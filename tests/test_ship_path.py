"""Ship-path smoke test: the north_rule names `spark-submit --py-files` as
the deployment vehicle — run the real thing end to end: build the zip,
submit the CLI driver from a NEUTRAL cwd (so all imports resolve from the
zip, not the repo checkout), and check output + manifest + lineage."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(spark, tmp_path):
    from html_sanitizer_spark.pipeline.synth import synth_spans_df

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    synth_spans_df(spark, 30, seed=51, mega_every=0).write.parquet(in_dir)

    zip_path = str(tmp_path / "hss.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py"),
         zip_path],
        check=True, capture_output=True,
    )

    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(REPO, "html_sanitizer_spark", "pipeline", "cli.py"),
         "--input", in_dir, "--output", out_dir,
         "--buckets", "2", "--salt", "4"],
        capture_output=True, text=True, env=env, timeout=420,
        cwd=str(tmp_path),  # neutral cwd: imports must come from the zip
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])

    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["buckets_done"] == [0, 1]
    assert os.path.exists(os.path.join(out_dir, "_sanitize_manifest.json"))
    got = spark.read.parquet(os.path.join(out_dir, "bucket=*"))
    assert got.count() == 30
    lineage = spark.read.parquet(os.path.join(out_dir, "_lineage", "bucket=*"))
    assert lineage.count() > 0


def test_cli_json_and_csv_sources(spark, tmp_path):
    """r05 source formats: the CLI reads schema-enforced JSON span docs
    and flat doc_id,text CSV fragments (wrapped into single-span docs —
    the reference CLI's one-fragment-per-row analog), producing sanitized
    output through the same checkpointed path. Runs main() in-process
    (the spark-submit vehicle itself is covered above)."""
    from html_sanitizer_spark.pipeline.cli import main, read_input

    # JSON: full span shape, one doc per line
    j_in = tmp_path / "jin"
    j_in.mkdir()
    (j_in / "docs.json").write_text(
        '{"doc_id": "j1", "spans": [{"kind": "text", "text": "<p style=x>Hi '
        '<b>there</b></p>", "media_ref": "", "offset": 0}, {"kind": "image", '
        '"text": "", "media_ref": "m://1", "offset": 1}]}\n'
    )
    j_out = str(tmp_path / "jout")
    assert main(["--input", str(j_in), "--format", "json",
                 "--output", j_out, "--buckets", "2", "--salt", "2"]) == 0
    rows = {r["doc_id"]: r["spans"]
            for r in spark.read.parquet(f"{j_out}/bucket=*").collect()}
    assert rows["j1"][0]["text"] == "<p>Hi <strong>there</strong></p>"
    assert rows["j1"][1]["media_ref"] == "m://1"  # media untouched

    # CSV: flat fragments
    c_in = tmp_path / "cin"
    c_in.mkdir()
    (c_in / "frags.csv").write_text(
        'doc_id,text\nc1,"<script>evil()</script><p>ok</p>"\nc2,plain\n'
    )
    c_out = str(tmp_path / "cout")
    assert main(["--input", str(c_in), "--format", "csv",
                 "--output", c_out, "--buckets", "2", "--salt", "2"]) == 0
    got = {r["doc_id"]: r["spans"][0]["text"]
           for r in spark.read.parquet(f"{c_out}/bucket=*").collect()}
    assert got == {"c1": "<p>ok</p>", "c2": "plain"}

    # the reader contract itself: csv wraps into the DOC_SCHEMA shape
    df = read_input(spark, str(c_in), "csv")
    assert df.columns == ["doc_id", "spans"]
    assert df.schema["spans"].dataType.elementType.names == [
        "kind", "text", "media_ref", "offset"
    ]

    # ADVICE r05 #3: a quoted field with EMBEDDED NEWLINES and escaped
    # quotes (common in HTML fragments) must stay one record — without
    # multiLine the row is split and silently corrupts.
    m_in = tmp_path / "min"
    m_in.mkdir()
    (m_in / "frags.csv").write_text(
        'doc_id,text\n'
        'm1,"<p>line one\nline two</p>"\n'
        'm2,"says ""hi""\nand <b>bye</b>"\n'
    )
    mrows = {r["doc_id"]: r["spans"][0]["text"]
             for r in read_input(spark, str(m_in), "csv").collect()}
    assert mrows == {
        "m1": "<p>line one\nline two</p>",
        "m2": 'says "hi"\nand <b>bye</b>',
    }


def test_cli_extract_mode(spark, tmp_path):
    """r06 --mode extract: the north rule's main-content extraction
    pipeline reachable from the same spark-submit driver — boilerplate
    (nav/footer, link-dense blocks) stripped from text spans, media
    spans untouched, span order preserved."""
    from html_sanitizer_spark.pipeline.cli import main

    e_in = tmp_path / "ein"
    e_in.mkdir()
    (e_in / "docs.json").write_text(
        '{"doc_id": "e1", "spans": ['
        '{"kind": "text", "text": "<nav><a href=/>Home</a></nav>'
        '<p>real article body</p>'
        '<ul><li><a href=/a>aaa</a></li><li><a href=/b>bbb</a></li></ul>'
        '<footer>c 2026</footer>", "media_ref": "", "offset": 0}, '
        '{"kind": "image", "text": "", "media_ref": "m://e", "offset": 1}'
        "]}\n"
    )
    e_out = str(tmp_path / "eout")
    assert main(["--input", str(e_in), "--format", "json",
                 "--output", e_out, "--mode", "extract", "--salt", "2"]) == 0
    rows = {r["doc_id"]: r["spans"]
            for r in spark.read.parquet(e_out).collect()}
    assert rows["e1"][0]["text"] == "real article body"
    assert rows["e1"][1]["media_ref"] == "m://e"
    assert [s["offset"] for s in rows["e1"]] == [0, 1]
