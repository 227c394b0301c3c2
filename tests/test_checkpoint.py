"""Tier 3: checkpoint/resume correctness — kill after k buckets, re-run,
output must be byte-equal to an uninterrupted run; config drift refused."""

from __future__ import annotations

import json
import os

import pytest

from html_sanitizer_spark.pipeline.checkpoint import (
    MANIFEST_NAME,
    read_checkpointed,
    run_checkpointed,
)
from html_sanitizer_spark.pipeline.synth import synth_spans_df


def _collect_sorted(df):
    return sorted(
        ((r["doc_id"], [tuple(s) for s in r["spans"]]) for r in df.collect()),
    )


def test_resume_after_crash(spark, tmp_path):
    df = synth_spans_df(spark, 120, seed=5, mega_every=0).cache()

    full_dir = str(tmp_path / "full")
    run_checkpointed(spark, df, full_dir, n_buckets=4)
    want = _collect_sorted(read_checkpointed(spark, full_dir))

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(spark, df, crash_dir, n_buckets=4, fail_after_bucket=2)
    manifest = json.load(open(os.path.join(crash_dir, MANIFEST_NAME)))
    assert len(manifest["done"]) == 2

    # resume: only remaining buckets run; output identical to one-shot
    run = run_checkpointed(spark, df, crash_dir, n_buckets=4)
    assert sorted(run.done) == [0, 1, 2, 3]
    got = _collect_sorted(read_checkpointed(spark, crash_dir))
    assert got == want
    df.unpersist()


def test_rerun_is_idempotent(spark, tmp_path):
    df = synth_spans_df(spark, 40, seed=9, mega_every=0)
    out = str(tmp_path / "out")
    run_checkpointed(spark, df, out, n_buckets=2)
    before = _collect_sorted(read_checkpointed(spark, out))
    run2 = run_checkpointed(spark, df, out, n_buckets=2)  # no-op: all done
    assert sorted(run2.done) == [0, 1]
    assert _collect_sorted(read_checkpointed(spark, out)) == before


def test_config_drift_refused(spark, tmp_path):
    df = synth_spans_df(spark, 10, seed=2, mega_every=0)
    out = str(tmp_path / "out")
    run_checkpointed(spark, df, out, n_buckets=2)
    with pytest.raises(ValueError, match="config fingerprint"):
        run_checkpointed(spark, df, out, settings="typographic", n_buckets=2)
    with pytest.raises(ValueError, match="n_buckets"):
        run_checkpointed(spark, df, out, n_buckets=4)


def test_staging_partition_pruned_io(spark, tmp_path):
    """The 100TB property: the input is staged ONCE (bucketed write), and
    each per-bucket job reads only its own bucket=<k> files — never a
    rescan of the whole input (a filter on computed xxhash64 can't prune)."""
    df = synth_spans_df(spark, 80, seed=7, mega_every=0)
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(spark, df, out, n_buckets=4, fail_after_bucket=1)

    staging = os.path.join(out, "_staging")
    assert os.path.exists(os.path.join(staging, "_staging_commit.json"))
    # staged copy holds the full input exactly once
    assert spark.read.parquet(staging).count() == 80
    # a per-bucket read touches only that bucket's files (partition-pruned)
    part = spark.read.parquet(os.path.join(staging, "bucket=2"))
    files = part.inputFiles()
    assert files and all("bucket=2" in f for f in files), files

    # resume reuses the staged copy, completes, and drops the staging dir
    run = run_checkpointed(spark, df, out, n_buckets=4)
    assert sorted(run.done) == [0, 1, 2, 3]
    assert not os.path.exists(staging)
    assert read_checkpointed(spark, out).count() == 80


def test_lineage_written(spark, tmp_path):
    df = synth_spans_df(spark, 30, seed=4, mega_every=0)
    out = str(tmp_path / "out")
    run_checkpointed(spark, df, out, n_buckets=2)
    lineage = spark.read.parquet(os.path.join(out, "_lineage", "bucket=*"))
    rows = lineage.collect()
    assert sum(r["n_spans"] for r in rows) >= 30
    assert {c for c in lineage.columns} >= {
        "part_id", "n_spans", "n_docs_approx", "text_bytes_out", "bucket"
    }


def test_quarantine_written_on_keep(spark, tmp_path, monkeypatch):
    """on_error='keep' routes poison spans to an explicit quarantine table
    per bucket and records the policy in the manifest (resume under a
    different policy refuses)."""
    from html_sanitizer_spark.functions import udfs
    from html_sanitizer_spark.pipeline.synth import DOC_SCHEMA

    orig = udfs.sanitize

    def bomb(t, s):
        if "BOOM" in t:
            raise RuntimeError("poison document")
        return orig(t, s)

    monkeypatch.setattr(udfs, "sanitize", bomb)
    docs = [
        {"doc_id": f"d{i}", "spans": [
            {"kind": "text",
             "text": "<p>BOOM</p>" if i == 3 else f"<p>ok {i}</p>",
             "media_ref": "", "offset": 0},
        ]}
        for i in range(8)
    ]
    df = spark.createDataFrame(docs, schema=DOC_SCHEMA)
    out = str(tmp_path / "out")
    run = run_checkpointed(spark, df, out, n_buckets=2, on_error="keep")
    assert sorted(run.done) == [0, 1]

    q = spark.read.parquet(os.path.join(out, "_quarantine", "bucket=*"))
    qrows = q.collect()
    assert len(qrows) == 1 and "BOOM" in qrows[0]["span"]["text"]
    # keep policy: the raw span is still in the main output, flagged only
    # via quarantine/lineage
    main = read_checkpointed(spark, out)
    texts = {r["doc_id"]: r["spans"][0]["text"] for r in main.collect()}
    assert texts["d3"] == "<p>BOOM</p>"
    assert texts["d0"] == "<p>ok 0</p>"
    lineage = spark.read.parquet(os.path.join(out, "_lineage", "bucket=*"))
    assert sum(r["n_errors"] for r in lineage.collect()) == 1
    # policy drift refused on resume
    with pytest.raises(ValueError, match="on_error"):
        run_checkpointed(spark, df, out, n_buckets=2, on_error="null")
