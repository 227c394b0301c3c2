"""Iceberg-lite table semantics: atomic snapshot commits, append vs
overwrite isolation, time travel, crash tolerance."""

from __future__ import annotations

import os

from html_sanitizer_spark.pipeline.iceberg_lite import IcebergLiteTable
from html_sanitizer_spark.pipeline.job import sanitize_spans
from html_sanitizer_spark.pipeline.synth import synth_spans_df


def test_append_and_time_travel(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "tbl"))
    df1 = synth_spans_df(spark, 20, seed=1, mega_every=0)
    v1 = t.append(df1, summary={"docs": 20})
    assert v1 == 1
    assert t.read(spark).count() == 20

    df2 = synth_spans_df(spark, 15, seed=2, mega_every=0)
    v2 = t.append(df2)
    assert v2 == 2
    assert t.read(spark).count() == 35
    # time travel back to v1
    assert t.read(spark, version=1).count() == 20
    assert [s["operation"] for s in t.snapshots()] == ["append", "append"]


def test_overwrite_replaces(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "tbl"))
    t.append(synth_spans_df(spark, 10, seed=3, mega_every=0))
    t.overwrite(synth_spans_df(spark, 5, seed=4, mega_every=0))
    assert t.read(spark).count() == 5
    assert t.read(spark, version=1).count() == 10  # old snapshot intact


def test_crash_before_hint_leaves_previous_snapshot(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "tbl"))
    t.append(synth_spans_df(spark, 10, seed=5, mega_every=0))
    # simulate a crash: data + metadata written but hint NOT advanced
    files = t._write_data_files(synth_spans_df(spark, 7, seed=6, mega_every=0))
    meta_path = os.path.join(t.meta_dir, "v2.metadata.json")
    import json
    with open(meta_path, "w") as fh:
        json.dump({"version": 2, "parent": 1, "data_files": files,
                   "operation": "append", "schema": {}, "summary": {}}, fh)
    # reader still sees v1
    assert t.current_version() == 1
    assert t.read(spark).count() == 10


def test_sanitized_output_to_table(spark, tmp_path):
    src = synth_spans_df(spark, 30, seed=7, mega_every=0)
    out = sanitize_spans(spark, src, salt_buckets=8)
    t = IcebergLiteTable(str(tmp_path / "clean"))
    t.append(out, summary={"stage": "sanitize", "config": "default"})
    back = t.read(spark)
    assert back.count() == 30
    assert set(back.columns) == {"doc_id", "spans"}
