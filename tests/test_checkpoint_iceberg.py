"""Checkpointed runs writing to the iceberg-lite table: resume after crash
yields exactly-once bucket snapshots (no duplicates)."""

from __future__ import annotations

import pytest

from html_sanitizer_spark.pipeline.checkpoint import (
    read_checkpointed,
    run_checkpointed,
)
from html_sanitizer_spark.pipeline.synth import synth_spans_df


def test_iceberg_lite_resume_exactly_once(spark, tmp_path):
    df = synth_spans_df(spark, 60, seed=31, mega_every=0).cache()
    out = str(tmp_path / "run")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(spark, df, out, n_buckets=3, fail_after_bucket=1,
                         table_format="iceberg-lite")
    run = run_checkpointed(spark, df, out, n_buckets=3,
                           table_format="iceberg-lite")
    assert sorted(run.done) == [0, 1, 2]
    got = read_checkpointed(spark, out, table_format="iceberg-lite")
    assert got.count() == 60
    assert got.select("doc_id").distinct().count() == 60  # no duplicates
    df.unpersist()
