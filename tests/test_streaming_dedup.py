"""Streaming exact dedup (stream_dedup_exact).

Pins both variants:
- unbounded ``dropDuplicates``: survivors match the batch q_dedup_exact
  keeper exactly when the feed arrives in doc_id order (differential);
- bounded ``dropDuplicatesWithinWatermark``: a duplicate inside the
  horizon is suppressed, a digest re-appearing after its state aged out
  is re-emitted (the bounded-state contract).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from html_sanitizer_spark.streaming.stream_job import (
    DEDUP_FEED_SCHEMA,
    stream_dedup_exact,
)


def _write_feed(spark, path, rows):
    df = spark.createDataFrame(
        [{"doc_id": i, "ts": ts, "text": text} for i, ts, text in rows],
        schema=DEDUP_FEED_SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, in_dir, out_dir, ckpt, watermark=None):
    q = stream_dedup_exact(spark, in_dir, out_dir, ckpt, watermark=watermark)
    q.awaitTermination(120)


def test_stream_dedup_matches_batch_keeper(spark, tmp_path):
    """Differential: feed duplicates in doc_id order across three
    availableNow runs (each run internally duplicate-free), then the
    streaming survivors must equal the batch min-doc_id keepers."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    t = datetime(2024, 1, 1, 12, 0)
    runs = [
        [(0, t, "alpha"), (1, t, "beta"), (2, t, "gamma")],
        [(10, t, "alpha"), (11, t, "delta"), (12, t, "beta")],
        [(20, t, "gamma"), (21, t, "delta"), (22, t, "epsilon")],
    ]
    all_rows = [r for run in runs for r in run]
    for run in runs:
        _write_feed(spark, in_dir, run)
        _run(spark, in_dir, out_dir, ckpt)

    got = {
        r["text_hash"]: r["doc_id"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = spark.createDataFrame(
        [{"doc_id": i, "ts": ts, "text": text} for i, ts, text in all_rows],
        schema=DEDUP_FEED_SCHEMA,
    )
    want = {
        r["text_hash"]: r["keeper"]
        for r in batch.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper"))
        .collect()
    }
    assert got == want
    # exactly one survivor per distinct digest, ever
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == len({r["text_hash"] for r in rows}) == 5


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """Bounded variant: in-horizon duplicates are suppressed; a digest
    re-appearing after its state entry aged out is re-emitted."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    d = datetime
    # run 1: first sighting of A at 12:00 (+ a same-run in-horizon dup)
    _write_feed(spark, in_dir, [
        (0, d(2024, 1, 1, 12, 0), "A"),
        (1, d(2024, 1, 1, 12, 1), "A"),      # in-horizon dup: suppressed
        (2, d(2024, 1, 1, 12, 2), "B"),
    ])
    _run(spark, in_dir, out_dir, ckpt, watermark="10 minutes")
    # run 2: advance the watermark far past 12:10 so A's state ages out
    _write_feed(spark, in_dir, [(3, d(2024, 1, 1, 14, 0), "C")])
    _run(spark, in_dir, out_dir, ckpt, watermark="10 minutes")
    # run 3: A re-appears AFTER its state aged out -> re-emitted
    _write_feed(spark, in_dir, [(4, d(2024, 1, 1, 14, 5), "A")])
    _run(spark, in_dir, out_dir, ckpt, watermark="10 minutes")

    rows = spark.read.parquet(out_dir).collect()
    by_doc = sorted(r["doc_id"] for r in rows)
    # doc 1 (in-horizon dup) suppressed; doc 4 (post-horizon A) re-emitted
    assert by_doc == [0, 2, 3, 4]


def test_stream_dedup_incremental_matches_batch_index_probe(spark, tmp_path):
    """Streaming twin of dedup_incremental_against_index (r05): feed three
    availableNow runs against a PERSISTED corpus digest index — emissions
    must equal the batch probe's keep=1 set over the same feed (feed
    arrives in doc_id order, so first-arrival == min doc_id), and an index
    row appended BETWEEN runs must start suppressing its digest."""
    from html_sanitizer_spark.queries import (
        dedup_incremental_against_index,
        write_digest_index,
    )
    from html_sanitizer_spark.streaming.stream_job import (
        stream_dedup_incremental,
    )

    in_dir, out_dir, ckpt, idx = (
        str(tmp_path / d) for d in ("in", "out", "ck", "idx")
    )
    t = datetime(2024, 1, 1, 12, 0)
    write_digest_index(
        spark.createDataFrame([(100, "alpha"), (101, "beta")],
                              ["doc_id", "text"]),
        idx,
    )

    runs = [
        # alpha: in corpus -> suppressed; gamma fresh -> emit doc 1
        [(0, t, "alpha"), (1, t, "gamma")],
        # gamma again: stream-state dup -> suppressed; delta -> emit doc 11
        [(10, t, "gamma"), (11, t, "delta")],
        # beta: corpus -> suppressed; epsilon: suppressed ONLY because the
        # index grew between runs (the accreting-index contract)
        [(20, t, "beta"), (21, t, "epsilon")],
    ]
    for i, run in enumerate(runs):
        _write_feed(spark, in_dir, run)
        q = stream_dedup_incremental(spark, in_dir, idx, out_dir, ckpt)
        q.awaitTermination(120)
        if i == 1:
            write_digest_index(
                spark.createDataFrame([(300, "epsilon")],
                                      ["doc_id", "text"]),
                idx,
            )

    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 11]

    # batch differential over the runs-1+2 feed (none of whose docs is
    # epsilon, so the grown index probes identically for them)
    batch_feed = spark.createDataFrame(
        [{"doc_id": i, "text": text} for run in runs[:2] for i, _, text in run]
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_incremental_against_index(spark, batch_feed,
                                                 idx).collect()
        if r["keep"] == 1
    )
    assert got == want


def test_stream_quality_gate_matches_batch_battery(spark, tmp_path):
    """Differential: the streaming Gopher gate must emit EXACTLY the
    batch rule battery's rows for the same documents, across two
    availableNow runs (stateless map — replay-idempotent per epoch)."""
    from html_sanitizer_spark.queries import gopher_feature_frame
    from html_sanitizer_spark.streaming.stream_job import (
        read_stream_output,
        stream_quality_gate,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("qin", "qout", "qck"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 80)
    )
    t = datetime(2024, 1, 1, 12, 0)
    rows = [(r["doc_id"], t, r["text"]) for r in docs.collect()]
    for chunk in (rows[:40], rows[40:]):
        _write_feed(spark, in_dir, chunk)
        q = stream_quality_gate(spark, in_dir, out_dir, ckpt)
        q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["n_words"], r["mean_word_len"], r["symbol_ratio"],
                      r["alpha_frac"], r["n_stop_types"], r["keep"])
        for r in read_stream_output(spark, out_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_words"], r["mean_word_len"], r["symbol_ratio"],
                      r["alpha_frac"], r["n_stop_types"], r["keep"])
        for r in gopher_feature_frame(
            docs.filter(F.length(F.trim(F.col("text"))) > 0)
        ).collect()
    }
    assert got == want and got
