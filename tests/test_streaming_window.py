"""Stateful streaming: watermarked event-time windows with late data.

Pins the append-mode contract of stream_event_window_rollup:
- a window is emitted exactly once, after the watermark passes its end;
- events later than the watermark are dropped, not double-counted;
- the watermark persists in the checkpoint across availableNow re-runs.
"""

from __future__ import annotations

from datetime import datetime

from html_sanitizer_spark.streaming.stream_job import (
    EVENT_SCHEMA,
    stream_event_window_rollup,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        [
            {"event_id": i, "ts": ts, "user_id": 1,
             "event_type": etype, "value": 1.0, "props": "{}"}
            for i, (ts, etype) in enumerate(rows)
        ],
        schema=EVENT_SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, in_dir, out_dir, ckpt):
    q = stream_event_window_rollup(spark, in_dir, out_dir, ckpt,
                                   window="1 day", watermark="2 hours")
    q.awaitTermination(120)


def test_watermarked_window_rollup_drops_late_data(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    d = datetime

    # run 1: three day-1 clicks, two day-2 noon views -> watermark advances
    # to day-2 10:00; nothing emitted yet (no window end has passed it)
    _write_events(spark, in_dir, [
        (d(2024, 1, 1, 3, 0), "click"),
        (d(2024, 1, 1, 5, 0), "click"),
        (d(2024, 1, 1, 7, 0), "click"),
        (d(2024, 1, 2, 12, 0), "view"),
        (d(2024, 1, 2, 12, 30), "view"),
    ])
    _run(spark, in_dir, out_dir, ckpt)

    # run 2: one LATE day-1 click (behind the persisted watermark -> must be
    # dropped) plus day-3 events that advance the watermark past day-2
    _write_events(spark, in_dir, [
        (d(2024, 1, 1, 6, 0), "click"),       # late: beyond watermark
        (d(2024, 1, 3, 9, 0), "purchase"),
    ])
    _run(spark, in_dir, out_dir, ckpt)

    # run 3: day-4 event advances the watermark past day-3
    _write_events(spark, in_dir, [(d(2024, 1, 4, 9, 0), "signup")])
    _run(spark, in_dir, out_dir, ckpt)

    got = {
        (r["day_start"].strftime("%Y-%m-%d"), r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # day-1 clicks: 3, NOT 4 — the late event was dropped by the watermark
    assert got[("2024-01-01", "click")] == 3
    # day-2 views emitted exactly once
    assert got[("2024-01-02", "view")] == 2
    # the day-4 window cannot have closed (watermark never passed its end)
    assert ("2024-01-04", "signup") not in got
    # no duplicate emission: counts keyed uniquely
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == len({(r["day_start"], r["event_type"]) for r in rows})


def test_stream_matches_batch_window_rollup_when_all_closed(spark, tmp_path):
    """Differential: the watermarked streaming window counts must equal the
    batch q_event_window_rollup counts once every window has closed (via a
    far-future sentinel event)."""
    from pyspark.sql import functions as F

    from html_sanitizer_spark.queries import q_event_window_rollup

    src = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    sf_dir = str(tmp_path / "sf")
    src.write.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r["day_start"], r["event_type"]): r["n_events"]
        for r in q_event_window_rollup(spark, sf_dir).collect()
    }
    assert batch

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    src.coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    _write_events(spark, in_dir, [(datetime(2031, 1, 1), "sentinel")])
    _run(spark, in_dir, out_dir, ckpt)
    _write_events(spark, in_dir, [(datetime(2031, 6, 1), "sentinel2")])
    _run(spark, in_dir, out_dir, ckpt)

    streamed = {
        (r["day_start"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]):
            r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
        if not r["event_type"].startswith("sentinel")
    }
    assert streamed == batch
