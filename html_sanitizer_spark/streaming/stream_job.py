"""Structured Streaming sanitize: incremental feeds of span documents.

The engine is a stateless per-row transform (the reference has no temporal
semantics at all — SURVEY.md §2.9), so the streaming story is deliberately
simple and robust:

    readStream (parquet dir / rate source / Kafka in production)
      -> the SAME sanitize_spans transformation as batch
      -> foreachBatch(writer)  with option("checkpointLocation", ...)

``foreachBatch`` + checkpointLocation gives exactly-once-per-epoch output
for idempotent writers (per-epoch overwrite), with no watermarks or state
store needed — late data is irrelevant without event-time aggregation.
The batch and streaming paths share one implementation, so golden-replay
correctness carries over verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.job import sanitize_spans
from ..pipeline.synth import DOC_SCHEMA

__all__ = ["stream_sanitize_parquet_dir", "start_stream"]


def stream_sanitize_parquet_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    settings=None,
    explode: bool = False,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for new parquet files of (doc_id, spans) docs and
    append sanitized docs to ``output_dir``.

    ``explode=False`` by default: per-microbatch volumes are small, so the
    nested single-UDF plan (no reassembly shuffle) is the right physical
    strategy; flip to True for firehose feeds with mega-documents.
    """
    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = sanitize_spans(
            batch_df.sparkSession, batch_df, settings=settings, explode=explode
        )
        out.write.mode("append").parquet(output_dir)

    writer = (
        src.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream(*args, **kwargs) -> StreamingQuery:  # convenience alias
    return stream_sanitize_parquet_dir(*args, **kwargs)
