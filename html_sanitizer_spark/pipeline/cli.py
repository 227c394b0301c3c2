"""Distributed job driver, runnable directly or via spark-submit:

    spark-submit --py-files engine.zip -m ...     (cluster)
    python -m html_sanitizer_spark.pipeline.cli \
        --input /data/spans --output /data/clean \
        --config default --buckets 16 --salt 64 [--resume] [--nested]

Reads a (doc_id, spans) parquet/Iceberg table, sanitizes text spans,
writes sanitized docs + per-partition lineage + an atomic resume manifest.
``scripts/build_pyfiles.py`` produces the --py-files zip.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# absolute imports: spark-submit executes this file as a top-level script
# with the --py-files zip on PYTHONPATH (also works under python -m)
from html_sanitizer_spark.configs import settings_for
from html_sanitizer_spark.pipeline.checkpoint import run_checkpointed
from html_sanitizer_spark.pipeline.job import extract_spans, sanitize_spans
from html_sanitizer_spark.pipeline.session import get_spark
from html_sanitizer_spark.pipeline.synth import DOC_SCHEMA


def read_input(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Source formats (r05): parquet and json carry the full
    (doc_id, spans) shape (json = one doc object per line, schema
    enforced — no sampling-based inference job); csv is the FLAT
    fragment shape ``doc_id,text`` (header row) wrapped into
    single-text-span documents — the distributed analog of the
    reference CLI's one-fragment-per-file batch mode
    (``__main__.py:8-13``)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.schema(DOC_SCHEMA).json(path)
    # multiLine + escape: HTML fragments routinely contain embedded
    # newlines and quotes; without multiLine a quoted field spanning
    # lines is split across records and silently corrupts rows
    # (ADVICE r05 #3). multiLine=True trades file-splittability for
    # correctness — acceptable for the CLI's ad-hoc fragment batches.
    flat = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    return flat.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="html-sanitizer-spark")
    ap.add_argument("--input", required=True,
                    help="input dir of (doc_id, spans) docs (see --format)")
    ap.add_argument("--format", choices=("parquet", "json", "csv"),
                    default="parquet",
                    help="parquet/json = full span-document shape (json: "
                         "one doc per line); csv = flat doc_id,text "
                         "fragments wrapped into single-span docs")
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", default="default")
    ap.add_argument("--buckets", type=int, default=16,
                    help="doc_id-hash checkpoint buckets (resume granularity)")
    ap.add_argument("--salt", type=int, default=64,
                    help="salt buckets for the sanitize-stage shuffle")
    ap.add_argument("--nested", action="store_true",
                    help="zero-reassembly-shuffle plan (no mega-doc skew)")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="single write, no manifest/resume")
    ap.add_argument("--on-error", choices=("raise", "keep", "null"),
                    default="raise",
                    help="poison-span policy; non-raise routes errored spans"
                         " to <output>/_quarantine and counts them in lineage")
    ap.add_argument("--memoize", type=int, default=0,
                    help="per-worker sanitize output cache size (exact; for"
                         " boilerplate-heavy corpora)")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--mode", choices=("sanitize", "extract"),
                    default="sanitize",
                    help="sanitize = allowlist-rewrite text spans (default);"
                         " extract = main-content extraction (boilerplate"
                         " strip via DOM heuristics, engine/extract.py) on"
                         " the same interleaved-span topology — single"
                         " write, no checkpoint stage")
    ap.add_argument("--max-link-density", type=float, default=0.5,
                    help="extract mode: atomic-block link-density keep bar")
    args = ap.parse_args(argv)

    settings = settings_for(args.config)  # fail fast on bad config

    active = SparkSession.getActiveSession()
    spark = active or get_spark("sanitize-job", parallelism=args.parallelism)
    df = read_input(spark, args.input, args.format)

    if args.mode == "extract":
        out = extract_spans(
            spark, df, max_link_density=args.max_link_density,
            salt_buckets=args.salt,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"input": args.input, "output": args.output,
                          "mode": "extract", "buckets_done":
                          "all (single write)"}))
        if active is None:
            spark.stop()
        return 0

    if args.no_checkpoint or args.nested:
        out = sanitize_spans(
            spark, df, settings=settings,
            explode=not args.nested, salt_buckets=args.salt,
            on_error=args.on_error, memoize=args.memoize,
        )
        out.write.mode("overwrite").parquet(args.output)
        done = "all (single write)"
    else:
        run = run_checkpointed(
            spark, df, args.output, settings=settings,
            n_buckets=args.buckets, salt_buckets=args.salt,
            on_error=args.on_error, memoize=args.memoize,
        )
        done = sorted(run.done)
    print(json.dumps({"input": args.input, "output": args.output,
                      "config": args.config, "buckets_done": done}))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
