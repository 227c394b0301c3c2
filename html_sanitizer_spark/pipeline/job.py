"""Core batch topology (SURVEY.md §3.4, north_rule plumbing).

Exploded path (default — skew-proof):

    read (doc_id, spans)
      -> posexplode_outer(spans)                  [no shuffle: explode is
                                                   pipelined into the scan]
      -> repartition by (doc_id, pos div 256)     [SHUFFLE 1 — chunk-salted:
                                                   a mega-doc's chunks spread
                                                   over all buckets, so no
                                                   straggler UDF task; <=256
                                                   spans per doc per task]
      -> sanitize_udf on text-kind spans          [the only JVM<->Python
                                                   Arrow hop]
      -> two-phase reassembly:
           groupBy(doc_id, _chunk) partial collect [SHUFFLE 2a — same key as
                                                   the salt, bounded group
                                                   size; elided for free if
                                                   Spark ever preserves
                                                   partitioning through
                                                   EvalPythonExec]
           groupBy(doc_id) merge + array_sort     [SHUFFLE 2b — one row per
                                                   doc; sort restores span
                                                   order by pos]

Nested path (``explode=False``): a single pandas UDF over the whole spans
array — zero reassembly shuffles, order preserved trivially. Wins when doc
sizes are tame; loses when one doc has 10^6 spans (whole doc on one core).
``sanitize_spans`` picks per call; bench.py measures both.

Order contract (north_rule): output spans equal input spans in (kind,
media_ref, offset, order), with text-kind ``text`` sanitized — verified by
tests/test_spark_tier1.py via span-sequence equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import (
    make_sanitize_udf,
    make_span_array_udf,
    sanitize_spans_arrow,
)

__all__ = [
    "sanitize_spans",
    "extract_spans",
    "explode_spans",
    "reassemble_spans",
    "lineage_metrics",
    "lineage_metrics_nested",
]


def explode_spans(df: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, pos, span); empty docs keep a null row."""
    return df.select("doc_id", F.posexplode_outer("spans").alias("pos", "span"))


def sanitize_exploded(
    exploded: DataFrame, settings=None, salt_buckets: int | None = None,
    memoize: int = 0, on_error: str = "raise", chunk_size: int = 256,
) -> DataFrame:
    """Apply the sanitize UDF to text-kind spans of an exploded frame.

    ``salt_buckets``: when set, repartitions by (doc_id, _chunk) where
    ``_chunk = pos div chunk_size`` — a mega-document's chunks spread
    across tasks before hitting Python (the skew defusal the north_rule
    requires; per-task state from any one document is bounded by
    chunk_size spans, the same bound the reassembly's phase-1 group
    already imposes). r08 change (guide §2.4 — key operations the same
    way so one exchange CAN be shared): the salt key now equals the
    reassembly's phase-1 group key. The intended exchange elision does
    not fire yet — Spark 4.1's EvalPythonExec drops outputPartitioning,
    so EnsureRequirements re-shuffles above the Arrow UDF regardless
    (verified with a minimal repro; OPTIMIZATION_r08.md) — but the
    aligned key measured ~15% on the exploded leg on its own, the gate
    test_exploded_pipeline_exchange_budget pins the <=3-exchange budget,
    and if upstream ever preserves partitioning through Python nodes the
    third exchange disappears with no further change here. The span's
    own row carries ``pos``, so order needs no co-location; output is
    span-for-span identical (tier-1 replay + sanitize_structure/span
    oracles unchanged).
    """
    udf = make_sanitize_udf(settings, memoize=memoize, on_error=on_error)
    salted = False
    if salt_buckets:
        exploded = exploded.withColumn(
            "_chunk",
            (F.col("pos").cast("long") / F.lit(chunk_size)).cast("long"),
        ).repartition(salt_buckets, "doc_id", "_chunk")
        salted = True
    applies = (F.col("span.kind") == F.lit("text")) & F.col("span.text").isNotNull()
    if on_error == "raise":
        clean = F.when(applies, udf(F.col("span.text"))).otherwise(
            F.col("span.text")
        )
        err = F.lit(False)
    else:
        # safe modes return struct<text, err>: the poison row is an explicit
        # flag column (quarantined / counted in lineage), never a silent
        # pass-through indistinguishable from clean output
        res = udf(F.col("span.text"))
        clean = F.when(applies, res["text"]).otherwise(F.col("span.text"))
        err = F.when(applies, F.coalesce(res["err"], F.lit(False))).otherwise(
            F.lit(False)
        )
    new_span = F.struct(
        F.col("span.kind").alias("kind"),
        clean.alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    return exploded.select(
        "doc_id",
        "pos",
        # carry the salt/chunk key through so reassemble_spans can group
        # on the exact attribute the exchange already partitioned by
        *(["_chunk"] if salted else []),
        # null-span guard covers both the posexplode_outer empty-doc row
        # (pos null too) and a null ELEMENT inside a spans array (pos set):
        # either stays null instead of being rebuilt as a struct of null
        # fields, matching the arrow/pandas nested paths (ADVICE r02)
        F.when(F.col("span").isNotNull(), new_span).alias("span"),
        err.alias("span_error"),
    )


def reassemble_spans(
    clean: DataFrame, two_phase: bool = True, chunk_size: int = 256
) -> DataFrame:
    """(doc_id, pos, span) -> (doc_id, spans) with order restored by pos.

    Two-phase mode bounds per-group aggregation state under mega-document
    skew: spans first collect per (doc_id, chunk) where chunk = pos div
    ``chunk_size`` — a *contiguous* range, so a normal (< chunk_size spans)
    document pays exactly one group and zero extra structure, while a
    mega-document's chunks spread over the cluster and arrive pre-sorted;
    the final per-doc merge only orders whole chunks and flattens. This is
    strictly cheaper than hash-salted partials (which shred every doc into
    single-span chunks). collect_list skips null spans, so empty docs come
    back with an empty array rather than [null].

    When the incoming frame already carries a ``_chunk`` column (the
    chunk-aligned salt sanitize_exploded applies since r08), phase 1
    groups on that exact attribute — the same key the salt exchange
    partitioned by. (The phase-1 exchange is not elided yet: Spark 4.1's
    EvalPythonExec drops outputPartitioning, see sanitize_exploded; the
    alignment still avoids any FOURTH shuffle and makes the elision
    automatic if that upstream limitation lifts.)
    """
    keyed = F.when(
        F.col("pos").isNotNull(),
        F.struct(F.col("pos").alias("pos"), F.col("span").alias("span")),
    )
    if two_phase:
        chunk_key = (
            F.col("_chunk")
            if "_chunk" in clean.columns
            else (F.col("pos").cast("long") / F.lit(chunk_size))
            .cast("long")
            .alias("_chunk")
        )
        partial = clean.groupBy("doc_id", chunk_key).agg(
            F.sort_array(F.collect_list(keyed)).alias("chunk_arr")
        )
        merged = partial.groupBy("doc_id").agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_chunk").alias("c"),
                                F.col("chunk_arr").alias("arr"),
                            )
                        )
                    ),
                    lambda kv: kv["arr"],
                )
            ).alias("keyed")
        )
    else:
        merged = clean.groupBy("doc_id").agg(
            F.array_sort(F.collect_list(keyed)).alias("keyed")
        )
    return merged.select(
        "doc_id", F.transform("keyed", lambda kv: kv["span"]).alias("spans")
    )


_AUTO_PROBE_ROWS = 4096
_AUTO_EXPLODE_THRESHOLD = 512


def _probe_max_spans(df: DataFrame, n_rows: int = _AUTO_PROBE_ROWS) -> int:
    """Bounded skew probe for ``explode="auto"``: max span count over the
    first ``n_rows`` documents (a GlobalLimit — the scan stops after
    n_rows, never a full pass; VERDICT r01 #7). At 100 TB prefer passing
    ``max_spans_hint`` from table statistics or the previous run's lineage
    rollup instead of probing at all."""
    from ..functions.bounded import bounded_collect

    row = bounded_collect(
        df.select(F.size("spans").alias("n"))
        .limit(n_rows)
        .agg(F.max("n").alias("m")),
        1,
        "explode-auto skew probe",
    )
    return row[0]["m"] or 0


def sanitize_spans(
    spark: SparkSession,
    df: DataFrame,
    settings=None,
    explode: bool | str = True,
    salt_buckets: int | str | None = "auto",
    two_phase: bool = True,
    memoize: int = 0,
    on_error: str = "raise",
    max_spans_hint: int | None = None,
    nested_impl: str = "arrow",
) -> DataFrame:
    """End-to-end: sanitize every text-kind span of (doc_id, spans).

    ``salt_buckets="auto"`` sizes the salted shuffle to 4x the cluster's
    default parallelism — enough granularity that AQE can rebalance and a
    mega-document never owns a task, without drowning small jobs in tiny
    tasks. Pass an int to pin it, or None to skip salting entirely.
    ``memoize``: per-worker output cache size for boilerplate-heavy
    corpora (see make_sanitize_udf).
    ``max_spans_hint``: known max span count per doc (table statistics /
    previous lineage); lets ``explode="auto"`` skip even the bounded probe.
    ``nested_impl``: "arrow" (mapInArrow, column-wise batch rebuild) or
    "pandas" (span-array pandas UDF) for the non-exploded plan."""
    if salt_buckets == "auto":
        salt_buckets = spark.sparkContext.defaultParallelism * 4
    if explode == "auto":
        # pick the physical plan by measured skew: if any document's span
        # count could monopolize a task, use the exploded+salted plan;
        # otherwise the nested single-UDF plan (no reassembly shuffles)
        # wins. on_error/memoize are honored on BOTH plans (VERDICT r03
        # #8), so the knobs no longer force the choice.
        if max_spans_hint is None:
            max_spans_hint = _probe_max_spans(df)
        explode = max_spans_hint > _AUTO_EXPLODE_THRESHOLD
    if not explode:
        if nested_impl == "arrow":
            return sanitize_spans_arrow(df, settings, memoize=memoize,
                                        on_error=on_error)
        udf = make_span_array_udf(settings, memoize=memoize,
                                  on_error=on_error)
        return df.select("doc_id", udf("spans").alias("spans"))
    clean = sanitize_exploded(explode_spans(df), settings, salt_buckets,
                              memoize=memoize, on_error=on_error)
    return reassemble_spans(clean, two_phase=two_phase)


def extract_spans(
    spark: SparkSession,
    df: DataFrame,
    *,
    max_link_density: float = 0.5,
    salt_buckets: int | str | None = "auto",
    two_phase: bool = True,
) -> DataFrame:
    """Main-content extraction over interleaved (doc_id, spans) documents —
    the north rule's "main-content extraction pipeline" run on the SAME
    topology as the sanitize flagship: explode -> salted shuffle on
    (doc_id, pos) -> ONE Arrow-batched Python hop (engine/extract.py:
    boilerplate kill list + atomic-block link density) applied to
    text-kind spans only -> two-phase chunked reassembly. Media-kind
    spans pass through byte-identical and in position; the span order
    contract is sanitize_spans' exactly (kind, media_ref, offset, order
    preserved; text replaced by the extracted main content)."""
    from ..functions.udfs import make_extract_udf

    if salt_buckets == "auto":
        salt_buckets = spark.sparkContext.defaultParallelism * 4
    exploded = explode_spans(df)
    salted = False
    if salt_buckets:
        # chunk-aligned salt (r08): same key the reassembly groups on —
        # see sanitize_exploded for why/limits
        exploded = exploded.withColumn(
            "_chunk", (F.col("pos").cast("long") / F.lit(256)).cast("long")
        ).repartition(salt_buckets, "doc_id", "_chunk")
        salted = True
    udf = make_extract_udf(max_link_density=max_link_density)
    applies = (F.col("span.kind") == F.lit("text")) & F.col(
        "span.text"
    ).isNotNull()
    new_text = F.when(
        applies, udf(F.col("span.text"))["main_text"]
    ).otherwise(F.col("span.text"))
    new_span = F.struct(
        F.col("span.kind").alias("kind"),
        new_text.alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    ex = exploded.select(
        "doc_id",
        "pos",
        *(["_chunk"] if salted else []),
        F.when(F.col("span").isNotNull(), new_span).alias("span"),
    )
    return reassemble_spans(ex, two_phase=two_phase)


def lineage_metrics(clean: DataFrame) -> DataFrame:
    """Per-partition lineage over the sanitized exploded frame
    (north_rule: per-partition lineage rows). Cheap second aggregation —
    run it on the same cached frame as the reassembly."""
    err_agg = (
        F.sum(F.col("span_error").cast("int"))
        if "span_error" in clean.columns
        else F.lit(0)
    )
    return (
        clean.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
            F.sum(
                F.when(F.col("span.kind") == "text", F.length("span.text")).otherwise(0)
            ).alias("text_bytes_out"),
            F.sum(F.when(F.col("span.kind") != "text", 1).otherwise(0)).alias(
                "n_media_spans"
            ),
            err_agg.alias("n_errors"),
        )
    )


def lineage_metrics_nested(clean: DataFrame) -> DataFrame:
    """Lineage rollup for the NESTED plan (VERDICT r04 #7): same columns
    as lineage_metrics, computed from the (doc_id, spans[, n_span_errors])
    frame ``sanitize_spans_arrow(..., with_errors=True)`` returns — the
    nested path gets the same quarantine/lineage visibility as the
    exploded frame's span_error flag. All per-row work is map-side array
    expressions (aggregate/filter over the spans array); the only shuffle
    is the per-partition groupBy, identical to lineage_metrics. Null span
    elements count toward n_spans (as in the exploded frame) but toward
    neither bytes nor media, and an empty/null spans array counts as ONE
    span — posexplode_outer keeps a placeholder row for such docs, so the
    exploded rollup sees it; greatest(size, 1) keeps the parity contract
    exact on empty docs too (ADVICE r05 #1)."""
    has_err = "n_span_errors" in clean.columns
    spans = F.coalesce(F.col("spans"), F.array())
    row = clean.select(
        "doc_id",
        F.spark_partition_id().alias("part_id"),
        F.greatest(F.size(spans), F.lit(1)).alias("_n_spans"),
        F.aggregate(
            spans,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.coalesce(
                F.when(
                    (s["kind"] == F.lit("text")) & s["text"].isNotNull(),
                    F.length(s["text"]).cast("long"),
                ),
                F.lit(0).cast("long"),
            ),
        ).alias("_text_bytes"),
        F.size(
            F.filter(spans, lambda s: s.isNotNull() & (s["kind"] != F.lit("text")))
        ).alias("_n_media"),
        (
            F.coalesce(F.col("n_span_errors"), F.lit(0))
            if has_err
            else F.lit(0)
        ).alias("_n_err"),
    )
    return row.groupBy("part_id").agg(
        F.sum("_n_spans").alias("n_spans"),
        F.approx_count_distinct("doc_id").alias("n_docs_approx"),
        F.sum("_text_bytes").alias("text_bytes_out"),
        F.sum("_n_media").alias("n_media_spans"),
        F.sum("_n_err").alias("n_errors"),
    )
