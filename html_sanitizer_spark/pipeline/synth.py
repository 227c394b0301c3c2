"""Deterministic synthetic spans-table generation (FIXTURES.md §1/§4).

The input shape comes from BASELINE.json's input_hint:

    documents(doc_id: string,
              spans: array<struct<kind, text, media_ref, offset>>)

Generation is seeded and wall-clock-free; every value derives from
(seed, doc_id), so generation is embarrassingly parallel: we generate with
``spark.range(n) -> mapInPandas`` which scales to any cluster size (no
driver-side materialization).

Span-count distribution is Zipf-skewed with deterministic "mega-docs"
(every ``mega_every``-th doc gets thousands of spans) to exercise the salted
reassembly path — the skew defusal the north_rule demands.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.udfs import SPANS_TYPE

__all__ = [
    "synth_spans_df",
    "synth_documents_df",
    "golden_spans_df",
    "DOC_SCHEMA",
    "DOCUMENTS_SCHEMA",
]

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE),
    ]
)

# HTML fragment templates covering every input class the golden corpus
# exercises (allowed tags, disallowed noise, entities, typographic
# whitespace, control chars, attacks). Kept small: realism comes from
# composition, volume from repetition with varying fill.
_FRAGMENTS = [
    "<p>{w} &nbsp; {w2}</p>",
    '<span style="font-weight: bold;">{w}</span><p></p>',
    "<p>{w} <span>inner <em>{w2}</em> tail</span> out</p>",
    "<h2>{w}</h2><h2>{w2}</h2>",
    "<ul><li> - {w}</li><li>* {w2}</li><li><p>{w}</p></li></ul>",
    '<a href="https://example.com/{w}">{w2}</a> &lsquo;quoted&rsquo;',
    '<a href="javascript:alert({w})">x</a><b>{w2}</b>',
    "<p>{w}<br/><br/>{w2}<br></p>",
    '<script type="text/javascript">evil("{w}")</script><p>{w2}</p>',
    "foo<style>* {{color: red}}</style>{w}",
    "<p><strong>{w}",
    "<li>{w}<p>{w2}<strong>xx</strong>rab</p><strong>baz</strong>a</li>",
    "<p>A & B \x01 {w}</p>",
    "＜img src=x onerror=＂alert({w})＂＞{w2}",
    "<form><p>{w}</p></form>",
    "<p>visit https://github.com/{w} soon</p>",
    "<h1>{w}  {w2}</h1><h3>drop-tag {w}</h3>",
    "<p>{w}<p>{w2}</p>tail</p>",
    "<div class=\"x\"><p>{w}</p></div>",
    "<p>emoji \U0001f602 {w}</p>",
]

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua Ut enim ad minim"
).split()


def _h(seed: int, *parts) -> int:
    """Deterministic 64-bit hash of (seed, parts) — the only randomness."""
    m = hashlib.blake2b(digest_size=8)
    m.update(str(seed).encode())
    for p in parts:
        m.update(b"\x00")
        m.update(str(p).encode())
    return int.from_bytes(m.digest(), "big")


def _doc_spans(seed: int, i: int, mega_every: int, text_repeat: int = 1) -> list[dict]:
    h0 = _h(seed, i, "n")
    if mega_every and i % mega_every == mega_every - 1:
        n_spans = 2000 + h0 % 8001  # mega-doc: 2k-10k spans
    else:
        # Zipf-ish (s~1.3) via inverse-CDF on a power law, clipped 1..40
        u = (h0 % 10_000) / 10_000.0 + 1e-9
        n_spans = min(40, max(1, int(u ** -0.77)))
    spans = []
    offset = 0
    for j in range(n_spans):
        hj = _h(seed, i, j)
        if hj % 10 < 3:  # p≈0.3 media span
            kind = ("image", "video", "audio")[hj % 3]
            text = "" if hj % 4 else f"caption {hj % 997}"
            media_ref = f"media://{hj:016x}"
        else:
            kind = "text"
            frag = _FRAGMENTS[hj % len(_FRAGMENTS)]
            text = frag.format(
                w=_WORDS[hj % len(_WORDS)], w2=_WORDS[(hj >> 8) % len(_WORDS)]
            )
            if text_repeat > 1:
                # fatten the span for compute-bound benchmarking; repeated
                # fragments keep sanitize cost linear in length
                text = " ".join([text] * text_repeat)
            media_ref = ""
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        offset += len(text) + 1
    return spans


def synth_spans_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    mega_every: int = 10_000,
    partitions: int | None = None,
    text_repeat: int = 1,
) -> DataFrame:
    """Distributed deterministic generation: one row per doc_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": [f"doc{int(i):012d}" for i in ids],
                    "spans": [
                        _doc_spans(seed, int(i), mega_every, text_repeat)
                        for i in ids
                    ],
                }
            )

    rng = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=DOC_SCHEMA)


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# hash-derived 8-char words: unrelated documents then share almost no
# character trigrams (a wNNN-style vocab makes EVERY doc pair look similar
# to a 3-gram sketch, which degenerates LSH into an all-pairs graph)
_DOC_VOCAB = [f"{_h(7, 'vocab', i):016x}"[:8] for i in range(5000)]


def synth_documents_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    group_size: int = 5,
    doc_words: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic documents table with CONTROLLED near-dup structure for
    dedup benchmarking: docs come in groups of ``group_size``; member 0 is
    the original, member k is the original with ~k of its ``doc_words``
    tokens rewritten — so every group spans the similarity spectrum from
    exact-ish dup (k=1) to borderline (k=group_size-1), exercising LSH
    banding, exact-Jaccard verification, clustering, and the removal join
    with known ground truth. Same distributed wall-clock-free generation
    as synth_spans_df (spark.range -> mapInPandas)."""

    def one(i: int) -> str:
        base = (i // group_size) * group_size
        k = i - base
        words = [
            _DOC_VOCAB[_h(seed, base, j) % len(_DOC_VOCAB)]
            for j in range(doc_words)
        ]
        if k:
            for j in range(doc_words):
                if _h(seed, i, "mut", j) % doc_words < k:
                    words[j] = _DOC_VOCAB[_h(seed, i, "rep", j) % len(_DOC_VOCAB)]
        return " ".join(words)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            texts = [one(i) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "n_chars": [len(t) for t in texts],
                }
            )

    rng = spark.range(
        0, n_docs,
        numPartitions=partitions or spark.sparkContext.defaultParallelism,
    )
    return rng.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def golden_spans_df(spark: SparkSession, config: str = "default") -> DataFrame:
    """Tier 1 replay table (FIXTURES.md §4): each golden case of the given
    config becomes one document with media sentinels around the text span,
    asserting pass-through + order preservation."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    if str(repo / "tests") not in sys.path:
        sys.path.insert(0, str(repo))
    from tests.golden_cases import CASES

    rows = []
    for case in CASES:
        if case.config != config:
            continue
        rows.append(
            {
                "doc_id": case.case_id,
                "spans": [
                    {"kind": "image", "text": "", "media_ref": f"media://pre/{case.case_id}", "offset": 0},
                    {"kind": "text", "text": case.before, "media_ref": "", "offset": 1},
                    {"kind": "video", "text": "cap", "media_ref": f"media://post/{case.case_id}", "offset": 2},
                ],
            }
        )
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)
