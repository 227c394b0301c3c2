"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100TB training-data pipeline carries image/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature
extraction / resize / frame-sampling as Arrow-batched ``mapInPandas``
stages. The image/audio codec libraries are not available in this
container, so the *decode kernels* are stubbed — either raising
NotImplementedError (strict mode) or producing a deterministic fake
feature (test mode) — while everything Spark-side is real and tested:
schemas, batch iteration, partitioning, column pruning, and the UDF
signatures a codec-backed implementation would drop into.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_from_spans",
    "decode_media",
    "extract_features",
    "deterministic_fake_decoder",
    "strict_decoder",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def strict_decoder(kind: str, payload: bytes) -> dict:
    """Placeholder for a real codec call (PIL / torchaudio / pyav).

    Raises NotImplementedError: the container ships no codec libraries.
    Swap in a real decoder with the same signature in production.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment (PIL/pyav/torchaudio)"
    )


def deterministic_fake_decoder(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in used by tests: derives plausible metadata and
    an 8-dim 'feature' from a digest of the payload, so the full Spark
    plumbing (batching, schema, ordering) is exercised end to end."""
    h = hashlib.blake2b(payload or b"", digest_size=16).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 if kind == "image" else 1 + h[2] % 64,
        "feature": [round(b / 255.0, 6) for b in h[8:16]],
    }


def media_from_spans(df: DataFrame) -> DataFrame:
    """Project the media spans of a (doc_id, spans) table into the media
    table shape, synthesizing an opaque payload from the media_ref (stand-in
    for an object-store fetch, which in production is a mapInPandas stage
    doing ranged GETs)."""
    ex = df.select("doc_id", F.explode("spans").alias("s")).filter(
        F.col("s.kind") != "text"
    )
    return ex.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
        F.encode(F.concat(F.col("s.media_ref"), F.lit("|payload")), "utf-8").alias(
            "payload"
        ),
        F.create_map(
            F.lit("caption"), F.col("s.text"),
            F.lit("offset"), F.col("s.offset").cast("string"),
        ).alias("meta"),
    )


def decode_media(
    df: DataFrame, decoder: Callable[[str, bytes], dict] | None = None
) -> DataFrame:
    """mapInPandas decode/feature stage over the media table.

    Arrow-batched: each python worker sees pandas DataFrames of
    (doc_id, media_ref, kind, payload, meta); per-batch it runs the decode
    kernel and emits FEATURE_SCHEMA rows. Partitioning is whatever the
    upstream provides — payloads are value-independent so no co-location is
    needed; at scale, size partitions by bytes (maxPartitionBytes) so a
    batch of payloads fits executor-python memory.
    """
    kernel = decoder or strict_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "media_ref": [], "kind": [],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for doc_id, ref, kind, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["kind"], pdf["payload"]
            ):
                d = kernel(kind, payload)
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["kind"].append(kind)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_frames"].append(d["n_frames"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_features(df: DataFrame, decoder=None) -> DataFrame:
    """Decode + per-kind aggregate feature stats (the shape of a real
    feature-extraction job: decode fan-out, then a rollup)."""
    feats = decode_media(df, decoder=decoder)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg("width").alias("avg_width"),
        F.avg("n_frames").alias("avg_frames"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
