"""Similarity search over embedding columns — the scale path.

Brute-force cosine top-k lives in queries.py (oracle-checked). This module
adds the sub-linear variants for 100TB-scale corpora:

- ``lsh_bucket``: sign-random-projection LSH — deterministic hyperplanes
  (seeded, generated driver-side, shipped as literal arrays), bucket id =
  packed sign bits of the projections. All JVM-native expressions
  (zip_with/aggregate), no Python in the scoring path.
- ``ann_lsh_topk``: bucket the corpus once, probe each query's bucket (plus
  single-bit-flip neighbor buckets for recall), score candidates exactly,
  window top-k. The candidate join is an equi hash join on bucket id —
  shuffle proportional to candidates, never all-pairs.
- ``ivf_topk``: IVF-style variant — coarse centroids picked as a
  deterministic sample of the corpus, every vector assigned to its nearest
  centroid (broadcast small centroid set), queries probe the ``nprobe``
  nearest centroid cells.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "auto_n_bits",
    "lsh_bucket",
    "ann_lsh_topk",
    "ivf_topk",
    "ivf_centroids",
    "unit_vec",
]


def auto_n_bits(
    n_vectors: int, target_bucket_size: int = 32,
    min_bits: int = 4, max_bits: int = 30,
) -> int:
    """Bucket-width sizing (VERDICT r03 #3): n_bits =
    ceil(log2(n_vectors / target_bucket_size)), clamped — the bucket count
    GROWS with the corpus so the average bucket stays ~target_bucket_size
    vectors instead of every bucket going hot. At 10^9 vectors / target 32
    this is 25 bits (~33M buckets); a fixed 6-bit literal would put ~16M
    vectors in every bucket and the candidate join degenerates toward
    all-pairs."""
    if n_vectors <= 0:
        return min_bits
    return max(min_bits,
               min(max_bits, math.ceil(math.log2(n_vectors / target_bucket_size))
                   if n_vectors > target_bucket_size else min_bits))


def unit_vec(col):
    # r08: norm evaluated ONCE per row via array_repeat — the old
    # ``transform(dbl, x -> x / norm)`` re-ran the captured norm
    # aggregate on every element (O(dim^2) interpreted steps per row,
    # multiplied by every syntactic reference; see _unit in queries.py
    # and OPTIMIZATION_r08.md). Same per-element arithmetic, same output.
    dbl = F.transform(col, lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, v: a + v * v))
    return F.zip_with(dbl, F.array_repeat(norm, F.size(dbl)),
                      lambda x, n: x / n)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda a, v: a + v)


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]


def lsh_bucket(emb_col, dim: int, n_bits: int = 12, seed: int = 42):
    """Packed sign bits of n_bits random projections (JVM-native)."""
    planes = _hyperplanes(dim, n_bits, seed)
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(emb_col, plane_lit) >= 0, F.lit(1 << b)).otherwise(0)
        bucket = bucket + bit.cast("long")
    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_bits: int | None = None,
    seed: int = 42,
    multiprobe_bits: int = 2,
    target_bucket_size: int = 32,
) -> DataFrame:
    """Approximate top-k neighbors per query via LSH buckets.

    ``emb``: (vec_id, embedding); ``queries``: same shape (small —
    broadcast). Multiprobe: each query also probes buckets at Hamming
    distance 1 in its lowest ``multiprobe_bits`` bits, trading a small
    candidate-set growth for recall.

    ``n_bits=None`` (production default) sizes the bucket width from the
    corpus: ceil(log2(count / target_bucket_size)) — see auto_n_bits. The
    count is one cheap driver-side job (parquet row-count metadata); pass
    an explicit ``n_bits`` to skip it (the oracle entries do, so their
    hyperplane literals are fixed).
    """
    if n_bits is None:
        n_bits = auto_n_bits(emb.count(), target_bucket_size)
    c = emb.select(
        F.col("vec_id").alias("cid"),
        unit_vec(F.col("embedding")).alias("c_emb"),
        lsh_bucket(unit_vec(F.col("embedding")), dim, n_bits, seed).alias("bucket"),
    )
    q_base = queries.select(
        F.col("vec_id").alias("qid"),
        unit_vec(F.col("embedding")).alias("q_emb"),
        lsh_bucket(unit_vec(F.col("embedding")), dim, n_bits, seed).alias("qb"),
    )
    probes = [F.col("qb")] + [
        F.col("qb").bitwiseXOR(F.lit(1 << b)) for b in range(multiprobe_bits)
    ]
    q = q_base.select(
        "qid", "q_emb", F.explode(F.array(*probes)).alias("bucket")
    )
    cand = F.broadcast(q).join(c, "bucket").filter(F.col("qid") != F.col("cid"))
    scored = cand.select(
        "qid", "cid", F.round(_dot(F.col("q_emb"), F.col("c_emb")), 6).alias("score")
    ).groupBy("qid", "cid").agg(F.max("score").alias("score"))  # dedup multiprobe
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "cid", F.round(F.col("score"), 4).alias("score"))
    )


def ivf_centroids(emb: DataFrame, n_cells: int = 16, sample_mod: int = 97):
    """Deterministic coarse centroids (every ``sample_mod``-th vector,
    capped at ``n_cells``), collected to the driver — the k-means-centroid
    pattern: the set is tiny by construction, and shipping it as literal
    arrays lets assignment run as a map-side expression."""
    from .bounded import bounded_collect

    return bounded_collect(
        emb.filter(F.col("vec_id") % sample_mod == 0)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"),
                unit_vec(F.col("embedding")).alias("cent")),
        n_cells,
        "IVF coarse centroids",
    )


def _cell_sims(vec_col, cents):
    """array<struct<sim, neg_cell>> of similarities to every centroid
    literal. ``neg_cell`` makes struct-ordering break sim ties toward the
    SMALLEST cell_id (array_max / descending sort both pick max neg_cell).
    Sims are rounded so the argmax is reproducible across engines."""
    return F.array(*[
        F.struct(
            F.round(
                _dot(vec_col, F.array(*[F.lit(float(v)) for v in row["cent"]])),
                9,
            ).alias("sim"),
            F.lit(-row["cell_id"]).cast("long").alias("neg_cell"),
        )
        for row in cents
    ])


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    sample_mod: int = 97,
) -> DataFrame:
    """IVF-style ANN: corpus rows are assigned to their nearest centroid by
    a map-side ``array_max`` over centroid literals (zero shuffle — the
    crossJoin+window argmax it replaces shuffled corpus x n_cells rows);
    queries probe their ``nprobe`` nearest cells the same way; the only
    joins are the broadcast candidate equi-join on cell_id and the final
    per-query top-k window."""
    cents = ivf_centroids(emb, n_cells, sample_mod)
    c = emb.select(F.col("vec_id").alias("cid"),
                   unit_vec(F.col("embedding")).alias("c_emb"))
    assigned = c.withColumn(
        "cell_id", -F.array_max(_cell_sims(F.col("c_emb"), cents))["neg_cell"]
    )
    q = queries.select(F.col("vec_id").alias("qid"),
                       unit_vec(F.col("embedding")).alias("q_emb"))
    probed = q.select(
        "qid",
        "q_emb",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_cell_sims(F.col("q_emb"), cents))),
                    1,
                    nprobe,
                ),
                lambda s: -s["neg_cell"],
            )
        ).alias("cell_id"),
    )
    cand = F.broadcast(probed).join(assigned, "cell_id").filter(
        F.col("qid") != F.col("cid")
    )
    scored = cand.select(
        "qid", "cid", F.round(_dot(F.col("q_emb"), F.col("c_emb")), 6).alias("score")
    ).groupBy("qid", "cid").agg(F.max("score").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "cid", F.round(F.col("score"), 4).alias("score"))
    )
