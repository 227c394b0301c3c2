"""Dedup-chain topology contracts (VERDICT r02 #1/#2/#6):

- clustering/apply consume the LSH-verified full-corpus pair graph — no
  baked-in corpus sample anywhere in the production chain;
- min-label propagation survives high-diameter graphs (localCheckpoint
  lineage truncation) and refuses to return partial labels;
- no forced broadcasts of per-document-sized tables in the dedup tail.
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from html_sanitizer_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _path_pairs(spark, n: int):
    """Path graph 0-1-2-...-n (diameter n: the worst case for min-label
    propagation — the root label travels one hop per round)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["doc_a", "doc_b"]
    )


def test_long_path_graph_converges_with_checkpointing(spark):
    """Diameter-16 path: needs >= 16 propagation rounds, crossing three
    localCheckpoint truncations; labels must still be the exact transitive
    closure (everything rooted at 0)."""
    labels = Q._neardup_labels(spark, SF, pairs=_path_pairs(spark, 16))
    rows = {r["doc"]: r["root"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(17)}


def test_nonconvergence_raises_instead_of_partial_labels(spark):
    """Hitting max_rounds must raise (ADVICE r02): partial labels silently
    diverge from the oracle's exact closure."""
    with pytest.raises(RuntimeError, match="converge"):
        Q._neardup_labels(spark, SF, pairs=_path_pairs(spark, 12),
                          max_rounds=3)


def test_cluster_chain_consumes_verified_pairs_not_sampled():
    """The production chain's default pair source is q_dedup_verified's
    is_dup edges; the %-sample literal exists only in the demo wrapper."""
    src = inspect.getsource(Q._neardup_labels)
    assert "q_dedup_verified" in src
    assert "q_ngram_jaccard" not in src
    assert "% 20" not in inspect.getsource(Q.q_dedup_apply)
    assert "% 20" not in inspect.getsource(Q.q_dedup_clusters)
    # the exhaustive operator itself defaults to the full corpus
    assert inspect.signature(Q.q_ngram_jaccard).parameters[
        "sample_mod"
    ].default is None


def test_clusters_match_bruteforce_cc_on_verified_graph(spark):
    """Cross-check the DataFrame CC against a driver-side union-find over
    the same verified is_dup edges (independent of the DuckDB oracle)."""
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in Q.q_dedup_verified(spark, SF)
        .filter(F.col("is_dup") == 1)
        .collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for v in parent:
        expected.setdefault(find(v), set()).add(v)
    got = {
        r["cluster_id"]: r["n_members"]
        for r in Q.q_dedup_clusters(spark, SF).collect()
    }
    assert got == {root: len(members) for root, members in expected.items()}
