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


def test_dedup_verified_caches_do_not_accumulate(spark):
    """ADVICE r03: q_dedup_verified persists four internal frames per
    invocation (candidate pairs, pair participants, per-digest shingle
    arrays, digest-keyed pairs); repeated invocations in a long-lived
    session must release the previous generation (and
    release_dedup_verify_caches drops the rest)."""
    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    Q.release_dedup_verify_caches()
    # Earlier tests leave localCheckpoint RDDs behind that the async
    # ContextCleaner may GC BETWEEN the two counts below, shifting the
    # baseline mid-test. Drain everything so base is 0 and immovable.
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    base = n_persistent()
    assert base == 0
    Q.q_dedup_verified(spark, SF).count()
    assert len(Q._dedup_verify_caches) == 4
    after_first = n_persistent()
    assert after_first == base + 4

    Q.q_dedup_verified(spark, SF).count()
    # previous generation was unpersisted, not accumulated: the persistent
    # block count is FLAT across invocations (object-level storageLevel
    # can't pin this — Spark's cache lookup is by logical plan, and the
    # two invocations build identical plans)
    assert len(Q._dedup_verify_caches) == 4
    assert n_persistent() == after_first

    Q.release_dedup_verify_caches()
    assert Q._dedup_verify_caches == []
    assert n_persistent() == base


def test_neardup_labels_release_verify_caches_it_created(spark):
    """The CC path owns the verify caches it triggers: after labels are
    checkpointed nothing holds persisted verify-stage blocks."""
    Q.release_dedup_verify_caches()
    Q._neardup_labels(spark, SF).count()
    assert Q._dedup_verify_caches == []
