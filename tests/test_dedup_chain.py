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


def test_full_chain_cache_hygiene_scope(spark):
    """VERDICT r04 #8: a full detect->verify->cluster->apply run inside
    dedup_verify_cache_scope leaves ZERO verify-stage caches; the only
    persistent blocks allowed to remain are lineage-cut localCheckpoint
    frames (the verified edge list and the final labels), which ARE the
    chain's result carriers and are freed by the ContextCleaner when
    their frames are garbage-collected."""
    Q.release_dedup_verify_caches()
    spark.catalog.clearCache()
    # drain-first pattern (see test_dedup_verified_caches_do_not_accumulate)
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0

    with Q.dedup_verify_cache_scope():
        rows = Q.q_dedup_apply(spark, SF).collect()
        assert rows and rows[0]["n_input"] > 0

    assert Q._dedup_verify_caches == []
    left = spark.sparkContext._jsc.getPersistentRDDs()
    assert left.size() <= 2, (
        f"{left.size()} persistent RDDs after scoped chain run — verify "
        "caches leaked past the scope"
    )
    for rdd in list(left.values()):
        rdd.unpersist()


def test_cache_scope_releases_on_exception(spark):
    """The scope must release on the error path too — that is its reason
    to exist over paired explicit calls."""
    with pytest.raises(RuntimeError, match="boom"):
        with Q.dedup_verify_cache_scope():
            Q.q_dedup_verified(spark, SF).count()
            assert len(Q._dedup_verify_caches) == 4
            raise RuntimeError("boom")
    assert Q._dedup_verify_caches == []


def test_incremental_dedup_against_persisted_index(spark, tmp_path):
    """VERDICT r04 #6: the production shape EXECUTED, not narrated — run 1
    ingests a corpus and persists the digest index; run 2 probes a NEW
    batch against that index (never the corpus scan); run 3 appends the
    batch's digests and a re-probe sees them as prior. Plan-gated: the
    probe reads digest ONLY from the index (column pruning reaches the
    scan even though the index carries first_doc_id metadata)."""
    from html_sanitizer_spark.queries import (
        dedup_incremental_against_index,
        write_digest_index,
    )

    idx = str(tmp_path / "digest_index")
    corpus = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        ["doc_id", "text"],
    )
    write_digest_index(corpus, idx)
    # index is digest-distinct with first-carrier metadata
    stored = {r["digest"]: r["first_doc_id"]
              for r in spark.read.parquet(idx).collect()}
    assert len(stored) == 2 and 1 in stored.values() and 2 in stored.values()

    batch = spark.createDataFrame(
        [
            (10, "alpha text"),   # dup vs prior corpus
            (11, "fresh text"),   # keeper
            (12, "fresh text"),   # dup inside the batch
            (13, "gamma text"),   # keeper
        ],
        ["doc_id", "text"],
    )
    out = dedup_incremental_against_index(spark, batch, idx)
    got = {r["doc_id"]: (r["dup_vs_prior"], r["dup_in_batch"], r["keep"])
           for r in out.collect()}
    assert got == {
        10: (1, 0, 0),
        11: (0, 0, 1),
        12: (0, 1, 0),
        13: (0, 0, 1),
    }

    # plan gate: the ONLY parquet scan is the index, pruned to digest
    plan = out._jdf.queryExecution().executedPlan().toString()
    schemas = [c.splitlines()[0] for c in plan.split("ReadSchema: ")[1:]]
    assert schemas, plan
    assert all(s == "struct<digest:string>" for s in schemas), plan

    # run 3: the ingest job appends its batch digests; a later batch sees
    # them as prior
    write_digest_index(batch, idx)
    later = spark.createDataFrame(
        [(20, "gamma text"), (21, "delta text")], ["doc_id", "text"]
    )
    got2 = {
        r["doc_id"]: r["dup_vs_prior"]
        for r in dedup_incremental_against_index(spark, later, idx).collect()
    }
    assert got2 == {20: 1, 21: 0}
