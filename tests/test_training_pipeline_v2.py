"""Composition tests for q_training_pipeline_v2 (VERDICT r05 next-round
#1): the oracle (tests/test_oracle_parity.py + the driver gate) proves
value parity of the stage counts; these tests prove what the oracle
can't — that every stage BINDS on the demo corpus (a pipeline whose
gates never fire proves nothing about composition) and that the
``index_dir`` path (the PERSISTED parquet digest index from
write_digest_index — the production ingest shape) produces the exact
same result as the self-contained derived prior."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from html_sanitizer_spark.queries import (
    _docs,
    _plain_subset_filter,
    q_training_pipeline_v2,
    write_digest_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def counts(spark):
    row = q_training_pipeline_v2(spark, SF_DIR).collect()
    assert len(row) == 1
    return row[0].asDict()


def test_every_stage_binds(counts):
    # monotone shrink through the funnel
    assert counts["n_input"] >= counts["n_plain"] >= counts["n_batch"]
    assert counts["n_batch"] > counts["n_quality"] > 0, (
        "quality gates must reject some batch docs"
    )
    assert counts["n_dup_vs_prior"] > 0, (
        "the overlapping prior split (doc_id%2 vs batch doc_id%3) must "
        "flag re-delivered docs — dedup stage not binding"
    )
    assert (
        counts["n_kept"]
        == counts["n_quality"]
        - counts["n_dup_vs_prior"]
        - counts["n_dup_in_batch"]
    )
    assert 0 < counts["n_sampled"] < counts["n_kept"], (
        "mixture sampling must down-sample non-binding languages"
    )
    assert counts["n_shards"] > 0
    assert counts["n_sequences"] >= counts["n_shards"]
    assert counts["n_tokens_packed"] > 0


def test_persisted_index_path_equals_derived_prior(spark, counts, tmp_path):
    """index_dir swaps the derived prior for write_digest_index parquet —
    byte-identical stage counts prove the production index path composes."""
    index_dir = str(tmp_path / "digest_index")
    prior_docs = (
        _docs(spark, SF_DIR)
        .filter(_plain_subset_filter())
        .filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), "[ \\t\\n\\r]+", " ").alias(
                "text"
            ),
        )
    )
    write_digest_index(prior_docs, index_dir)
    # second append run with a subset — the accreting index must still
    # yield identical flags (digests are deduped at probe time)
    write_digest_index(prior_docs.limit(20), index_dir)
    via_index = (
        q_training_pipeline_v2(spark, SF_DIR, index_dir=index_dir)
        .collect()[0]
        .asDict()
    )
    assert via_index == counts
