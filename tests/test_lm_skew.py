"""Skewed-corpus differential for the bigram-LM scorer (VERDICT r05
what's wrong #3): a synthetic Zipf corpus where one head word dominates
(~1/3 of all tokens are 'the', so roughly half of all bigrams carry
w1='the' or w2='the') must still score in exact DuckDB parity. Together
with test_plan_quality.py::test_lm_bigram_score_join_census_skew_proof
(the corpus stream never joins on w1 alone) this closes the hot-key
watch item: correctness under skew is differential-tested here, task
balance is structural — the skewed key no longer partitions anything
corpus-sized."""

from __future__ import annotations

import duckdb
import pytest

SEED_WORDS = [
    "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "stone",
    "river", "cloud", "ember", "glass", "winter", "harbor", "signal",
]


def _skewed_text(i: int) -> str:
    # deterministic Zipf-ish stream: every other token is the head word
    words = []
    for k in range(40):
        words.append("the")
        words.append(SEED_WORDS[(i * 7 + k * 3) % len(SEED_WORDS)])
    # a per-doc discriminator so scores differ across docs
    words.append(SEED_WORDS[i % len(SEED_WORDS)])
    return " ".join(words)


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewcorpus") / "sf")
    rows = [(i, _skewed_text(i), len(_skewed_text(i))) for i in range(400)]
    spark.createDataFrame(rows, ["doc_id", "text", "n_chars"]).write.parquet(
        f"{out}/documents.parquet"
    )
    return out


def test_lm_score_exact_parity_on_skewed_corpus(spark, skew_dir):
    from html_sanitizer_spark.queries import REGISTRY

    fn, sql = REGISTRY["lm_bigram_score"]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["keep"])
        for r in fn(spark, skew_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{skew_dir}/documents.parquet/*.parquet')"
    )
    want = {
        doc_id: (n, lp, keep)
        for doc_id, n, lp, keep in con.execute(sql).fetchall()
    }
    con.close()
    assert len(got) == 400
    assert got == want


def test_head_word_truly_dominates(spark, skew_dir):
    """Guard the fixture itself: if the skew generator drifts, the
    differential above stops testing what it claims."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{skew_dir}/documents.parquet")
    tok = d.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("w")
    ).filter(F.col("w") != "")
    total = tok.count()
    head = tok.filter(F.col("w") == "the").count()
    assert head / total > 0.45
