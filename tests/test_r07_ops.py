"""Ground-truth semantics of the r07 operators (quality_tiers,
gopher_filters, train_shuffle, warc_extract) — independent pure-Python
reimplementations and properties the DuckDB parity gate cannot see
(both engines could be wrong the same way): tier threshold maximality,
per-rule binding on the designed subsets, permutation laws, and the
archive construction contract."""

from __future__ import annotations

import hashlib
import math

import duckdb

from html_sanitizer_spark.queries import (
    q_gopher_filters,
    q_quality_score,
    q_quality_tiers,
    q_train_shuffle,
    q_warc_extract,
)

SF = "/root/testdata/sf0.001"


def _docs_py():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def _round4(x: float) -> float:
    # HALF_UP at the 4-decimal grain (both engines' round())
    return math.floor(x * 10_000 + 0.5) / 10_000


# --------------------------------------------------------------------------
# quality_tiers
# --------------------------------------------------------------------------

def test_quality_tiers_threshold_law(spark):
    """Recompute the greedy from-the-top threshold fold in pure Python
    from the emitted keys and check every tier assignment — independent
    of the operator's own driver-side fold (the score itself is already
    single-sourced with the oracled quality_score)."""
    rows = q_quality_tiers(spark, SF).collect()
    assert rows
    n = len(rows)
    hist: dict[int, int] = {}
    for r in rows:
        hist[r["quality_key"]] = hist.get(r["quality_key"], 0) + 1
    thresholds = []
    for div in (5, 2):
        budget, cum, t = n // div, 0, None
        for k in sorted(hist, reverse=True):
            cum += hist[k]
            if cum > budget:
                break
            t = k
        thresholds.append(t)
    t1, t2 = thresholds
    for r in rows:
        k = r["quality_key"]
        want = (
            0 if (t1 is not None and k >= t1)
            else 1 if (t2 is not None and k >= t2)
            else 2
        )
        assert r["tier"] == want, (r, t1, t2)
    # budget + maximality laws: tiers never exceed their budgets, and the
    # next tie-block down would overflow (unless the tier is exhaustive)
    n0 = sum(1 for r in rows if r["tier"] == 0)
    n01 = sum(1 for r in rows if r["tier"] <= 1)
    assert n0 <= n // 5 and n01 <= n // 2
    below_t1 = [k for k in hist if t1 is None or k < t1]
    if below_t1:
        assert n0 + hist[max(below_t1)] > n // 5
    below_t2 = [k for k in hist if t2 is None or k < t2]
    if below_t2:
        assert n01 + hist[max(below_t2)] > n // 2
    # tiers are monotone in the key: min key of tier i >= max key of i+1
    by_tier: dict[int, list[int]] = {0: [], 1: [], 2: []}
    for r in rows:
        by_tier[r["tier"]].append(r["quality_key"])
    for hi, lo in ((0, 1), (1, 2)):
        if by_tier[hi] and by_tier[lo]:
            assert min(by_tier[hi]) > max(by_tier[lo])


def test_tier_threshold_fold_degenerate_distributions(spark):
    """The greedy fold on designed histograms: a single massive tie
    (budget overflow at the top key -> NO tier 0/1, everything tier 2),
    and a clean two-key split."""
    from html_sanitizer_spark.queries import _tier_expr, _tier_thresholds
    from pyspark.sql import functions as F

    # 10 docs all sharing one key: budgets 2 and 5 both overflow at the
    # first tie-block -> both thresholds None -> everything tier 2
    one = spark.createDataFrame(
        [(i, 7000) for i in range(10)], ["doc_id", "quality_key"]
    )
    t1, t2 = _tier_thresholds(one)
    assert t1 is None and t2 is None
    tiers = one.select(_tier_expr((t1, t2)).alias("t")).collect()
    assert {r["t"] for r in tiers} == {2}

    # 2 docs at key 9000, 8 at key 1000: budget_t1 = 10//5 = 2 -> the
    # top block fits exactly -> t1 = 9000; budget_t2 = 5 -> adding the
    # 8-doc block overflows -> t2 stays 9000 as well
    two = spark.createDataFrame(
        [(i, 9000) for i in range(2)] + [(i + 2, 1000) for i in range(8)],
        ["doc_id", "quality_key"],
    )
    t1, t2 = _tier_thresholds(two)
    assert (t1, t2) == (9000, 9000)
    got = {
        r["doc_id"]: r["t"]
        for r in two.select(
            "doc_id", _tier_expr((t1, t2)).alias("t")
        ).collect()
    }
    assert all(got[i] == 0 for i in range(2))
    assert all(got[i + 2] == 2 for i in range(8))


def test_quality_tiers_key_matches_quality_score(spark):
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in q_quality_score(spark, SF).collect()
    }
    for r in q_quality_tiers(spark, SF).collect():
        # the key is the nearest integer to score*10000 (score is already
        # at the 4-decimal grain, so the product is integral up to float
        # representation error)
        assert abs(r["quality_key"] - scores[r["doc_id"]] * 10_000) < 0.5


def test_source_quality_report_recomposes_from_tiers(spark):
    """The report must equal a pure-Python rollup of the tiers output
    joined with the docs' sources — composition cannot drift from the
    per-doc operator."""
    from html_sanitizer_spark.queries import q_source_quality_report

    sources = {d: s for d, _, s, _ in _docs_py()}
    tiers = q_quality_tiers(spark, SF).collect()
    agg: dict[str, list] = {}
    for r in tiers:
        a = agg.setdefault(sources[r["doc_id"]], [0, 0, 0, 0])
        a[0] += 1
        a[1] += r["quality_key"]
        a[2] += r["tier"] == 0
        a[3] += r["tier"] <= 1
    rows = q_source_quality_report(spark, SF).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n, ksum, n0, n01 = agg[r["source"]]
        assert r["n_docs"] == n
        assert abs(r["mean_quality_key"] - _round4(ksum / n)) < 1e-9
        assert abs(r["tier0_share"] - _round4(n0 / n)) < 1e-9
        assert abs(r["tier01_share"] - _round4(n01 / n)) < 1e-9


def test_token_budget_report_bucket_law(spark):
    """Buckets are exact powers of two, every doc lands in the bucket
    containing its token count (bucket <= n < 2*bucket), and totals
    conserve: sum(n_docs) = corpus docs, sum(n_tokens) = corpus tokens
    — recomputed in pure Python."""
    from html_sanitizer_spark.queries import q_token_budget_report

    expected: dict[int, list] = {}
    total_docs = 0
    for _, text, _, _ in _docs_py():
        if not text.strip():
            continue
        n = len(text.strip().split(" "))
        b = 1 << (n.bit_length() - 1)
        a = expected.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += n
        total_docs += 1
    rows = q_token_budget_report(spark, SF).collect()
    assert {r["len_bucket"]: (r["n_docs"], r["n_tokens"]) for r in rows} == {
        b: tuple(a) for b, a in expected.items()
    }
    assert sum(r["n_docs"] for r in rows) == total_docs
    for r in rows:
        b = r["len_bucket"]
        assert b & (b - 1) == 0 and b > 0  # power of two


def test_cosine_threshold_report_conserves_and_bounds(spark):
    """The histogram must conserve the candidate-pair count, every
    bucket must satisfy bucket_lo <= cos < bucket_lo + 0.05 for its
    members (checked via the shared pair frame), and the neardup op's
    pair count must equal the mass at buckets >= 0.35."""
    from html_sanitizer_spark.queries import (
        _blocked_cosine_pairs,
        q_cosine_threshold_report,
        q_embedding_neardup,
    )

    pairs = _blocked_cosine_pairs(spark, SF).collect()
    rows = q_cosine_threshold_report(spark, SF).collect()
    assert sum(r["n_pairs"] for r in rows) == len(pairs)
    expected: dict[int, int] = {}
    for p in pairs:
        b = math.floor(p["cos"] * 20)
        expected[b] = expected.get(b, 0) + 1
    assert {r["cos_bucket"]: r["n_pairs"] for r in rows} == expected
    for r in rows:
        assert abs(r["bucket_lo"] - r["cos_bucket"] / 20.0) < 1e-12
    n_above = sum(
        r["n_pairs"] for r in rows if r["cos_bucket"] >= 7
    )  # bucket 7 = [0.35, 0.40)
    n_neardup = sum(
        r["n_neardup_pairs"] for r in q_embedding_neardup(spark, SF).collect()
    )
    # bucket mass >= 0.35 equals the thresholded op's pair count iff no
    # pair sits exactly on a float boundary quirk; verify via the exact
    # per-pair filter instead of assuming
    assert n_neardup == sum(1 for p in pairs if p["cos"] >= 0.35)
    assert n_above == sum(1 for p in pairs if math.floor(p["cos"] * 20) >= 7)


# --------------------------------------------------------------------------
# gopher_filters
# --------------------------------------------------------------------------

_STOP = {"the", "a", "and", "of", "to", "in", "on", "for", "is", "with"}


def _gopher_py(doc_id: int, text: str):
    w = text.strip().split(" ")
    n0 = len(w)
    if doc_id % 7 == 0:
        w = w + ["###"] * (n0 // 5 + 1)
    if doc_id % 11 == 0:
        w = w + ["a"] * (n0 * 3)
    if doc_id % 13 == 0:
        w = w + ["12345"] * (n0 // 3 + 1)
    n = len(w)
    mean_len = _round4(sum(len(t) for t in w) / n)
    sym = _round4(sum(1 for t in w if "#" in t or "..." in t) / n)
    alpha = _round4(sum(1 for t in w if any(c.isascii() and c.isalpha() for c in t)) / n)
    n_stop = len({t for t in w if t in _STOP})
    keep = int(
        30 <= n <= 100_000
        and 3.0 <= mean_len <= 10.0
        and sym <= 0.1
        and alpha >= 0.8
        and n_stop >= 2
    )
    return n, mean_len, sym, alpha, n_stop, keep


def test_gopher_filters_pure_python_reimplementation(spark):
    expected = {
        doc_id: _gopher_py(doc_id, text)
        for doc_id, text, _, n_chars in _docs_py()
        if text.strip()
    }
    rows = q_gopher_filters(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, mean_len, sym, alpha, n_stop, keep = expected[r["doc_id"]]
        assert r["n_words"] == n, r
        assert abs(r["mean_word_len"] - mean_len) < 1e-9, (r, mean_len)
        assert abs(r["symbol_ratio"] - sym) < 1e-9, (r, sym)
        assert abs(r["alpha_frac"] - alpha) < 1e-9, (r, alpha)
        assert r["n_stop_types"] == n_stop, r
        assert r["keep"] == keep, r


def test_gopher_rules_bind_on_designed_subsets(spark):
    rows = {r["doc_id"]: r for r in q_gopher_filters(spark, SF).collect()}
    # each injection binds its own rule on docs hit by ONLY that residue
    sym_only = [r for d, r in rows.items()
                if d % 7 == 0 and d % 11 != 0 and d % 13 != 0]
    assert sym_only and all(r["symbol_ratio"] > 0.1 for r in sym_only)
    short_only = [r for d, r in rows.items() if d % 11 == 0]
    assert short_only and all(r["mean_word_len"] < 3.0 for r in short_only)
    alpha_only = [r for d, r in rows.items()
                  if d % 13 == 0 and d % 11 != 0]
    assert alpha_only and all(r["alpha_frac"] < 0.8 for r in alpha_only)
    # and the battery still keeps a healthy undecorated majority
    clean = [r for d, r in rows.items()
             if d % 7 and d % 11 and d % 13 and r["n_words"] >= 30]
    kept = [r for r in clean if r["keep"] == 1]
    assert kept, "no clean doc survives — thresholds are miscalibrated"


def test_crawl_curation_pipeline_composes_its_stages(spark):
    """Per-doc recomposition from the three standalone operators — the
    composed op must never diverge from its own stages."""
    from html_sanitizer_spark.queries import (
        q_crawl_curation_pipeline,
        q_gopher_filters,
        q_robots_meta_filter,
    )

    robots = {
        r["doc_id"]: r["keep"]
        for r in q_robots_meta_filter(spark, SF).collect()
    }
    gopher = {
        r["doc_id"]: r["keep"] for r in q_gopher_filters(spark, SF).collect()
    }
    tiers = {r["doc_id"]: r["tier"] for r in q_quality_tiers(spark, SF).collect()}
    rows = q_crawl_curation_pipeline(spark, SF).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        assert r["robots_keep"] == robots[d]
        assert r["gopher_keep"] == gopher[d]
        assert r["tier"] == tiers[d]
        assert r["selected"] == int(
            robots[d] == 1 and gopher[d] == 1 and tiers[d] <= 1
        )
    # the composition binds: some docs fail each gate, some survive all
    assert any(r["selected"] == 1 for r in rows)
    assert any(r["robots_keep"] == 0 for r in rows)
    assert any(r["gopher_keep"] == 0 for r in rows)
    assert any(r["tier"] == 2 for r in rows)


# --------------------------------------------------------------------------
# hits_scores
# --------------------------------------------------------------------------

def test_hits_pure_python_reimplementation(spark):
    """Full pure-Python HITS over independently-reconstructed digest
    edges: same integer half-steps, same final normalization — catches
    a direction flip (hub/authority swap), a missed semi-join, or a
    normalization drift that dual-engine parity can't (both engines
    share the generated edge SQL)."""
    from html_sanitizer_spark.queries import q_hits_scores

    docs = [(d, t) for d, t, _, n in _docs_py() if n > 0]
    mx = max(d for d, _ in docs)
    n = len(docs)
    ids = {d for d, _ in docs}
    edges = set()
    for d, t in docs:
        h = hashlib.md5(t.encode()).hexdigest()
        for off in (0, 6, 12):
            dst = int(h[off:off + 6], 16) % (mx + 1)
            if dst != d and dst in ids:
                edges.add((d, dst))
    hub = {d: 10 ** 6 for d, _ in docs}
    auth: dict[int, int] = {}
    for _ in range(3):
        auth = {}
        for s, t in edges:
            if s in hub:
                auth[t] = auth.get(t, 0) + hub[s]
        hub = {}
        for s, t in edges:
            if t in auth:
                hub[s] = hub.get(s, 0) + auth[t]
    ta, th = sum(auth.values()), sum(hub.values())
    rows = q_hits_scores(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        ea = _round4(auth.get(r["doc_id"], 0) * n / ta)
        eh = _round4(hub.get(r["doc_id"], 0) * n / th)
        assert abs(r["authority"] - ea) < 1e-9, (r, ea)
        assert abs(r["hub"] - eh) < 1e-9, (r, eh)
    # sanity: both signals normalized to mean ~1.0 and not degenerate
    assert abs(sum(r["authority"] for r in rows) / n - 1.0) < 1e-3
    assert abs(sum(r["hub"] for r in rows) / n - 1.0) < 1e-3
    assert len({r["authority"] for r in rows}) > 10


# --------------------------------------------------------------------------
# train_shuffle
# --------------------------------------------------------------------------

def test_train_shuffle_pure_python_reimplementation(spark):
    doc_ids = [d for d, *_ in _docs_py()]
    shards: dict[int, list[tuple[str, int]]] = {}
    for d in doc_ids:
        h = hashlib.md5(f"epoch0:{d}".encode()).hexdigest()
        shards.setdefault(int(h[:8], 16) % 16, []).append((h, d))
    expected = {}
    for s, members in shards.items():
        for pos, (_, d) in enumerate(sorted(members), start=1):
            expected[d] = (s, pos)
    rows = q_train_shuffle(spark, SF, n_shards=16).collect()
    assert len(rows) == len(doc_ids)
    for r in rows:
        assert (r["shard"], r["pos"]) == expected[r["doc_id"]], r


def test_train_shuffle_is_a_permutation_per_shard(spark):
    rows = q_train_shuffle(spark, SF, n_shards=16).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), s


# --------------------------------------------------------------------------
# warc_extract
# --------------------------------------------------------------------------

def test_wet_pipeline_composes_main_content_through_the_archive(spark):
    """The WET hop must recover EXACTLY what the standalone extractor
    op produces (same page, now round-tripped through WARC framing),
    and its content_length must equal a pure-Python rebuild of the page
    from the same constants — catching any drift between the Column
    construction, the shared literals, and the oracle arithmetic."""
    from html_sanitizer_spark.functions.warc import HTTP_HEAD
    from html_sanitizer_spark.queries import (
        _PAGE_FARM,
        _PAGE_FIXED_LEN,
        _PAGE_NAV_ITEM,
        q_main_content,
        q_wet_pipeline,
    )

    wet = {r["doc_id"]: r for r in q_wet_pipeline(spark, SF).collect()}
    main = {r["doc_id"]: r for r in q_main_content(spark, SF).collect()}
    assert set(wet) == set(main)
    for d, r in wet.items():
        m = main[d]
        assert (r["main_text"], r["n_kept"], r["n_dropped"]) == (
            m["main_text"], m["n_kept"], m["n_dropped"]
        ), d
    texts = {doc_id: text for doc_id, text, _, _ in _docs_py()}
    for d, r in wet.items():
        expect = (
            len(HTTP_HEAD) + _PAGE_FIXED_LEN
            + len(_PAGE_NAV_ITEM) * (d % 3 + 3)
            + (len(_PAGE_FARM) if d % 3 != 0 else 0)
            + len(texts[d].encode("utf-8"))
        )
        assert r["content_length"] == expect, (d, r["content_length"], expect)


def test_warc_extract_construction_contract(spark):
    from html_sanitizer_spark.functions.warc import HTTP_HEAD

    expected = {
        doc_id: (len(HTTP_HEAD) + len(text.encode("utf-8")),
                 hashlib.md5(text.encode("utf-8")).hexdigest())
        for doc_id, text, _, _ in _docs_py()
    }
    rows = q_warc_extract(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        clen, digest = expected[r["doc_id"]]
        assert r["http_status"] == 200
        assert r["content_length"] == clen, r
        assert r["n_warc_headers"] == 6
        assert r["body_md5"] == digest, r
