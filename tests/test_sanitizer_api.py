"""API-parity facade: reference-style Sanitizer class + named registry."""

from __future__ import annotations

import pytest

from html_sanitizer_spark import Sanitizer, get_sanitizer
from html_sanitizer_spark.sanitizer_api import register_sanitizer

from .golden_cases import CASES, CONFIGS, expected


def test_reference_style_usage():
    s = Sanitizer()
    assert s.sanitize("<b>Bla</b><script>x()</script>") == "<strong>Bla</strong>"
    custom = Sanitizer({"tags": ["h1", "h2"], "empty": (), "separate": (),
                        "attributes": {}})
    assert custom.sanitize("<h1>a</h1><h3>b</h3>") == "<h1>a</h1>b"


def test_constructor_contracts_match_reference():
    with pytest.raises(TypeError, match="Expected a set but got"):
        Sanitizer({"tags": "blub"})
    with pytest.raises(TypeError, match='Tags in "empty"'):
        Sanitizer({"tags": {"blub"}})


def test_registry_roundtrip():
    register_sanitizer("only_em", {"tags": {"em"}, "empty": set(),
                                   "separate": set(), "attributes": {}})
    s = get_sanitizer("only_em")
    assert s is get_sanitizer("only_em")  # memoized like lru_cache
    assert s.sanitize("<em>x</em><strong>y</strong>") == "<em>x</em>y"
    with pytest.raises(KeyError):
        get_sanitizer("nope")
    with pytest.raises(TypeError):
        register_sanitizer("bad", {"tags": "x"})


def test_facade_matches_golden_for_every_config():
    """The facade must reproduce all 112 pairs through Sanitizer objects."""
    instances = {name: Sanitizer(cfg) for name, cfg in CONFIGS.items()}
    for case in CASES:
        got = instances[case.config].sanitize(case.before)
        want = expected(case)
        if case.strip:
            got, want = got.strip(), want.strip()
        assert got == want, case.case_id


def test_facade_drives_spark(spark):
    from html_sanitizer_spark.pipeline.synth import golden_spans_df

    s = Sanitizer()
    out = s.sanitize_df(spark, golden_spans_df(spark, "default"), salt_buckets=4)
    assert out.count() > 0
