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


CLASSY = {
    "tags": {"h1", "p", "a", "span"},
    "attributes": {"h1": ("class",), "p": ("class",), "span": ("class",),
                   "a": ("href", "name", "target", "title", "id", "rel")},
    "empty": set(),
    "separate": {"a", "p"},
}


class ClassAwareSanitizer(Sanitizer):
    """The reference's documented override point: subclass + override the
    is_mergeable staticmethod (sanitizer.py:252-258)."""

    @staticmethod
    def is_mergeable(e1, e2):
        return e1.get("class") == e2.get("class")


def test_subclass_is_mergeable_override():
    html = '<h1 class="a">x</h1><h1 class="b">y</h1>'
    merged = Sanitizer(CLASSY).sanitize(html)
    kept = ClassAwareSanitizer(CLASSY).sanitize(html)
    assert merged.count("<h1") == 1, merged
    assert kept.count("<h1") == 2, kept
    same = ClassAwareSanitizer(CLASSY).sanitize(
        '<h1 class="a">x</h1><h1 class="a">y</h1>'
    )
    assert same.count("<h1") == 1, same


def test_subclass_override_dict_still_wins():
    always = {**CLASSY, "is_mergeable": lambda e1, e2: True}
    out = ClassAwareSanitizer(always).sanitize(
        '<h1 class="a">x</h1><h1 class="b">y</h1>'
    )
    assert out.count("<h1") == 1, out


def test_subclass_override_drives_spark(spark):
    """The same subclass instance must carry its override through the
    distributed path (settings pickled into the UDF closure)."""
    df = spark.createDataFrame(
        [("d1", [{"kind": "text",
                  "text": '<h1 class="a">x</h1><h1 class="b">y</h1>',
                  "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = ClassAwareSanitizer(CLASSY).sanitize_df(spark, df, salt_buckets=2)
    text = out.collect()[0]["spans"][0]["text"]
    assert text.count("<h1") == 2, text
