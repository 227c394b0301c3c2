"""Poison-document policy + automatic physical-plan selection."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import PythonException

from html_sanitizer_spark.functions import udfs
from html_sanitizer_spark.pipeline.job import sanitize_spans
from html_sanitizer_spark.pipeline.synth import DOC_SCHEMA, synth_spans_df


@pytest.fixture
def poison(monkeypatch):
    orig = udfs.sanitize

    def bomb(t, s):
        if "BOOM" in t:
            raise RuntimeError("poison document")
        return orig(t, s)

    monkeypatch.setattr(udfs, "sanitize", bomb)
    yield


@pytest.fixture
def doc(spark):
    return spark.createDataFrame(
        [{"doc_id": "d", "spans": [
            {"kind": "text", "text": "<p>ok</p>", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "<p>BOOM</p>", "media_ref": "", "offset": 1},
        ]}],
        schema=DOC_SCHEMA,
    )


def test_on_error_keep(spark, poison, doc):
    spans = sanitize_spans(spark, doc, on_error="keep",
                           salt_buckets=2).collect()[0]["spans"]
    assert [s["text"] for s in spans] == ["<p>ok</p>", "<p>BOOM</p>"]


def test_on_error_null(spark, poison, doc):
    spans = sanitize_spans(spark, doc, on_error="null",
                           salt_buckets=2).collect()[0]["spans"]
    assert [s["text"] for s in spans] == ["<p>ok</p>", None]


def test_on_error_raise_default(spark, poison, doc):
    with pytest.raises(Exception):
        sanitize_spans(spark, doc, salt_buckets=2).collect()


def test_on_error_rejects_bad_value():
    with pytest.raises(ValueError):
        udfs.make_sanitize_udf(on_error="ignore")


def test_auto_plan_selection(spark):
    small = synth_spans_df(spark, 20, seed=1, mega_every=0)
    mega = synth_spans_df(spark, 20, seed=1, mega_every=10)
    # both plans must produce correct output; 'auto' picks per skew
    for df in (small, mega):
        out = sanitize_spans(spark, df, explode="auto")
        assert out.count() == 20
