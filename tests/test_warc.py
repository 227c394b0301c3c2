"""functions/warc.py unit contract — framing is length-addressed, never
delimiter-searched, and violations fail loud (the pdf.py /Length lesson
carried over; no Spark needed here)."""

from __future__ import annotations

import hashlib

import pytest

from html_sanitizer_spark.functions.warc import (
    HTTP_HEAD,
    build_warc,
    iter_warc,
    split_http,
)


def _mk(bodies):
    return build_warc(
        [(f"http://h.example.org/doc/{i}", b) for i, b in enumerate(bodies)]
    )


def test_roundtrip_multi_record():
    bodies = [b"hello world", b"", b"x" * 10_000]
    recs = list(iter_warc(_mk(bodies)))
    assert len(recs) == 3
    for i, (headers, payload) in enumerate(recs):
        assert headers["WARC-Type"] == "response"
        assert headers["WARC-Target-URI"].endswith(f"/doc/{i}")
        assert int(headers["Content-Length"]) == len(HTTP_HEAD) + len(bodies[i])
        status, http_headers, body = split_http(payload)
        assert status == 200
        assert http_headers["Content-Type"].startswith("text/html")
        assert body == bodies[i]


def test_adversarial_bodies_cannot_shift_frames():
    """Bodies embedding CRLFCRLF, a fake WARC version line, and a fake
    Content-Length header must not shift record framing — the parser
    slices by the DECLARED length only."""
    bodies = [
        b"before\r\n\r\nafter",
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 1\r\n\r\nZ",
        b"\r\n\r\n\r\n\r\n",
        b"tail",
    ]
    recs = list(iter_warc(_mk(bodies)))
    assert [split_http(p)[2] for _, p in recs] == bodies


def test_framing_violations_raise():
    blob = _mk([b"abc"])
    # truncated header block
    with pytest.raises(ValueError, match="unterminated"):
        list(iter_warc(blob[: blob.find(b"\r\n\r\n")]))
    # wrong version line
    with pytest.raises(ValueError, match="version"):
        list(iter_warc(b"WARC/0.9" + blob[8:]))
    # corrupted Content-Length -> terminator check must fail loud
    bad = blob.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    with pytest.raises(ValueError):
        list(iter_warc(bad))


def test_roundtrip_property_arbitrary_bodies():
    """Hypothesis: ANY byte bodies (including ones full of CRLF runs,
    header-shaped text, and WARC version lines) round-trip through
    build+parse with exact framing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(max_size=400), min_size=1, max_size=6))
    def prop(bodies):
        recs = list(iter_warc(_mk(bodies)))
        assert [split_http(p)[2] for _, p in recs] == bodies
        assert [h["WARC-Target-URI"].rsplit("/", 1)[1] for h, _ in recs] == [
            str(i) for i in range(len(bodies))
        ]

    prop()


def test_record_id_is_content_derived():
    uri = "http://h.example.org/doc/7"
    blob = build_warc([(uri, b"b")])
    (headers, _), = iter_warc(blob)
    assert headers["WARC-Record-ID"] == (
        f"<urn:md5:{hashlib.md5(uri.encode()).hexdigest()}>"
    )
    # determinism: same input, byte-identical archive
    assert blob == build_warc([(uri, b"b")])
