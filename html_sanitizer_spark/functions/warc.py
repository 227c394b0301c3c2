"""WARC (Web ARChive, ISO 28500) record build + parse — stdlib-only.

Web-scale training corpora arrive as WARC files (Common Crawl's native
format), so the pipeline needs a WARC source the same way it needs the
PDF one: synthesize deterministic archives at any scale for tests and
benchmarks (no external data, per the brief), and parse them with exact
record framing. The reference sanitizer has no archive layer (it rewrites
single HTML fragments); this module is pipeline infrastructure, modeled
on the public WARC 1.0 spec and the warcio/Common Crawl record layout.

Framing contract (the pdf.py ``/Length`` lesson, applied here): a record
BODY is sliced by its declared ``Content-Length`` — NEVER by searching
for the next record delimiter, because an HTTP payload may legitimately
contain ``\\r\\n\\r\\n`` (or even a ``WARC/1.0`` line) inside its bytes.
Only the header block is delimiter-terminated; everything after it is
length-addressed.

* ``build_warc`` — concatenated ``response`` records, each wrapping an
  HTTP/1.1 response whose body is caller-provided bytes.
* ``iter_warc`` — yields ``(warc_headers, payload_bytes)`` per record,
  validating version line, Content-Length framing, and the two CRLF
  record terminators.
* ``split_http`` — splits an ``application/http`` payload into
  ``(status_code, http_headers, body_bytes)``.
"""

from __future__ import annotations

import hashlib

__all__ = ["build_warc", "iter_warc", "split_http", "HTTP_HEAD"]

# Fixed HTTP response head every synthesized record wraps its body in.
# Its byte length is part of the construction contract the warc_extract
# oracle recomputes (content_length = len(HTTP_HEAD) + len(body)).
HTTP_HEAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"

# Deterministic: no wall clock in a reproducible corpus (and Date.now-ish
# calls are banned in the workflow runtime anyway).
_WARC_DATE = "2026-01-01T00:00:00Z"


def build_warc(records: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``(target_uri, http_body_bytes)`` pairs into one WARC.

    Each record is ``WARC-Type: response`` with an
    ``application/http; msgtype=response`` payload of ``HTTP_HEAD`` +
    body. Record IDs are content-derived (md5 of the URI) so the same
    input always produces byte-identical archives.
    """
    out = []
    for uri, body in records:
        payload = HTTP_HEAD + body
        rec_id = hashlib.md5(uri.encode("utf-8")).hexdigest()
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:md5:{rec_id}>\r\n"
            f"WARC-Date: {_WARC_DATE}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        )
        out.append(head.encode("utf-8"))
        out.append(payload)
        out.append(b"\r\n\r\n")
    return b"".join(out)


def iter_warc(blob: bytes):
    """Yield ``(headers_dict, payload_bytes)`` for each record in ``blob``.

    Header block = everything up to the first CRLFCRLF; payload = exactly
    ``Content-Length`` bytes after it (length-addressed, see module
    docstring); then the record's closing CRLFCRLF is required. Raises
    ValueError on any framing violation — a mis-sliced archive must fail
    loud, not yield shifted garbage records.
    """
    pos, n = 0, len(blob)
    while pos < n:
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError(f"unterminated WARC header block at byte {pos}")
        head = blob[pos:end].decode("utf-8")
        lines = head.split("\r\n")
        if lines[0] != "WARC/1.0":
            raise ValueError(f"bad WARC version line {lines[0]!r} at byte {pos}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, sep, value = line.partition(": ")
            if not sep:
                raise ValueError(f"malformed WARC header {line!r}")
            headers[name] = value
        try:
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at byte {pos}")
        body_start = end + 4
        body_end = body_start + clen
        if blob[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"record at byte {pos} not terminated by CRLFCRLF after "
                f"{clen} payload bytes — Content-Length framing violated"
            )
        yield headers, blob[body_start:body_end]
        pos = body_end + 4


def split_http(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an HTTP response payload into (status, headers, body).

    The body is everything after the FIRST CRLFCRLF — by construction of
    the HTTP message format the head cannot contain one, so this split is
    exact even when the body itself embeds CRLFCRLF sequences.
    """
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        raise ValueError("HTTP payload has no header/body separator")
    lines = payload[:end].decode("utf-8").split("\r\n")
    status = int(lines[0].split(" ")[1])
    headers = {}
    for line in lines[1:]:
        name, _, value = line.partition(": ")
        headers[name] = value
    return status, headers, payload[end + 4:]
