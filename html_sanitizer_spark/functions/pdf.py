"""PDF text + layout extraction (stdlib-only).

The north rule names "PDF/layout parse" as part of the main-content
extraction pipeline. This module implements the REAL subset that the
standard library can decode — mirroring the multimodal.py posture
(real netpbm/WAV decoders, declared constraint raise for codec-library
formats):

* **Real**: classic-PDF object scan, content streams stored plain or
  FlateDecode-compressed (zlib IS stdlib), text operators (``BT``/``ET``,
  ``Tj``, ``'``, ``TJ`` arrays with kerning, literal strings with the
  full escape table + octal, hex strings), positioning operators
  (``Tm``, ``Td``, ``TD``), and **layout reassembly**: text runs are
  collected with their device-space (x, y), grouped into lines by y,
  ordered top-to-bottom then left-to-right — so a content stream that
  EMITS lines out of order still extracts in reading order.
* **Declared constraint** (`strict=True` raises NotImplementedError):
  Type0/CID composite fonts (multi-byte encodings need external CMaps)
  and non-Flate stream filters (DCT/JPX/LZW/CCITT are codec-library
  territory). Non-strict mode skips those streams.

``build_pdf`` writes a minimal valid PDF 1.4 (correct xref offsets) and
exists so tests and the ``pdf_extract`` query can synthesize
deterministic documents at any scale — no external data, per the brief.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["build_pdf", "extract_pdf_runs", "extract_pdf_text"]


# --------------------------------------------------------------------------
# generator
# --------------------------------------------------------------------------

def _esc_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    lines: list[str],
    *,
    compress: bool = False,
    op: str = "Tj",
    emit_order: list[int] | None = None,
) -> bytes:
    """Minimal valid single-page PDF 1.4 showing ``lines`` top-to-bottom
    at x=72, 14pt leading.

    ``op``: ``"Tj"`` (literal string), ``"TJ"`` (the line split into two
    halves inside a TJ array with a kerning number between — same text,
    different operator path), or ``"hex"`` (hex string + Tj).
    ``emit_order``: permutation in which lines are written to the content
    stream; extraction must restore top-to-bottom reading order from the
    Tm coordinates regardless.

    Input contract: text must be **latin-1 encodable** (chars <= U+00FF).
    Classic-PDF string objects are single-byte; wider code points need
    Type0/CID fonts, which sit behind the declared codec constraint in
    :func:`extract_pdf_runs`. Non-latin-1 input raises UnicodeEncodeError
    — callers (``q_pdf_extract``) guard their input accordingly.
    """
    if op not in ("Tj", "TJ", "hex"):
        raise ValueError(f"op must be Tj|TJ|hex, got {op!r}")
    parts = ["BT /F1 12 Tf"]
    for i in emit_order if emit_order is not None else range(len(lines)):
        y = 720 - 14 * i
        parts.append(f"1 0 0 1 72 {y} Tm")
        line = lines[i]
        if op == "TJ":
            mid = max(len(line) // 2, 1)
            a, b = _esc_literal(line[:mid]), _esc_literal(line[mid:])
            parts.append(f"[({a}) -15 ({b})] TJ" if b else f"[({a})] TJ")
        elif op == "hex":
            parts.append(f"<{line.encode('latin-1').hex()}> Tj")
        else:
            parts.append(f"({_esc_literal(line)}) Tj")
    parts.append("ET")
    content = "\n".join(parts).encode("latin-1")
    filt = ""
    if compress:
        content = zlib.compress(content)
        filt = " /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        (f"<< /Length {len(content)}{filt} >>\nstream\n".encode("latin-1")
         + content + b"\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode("latin-1")
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
    return bytes(out)


# --------------------------------------------------------------------------
# extractor
# --------------------------------------------------------------------------

# The stream keyword, anchored to the '>>' that closes its OWN dict; the
# dict body is then recovered by a BACKWARD balanced '<< >>' scan from that
# '>>' (a non-greedy '<<(.*?)>>\s*stream' would start at the first
# unconsumed '<<' in the file, spanning every preceding object's dict, so
# an earlier object's /Length or filter name mis-slices the payload).
# The payload itself is sliced by /Length, never by searching for
# "endstream" — a compressed payload can legitimately end in 0x0d/0x0a
# bytes that a `\r?\nendstream` regex would strip (truncated-zlib bug found
# by the sf0.001 oracle run), or even contain the word itself.
_STREAM_KW_RE = re.compile(rb">>\s*stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _dict_open(data: bytes, close: int, floor: int) -> int:
    """Index of the '<<' balance-matching the '>>' that starts at ``close``,
    scanning no earlier than ``floor`` (start of the current object region,
    so a prior stream's binary payload can't be walked into). Returns
    ``floor`` if the scan fails to balance (malformed input — the caller
    then sees a wider dict_src, same failure mode as before, never worse).
    Token scan only: '<<'/'>>' inside literal strings in the dict would
    miscount, which classic PDFs do not produce in stream dicts."""
    depth = 1
    i = close
    while i > floor:
        j_open = data.rfind(b"<<", floor, i)
        j_close = data.rfind(b">>", floor, i)
        if j_close > j_open:
            depth += 1
            i = j_close
        else:
            if j_open < 0:
                return floor
            depth -= 1
            i = j_open
            if depth == 0:
                return j_open
    return floor


def _iter_streams(data: bytes):
    pos = 0  # cursor past the last consumed payload: payload bytes are
    # never re-scanned for stream heads (compressed output can contain
    # '>> stream' byte runs spuriously)
    while True:
        m = _STREAM_KW_RE.search(data, pos)
        if m is None:
            return
        ds = _dict_open(data, m.start(), pos)
        if data[ds:ds + 2] == b"<<":
            ds += 2  # skip the opener itself; keep only the dict body
        dict_src = data[ds:m.start()]
        start = m.end()
        lm = _LENGTH_RE.search(dict_src)
        if lm:  # direct /Length: exact slice
            end = start + int(lm.group(1))
            payload = data[start:end]
            pos = end
        else:  # indirect length ref: fall back, trimming the EOL we wrote
            end = data.find(b"endstream", start)
            payload = data[start:end if end >= 0 else len(data)]
            payload = payload.rstrip(b"\r\n")
            pos = end if end >= 0 else len(data)
        yield dict_src, payload
_UNSUPPORTED_FILTERS = (
    b"/DCTDecode", b"/JPXDecode", b"/LZWDecode", b"/CCITTFaxDecode",
    b"/RunLengthDecode", b"/ASCII85Decode", b"/ASCIIHexDecode",
    b"/JBIG2Decode",
)

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}

_NUM_RE = re.compile(rb"[+-]?\d+(?:\.\d+)?|[+-]?\.\d+")


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ( ) literal string starting at data[i] == '('. Returns
    (text, index past the closing paren). Handles nesting, the escape
    table, 1-3 digit octal, and backslash-newline continuation."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and data[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(data[i + 1:j], 8) & 0xFF))
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i:i + 1] == b"\n":
                    i += 1
            else:  # lone backslash: drop, keep next char literally
                i += 1
        elif c == b"(":
            depth += 1
            out.append("(")
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    end = data.index(b">", i)
    hx = re.sub(rb"\s+", b"", data[i + 1:end])
    if len(hx) % 2:  # odd count: final digit implies trailing 0 (spec)
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), end + 1


def _text_runs_from_stream(data: bytes) -> list[tuple[float, float, str]]:
    """Scan one decoded content stream for BT/ET text blocks; return
    (y, x, text) runs. Tracks the text-line matrix through Tm (absolute)
    and Td/TD (relative); T* advances by the TD-set leading (or 14pt)."""
    runs: list[tuple[float, float, str]] = []
    i, n = 0, len(data)
    x = y = 0.0
    leading = 14.0
    nums: list[float] = []
    strings: list[str] = []  # pending string operands (for Tj/'/TJ)
    in_array = False
    while i < n:
        c = data[i:i + 1]
        if c == b"(":
            s, i = _parse_literal(data, i)
            strings.append(s)
            continue
        if c == b"<" and data[i + 1:i + 2] != b"<":
            s, i = _parse_hex(data, i)
            strings.append(s)
            continue
        if c == b"[":
            in_array = True
            strings = []
            i += 1
            continue
        if c == b"]":
            in_array = False
            i += 1
            continue
        m = _NUM_RE.match(data, i)
        if m:
            if not in_array:  # kerning numbers inside TJ arrays are not coords
                nums.append(float(m.group()))
                if len(nums) > 6:
                    nums = nums[-6:]
            i = m.end()
            continue
        if data.startswith(b"Tm", i):
            if len(nums) >= 2:
                x, y = nums[-2], nums[-1]
            nums, strings, i = [], [], i + 2
            continue
        if data.startswith(b"TD", i) or data.startswith(b"Td", i):
            if len(nums) >= 2:
                x, y = x + nums[-2], y + nums[-1]
                if data.startswith(b"TD", i):
                    leading = -nums[-1] or leading
            nums, strings, i = [], [], i + 2
            continue
        if data.startswith(b"T*", i):
            y -= leading
            nums, strings, i = [], [], i + 2
            continue
        if data.startswith(b"TJ", i):
            if strings:
                runs.append((y, x, "".join(strings)))
            nums, strings, i = [], [], i + 2
            continue
        if data.startswith(b"Tj", i) or c == b"'":
            if c == b"'":
                y -= leading
            if strings:
                runs.append((y, x, strings[-1]))
            nums, strings, i = [], [], i + (1 if c == b"'" else 2)
            continue
        i += 1
    return runs


def extract_pdf_runs(data: bytes, *, strict: bool = True) -> list[tuple[float, float, str]]:
    """All text runs (y, x, text) from every content stream of a PDF."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    if strict and (b"/Type0" in data or b"/CIDFont" in data):
        raise NotImplementedError(
            "composite (Type0/CID) fonts need external CMaps — declared "
            "codec constraint (see multimodal.py posture)"
        )
    runs: list[tuple[float, float, str]] = []
    for dict_src, payload in _iter_streams(data):
        if b"/FlateDecode" in dict_src:
            payload = zlib.decompress(payload)
        elif any(f in dict_src for f in _UNSUPPORTED_FILTERS):
            if strict:
                raise NotImplementedError(
                    f"unsupported stream filter in {dict_src[:80]!r} — "
                    "declared codec constraint"
                )
            continue
        if b"BT" in payload:
            runs.extend(_text_runs_from_stream(payload))
    return runs


def extract_pdf_text(
    data: bytes, *, strict: bool = True, y_tolerance: float = 2.0
) -> str:
    """Reading-order text: runs grouped into lines by y (within
    ``y_tolerance``), lines ordered top-to-bottom, runs within a line
    left-to-right, concatenated; lines joined by newline. This is the
    layout-parse step: emission order in the stream is irrelevant."""
    runs = extract_pdf_runs(data, strict=strict)
    if not runs:
        return ""
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for y, x, text in sorted(runs, key=lambda r: (-r[0], r[1])):
        if lines and abs(lines[-1][0] - y) <= y_tolerance:
            lines[-1][1].append((x, text))
        else:
            lines.append((y, [(x, text)]))
    return "\n".join(
        "".join(t for _, t in sorted(parts, key=lambda p: p[0]))
        for _, parts in lines
    )
