"""HTML serialization matching ``lxml.html.tostring(encoding="unicode")``.

Escaping contract (observed via the golden corpus, tests.py:75-76,560-566):
text escapes ``& < >``; attribute values are double-quoted and escape
``& < >``; quotes inside attribute values escape to ``&quot;``; everything
else (emoji, typographic whitespace) passes through as raw unicode. Void
elements serialize without a closing tag (``<br>``). <script>/<style> text
is emitted raw. Attribute order is insertion order.

Also hosts the two post-serialization regexes from the reference
(sanitizer.py:444-448): self-close spacing and wrapper-div removal.
"""

from __future__ import annotations

import re

from .parser import VOID_ELEMENTS, _RAW_TEXT
from .tree import Element

__all__ = ["serialize", "space_self_closing", "strip_wrapper_div"]

_SELF_CLOSE_RE = re.compile(r"<([^/>]+)/>")
_WRAPPER_DIV_RE = re.compile(r"^<div>|</div>$")


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def serialize(el: Element, *, with_tail: bool = False) -> str:
    out: list[str] = []
    _write(el, out)
    if with_tail and el.tail:
        out.append(_esc_text(el.tail))
    return "".join(out)


def serialize_children(root: Element) -> str:
    """Serialize a #fragment root's content without any wrapper."""
    out: list[str] = []
    if root.text:
        out.append(_esc_text(root.text))
    for child in root:
        _write(child, out)
        if child.tail:
            out.append(_esc_text(child.tail))
    return "".join(out)


def _write(el: Element, out: list[str]) -> None:
    # Iterative (explicit stack): adversarial web pages nest thousands of
    # elements deep, which must not hit the Python recursion limit inside an
    # executor UDF.
    stack: list[tuple[str, object]] = [("open", el)]
    while stack:
        op, node = stack.pop()
        if op == "str":
            out.append(node)  # type: ignore[arg-type]
            continue
        assert isinstance(node, Element)
        tag = node.tag
        out.append("<")
        out.append(tag)
        for k, v in node.attrib.items():
            out.append(f' {k}="{_esc_attr(v)}"')
        out.append(">")
        if tag in VOID_ELEMENTS:
            continue
        raw = tag in _RAW_TEXT
        pending: list[tuple[str, object]] = []
        if node.text:
            pending.append(("str", node.text if raw else _esc_text(node.text)))
        for child in node._children:
            pending.append(("open", child))
            if child.tail:
                pending.append(("str", child.tail if raw else _esc_text(child.tail)))
        pending.append(("str", f"</{tag}>"))
        stack.extend(reversed(pending))


def space_self_closing(html: str) -> str:
    """``<x/>`` -> ``<x />`` (sanitizer.py:445)."""
    return _SELF_CLOSE_RE.sub(r"<\1 />", html)


def strip_wrapper_div(html: str) -> str:
    """Remove the parser wrapper tag (sanitizer.py:448)."""
    return _WRAPPER_DIV_RE.sub("", html)
