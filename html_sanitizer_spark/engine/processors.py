"""Built-in element pre/post-processors.

Semantics match the reference's default ``element_preprocessors``
(sanitizer.py:72-112, wired at sanitizer.py:178-189). They operate on our
stdlib tree (:mod:`.tree`) instead of lxml elements; the Element API is
attribute-compatible (``tag``, ``attrib``, ``get``/``set``) so user-supplied
processors written against the reference port directly.
"""

from __future__ import annotations

__all__ = [
    "bold_span_to_strong",
    "italic_span_to_em",
    "tag_replacer",
    "target_blank_noopener",
    "anchor_id_to_name",
]


def bold_span_to_strong(element):
    """span[style*=bold] -> strong (sanitizer.py:72-75)."""
    if element.tag == "span" and "bold" in element.get("style", ""):
        element.tag = "strong"
    return element


def italic_span_to_em(element):
    """span[style*=italic] -> em (sanitizer.py:78-81)."""
    if element.tag == "span" and "italic" in element.get("style", ""):
        element.tag = "em"
    return element


def tag_replacer(from_, to_):
    """Rename ``from_`` tags to ``to_`` (sanitizer.py:84-90)."""

    def replacer(element):
        if element.tag == from_:
            element.tag = to_
        return element

    replacer.__name__ = f"replace_{from_}_with_{to_}"
    return replacer


def target_blank_noopener(element):
    """a[target=_blank] gets rel+=noopener (sanitizer.py:93-102)."""
    if (
        element.tag == "a"
        and element.attrib.get("target") == "_blank"
        and "noopener" not in element.attrib.get("rel", "")
    ):
        element.attrib["rel"] = " ".join(
            part for part in (element.attrib.get("rel", ""), "noopener") if part
        )
    return element


def anchor_id_to_name(element):
    """a[id] copies id into name if absent — DOM-clobbering defense
    (sanitizer.py:105-112); the id itself is dropped later by the attribute
    allowlist."""
    if (
        element.tag == "a"
        and element.attrib.get("id")
        and not element.attrib.get("name")
    ):
        element.attrib["name"] = element.attrib["id"]
    return element
