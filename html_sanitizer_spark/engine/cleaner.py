"""Coarse and strict cleaning passes + autolink.

Re-creates the behavior the reference gets from ``lxml.html.clean.Cleaner``
(first pass: sanitizer.py:289-299; second pass: sanitizer.py:434-440) and
``lxml.html.clean.autolink`` (sanitizer.py:428-431), implemented over our
stdlib tree. Comments/PIs/doctype junk never reach the tree (dropped by the
parser), which matches the Cleaner's unconditional comment/PI removal.
"""

from __future__ import annotations

import re
import urllib.parse

from .tree import Element

__all__ = ["coarse_clean", "strict_clean", "autolink", "add_nofollow_links"]

# Elements removed WITH their content (lxml Cleaner kill_tags under the
# reference's first-pass flags: scripts/frames/links/meta on; style
# conditional). Tails survive (drop_tree semantics).
_KILL_BASE = frozenset(
    "script applet frame frameset noframes iframe meta link".split()
)
# Elements unwrapped (content kept) in the coarse pass (lxml remove_tags:
# page_structure + embedded under the same flags).
_UNWRAP_BASE = frozenset("head html title embed object param layer".split())

_URL_ATTRS = ("href", "src", "action", "formaction")

# lxml Cleaner(javascript=True) scheme blacklist (_javascript_scheme_re):
# javascript/jscript/livescript/vbscript/mocha/about plus data:, with
# base64 data:image/* URLs allowed back (except script-capable image types
# like svg). Matching runs on the unquote_plus'd, whitespace-flattened
# value so "j a v a s c r i p t:" and %6A%61...%3A smuggling are caught.
_MALICIOUS_SCHEMES = re.compile(
    r"(?:javascript|jscript|livescript|vbscript|data|mocha|about):", re.I
)
_IMAGE_DATAURLS = re.compile(r"data:image/([a-z0-9.+-]+);base64,", re.I)
_FLATTEN_WS = re.compile(r"[\s\x00-\x08\x0B\x0C\x0E-\x1f]+")


def _has_js_scheme(value: str) -> bool:
    # Percent-encoded schemes count too (tests.py:92 javascript%3Aalert).
    flat = _FLATTEN_WS.sub("", urllib.parse.unquote_plus(value))
    safe_images = 0
    for image_type in _IMAGE_DATAURLS.findall(flat):
        lowered = image_type.lower()
        # lxml-html-clean's _is_unsafe_image_type treats any xml-flavored
        # image type (svg+xml, foo+xml, ...) as script-capable
        if "svg" in lowered or "xml" in lowered or "script" in lowered:
            return True  # script-capable "image" payload
        safe_images += 1
    return len(_MALICIOUS_SCHEMES.findall(flat)) > safe_images


def coarse_clean(root: Element, allowed_tags: frozenset | set) -> None:
    """First Cleaner pass: kill dangerous subtrees, neutralize javascript.

    ``style`` elements are killed unless 'style' is an allowed tag
    (sanitizer.py:291-292); style *attributes* are kept for the
    span->strong/em conversion (sanitizer.py:293-296).
    """
    kill = set(_KILL_BASE)
    if "style" not in allowed_tags:
        kill.add("style")

    # single traversal: collect kill/unwrap targets and neutralize
    # javascript (Cleaner(javascript=True) analog: drop on* handler
    # attributes, blank javascript: URLs) in one pass
    doomed: list[Element] = []
    unwrap: list[Element] = []
    for el in root.descendants_list():
        tag = el.tag
        if tag in kill:
            doomed.append(el)
            continue
        if tag in _UNWRAP_BASE:
            unwrap.append(el)
        attrib = el.attrib
        if attrib:
            for name in list(attrib):
                if name.startswith("on"):
                    del attrib[name]
            for name in _URL_ATTRS:
                val = attrib.get(name)
                if val and _has_js_scheme(val):
                    attrib[name] = ""

    for el in doomed:
        if el.getparent() is not None:
            el.drop_tree()
    for el in unwrap:
        if el.getparent() is not None:
            el.drop_tag()


def add_nofollow_links(root: Element) -> None:
    """Add rel="nofollow" to external links (Cleaner(add_nofollow=True);
    external = non-empty href whose first char is not '#'). Reference wiring:
    sanitizer.py:438; asserted by tests.py:189-199,229-240."""
    for el in root.descendants_list():
        if el.tag != "a":
            continue
        href = (el.get("href") or "").strip()
        if not href or href.startswith("#"):
            continue
        rel = el.get("rel")
        if rel:
            if "nofollow" in rel.split():
                continue
            el.set("rel", rel + " nofollow")
        else:
            el.set("rel", "nofollow")


def strict_clean(root: Element, allowed_tags: frozenset | set) -> None:
    """Second Cleaner pass (allow_tags=...): unwrap every element whose tag
    is not allowed, keeping text/children (sanitizer.py:434-440). The
    synthetic root is never dropped (lxml retags a disallowed root to <div>
    instead of dropping it)."""
    doomed = [el for el in root.descendants_list() if el.tag not in allowed_tags]
    for el in doomed:
        if el.getparent() is not None:
            el.drop_tag()


# ---------------------------------------------------------------------------
# autolink — semantics of lxml.html.clean.autolink with its default
# link_regexes / avoid_elements / avoid_hosts (sanitizer.py:428-431,
# tests.py:209-256).
# ---------------------------------------------------------------------------

_LINK_REGEXES = [
    re.compile(
        r"(?P<body>https?://(?P<host>[a-z0-9._-]+)(:[0-9]+)?(?P<path>/[^ \n\r]*)?)",
        re.I,
    ),
    re.compile(r"mailto:(?P<body>[a-z0-9._-]+@(?P<host>[a-z0-9_.-]+[a-z]))", re.I),
]
_AVOID_ELEMENTS = frozenset(
    ["textarea", "pre", "code", "head", "select", "a", "script", "style"]
)
_AVOID_HOSTS = [
    re.compile(r"^localhost", re.I),
    re.compile(r"\blocal\.", re.I),
    re.compile(r"^127\.0\.0\.1$"),
]
_AVOID_CLASSES = ("nolink",)


def autolink(el: Element, link_regexes=None, avoid_hosts=None,
             avoid_elements=None, avoid_classes=None):
    """Wrap bare URLs in text content with <a href> elements.

    Accepts the full lxml.html.clean.autolink kwargs surface (the
    reference forwards a settings dict verbatim, sanitizer.py:430-431):
    ``link_regexes`` (patterns or strings with ``body`` and, for the
    avoid_hosts check, ``host`` named groups), ``avoid_elements``,
    ``avoid_hosts``, ``avoid_classes``.
    """
    if link_regexes is None:
        link_regexes = _LINK_REGEXES
    else:
        link_regexes = [
            re.compile(p) if isinstance(p, str) else p for p in link_regexes
        ]
    if avoid_hosts is None:
        avoid_hosts = _AVOID_HOSTS
    else:
        avoid_hosts = [
            re.compile(p) if isinstance(p, str) else p for p in avoid_hosts
        ]
    if avoid_elements is None:
        avoid_elements = _AVOID_ELEMENTS
    if avoid_classes is None:
        avoid_classes = _AVOID_CLASSES
    _autolink_walk(el, link_regexes, avoid_hosts, avoid_elements, avoid_classes)


def _autolink_walk(root, link_regexes, avoid_hosts, avoid_elements, avoid_classes):
    # Iterative: deep documents must not exhaust the recursion limit.
    # An avoided element prunes its whole subtree; a child's *tail* belongs
    # to the parent's context and is linked regardless of the child's own
    # avoidance (matching lxml's recursion structure).
    todo = [root]
    while todo:
        el = todo.pop()
        if el.tag in avoid_elements:
            continue
        cls = el.get("class")
        if cls and any(c in cls.split() for c in avoid_classes):
            continue
        for child in list(el):
            todo.append(child)
            if child.tail:
                text, new_links = _link_text(child.tail, link_regexes, avoid_hosts)
                if new_links:
                    child.tail = text
                    idx = el.index(child)
                    for off, link in enumerate(new_links):
                        el.insert(idx + 1 + off, link)
        if el.text:
            text, new_links = _link_text(el.text, link_regexes, avoid_hosts)
            if new_links:
                el.text = text
                for off, link in enumerate(new_links):
                    el.insert(off, link)


def _link_text(text: str, link_regexes, avoid_hosts):
    """Split text into (leading_text, [<a> elements with tails])."""
    leading = ""
    links: list[Element] = []
    pos = 0
    while True:
        best = None
        for regex in link_regexes:
            search_from = pos
            while True:
                m = regex.search(text, search_from)
                if m is None:
                    break
                host = m.groupdict().get("host")
                if host is not None and any(h.search(host) for h in avoid_hosts):
                    search_from = m.end()
                    continue
                break
            if m is None:
                continue
            if best is None or m.start() < best.start():
                best = m
        if best is None:
            rest = text[pos:]
            if links:
                links[-1].tail = (links[-1].tail or "") + rest
            else:
                leading += rest
            break
        link_target = best.group(0)
        end = best.end()
        # trailing sentence punctuation should not end a link
        while link_target and link_target[-1] in ".,":
            link_target = link_target[:-1]
            end -= 1
        between = text[pos:best.start()]
        if links:
            links[-1].tail = between
        else:
            leading = between
        anchor = Element("a")
        anchor.set("href", link_target)
        body = best.groupdict().get("body") or link_target
        while body and body[-1] in ".,":
            body = body[:-1]
        anchor.text = body
        links.append(anchor)
        pos = end
    return leading, links
