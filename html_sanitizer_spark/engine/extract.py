"""Main-content extraction: HTML boilerplate strip via DOM heuristics.

The north rule names "main-content extraction (HTML boilerplate strip,
DOM heuristics)" as a pipeline capability. The reference sanitizer never
extracts (it rewrites markup in place), so this module has no reference
analog; the heuristics are the published boilerpipe / arc90-readability /
jusText family:

1. **Semantic kill list** — subtrees rooted at structurally-boilerplate
   tags (`nav`, `header`, `footer`, `aside`, `form`, ...) are removed
   wholesale before any scoring. Their tails (text after the element)
   belong to the surrounding block and are kept.
2. **Atomic blocks** — the scoring unit is a block-level element whose
   (post-kill) subtree contains no other block element: the `<p>` inside
   `<div>`, the whole `<ul>` of a link list. Non-atomic containers are
   never scored; only their atomic descendants are, so a link-farm
   sibling cannot drag down the article paragraph next to it.
   `li`/`td` are deliberately NOT block tags: a list or table is scored
   as one unit (a nav list is boilerplate as a whole, and per-item
   densities are degenerate).
3. **Link density** — an atomic block is kept iff its whitespace-
   normalized text is non-empty and
   ``sum(len(norm(text of each <a> subtree))) / len(norm(block text))``
   is <= ``max_link_density`` (boundary KEPT). Empty blocks are dropped
   silently and counted.

The output is the normalized text of the kept blocks, in document order,
joined by ``separator``. Parsing reuses the engine's recovery tokenizer/
tree builder (entities decoded, misnesting repaired), so extraction and
sanitization see the same DOM for the same bytes.

Everything is iterative (explicit stacks) like the rest of the engine:
5k-deep trees must not RecursionError.
"""

from __future__ import annotations

import re

from .parser import parse_fragment
from .tree import Element

__all__ = ["BOILERPLATE_TAGS", "BLOCK_TAGS", "collect_anchors",
           "extract_main", "extract_main_blocks", "meta_robots"]

# Structurally-boilerplate subtrees: killed before scoring. script/style
# are RAWTEXT containers whose payload is never content; the rest are the
# HTML5 sectioning/chrome elements whose purpose is navigation or site
# furniture.
BOILERPLATE_TAGS = frozenset({
    "nav", "header", "footer", "aside", "menu",
    "script", "style", "noscript", "template", "iframe", "object",
    "form", "button", "select", "option", "label", "fieldset", "legend",
})

# Scoring units. li/td/th/dt/dd excluded on purpose (see module docstring).
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "blockquote", "pre",
    "ul", "ol", "dl", "table", "figure", "figcaption",
    "h1", "h2", "h3", "h4", "h5", "h6",
})

_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _subtree_text(el: Element) -> str:
    """In-order text of ``el``'s subtree, skipping kill-list subtrees
    (their tails kept — text after <script>...</script> is content).
    ``el``'s own tail is NOT included (it belongs to the parent)."""
    parts = [el.text or ""]
    # (node, phase): phase 0 = enter (emit text, queue children),
    # phase 1 = exit (emit tail after all children are done)
    stack: list = [(c, 0) for c in reversed(el._children)]
    while stack:
        node, phase = stack.pop()
        if phase == 1:
            parts.append(node.tail or "")
            continue
        if node.tag in BOILERPLATE_TAGS:
            parts.append(node.tail or "")
            continue
        parts.append(node.text or "")
        stack.append((node, 1))
        stack.extend((c, 0) for c in reversed(node._children))
    return "".join(parts)


def _link_text_len(el: Element) -> int:
    """Sum of per-<a> normalized subtree text lengths within ``el``
    (kill-list subtrees skipped; an anchor's tail is not link text)."""
    total = 0
    stack = list(reversed(el._children))
    while stack:
        node = stack.pop()
        if node.tag in BOILERPLATE_TAGS:
            continue
        if node.tag == "a":
            total += len(_norm(_subtree_text(node)))
            continue  # parser forbids nested anchors; don't double count
        stack.extend(reversed(node._children))
    return total


def _atomic_blocks(root: Element) -> list[Element]:
    """Document-order atomic blocks: block-tag elements whose post-kill
    subtree contains no other block tag. Kill-list subtrees are pruned
    both from the walk and from the atomicity check (a <div> whose only
    block child is a killed <nav> IS atomic)."""
    out = []
    stack = list(reversed(root._children))
    while stack:
        node = stack.pop()
        if node.tag in BOILERPLATE_TAGS:
            continue
        if node.tag in BLOCK_TAGS and not _has_block_descendant(node):
            out.append(node)
            continue
        stack.extend(reversed(node._children))
    return out


def _has_block_descendant(el: Element) -> bool:
    stack = list(el._children)
    while stack:
        node = stack.pop()
        if node.tag in BOILERPLATE_TAGS:
            continue
        if node.tag in BLOCK_TAGS:
            return True
        stack.extend(node._children)
    return False


def extract_main_blocks(
    html: str, *, max_link_density: float = 0.5
) -> tuple[list[str], int]:
    """Extract kept-block texts + dropped count from an HTML fragment.

    Returns ``(kept_texts, n_dropped)`` where ``kept_texts`` is the
    normalized text of each kept atomic block in document order and
    ``n_dropped`` counts atomic blocks rejected (link-dense or empty).
    """
    if not html:
        return [], 0
    root = parse_fragment(html)
    kept: list[str] = []
    dropped = 0
    for block in _atomic_blocks(root):
        text = _norm(_subtree_text(block))
        if not text:
            dropped += 1
            continue
        if _link_text_len(block) / len(text) <= max_link_density:
            kept.append(text)
        else:
            dropped += 1
    return kept, dropped


def extract_main(
    html: str, *, max_link_density: float = 0.5, separator: str = "\n"
) -> str:
    """Main-content text of an HTML fragment (see module docstring)."""
    kept, _ = extract_main_blocks(html, max_link_density=max_link_density)
    return separator.join(kept)


def meta_robots(html: str) -> frozenset:
    """Directives from every ``<meta name=robots content=...>`` in the
    DOM (crawl-politeness gate: noindex pages must not enter a corpus).
    Per the HTML spec the name value is ASCII-case-insensitive and the
    content is a comma-separated directive list — both normalized here;
    multiple robots metas union (the conservative reading). Attribute
    NAMES are already lowercased by the tokenizer; VALUES keep case and
    are lowered here."""
    if not html:
        return frozenset()
    dirs: set = set()
    stack = list(reversed(parse_fragment(html)._children))
    while stack:
        node = stack.pop()
        if (
            node.tag == "meta"
            and node.attrib.get("name", "").lower() == "robots"
        ):
            dirs.update(
                d.strip().lower()
                for d in node.attrib.get("content", "").split(",")
                if d.strip()
            )
        stack.extend(reversed(node._children))
    return frozenset(dirs)


def collect_anchors(html: str) -> list[tuple[str, str]]:
    """Document-order (href, normalized anchor text) pairs from the
    recovery-parsed DOM — the outlink harvest a crawler runs at fetch
    time (anchor text is the classic relevance signal the link graph
    carries). The kill list is deliberately NOT applied: nav/footer
    links are exactly what a link graph wants. Anchors without an href
    are skipped; nested anchors cannot occur (the recovery parser's
    implied-end-tag rule forbids them), so no pair is double-counted.
    Iterative like the rest of the module."""
    if not html:
        return []
    out: list[tuple[str, str]] = []
    stack = list(reversed(parse_fragment(html)._children))
    while stack:
        node = stack.pop()
        if node.tag == "a" and "href" in node.attrib:
            out.append((node.attrib["href"], _norm(_subtree_text(node))))
        stack.extend(reversed(node._children))
    return out
