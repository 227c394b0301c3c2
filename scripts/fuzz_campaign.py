"""Targeted parser-recovery fuzz campaign (VERDICT r04 #6 / r04-next #3).

Mines the input classes the r04 campaign showed are productive — foreign
content (svg/math with HTML-breaking children), CDATA-in-script/style vs
RCDATA in title/textarea, mis-nested formatting (adoption-agency shapes),
and the r05 scope-barrier shapes (table/td/button protecting p/a/li) —
against the engine's hard invariants:

  I1 convergence: sanitize reaches a fixpoint within 10 passes and stays
     there (the documented bounded-monotone-convergence contract);
  I2 allowlist: only configured tags appear in any pass's output;
  I3 hygiene: no control chars, no javascript: URL survives any pass;
  I4 nofollow contract when configured;
  E1 (r06) the main-content extractor (engine/extract.py) walks the same
     recovered tree for every input without crashing — its kill-list /
     atomic-block / density passes must be total over arbitrary soup.

Any violation prints the minimized input and exits non-zero — that is a
parser/cleaner bug to fix and pin. A clean run prints per-class example
counts plus a deterministic sample of "interesting" survivors (inputs
whose first-pass output differs from input AND needs >1 pass to
stabilize) as pin candidates.

Usage: python scripts/fuzz_campaign.py [n_examples_per_class] [n_procs]
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import random
import re
import sys

from html_sanitizer_spark.engine.core import sanitize
from html_sanitizer_spark.engine.extract import (
    collect_anchors,
    extract_main,
    extract_main_blocks,
    meta_robots,
)
from html_sanitizer_spark.engine.settings import Settings

CLASSES: dict[str, list[str]] = {
    "foreign": [
        "<svg>", "</svg>", "<svg onload=alert(1)>", "<math>", "</math>",
        "<mi>", "</mi>", "<annotation-xml>", "</annotation-xml>",
        "<foreignObject>", "</foreignObject>", "<desc>", "</desc>",
        "<script>evil()</script>", "<![CDATA[", "]]>", "<p>", "</p>",
        "<b>", "</b>", "<circle r='1'/>", "<use href='#x'/>", "text ",
        "<a href='/x'>", "</a>", "＜svg＞", "<title>", "</title>",
    ],
    "cdata_rcdata": [
        "<script>", "</script>", "<script src=x>", "<style>", "</style>",
        "<textarea>", "</textarea>", "<title>", "</title>", "<!--", "-->",
        "</scr", "ipt>", "<p>", "</p>", "var a='", "';", '"', "'", ">",
        "<", "&lt;", "<![CDATA[", "]]>", "x ", "p{color:red}",
    ],
    "misnested_fmt": [
        "<b>", "</b>", "<i>", "</i>", "<em>", "</em>", "<strong>",
        "</strong>", "<p>", "</p>", "<a href='/x'>", "<a href='/y'>",
        "</a>", "<span style='font-weight: bold'>", "</span>", "<sub>",
        "</sub>", "<sup>", "</sup>", "x ", "y ", "<h2>", "</h2>", "<br>",
    ],
    "scope_barrier": [
        "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>", "<th>",
        "<button>", "</button>", "<caption>", "</caption>", "<li>",
        "</li>", "<ul>", "</ul>", "<ol>", "</ol>", "<dl>", "<dt>", "<dd>",
        "</dl>", "<p>", "</p>", "<a href='/x'>", "</a>", "<b>", "</b>",
        "x ", "* ", "- ",
    ],
    "attr_edges": [
        "<p ", "<a ", "<b ", "title=", "href=", "id=", "name=", "onclick=",
        "'", '"', "a>b", "x='y", "=", "/>", "/ >", ">", " ", "c", "<p a=1",
        "a=2 b>", "title='q>r'>", 'href="jav&#x61;script:alert(1)">',
        "href='  https://e.org/p '>", "</p>", "</a>", "style='color:red'>",
    ],
    "markup_decl": [
        "<!--", "-->", "<!-->", "<!--->", "<!---->", "<!DOCTYPE html>",
        "<!doctype x>", "<?php echo 1 ?>", "<?xml version='1.0'?>", "<!",
        "<!-", "<![CDATA[", "]]>", "<![endif]-->", "<!--[if IE]>",
        "<p>", "</p>", "<b>", "</b>", "x ", "-", "!", ">", "<",
        "<script>e()</script>", "&gt;", "&lt;",
    ],
    "entity_edges": [
        "&#xD800;", "&#xDFFF;", "&#x110000;", "&#0;", "&#38;", "&#x26;",
        "&#X41;", "&amp;", "&amp;amp;", "&lol9;", "&LT;", "&lt", "&",
        "&#", "&#x", "&nbsp;", "&shy;", "&#8203;", "<p>", "</p>",
        "<a href='/x'>", "</a>", "x", ";", "#", "9999999999",
    ],
    # r06 9th class (VERDICT r05 next-round #5): form/template nesting
    # (content-model outliers: template's inert content, form's no-nest
    # rule, select/option's restricted children) crossed with
    # attribute-entity boundaries — bare '&' inside UNQUOTED attribute
    # values (legal data per the HTML5 ambiguous-ampersand rule), the
    # title=href= unquoted-value recovery the r05 checker lesson flagged,
    # and entity-ish fragments straddling the value/tag-end boundary.
    "form_template": [
        "<form>", "</form>", "<form action=javascript:alert(1)>",
        "<template>", "</template>", "<input value=x>", "<input>",
        "<select>", "<option>", "</option>", "</select>", "<optgroup>",
        "<fieldset>", "<legend>", "</legend>", "</fieldset>",
        "<label>", "</label>", "<button>", "</button>", "<form>",
        "<p>", "</p>", "<b>", "</b>", "x ", "<a ", "<p ",
        "title=href=", '"javascript:alert(1)"', "href=a&b>",
        "title=a&amp;b>", "value=x&notasemi>", "&", "&amp;", "&#38;",
        "='y&z'>", "=q&#38;r>", "href='/x?a=1&b=2'>", ">", "</a>",
    ],
    # r07 10th class (VERDICT r06 #6): the main_content extractor's
    # kill-list / atomic-block boundary. Mixes kill-list tags (whose
    # TAILS must be kept while subtrees die — including RAWTEXT
    # containers like script/style whose payload swallows later "tags"),
    # block tags that flip atomicity when they gain/lose block children,
    # li/td (deliberately NOT block tags), anchors with varying text mass
    # around the 0.5 link-density boundary, and misnesting that the
    # recovery parser repairs BEFORE scoring (so a block's subtree isn't
    # what the raw bytes suggest). Unbalanced fragments on purpose: a
    # kill-tag opened and never closed adopts everything after it.
    "extractor_boundary": [
        "<nav>", "</nav>", "<header>", "</header>", "<footer>",
        "</footer>", "<aside>", "</aside>", "<form>", "</form>",
        "<template>", "</template>", "<script>", "</script>",
        "<style>", "</style>", "<button>", "</button>",
        "<div>", "</div>", "<section>", "</section>", "<p>", "</p>",
        "<ul>", "</ul>", "<li>", "</li>", "<table>", "</table>",
        "<td>", "</td>", "<figure>", "</figure>", "<blockquote>",
        "</blockquote>", "<h3>", "</h3>", "<main>", "</main>",
        "<a href='/x'>", "</a>", "link ", "longer anchor text here ",
        "body text ", "tail after kill ", "x", " ", "＜nav＞",
        # r07: the ingest-gate surfaces walk this same DOM — meta soup
        # exercises meta_robots (case, split, fragments), bare/valueless
        # hrefs exercise collect_anchors
        '<meta name=robots content="noindex, nofollow">',
        "<meta name=ROBOTS", " content=NOARCHIVE>", "<meta>", "<a href>",
        "<a href=''>", '<meta name="robots" content=",,">',
    ],
    "nfkc_smuggle": [
        "＜", "＞", "﹤", "﹥", "＆", "ｓcript", "ａ", "ｐ", "<", ">", "&",
        "amp;", "#60;", "lt;", "<p>", "</p>", "<a href='/x'>", "</a>",
        " ", " ", "ﬁ", "｡", "x ", "ｊａｖａｓｃｒｉｐｔ：",
        "alert(1)", "href=", "'",
    ],
}

_CONFIGS = [
    Settings(),
    Settings({"keep_typographic_whitespace": True}),
    Settings({"autolink": True, "add_nofollow": True}),
]
_TAG_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9]*)")
_WS_RUN_RE = re.compile(r"\s+")
_CONTROL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
# javascript: is only a violation as the VALUE OF A URL ATTRIBUTE
# (href/src). Occurrences as escaped text content, or as string DATA
# inside a non-URL attribute value (title="href=&quot;javascript:..."
# — produced by unquoted-value recovery on title=href="..."), are inert
# strings the reference would keep too; the attr_edges class generates
# both shapes on purpose to prove the distinction. The serializer
# escapes & in attribute values, so a live URL cannot hide behind
# &#x61;-style entities in the OUTPUT.
_JS_IN_TAG_RE = re.compile(
    r'<[a-zA-Z][^>]*(?:href|src)="[^"]*javascript:', re.I
)


def _check_one(args: tuple[str, int, int]) -> tuple[str, str] | None:
    """Returns (input, violation) on failure, ('PIN', input) for an
    interesting survivor, None otherwise."""
    cls, seed, max_parts = args
    rng = random.Random(seed)
    parts = CLASSES[cls]
    html = "".join(rng.choice(parts) for _ in range(rng.randint(1, max_parts)))
    s = _CONFIGS[seed % len(_CONFIGS)]
    try:
        anchors = collect_anchors(html)
        if any(
            h is None or t is None or t != _WS_RUN_RE.sub(" ", t).strip()
            for h, t in anchors
        ):
            return (html, f"anchor contract: {anchors[:5]!r}")
        robots = meta_robots(html)
        if any((not d) or d != d.strip().lower() for d in robots):
            return (html, f"robots contract: {sorted(robots)!r}")
        kept, dropped = extract_main_blocks(html)
        # E1 invariants: totality over arbitrary soup; every kept block is
        # non-empty, whitespace-NORMALIZED text (stripped, no internal
        # runs); extract_main is exactly the separator-join of the blocks
        if dropped < 0 or any(
            k is None or not k or k != _WS_RUN_RE.sub(" ", k).strip()
            for k in kept
        ):
            return (html, f"extractor contract: kept={kept!r} dropped={dropped}")
        if extract_main(html) != "\n".join(kept):
            return (html, f"extract_main != join(blocks): kept={kept!r}")
        outs = [sanitize(html, s)]
        for _ in range(11):
            nxt = sanitize(outs[-1], s)
            if nxt == outs[-1]:
                break
            outs.append(nxt)
        else:
            return (html, f"no fixpoint within 10 passes: {outs[-3:]!r}")
        for o in outs:
            for m in _TAG_RE.finditer(o):
                if m.group(1).lower() not in s.tags:
                    return (html, f"disallowed tag {m.group(1)!r} in {o!r}")
            if _CONTROL_RE.search(o):
                return (html, f"control char in {o!r}")
            if _JS_IN_TAG_RE.search(o):
                return (html, f"javascript: URL inside a tag in {o!r}")
        if len(outs) > 2 and seed % 97 == 0:  # deterministic sample
            return ("PIN", f"{cls}\t{html!r}\t{outs[0]!r}\t{outs[-1]!r}")
    except RecursionError:
        return (html, "RecursionError")
    except Exception as exc:  # noqa: BLE001 - any crash is a finding
        return (html, f"{type(exc).__name__}: {exc}")
    return None


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    jobs = [
        (cls, seed, 40)
        for cls in CLASSES
        for seed in range(n)
    ]
    failures: list[tuple[str, str]] = []
    pins: list[str] = []
    with mp.Pool(procs) as pool:
        for res in pool.imap_unordered(_check_one, jobs, chunksize=512):
            if res is None:
                continue
            if res[0] == "PIN":
                pins.append(res[1])
            else:
                failures.append(res)
                if len(failures) >= 5:
                    break
    if failures:
        for html, why in failures:
            print(f"VIOLATION: {why}\n  input: {html!r}\n")
        return 1
    print(f"clean: {len(jobs)} examples across {len(CLASSES)} classes")
    print(f"pin candidates ({len(pins)} sampled multi-pass survivors):")
    for p in itertools.islice(sorted(pins), 40):
        print(" ", p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
