"""Engine unit tests for main-content extraction (engine/extract.py).

The extractor has no reference analog (html-sanitizer never extracts), so
its contract is pinned here directly: kill-list semantics, atomic-block
selection, the link-density boundary, tail/entity handling, recovery
parsing, and recursion safety.
"""

from __future__ import annotations

from html_sanitizer_spark.engine.extract import (
    extract_main,
    extract_main_blocks,
)


def test_full_page_extraction():
    h = (
        "<header><h1>Site Title</h1></header>"
        '<nav><ul><li><a href="/">Home</a></li><li><a href="/b">Blog</a>'
        "</li></ul></nav>"
        '<div class="main"><p>The quick brown fox jumps over the lazy dog.'
        "</p>"
        '<ul><li><a href="/a">aaa</a></li><li><a href="/b">bbb</a></li></ul>'
        '<p>See <a href="/more">details</a> in the archive</p></div>'
        '<aside><p><a href="/ad">Sponsored</a></p></aside>'
        '<footer><p>&copy; 2026 <a href="/t">Terms</a></p></footer>'
    )
    kept, dropped = extract_main_blocks(h)
    assert kept == [
        "The quick brown fox jumps over the lazy dog.",
        "See details in the archive",
    ]
    assert dropped == 1  # the link-farm <ul>; nav/aside/footer are killed
    assert extract_main(h) == (
        "The quick brown fox jumps over the lazy dog.\n"
        "See details in the archive"
    )


def test_link_density_boundary_kept_at_exactly_half():
    # 5 link chars / 10 total = 0.5 -> kept (boundary is <=)
    kept, dropped = extract_main_blocks('<p><a href="x">abcde</a>fgihj</p>')
    assert kept == ["abcdefgihj"] and dropped == 0
    # 6 / 10 = 0.6 -> dropped
    kept, dropped = extract_main_blocks('<p><a href="x">abcdef</a>ghij</p>')
    assert kept == [] and dropped == 1


def test_multiple_links_sum_independently():
    # links "ab" + "cd" = 4 of 8 -> 0.5 kept; anchor tails are content
    kept, _ = extract_main_blocks(
        '<p><a href="x">ab</a>ef<a href="y">cd</a>gh</p>'
    )
    assert kept == ["abefcdgh"]


def test_kill_list_tail_is_content_but_text_is_not():
    kept, dropped = extract_main_blocks(
        "<p>before<script>evil()</script> after</p>"
    )
    assert kept == ["before after"] and dropped == 0


def test_killed_nav_inside_div_does_not_block_atomicity():
    # the div's only block descendant is inside a killed <nav>, so the
    # div itself is the atomic block and its direct text is kept
    kept, dropped = extract_main_blocks(
        "<div><nav><ul><li><a href=x>L</a></li></ul></nav>real content"
        " text</div>"
    )
    assert kept == ["real content text"] and dropped == 0


def test_non_atomic_container_not_scored():
    # outer div has block children -> never scored; a link-farm child
    # cannot drag down the sibling paragraph
    kept, dropped = extract_main_blocks(
        "<div><p>good paragraph text</p>"
        '<ul><li><a href="/1">x</a></li><li><a href="/2">y</a></li></ul>'
        "</div>"
    )
    assert kept == ["good paragraph text"] and dropped == 1


def test_list_scored_as_one_unit_not_per_item():
    # li is not a block tag: one drop for the whole ul, not two
    _, dropped = extract_main_blocks(
        '<ul><li><a href="/a">aaa</a></li><li><a href="/b">bbb</a></li></ul>'
    )
    assert dropped == 1


def test_empty_and_whitespace_blocks_dropped_silently():
    kept, dropped = extract_main_blocks("<p>   </p><p></p><p>kept one</p>")
    assert kept == ["kept one"] and dropped == 2


def test_entities_decoded_before_scoring():
    kept, _ = extract_main_blocks("<p>fish &amp; chips &mdash; daily</p>")
    assert kept == ["fish & chips — daily"]


def test_whitespace_normalized_per_block():
    kept, _ = extract_main_blocks("<p>  a\n\n b\tc  </p>")
    assert kept == ["a b c"]


def test_recovery_parse_unclosed_tags():
    kept, dropped = extract_main_blocks(
        "<div><p>first paragraph<p>second paragraph</div>"
    )
    assert kept == ["first paragraph", "second paragraph"]
    assert dropped == 0


def test_deep_nesting_no_recursion_error():
    h = "<div>" * 3000 + "<p>deep text here</p>" + "</div>" * 3000
    assert extract_main(h) == "deep text here"


def test_headings_are_blocks():
    kept, _ = extract_main_blocks("<h2>Section</h2><p>body text</p>")
    assert kept == ["Section", "body text"]


def test_empty_and_none_input():
    assert extract_main("") == ""
    assert extract_main_blocks("") == ([], 0)
    assert extract_main("no markup at all") == ""  # bare text: no blocks


def test_custom_threshold():
    # density 0.5 block: dropped when the bar is tightened to 0.4
    kept, dropped = extract_main_blocks(
        '<p><a href="x">abcde</a>fgihj</p>', max_link_density=0.4
    )
    assert kept == [] and dropped == 1


# ---------------------------------------------------------------------------
# properties: constructed pages with known-density blocks extract exactly
# ---------------------------------------------------------------------------
from hypothesis import given, settings as hyp_settings, strategies as st

_words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),
    min_size=1,
    max_size=12,
).map(" ".join)


@hyp_settings(max_examples=200, deadline=None)
@given(content=_words, n_nav=st.integers(1, 5))
def test_constructed_page_property(content, n_nav):
    """Any plain-word paragraph survives extraction verbatim; any number
    of killed-tag/nav siblings and a link-farm never leak into it."""
    nav = "<nav><ul>" + '<li><a href="/x">Home</a></li>' * n_nav + "</ul></nav>"
    page = (
        f"<header><h1>T</h1></header>{nav}<div><p>{content}</p>"
        '<ul><li><a href="/a">aaa</a></li><li><a href="/b">bbb</a></li>'
        "</ul></div><footer><a href='/t'>Terms</a></footer>"
    )
    kept, dropped = extract_main_blocks(page)
    assert kept == [content]
    assert dropped == 1


@hyp_settings(max_examples=200, deadline=None)
@given(link_text=_words, body=_words)
def test_density_decision_matches_definition(link_text, body):
    """The keep/drop decision must equal the documented formula computed
    independently: len(norm(link)) / len(norm('link body'))."""
    html = f'<p><a href="/x">{link_text}</a> {body}</p>'
    kept, dropped = extract_main_blocks(html)
    full = f"{link_text} {body}"
    expect_keep = len(link_text) / len(full) <= 0.5
    assert (kept == [full] and dropped == 0) == expect_keep


def test_collect_anchors_document_order_and_recovery():
    from html_sanitizer_spark.engine.extract import collect_anchors

    html = (
        '<nav><a href="/n">Home</a></nav><p>x <a href="/p">two  words</a>'
        "</p><a name=only>no href</a>"
        '<div><a href="/q"><b>bold</b> tail</a></div>'
    )
    assert collect_anchors(html) == [
        ("/n", "Home"), ("/p", "two words"), ("/q", "bold tail"),
    ]
    assert collect_anchors("") == []
    # recovery input: an unclosed anchor adopts following text; a second
    # <a> implies the first one's end (no nesting, no double count)
    assert collect_anchors('<a href="/1">one <a href="/2">two') == [
        ("/1", "one"), ("/2", "two"),
    ]


def test_meta_robots_directives():
    from html_sanitizer_spark.engine.extract import meta_robots

    assert meta_robots(
        '<meta name="ROBOTS" content="NoIndex, nofollow">'
        '<meta name="viewport" content="width=1"><p>x</p>'
        '<meta name="robots" content=" noarchive ">'
    ) == frozenset({"noindex", "nofollow", "noarchive"})
    assert meta_robots('<meta content="noindex">') == frozenset()
    assert meta_robots("") == frozenset()
    assert meta_robots('<meta name="robots" content=",, ,">') == frozenset()
