"""Vendored golden corpus: every (before, after) pair from the reference
test suite (/root/reference/html_sanitizer/tests.py, BSD-3), as data.

``after=None`` means "expect the input unchanged" (tests.py:13).
``strip=True`` compares after ``.strip()`` (billion-laughs cases,
tests.py:560-566). Each case cites its source line.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Case:
    case_id: str
    config: str
    before: str
    after: str | None
    strip: bool = False
    source: str = ""


# --- named config overrides (tests.py construction sites) -----------------

def _mergeable_by_class(e1, e2):
    return e1.get("class") == e2.get("class")


CONFIGS: dict[str, dict] = {
    "default": {},
    "h1_h2_only": {  # tests.py:152-154
        "tags": ["h1", "h2"], "empty": (), "separate": (), "attributes": {},
    },
    "nofollow": {"add_nofollow": True},  # tests.py:190
    "autolink": {"autolink": True},  # tests.py:212
    "autolink_nofollow": {"autolink": True, "add_nofollow": True},  # tests.py:229
    "autolink_no_avoid": {"autolink": {"avoid_hosts": []}},  # tests.py:242
    "classes": {  # tests.py:260-272
        "tags": {"h1", "h2", "p", "a", "span"},
        "attributes": {
            "a": ("href", "name", "target", "title", "id", "rel"),
            "h1": ("class",), "p": ("class",), "span": ("class",),
        },
        "empty": set(), "separate": {"a", "p"},
    },
    "classes_mergeable": {  # tests.py:294-307
        "tags": {"h1", "h2", "p", "a", "span"},
        "attributes": {
            "a": ("href", "name", "target", "title", "id", "rel"),
            "h1": ("class",), "p": ("class",), "span": ("class",),
        },
        "empty": set(), "separate": {"a", "p"},
        "is_mergeable": _mergeable_by_class,
    },
    "remove_everything": {  # tests.py:340-342
        "tags": {"__never"}, "attributes": {}, "empty": set(), "separate": set(),
    },
    "keep_br": {"whitespace": set(), "separate": {"br"}},  # tests.py:367
    "custom_attr": {"attributes": {"a": ("href", "custom")}},  # tests.py:380
    "typographic": {"keep_typographic_whitespace": True},  # tests.py:420
    "style_impossible": {  # tests.py:483-490
        "tags": {"impossible tag"}, "attributes": {},
        "empty": set(), "separate": set(),
    },
    "style_tag": {  # tests.py:502-509
        "tags": {"h2", "style"}, "attributes": {},
        "empty": set(), "separate": set(),
    },
    "style_tag_attr": {  # tests.py:524-531
        "tags": {"h2", "style"}, "attributes": {"h2": {"style"}},
        "empty": set(), "separate": set(),
    },
    "data_attr_span": {  # tests.py:569-576
        "tags": ["span"], "empty": (), "separate": (),
        "attributes": {"span": {"data-title"}},
    },
    "img": {  # tests.py:609-615
        "tags": {"p", "img"}, "empty": {"img"}, "separate": (),
        "attributes": {"img": {"alt", "src"}},
    },
    "code_typographic": {  # tests.py:628-636
        "tags": {"code"}, "empty": set(), "separate": set(), "attributes": {},
        "keep_typographic_whitespace": True,
    },
    "typographic_merge": {  # tests.py:669-674
        "whitespace": set(), "keep_typographic_whitespace": True,
    },
}


_BLOB_SOURCE = """\
<p class="western" style="margin-left: 0.39in; text-indent: -0.39in; margin-top: 0.25in; margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify">
<font style="font-size: 12pt" size="3"><b>1.2.\tDefinition des
Spesenbegriffs</b></font></p>
<p class="western" style="margin-left: 0.39in; margin-top: 0.13in; margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify">
<font style="font-size: 12pt" size="3">Als Spesen im Sinne dieses
Reglements gelten die Auslagen, die einem Mitarbeitenden im Interesse
des Arbeitgebers angefallen sind. Sämtliche Mitarbeitende sind
verpflichtet, ihre Spesen im Rahmen dieses Reglements möglichst tief
zu halten. Aufwendungen, die für die Arbeitsausführung nicht
notwendig waren, werden von der Firma nicht übernommen, sondern sind
von den Mitarbeitenden selbst zu tragen.</font></p>
<p class="western" style="margin-left: 0.39in; margin-top: 0.13in; margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify">
<font style="font-size: 12pt" size="3">Im Wesentlichen werden den
Mitarbeitenden folgende geschäftlich bedingten Auslagen ersetzt:</font></p>
<ul><li><p class="western" style="margin-top: 0.13in; margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify"> <font style="font-size: 12pt" size="3">-\tFahrtkosten\t\t\t\t\t(nachfolgend 2.)</font></p> </li><li><p class="western" style="margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify"> <font style="font-size: 12pt" size="3">-\tVerpflegungskosten\t\t\t(nachfolgend 3.)</font></p> </li><li><p class="western" style="margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify"> <font style="font-size: 12pt" size="3">-\tÜbernachtungskosten\t\t\t(nachfolgend 4.)</font></p> </li><li><p class="western" style="margin-bottom: 0in; line-height: 0.19in" lang="de-DE" align="justify"> <font style="font-size: 12pt" size="3">-\tÜbrige Kosten\t\t\t\t(nachfolgend 5.)</font></p> </li></ul>"""

_BLOB_RESULT = """\
<p> <strong>1.2. Definition des Spesenbegriffs</strong></p> <p> Als Spesen im Sinne dieses Reglements gelten die Auslagen, die einem Mitarbeitenden im Interesse des Arbeitgebers angefallen sind. Sämtliche Mitarbeitende sind verpflichtet, ihre Spesen im Rahmen dieses Reglements möglichst tief zu halten. Aufwendungen, die für die Arbeitsausführung nicht notwendig waren, werden von der Firma nicht übernommen, sondern sind von den Mitarbeitenden selbst zu tragen.</p> <p> Im Wesentlichen werden den Mitarbeitenden folgende geschäftlich bedingten Auslagen ersetzt:</p> <ul><li> - Fahrtkosten (nachfolgend 2.) </li><li> - Verpflegungskosten (nachfolgend 3.) </li><li> - Übernachtungskosten (nachfolgend 4.) </li><li> - Übrige Kosten (nachfolgend 5.) </li></ul>"""

_BILLION_LAUGHS = """\
<?xml version="1.0"?>
<!DOCTYPE lolz [
 <!ENTITY lol "lol">
 <!ELEMENT lolz (#PCDATA)>
 <!ENTITY lol1 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">
 <!ENTITY lol2 "&lol1;&lol1;&lol1;&lol1;&lol1;&lol1;&lol1;&lol1;&lol1;&lol1;">
 <!ENTITY lol3 "&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;">
 <!ENTITY lol4 "&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;">
 <!ENTITY lol5 "&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;">
 <!ENTITY lol6 "&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;">
 <!ENTITY lol7 "&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;">
 <!ENTITY lol8 "&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;">
 <!ENTITY lol9 "&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;">
]>
<lolz>&lol9;</lolz>
"""

_EXTERNAL_ENTITIES = """\
 <?xml version="1.0"?>
  <!DOCTYPE foo [
   <!ELEMENT foo ANY >
   <!ENTITY xxe SYSTEM "file:///dev/random" >]><foo>&xxe;</foo>
"""

_CODE_TYPO = "<code>\ngit status\ngit add\ngit commit\n</code>\n"


def _cases() -> list[Case]:
    c: list[Case] = []

    def add(group, config, entries, strip=False, source=""):
        for i, (before, after) in enumerate(entries):
            c.append(Case(f"{group}[{i}]", config, before, after, strip, source))

    add("sanitize", "default", [  # tests.py:26-79
        ("<p>&nbsp;</p>", " "),
        ("<p>           </p>", " "),
        ('<span style="font-weight: bold;">Something</span><p></p>',
         "<strong>Something</strong>"),
        ("<p>abc <span>def <em>ghi</em> jkl</span> mno</p>",
         "<p>abc def <em>ghi</em> jkl mno</p>"),
        ('<span style="font-style: italic;">Something</span><p></p>',
         "<em>Something</em>"),
        ('<h2 style="font-weight:bold">bla</h2>', "<h2>bla</h2>"),
        ('<h2 style="font-style:italic">bla</h2>', "<h2>bla</h2>"),
        ("<p>abc<br />def</p>", "<p>abc<br>def</p>"),
        ("<p><br/><br/><strong></strong>  <br/></p>", ""),
        ("<p><br/><strong></strong>  <br/> abc</p>", "<p> abc</p>"),
        ("<li><br>bla</li>", "<li>bla</li>"),
        ("<p><strong>just</strong> <em>testing</em></p>",
         "<p><strong>just</strong> <em>testing</em></p>"),
        ("<p>Hallo<br>Welt<br><br>Hallo<br>Welt</p>",
         "<p>Hallo<br>Welt<br>Hallo<br>Welt</p>"),
        ("<p><strong>Zeile 1</strong><br>Zeile 2<br>Zeile 3</p>",
         "<p><strong>Zeile 1</strong><br>Zeile 2<br>Zeile 3</p>"),
        ("<p><strong>A</strong>, <strong>B</strong> und <strong>C</strong></p>",
         "<p><strong>A</strong>, <strong>B</strong> und <strong>C</strong></p>"),
        ("<p><form>Zeile 1</form></p>", "<p>Zeile 1</p>"),
        ("<form><p>Zeile 2</p></form>", "<p> Zeile 2 </p>"),
        ("1<p> </p>2", "1 2"),
        ("1<p></p>2", "12"),
        ("<p>son<strong>der</strong>bar</p>", "<p>son<strong>der</strong>bar</p>"),
        ("<a>  </a>", "<a> </a>"),
        ("<a><br />  </a>", "<a> </a>"),
        ("<p>blab<br hello='world' />blub<p>", "<p>blab<br>blub</p>"),
        ("<p>A & B</p>", "<p>A &amp; B</p>"),
        ("<p>A &lt; B</p>", "<p>A &lt; B</p>"),
    ], source="tests.py:26-79")

    add("a_tag", "default", [  # tests.py:81-97
        ('<a href="/foo">foo</a>', None),
        ('<a href="/foo" name="bar" target="some" title="baz"'
         ' cookies="yesplease">foo</a>',
         '<a href="/foo" name="bar" target="some" title="baz">foo</a>'),
        ('<a href="http://somewhere.else">foo</a>', None),
        ('<a href="https://somewhere.else">foo</a>', None),
        ('<a href="javascript:alert()">foo</a>', '<a href="#">foo</a>'),
        ('<a href="javascript%3Aalert()">foo</a>', '<a href="#">foo</a>'),
        ('<a href="mailto:foo@bar.com">foo</a>', None),
        ('<a href="tel:1-234-567-890">foo</a>', None),
    ], source="tests.py:81-97")

    add("merge", "default", [  # tests.py:99-105
        ("<h2>foo</h2><h2>bar</h2>", "<h2>foobar</h2>"),
        ("<h2>foo  </h2>   <h2>   bar</h2>", "<h2>foo bar</h2>"),
    ], source="tests.py:99-105")

    add("no_space_merge", "default", [  # tests.py:107-111
        ("<strong>Hel</strong><strong>lo</strong>", "<strong>Hello</strong>"),
    ], source="tests.py:107-111")

    add("p_in_li", "default", [  # tests.py:113-124
        ("<li><p>foo</p></li>", "<li> foo </li>"),
        ("<li>&nbsp;<p>foo</p> &#160; </li>", "<li> foo </li>"),
        ("<li>foo<p>bar<strong>xx</strong>rab</p><strong>baz</strong>"
         "a<p>b</p>c</li>",
         "<li>foo bar <strong>xx</strong>rab<strong>baz</strong>a b c</li>"),
    ], source="tests.py:113-124")

    add("p_in_p", "default", [  # tests.py:126-141
        ("<p><p>foo</p></p>", "<p>foo</p>"),
        ("<p><p><p>&nbsp;</p> </p><p><br /></p></p>", " "),
        ("<p>foo<p>bar</p>baz</p>", "<p>foo</p><p>bar</p>baz"),
        ("<p>bla <p>blub</p> blaaa</p>", "<p>bla </p><p>blub</p> blaaa"),
        ("<p>text1 <p>text2</p> tail2 <p>text3</p> tail3 </p>tail1",
         "<p>text1 </p><p>text2</p> tail2 <p>text3</p> tail3 tail1"),
    ], source="tests.py:126-141")

    add("allowlist", "default", [  # tests.py:143-149
        ('<script src="http://abc">foo</script>', ""),
        ('<script type="text/javascript">foo</script>', ""),
    ], source="tests.py:143-149")

    add("configuration", "h1_h2_only", [  # tests.py:151-161
        ("<h1>foo</h1>", None),
        ("<h1>foo</h1><h2>bar</h2><h3>baz</h3>", "<h1>foo</h1><h2>bar</h2>baz"),
    ], source="tests.py:151-161")

    add("li_marker", "default", [  # tests.py:163-170
        ("<li> - foo</li>", "<li>foo</li>"),
        ("<li>* foo</li>", "<li>foo</li>"),
        ("<li>*foo</li>", "<li>*foo</li>"),
    ], source="tests.py:163-170")

    add("empty_p_text_in_li", "default", [  # tests.py:172-179
        ("<li><p><strong>foo</strong></p></li>", "<li><strong>foo</strong></li>"),
        ("<li><p><em>foo</em></p></li>", "<li><em>foo</em></li>"),
    ], source="tests.py:172-179")

    add("broken_html", "default", [  # tests.py:181-187
        ("<p><strong>bla", "<p><strong>bla</strong></p>"),
        ("<p><strong>bla<>/dsiad<p/", "<p><strong>bla&lt;&gt;/dsiad</strong></p>"),
    ], source="tests.py:181-187")

    add("nofollow", "nofollow", [  # tests.py:189-199
        ('<p><a href="http://example.com/">example.com</a></p>',
         '<p><a href="http://example.com/" rel="nofollow">example.com</a></p>'),
    ], source="tests.py:189-199")

    add("replacements", "default", [  # tests.py:201-207
        ("<b>Bla</b>", "<strong>Bla</strong>"),
        ("<i>Bla</i>", "<em>Bla</em>"),
    ], source="tests.py:201-207")

    add("autolink_off", "default", [  # tests.py:210
        ("<p>https://github.com/</p>", "<p>https://github.com/</p>"),
    ], source="tests.py:210")

    add("autolink_on", "autolink", [  # tests.py:212-227
        ("<p>https://github.com/</p>",
         '<p><a href="https://github.com/">https://github.com/</a></p>'),
        ("<p>https://localhost/</p>", "<p>https://localhost/</p>"),
    ], source="tests.py:212-227")

    add("autolink_nofollow", "autolink_nofollow", [  # tests.py:229-240
        ("<p>https://github.com/</p>",
         '<p><a href="https://github.com/"'
         ' rel="nofollow">https://github.com/</a></p>'),
    ], source="tests.py:229-240")

    add("autolink_no_avoid", "autolink_no_avoid", [  # tests.py:242-256
        ("<p>https://github.com/</p>",
         '<p><a href="https://github.com/">https://github.com/</a></p>'),
        ("<p>https://localhost/</p>",
         '<p><a href="https://localhost/">https://localhost/</a></p>'),
    ], source="tests.py:242-256")

    add("classes", "classes", [  # tests.py:258-290
        ('<p class="centered">Test</p>', '<p class="centered">Test</p>'),
        ('<p class="centered">Test <span class="bla">span</span></p>',
         '<p class="centered">Test <span class="bla">span</span></p>'),
        ('<p class="centered">Test <span class="bla">span</span>'
         '<span class="blub">span</span></p>',
         '<p class="centered">Test <span class="bla">spanspan</span></p>'),
        ('<h1 class="centered">Test</h1>', '<h1 class="centered">Test</h1>'),
        ('<h2 class="centered">Test</h2>', "<h2>Test</h2>"),
    ], source="tests.py:258-290")

    add("classes_mergeable", "classes_mergeable", [  # tests.py:292-324
        ('<p class="centered">Test <span class="bla">span</span>'
         '<span class="blub">span</span></p>',
         '<p class="centered">Test <span class="bla">span</span>'
         '<span class="blub">span</span></p>'),
        ('<p class="centered">Test <span class="bla">span</span>'
         '<span class="bla">span</span></p>',
         '<p class="centered">Test <span class="bla">spanspan</span></p>'),
    ], source="tests.py:292-324")

    add("emoji", "default", [  # tests.py:326-327
        ("<p>\U0001f602</p>", "<p>\U0001f602</p>"),
        ("<p>\U0001f495</p>", "<p>\U0001f495</p>"),
    ], source="tests.py:326-327")

    add("target_blank", "default", [  # tests.py:329-337
        ('<a href="#" target="_blank">test</a>',
         '<a href="#" target="_blank" rel="noopener">test</a>'),
    ], source="tests.py:329-337")

    add("remove_everything", "remove_everything", [  # tests.py:339-352
        ('<span style="color:#000000;font-weight:bold">11:44:14</span>',
         "11:44:14"),
    ], source="tests.py:339-352")

    add("more_merging", "default", [  # tests.py:354-364
        ("<p><hr></p>", "<hr>"),
        ("<hr><hr><hr>", "<hr>"),
        ('<a name="a"></a><a name="b"></a>', '<a name="a"></a><a name="b"></a>'),
    ], source="tests.py:354-364")

    add("keep_consecutive_br", "keep_br", [  # tests.py:366-377
        ("<p>Hello<br><br>World</p>", "<p>Hello<br><br>World</p>"),
        ("<p>Hello<br><br></p>", "<p>Hello<br><br></p>"),
        ("<p><br><br>World</p>", "<p><br><br>World</p>"),
        ("<p><br><br></p>", "<p><br><br></p>"),
        ("<p><br></p><hr><br></p>", "<p><br></p><hr><br>"),
    ], source="tests.py:366-377")

    add("custom_attr", "custom_attr", [  # tests.py:379-389
        ('<a href="http://example.com" custom="1" abc="2">Test</a>',
         '<a href="http://example.com" custom="1">Test</a>'),
    ], source="tests.py:379-389")

    add("blob", "default", [(_BLOB_SOURCE, _BLOB_RESULT)], source="tests.py:391-417")

    add("keep_typographic", "typographic", [  # tests.py:419-445
        ("\u200a\u2001\u202f\u2004\xa0\u2007\u2002\u2000"
         "\u2003\u2009\u205f\u2005\u2006\u2008\u3000",
         "\u200a\u2003\u202f\u2004\xa0\u2007\u2002\u2002"
         "\u2003\u2009\u205f\u2005\u2006\u2008\u3000"),
        ("Hello This is a paragraph. \n"
         "\tHello. This is a tabled line."
         "Hello.This is beginning of the end.\r",
         "Hello This is a paragraph. \n"
         "\tHello. This is a tabled line."
         "Hello.This is beginning of the end.\n"),
        ("something    <br>somethingelse    ",
         "something    <br>somethingelse    "),
    ], source="tests.py:419-445")

    add("strip_typographic", "default", [  # tests.py:447-459
        ("\u200a\u2001\u202f\u2004\xa0\u2007\u2002\u2000"
         "\u2003\u2009\u205f\u2005\u2006\u2008\u3000",
         " "),
    ], source="tests.py:447-459")

    add("anchor_names", "default", [  # tests.py:461-477
        ('<a name="test" id="test"></a>', '<a name="test"></a>'),
        ('<a name="test"></a>', '<a name="test"></a>'),
        ('<a id="test"></a>', '<a name="test"></a>'),
    ], source="tests.py:461-477")

    add("style_impossible", "style_impossible", [  # tests.py:479-491
        ("foo<style>*{color: red}</style>bar", "foobar"),
    ], source="tests.py:479-491")

    add("style_tag", "style_tag", [  # tests.py:493-510
        ("foo<style>*{color: red}</style>bar",
         "foo<style>*{color: red}</style>bar"),
        ('<h2 style="font-weight:bold">bla</h2>', "<h2>bla</h2>"),
    ], source="tests.py:493-510")

    add("style_tag_attr", "style_tag_attr", [  # tests.py:512-532
        ("foo<style>*{color: red}</style>bar",
         "foo<style>*{color: red}</style>bar"),
        ('<h2 style="font-weight:bold">bla</h2>',
         '<h2 style="font-weight:bold">bla</h2>'),
    ], source="tests.py:512-532")

    add("billion_laughs", "default", [  # tests.py:534-566
        (_BILLION_LAUGHS, "]&gt; &amp;lol9;"),
        (_EXTERNAL_ENTITIES, "]&gt;&amp;xxe;"),
    ], strip=True, source="tests.py:534-566")

    add("data_attributes", "data_attr_span", [  # tests.py:568-589
        ('<span data-title="Test">Content</span>',
         '<span data-title="Test">Content</span>'),
        ('<span data-title="Test" data-other="Stuff">Content</span>',
         '<span data-title="Test">Content</span>'),
    ], source="tests.py:568-589")

    add("entities", "default", [  # tests.py:591-596
        ("&lsquo;", "‘"),
    ], source="tests.py:591-596")

    add("img_tag", "img", [  # tests.py:608-625
        ('<p><img src="hello.jpg" alt="hello" class="hello"></p>',
         '<p><img src="hello.jpg" alt="hello"></p>'),
    ], source="tests.py:608-625")

    add("code_whitespace", "code_typographic", [  # tests.py:627-646
        (_CODE_TYPO, _CODE_TYPO),
    ], source="tests.py:627-646")

    add("br_attributes", "default", [  # tests.py:648-656
        ("<p><br hello=\"alert('world');\"/><br></p>", ""),
        ('<p hello="world"></p>', ""),
        ("<br hello=\"alert('world');\"/><br>", "<br>"),
    ], source="tests.py:648-656")

    add("normalize_early", "default", [  # tests.py:658-666
        ("＜img src=x onerror=＂alert(window.location)＂＞", ""),
    ], source="tests.py:658-666")

    add("typographic_merge", "typographic_merge", [  # tests.py:668-687
        ("This is <strong>some</strong> <strong>text</strong> with adjacent tags.",
         "This is <strong>some text</strong> with adjacent tags."),
        ("This is <strong>some</strong> <strong>text</strong>with adjacent tags.",
         "This is <strong>some text</strong>with adjacent tags."),
    ], source="tests.py:668-687")

    add("control_characters", "default", [  # tests.py:689-702
        ("<p>\x01</p>", ""),
        ("<p>Hallo \x01 Welt</p>", "<p>Hallo Welt</p>"),
    ], source="tests.py:689-702")

    return c


CASES: list[Case] = _cases()


def expected(case: Case) -> str:
    return case.before if case.after is None else case.after
