"""DOM + CSS engine unit tests — the selector grammar the reference uses."""

from s_crawler_spark.functions import htmlsel as hs


HTML = b"""
<html><body>
  <div id="main" class="wrap">
    <div class="card pb-3 mb-4 border-bottom">
      <div class="card-header"><h2 class="article-title"><a href="/doi/10.1126/x.1">One</a></h2></div>
      <span class="card-meta__item bullet-left">Science</span>
      <time>10 Aug 2023</time>
      <span class="hlFld-ContribAuthor">A One</span>
      <span class="hlFld-ContribAuthor">B Two</span>
    </div>
    <div class="card pb-3 mb-4 border-bottom">
      <a data-test="article-title" href="http://x/doi/10.1/y">Two</a>
    </div>
  </div>
  <ul><li class="page-item active"><a>1</a></li><li class="page-item"><a href="/p2">next</a></li></ul>
</body></html>
"""


def test_multiclass_and_document_order():
    root = hs.parse_html(HTML)
    cards = hs.find_elements(root, ".card.pb-3.mb-4.border-bottom")
    assert len(cards) == 2
    assert "One" in cards[0].text and "Two" in cards[1].text


def test_child_and_descendant_combinators():
    root = hs.parse_html(HTML)
    a = hs.find_element(root, ".card-header h2.article-title > a")
    assert a.text == "One"
    assert a.get_attribute("href") == "/doi/10.1126/x.1"


def test_attr_selectors():
    root = hs.parse_html(HTML)
    assert hs.find_element(root, "a[data-test='article-title']").text == "Two"
    assert hs.find_element(root, "a[href*='doi']").text == "One"  # first in doc order
    assert hs.find_element(root, "a[href^='http']").text == "Two"


def test_adjacent_sibling():
    root = hs.parse_html(HTML)
    nxt = hs.find_element(root, "li.page-item.active + li.page-item > a")
    assert nxt.get_attribute("href") == "/p2"


def test_id_selector_and_scoping():
    root = hs.parse_html(HTML)
    main = hs.find_element(root, "#main")
    assert main is not None
    # scoped search: only descendants of the first card
    card = hs.find_elements(root, ".card")[0]
    authors = hs.find_elements(card, ".hlFld-ContribAuthor")
    assert [a.text for a in authors] == ["A One", "B Two"]
    assert hs.find_element(card, "a[data-test='article-title']") is None


def test_text_whitespace_collapse():
    root = hs.parse_html(b"<p>  a\n  b\t c  </p>")
    assert hs.find_element(root, "p").text == "a b c"


def test_missing_selector_returns_none():
    root = hs.parse_html(HTML)
    assert hs.find_element(root, ".nope") is None
    assert hs.find_elements(root, ".nope") == []


# ---------------------------------------------------------------------------
# fast-tokenizer ↔ stdlib-HTMLParser equivalence (the fast path must build
# the identical tree on every page shape the engine can meet)
# ---------------------------------------------------------------------------

def _tree_sig(el):
    return (el.tag, sorted(el.attrs.items()),
            "".join(el._texts or ()), [_tree_sig(c) for c in (el.children or ())])


def test_fast_parser_equals_stdlib_on_corpus(pages_dict):
    from s_crawler_spark.functions.htmlsel import parse_html, parse_html_stdlib
    checked = 0
    for url, html in pages_dict.items():
        if html[:4] == b"%PDF":
            continue
        assert _tree_sig(parse_html(html)) == _tree_sig(parse_html_stdlib(html)), url
        checked += 1
    assert checked > 100


def test_fast_parser_edge_cases():
    from s_crawler_spark.functions.htmlsel import parse_html, parse_html_stdlib
    cases = [
        "<div class='a' data-x=bare disabled>t &amp; u</div>",
        '<p>one<br>two<img src="x"/>three</p>',
        "<!-- comment --><div>after</div>",
        "<!DOCTYPE html><html><body>x</body></html>",
        "<div><span>unclosed</div>",
        "<ul><li>a<li>b</ul>",
        "<a href='x?a=1&amp;b=2'>q</a>",
        "<script>if (a < b) { x(); }</script><div>after</div>",
        "<style>.a > .b { color: red }</style><p>t</p>",
        "<div>stray < lone</div>",
        "<DIV CLASS='Upper'>case</DIV>",
        "<div a='1' a='2'>dup</div>",
        # non-void self-closing tags: siblings must not nest inside
        "<div><span/>after</div>",
        "<foo/><bar>y</bar>",
        "<div a=\"1\"/>sib",
        "<span foo/>tail",
        # trailing '/' inside an unquoted attr value is NOT a self-close
        "<a href=http://x/>in</a>",
        "<div a=1 / b=2>z</div>",
        # uppercase bare attribute stays valueless (None, not '')
        "<div DISABLED>x</div>",
    ]
    for html in cases:
        assert _tree_sig(parse_html(html)) == _tree_sig(parse_html_stdlib(html)), html


def test_selectors_survive_bare_attributes():
    """Bare (valueless) attributes parse to None; selector queries must not
    crash and must treat them per browser semantics (value '' for compares,
    present for [attr])."""
    from s_crawler_spark.functions.htmlsel import find_element, find_elements, parse_html
    root = parse_html('<div class>x</div><p class="a">y</p>'
                      '<span disabled>z</span><i data-x="">w</i>')
    assert find_element(root, ".a").text == "y"          # no crash on bare class
    assert find_element(root, "[disabled]").text == "z"  # presence matches bare
    assert find_element(root, "[data-x='']").text == "w"
    assert find_elements(root, "span[disabled='']")      # bare compares as ''


def test_attrs_cache_is_read_only():
    """The memoized attrs mapping is shared across every element with the
    same attrs string; mutation must raise instead of silently corrupting
    unrelated elements/documents parsed in the same worker."""
    import pytest
    root = hs.parse_html('<div class="card">a</div><div class="card">b</div>')
    a, b = hs.find_elements(root, "div.card")
    assert a.attrs is b.attrs or dict(a.attrs) == dict(b.attrs)
    with pytest.raises(TypeError):
        a.attrs["class"] = "mutated"
    with pytest.raises((TypeError, AttributeError)):
        a.attrs.pop("class")
    assert b.attrs["class"] == "card"
