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
