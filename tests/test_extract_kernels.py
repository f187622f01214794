"""Golden tests for the extraction kernels (SURVEY.md §7 Phase 1).

Fixture rows per FIXTURES.md §6: every selector-cascade branch, skip rule,
URL-completion arm, date format, and validation edge the reference pins.
Expected values are hand-written (not derived from the kernels).
"""

from datetime import datetime

from s_crawler_spark.operators import extract_core as ec

CARD = """
<div class="card pb-3 mb-4 border-bottom">
  <div class="card-header"><h2 class="article-title">
    <a href="/doi/10.1126/science.abc123">  Twisted   bilayer\n graphene </a>
  </h2></div>
  <span class="card-meta__item bullet-left">Science</span>
  <time>10 Aug 2023</time>
  <span class="hlFld-ContribAuthor">Jane Roe</span>
  <span class="hlFld-ContribAuthor"> </span>
  <span class="hlFld-ContribAuthor">Sam Poe</span>
</div>
"""


def wrap(*cards):
    return "<html><body>" + "".join(cards) + "</body></html>"


def test_card_happy_path_and_whitespace():
    [info] = ec.extract_cards(wrap(CARD))
    # Selenium-style .text: collapsed internal whitespace, stripped
    assert info["title"] == "Twisted bilayer graphene"
    assert info["url"] == "https://www.science.org/doi/10.1126/science.abc123"
    assert info["doi"] == "10.1126/science.abc123"
    assert info["journal"] == "Science"
    assert info["publication_date"] == datetime(2023, 8, 10)
    # empty-text author span dropped (reference src/link_collector.py:242)
    assert info["authors"] == ["Jane Roe", "Sam Poe"]


def test_title_cascade_priority_order():
    # only the 4th selector matches
    c4 = ('<div class="card pb-3 mb-4 border-bottom">'
          '<a data-test="article-title" href="/doi/10.5/x">T4</a></div>')
    [i4] = ec.extract_cards(wrap(c4))
    assert i4["title"] == "T4"
    # 1st and 4th both present → 1st wins
    c14 = ('<div class="card pb-3 mb-4 border-bottom">'
           '<a data-test="article-title" href="/doi/10.5/b">T4</a>'
           '<div class="card-header"><h2 class="article-title">'
           '<a href="/doi/10.5/a">T1</a></h2></div></div>')
    [i14] = ec.extract_cards(wrap(c14))
    assert i14["title"] == "T1" and i14["doi"] == "10.5/a"
    # 1st selector present but empty text → falls through to next non-empty
    cempty = ('<div class="card pb-3 mb-4 border-bottom">'
              '<div class="card-header"><h2 class="article-title">'
              '<a href="/doi/10.5/e"> </a></h2></div>'
              '<a data-test="article-title" href="/doi/10.5/f">Fallback</a></div>')
    [ie] = ec.extract_cards(wrap(cempty))
    # NOTE: '.card-header a' (3rd) matches the same empty anchor — empty text
    # → cascade continues to the 4th selector
    assert ie["title"] == "Fallback" and ie["doi"] == "10.5/f"


def test_card_skip_rules():
    no_title = '<div class="card pb-3 mb-4 border-bottom"><time>10 Aug 2023</time></div>'
    assert ec.extract_cards(wrap(no_title)) == []
    no_href = ('<div class="card pb-3 mb-4 border-bottom"><div class="card-header">'
               '<h2 class="article-title"><a>T</a></h2></div></div>')
    assert ec.extract_cards(wrap(no_href)) == []
    # skipped card does not break document order of survivors
    out = ec.extract_cards(wrap(no_title, CARD, no_href, CARD))
    assert len(out) == 2


def test_url_completion():
    assert ec.complete_url("/doi/10.1/x") == "https://www.science.org/doi/10.1/x"
    assert ec.complete_url("https://other.org/doi/10.1/x") == "https://other.org/doi/10.1/x"
    assert ec.complete_url("http://other.org/p") == "http://other.org/p"


def test_doi_regex():
    f = ec.extract_doi_from_url
    assert f("https://www.science.org/doi/10.1126/science.abc") == "10.1126/science.abc"
    assert f("https://x.org/doi/10.1126/sci.1/extra") == "10.1126/sci.1"
    assert f("https://x.org/nodoi/here") is None
    assert f("/doi/11.1126/x") is None  # must start '10.'


def test_date_parsing():
    f = ec.parse_publication_date
    assert f("10 Aug 2023") == datetime(2023, 8, 10)
    assert f(" 01 Jan 2010 ") == datetime(2010, 1, 1)
    assert f("2023-01-01") == datetime(2023, 1, 1)
    assert f("Vol 381") is None
    assert f("") is None


def test_sanitize_filename():
    f = ec.sanitize_filename
    assert f('Test/File:Name*with?special<chars>') == "Test_File_Name_with_special_chars_"
    assert f("  a   b\t\nc ") == "a b c"
    assert f("中文 标题") == "中文 标题"
    assert f("x" * 300) == "x" * 200
    assert f("") == ""  # canonical impl (src/utils/file_utils.py) — SURVEY.md §5


def test_detail_abstract_cascade():
    h1 = "<html><body><div role='paragraph'>Primary</div><div class='abstract'>Fifth</div></body></html>"
    assert ec.extract_detail(h1)["abstract"] == "Primary"
    h2 = "<html><body><div class='abstract'><p>AbsP</p></div></body></html>"
    # '.abstract p' (2nd) beats 'div.abstract' (5th)
    assert ec.extract_detail(h2)["abstract"] == "AbsP"
    h3 = "<html><body><p data-test='article-summary'>Last</p></body></html>"
    assert ec.extract_detail(h3)["abstract"] == "Last"
    assert ec.extract_detail("<html><body></body></html>")["abstract"] is None


def test_pdf_link_discovery_priority():
    exact = ('<div id="main"><div class="article-container"><article><header><div>'
             '<div class="info-panel"><div class="info-panel__right-content">'
             '<div class="info-panel__formats info-panel__item">'
             '<a href="/doi/epdf/10.1/x"><i class="icon-pdf"></i></a>'
             '</div></div></div></div></header></article></div></div>')
    h = f"<html><body>{exact}<a href='/doi/epdf/10.1/other'>o</a></body></html>"
    assert ec.extract_detail(h)["pdf_page_url"] == "https://www.science.org/doi/epdf/10.1/x"
    # backup: bare icon inside anchor
    h2 = "<html><body><a href='/doi/epdf/10.1/y'><i class='icon-pdf'></i></a></body></html>"
    assert ec.extract_detail(h2)["pdf_page_url"] == "https://www.science.org/doi/epdf/10.1/y"
    # backup a[href*='pdf'] is case-SENSITIVE (CSS semantics) and completes
    # the URL; the final fallback lowercases and returns the RAW href
    h3 = ("<html><body><a href='/nope'>n</a>"
          "<a href='/files/one.PDF'>1</a><a href='/two.pdf'>2</a></body></html>")
    assert ec.extract_detail(h3)["pdf_page_url"] == "https://www.science.org/two.pdf"
    h3b = "<html><body><a href='/nope'>n</a><a href='/files/one.PDF'>1</a></body></html>"
    assert ec.extract_detail(h3b)["pdf_page_url"] == "/files/one.PDF"
    assert ec.extract_detail("<html><body><a href='/x'>n</a></body></html>")["pdf_page_url"] is None


def test_download_link_priority():
    exact = ('<nav id="app-navbar"><div class="btn-group navbar-right">'
             '<div class="grouped right"><a href="https://s.org/doi/pdf/10.1/x?download=true">'
             '<span class="icon material-icons">dl</span></a></div></div></nav>')
    h = f"<html><body>{exact}<a href='https://s.org/other?download=true'>alt</a></body></html>"
    assert ec.find_download_link(h) == "https://s.org/doi/pdf/10.1/x?download=true"
    h2 = "<html><body><a href='https://s.org/p?download=true'>alt</a></body></html>"
    assert ec.find_download_link(h2) == "https://s.org/p?download=true"
    assert ec.find_download_link("<html><body></body></html>") is None


def test_pdf_validation():
    f = ec.validate_pdf_content
    big = b"%PDF-1.4" + b"x" * 2000
    assert f(big, "application/pdf", 200)
    assert f(big, "text/html", 200)            # magic rescues wrong type
    assert f(b"%PDF tiny", "application/pdf", 200)   # small but magic
    assert not f(b"<html>err</html>", "text/html", 200)
    assert not f(b"x" * 500, "application/octet-stream", 200)  # small, no magic
    assert f(b"x" * 5000, "application/octet-stream", 200)     # big + right type
    assert not f(big, "application/pdf", 403)
    assert not f(None, "application/pdf", 200)


def test_page_predicates():
    assert ec.is_page_abnormal(b"<html><title>Just a moment</title><body>cloudflare challenge</body></html>")
    assert not ec.is_page_abnormal(b"<html><body>regular page content</body></html>")
    assert ec.is_page_normal(wrap(CARD).encode())
    assert not ec.is_page_normal(b"<html><body>tiny</body></html>")
    assert ec.is_page_normal(b"<html><body>" + b"long text " * 20 + b"</body></html>")


def test_keyword_cascade():
    ul = ('<html><body><ul class="article-keywords">'
          '<li><a href="/subjects/0">Photochemistry</a></li>'
          '<li><a href="/subjects/1">Liquid crystals</a></li></ul></body></html>')
    spans = ('<html><body><div class="keywords-section">'
             '<span class="keyword">turnkey synthesis</span></div></body></html>')
    none = "<html><body><p>no subject terms</p></body></html>"
    assert ec.extract_detail(ul)["keywords"] == ["Photochemistry", "Liquid crystals"]
    assert ec.extract_detail(spans)["keywords"] == ["turnkey synthesis"]
    assert ec.extract_detail(none)["keywords"] is None
    # first cascade entry wins when both markups are present
    both = ul.replace("</body></html>", "") + spans.split("<body>")[1]
    assert ec.extract_detail(both)["keywords"] == ["Photochemistry", "Liquid crystals"]
