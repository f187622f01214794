"""Pure-Python extraction kernels — the per-URL byte-identical invariant.

Each function re-derives, from first principles, what the reference crawler
computes for one page (reference: lijihui0401/s_crawler). They are pure
``html bytes -> dict`` functions with NO Spark dependency so that:

- the Arrow-batched pandas UDFs in ``operators/extract.py`` apply them per
  Arrow batch (the distributed path), and
- the sequential reference simulator in ``plans/reference_sim.py`` applies
  them in the reference's exact loop order (the parity oracle),

guaranteeing the two paths can only diverge in *orchestration* (ordering,
dedup, truncation) — which is exactly what the parity tests pin down.

Semantics are cited per function. "First non-empty match wins" cascades keep
the reference's selector priority order byte-for-byte.
"""

from __future__ import annotations

import re
from datetime import datetime

from ..functions import htmlsel

SCIENCE_BASE_URL = "https://www.science.org"

# reference: src/config.py:41-48 (SELECTORS)
SEARCH_CARDS_SELECTOR = ".card.pb-3.mb-4.border-bottom"
NEXT_PAGE_SELECTOR = "li.page-item.active + li.page-item > a"

# reference: src/link_collector.py:148-153 — ordered, first non-empty text wins
TITLE_SELECTORS = (
    ".card-header h2.article-title > a",
    "h2.article-title > a",
    ".card-header a",
    "a[data-test='article-title']",
)
# reference: src/link_collector.py:192-197
JOURNAL_SELECTORS = (
    "span.card-meta__item.bullet-left",
    ".card-meta__item",
    ".journal-info",
    "span[data-test='journal']",
)
# reference: src/link_collector.py:214-219
DATE_SELECTORS = (
    "time",
    ".publication-date",
    ".date",
    "span[data-test='date']",
)
# reference: src/link_collector.py:240 — the ONLY author selector
AUTHOR_SELECTOR = ".hlFld-ContribAuthor"

# reference: src/pdf_processor.py:332-342 — 9-selector abstract cascade
ABSTRACT_SELECTORS = (
    "div[role='paragraph']",
    ".abstract p",
    ".summary p",
    "[data-test='abstract'] p",
    "div.abstract",
    "div.summary",
    ".article__body p",
    "section[data-test='abstract'] p",
    "p[data-test='article-summary']",
)

# reference: src/pdf_processor.py:79 — exact PDF-icon selector on detail page
PDF_MAIN_SELECTOR = (
    "#main > div.article-container > article > header > div > "
    "div.info-panel > div.info-panel__right-content > "
    "div.info-panel__formats.info-panel__item > a > i"
)
# reference: src/pdf_processor.py:100-112 — 11 backups, in priority order
PDF_BACKUP_SELECTORS = (
    "i.icon-pdf",
    "#main > div.article-container > article > header > div > "
    "div.info-panel > div.info-panel__right-content > "
    "div.info-panel__formats.info-panel__item > a",
    "a[href*='pdf']",
    "a[data-test='pdf-link']",
    "a[aria-label*='PDF']",
    ".pdf-link",
    "a[title*='PDF']",
    "a.show-pdf",
    "a.pdf-button",
    "a[href*='pdf'][href*='download=true']",
    ".article-action-pdf a",
)

# reference: src/pdf_processor.py:172 — exact download selector on PDF page
DOWNLOAD_MAIN_SELECTOR = "#app-navbar > div.btn-group.navbar-right > div.grouped.right > a"
# reference: src/pdf_processor.py:180-192 — 11 backups, in priority order
DOWNLOAD_BACKUP_SELECTORS = (
    "a[href*='download=true']",
    ".download-button",
    "a[data-test='pdf-download']",
    ".pdf-download-btn",
    "a.article-dl-pdf-link-free",
    "a[title*='Download']",
    "a[aria-label*='Download']",
    "a.c-pdf-download__link",
    "a[data-track-action='download pdf']",
    ".download-links-holder a",
    "a.download-link",
)

_DOI_RE = re.compile(r"/doi/(10\.\d+/[^/]+)")


def complete_url(href: str, base: str = SCIENCE_BASE_URL) -> str:
    """Relative → absolute URL (reference: src/link_collector.py:180,
    src/pdf_processor.py:93,126,135)."""
    return href if href.startswith("http") else base + href


def extract_doi_from_url(url: str):
    """reference: src/link_collector.py:277-284 — regex, None on miss."""
    m = _DOI_RE.search(url)
    return m.group(1) if m else None


def parse_publication_date(date_text: str):
    """reference: src/link_collector.py:286-296 — '%d %b %Y' then '%Y-%m-%d',
    else None. Returns a datetime."""
    s = date_text.strip()
    try:
        return datetime.strptime(s, "%d %b %Y")
    except ValueError:
        try:
            return datetime.strptime(s, "%Y-%m-%d")
        except ValueError:
            return None


def sanitize_filename(filename: str) -> str:
    """reference: src/utils/file_utils.py:16-34 (canonical impl; the variant
    in src/utils.py is shadowed dead code — SURVEY.md §5)."""
    filename = re.sub(r'[<>:"/\\|?*]', "_", filename)
    filename = re.sub(r"\s+", " ", filename).strip()
    if len(filename) > 200:
        filename = filename[:200]
    return filename


def extract_card_info(card, parse_dates: bool = True) -> dict | None:
    """One search-result card → article dict, or None if skipped.

    reference: src/link_collector.py:141-262 (_extract_card_info):
    title cascade first-non-empty (:157-164), skip on missing title (:168-170)
    or missing href (:175-177), URL completion (:180), DOI regex (:186),
    default journal 'Science' (:187), journal cascade (:200-208), date cascade
    (:222-231), authors via the single selector, empties dropped (:240-242),
    'authors' key only when non-empty (:246-247).
    """
    title_elem = None
    for selector in TITLE_SELECTORS:
        el = htmlsel.find_element(card, selector)
        if el is not None and el.text:
            title_elem = el
            break
    if title_elem is None:
        return None
    title = title_elem.text
    detail_href = title_elem.get_attribute("href")
    if not detail_href:
        return None
    detail_url = complete_url(detail_href)

    info = {
        "title": title,
        "url": detail_url,
        "doi": extract_doi_from_url(detail_url),
        "journal": "Science",
    }
    for selector in JOURNAL_SELECTORS:
        el = htmlsel.find_element(card, selector)
        if el is not None and el.text:
            info["journal"] = el.text
            break
    for selector in DATE_SELECTORS:
        el = htmlsel.find_element(card, selector)
        if el is not None and el.text:
            if parse_dates:
                info["publication_date"] = parse_publication_date(el.text)
            else:
                # Spark path: raw date text out, parsing stays JVM-side
                # (scalars.parse_publication_date) — equivalence unit-tested.
                info["date_text"] = el.text
            break
    authors = [e.text for e in htmlsel.find_elements(card, AUTHOR_SELECTOR) if e.text]
    if authors:
        info["authors"] = authors
    return info


def extract_cards(html, parse_dates: bool = True) -> list[dict]:
    """One search page → ordered card dicts (document order, skips preserved).

    reference: src/link_collector.py:89-139 (_collect_page_links): cards via
    SEARCH_CARDS_SELECTOR (:98), per-card extraction in enumerate order
    (:108), None results dropped (:113-114).
    """
    root = htmlsel.parse_html(html)
    out = []
    for card in htmlsel.find_elements(root, SEARCH_CARDS_SELECTOR):
        info = extract_card_info(card, parse_dates=parse_dates)
        if info is not None:
            out.append(info)
    return out


def has_next_page(html) -> bool:
    """reference: src/link_collector.py:264-275 (_go_to_next_page)."""
    root = htmlsel.parse_html(html)
    return htmlsel.find_element(root, NEXT_PAGE_SELECTOR) is not None


def extract_abstract(root) -> str | None:
    """reference: src/pdf_processor.py:327-359 — 9-selector cascade,
    first non-empty text wins."""
    for selector in ABSTRACT_SELECTORS:
        el = htmlsel.find_element(root, selector)
        if el is not None and el.text:
            return el.text
    return None


def _ancestor_anchor(el):
    p = el.parent
    while p is not None:
        if p.tag == "a":
            return p
        p = p.parent
    return None


def find_pdf_page_url(root) -> str | None:
    """Detail page → PDF-viewer URL.

    reference: src/pdf_processor.py:73-166: exact icon selector then parent
    <a> (:84-95); backups in order — 'i.icon-pdf' walks find_elements and
    takes the first icon whose ancestor <a> has an href (:118-130), other
    backups take the element's own href (:131-137); fallback scans ALL <a>
    for 'pdf'/'epdf' substring in lowercased href, first in document order
    (:145-160; note 'epdf' contains 'pdf' so the second test is redundant —
    preserved semantics, not preserved code).
    """
    icon = htmlsel.find_element(root, PDF_MAIN_SELECTOR)
    if icon is not None:
        parent_a = _ancestor_anchor(icon)
        if parent_a is not None:
            href = parent_a.get_attribute("href")
            if href:
                return complete_url(href)
    for selector in PDF_BACKUP_SELECTORS:
        if selector == "i.icon-pdf":
            for ic in htmlsel.find_elements(root, selector):
                a = _ancestor_anchor(ic)
                if a is not None:
                    href = a.get_attribute("href")
                    if href:
                        return complete_url(href)
        else:
            el = htmlsel.find_element(root, selector)
            if el is not None:
                href = el.get_attribute("href")
                if href:
                    return complete_url(href)
    for a in htmlsel.find_elements(root, "a"):
        href = a.get_attribute("href")
        if href and "pdf" in href.lower():
            return href  # fallback returns the raw href (reference :156)
    return None


KEYWORD_SELECTORS = ["ul.article-keywords li a", ".keywords-section span.keyword"]


def extract_keywords(root) -> list | None:
    """Detail page → subject-term keywords (document order), None if absent.

    The reference's catalog schema and keyword search include a ``keywords``
    column (src/database_manager.py:51,157-162) that its golden 1.csv
    carries as comma-joined subject terms, but its science extractor never
    populates it — this cascade (Nature-style subject-list markup) closes
    that gap on the engine side."""
    for selector in KEYWORD_SELECTORS:
        els = htmlsel.find_elements(root, selector)
        vals = [e.text for e in els if e.text]
        if vals:
            return vals
    return None


def extract_detail(html) -> dict:
    """One detail page → {'abstract', 'pdf_page_url', 'keywords'}."""
    root = htmlsel.parse_html(html)
    return {
        "abstract": extract_abstract(root),
        "pdf_page_url": find_pdf_page_url(root),
        "keywords": extract_keywords(root),
    }


def find_download_link(html) -> str | None:
    """PDF-viewer page → final download href.

    reference: src/pdf_processor.py:168-208: exact selector's own href
    (:172-177), else 11 backups in order, first with any href (:194-202).
    Hrefs returned raw (the reference does not complete them here).
    """
    root = htmlsel.parse_html(html)
    el = htmlsel.find_element(root, DOWNLOAD_MAIN_SELECTOR)
    if el is not None:
        href = el.get_attribute("href")
        if href:
            return href
    for selector in DOWNLOAD_BACKUP_SELECTORS:
        el = htmlsel.find_element(root, selector)
        if el is not None:
            href = el.get_attribute("href")
            if href:
                return href
    return None


def validate_pdf_content(content: bytes | None, content_type: str | None, status: int) -> bool:
    """Fetched payload → is-valid-PDF predicate.

    reference: src/pdf_processor.py:266-302 and src/utils/download_utils.py:48-84:
    status must be 200; content-type pdf/octet-stream passes, otherwise the
    first bytes must contain %PDF within the first 10; files <1000 bytes must
    also carry the magic in their first 10 bytes.
    """
    if status != 200 or content is None:
        return False
    ct = (content_type or "").lower()
    if not ("application/pdf" in ct or "octet-stream" in ct):
        if b"%PDF" not in content[:10]:
            return False
    if len(content) < 1000 and b"%PDF" not in content[:10]:
        return False
    return True


# reference: src/utils/driver_utils.py:124-154 — captcha/abnormal keyword scan
ABNORMAL_KEYWORDS = (
    "captcha", "cloudflare", "verify", "robot", "unusual traffic",
    "access denied", "blocked",
)


def is_page_abnormal(html) -> bool:
    """Keyword scan of title+body text (reference: src/utils/driver_utils.py:124-154)."""
    root = htmlsel.parse_html(html)
    text = root.text.lower()
    return any(k in text for k in ABNORMAL_KEYWORDS)


def is_page_normal(html) -> bool:
    """Any-of readiness probe (reference: src/utils/driver_utils.py:66-122):
    ≥1 search card, or a title link, or a PDF icon, or a download button, or
    body text >100 chars."""
    root = htmlsel.parse_html(html)
    if htmlsel.find_element(root, SEARCH_CARDS_SELECTOR) is not None:
        return True
    if htmlsel.find_element(root, TITLE_SELECTORS[0]) is not None:
        return True
    if htmlsel.find_element(root, "i.icon-pdf") is not None:
        return True
    if htmlsel.find_element(root, DOWNLOAD_MAIN_SELECTOR) is not None:
        return True
    body = htmlsel.find_element(root, "body")
    return body is not None and len(body.text) > 100
