"""Sequential simulator of the reference crawler's control flow — the parity
oracle (SURVEY.md §7 Phase 6).

Re-implements the reference's *orchestration* exactly, one page at a time,
using the same pure extraction kernels as the distributed engine
(operators/extract_core.py). Because the kernels are shared, any divergence
between this simulator and the Spark wave job isolates an orchestration bug
(ordering, dedup, truncation, link resolution) — which is precisely the
invariant the north rule pins: "matching the reference's crawl ordering and
URL-seen set under the same seed list".

Control flow mirrored:

- paginated collection until MAX_COUNT or no next page
  (reference src/link_collector.py:27-77)
- cards in document order, skips preserved (:108-114)
- inline first-occurrence DOI dedup against the seen set (:49-55)
- truncation to MAX_COUNT *after* dedup, prefix order preserved (:56-57,66-68)
- strictly sequential fetch: detail → viewer → payload per article
  (reference src/driver_manager.py:49-66, src/pdf_processor.py:16-68)
- tiered insert dedup DOI → MD5 → title (reference src/database_manager.py:28-46)

Runs on a dict {url: html_bytes} — i.e. the corpus collected to the driver —
so it is only usable at test scale, by design.
"""

from __future__ import annotations

import hashlib

from ..operators import extract_core as ec


def simulate_crawl(pages: dict[str, bytes], seed_url: str, max_count: int,
                   db_dois: set[str] | None = None):
    """Run one full reference-style crawl wave. Returns (articles, seen_dois):
    ``articles`` is the ordered list of stored article dicts (crawl order ==
    list order) and ``seen_dois`` the final stored-DOI set.

    Fidelity note: the collection-time DOI check (reference
    src/link_collector.py:49-55) probes the *database*, whose state during
    collection is the pre-run catalog (``db_dois`` = prior waves) — within-run
    duplicates across search pages therefore survive collection, count toward
    MAX_COUNT, are fetched, and are only dropped by the tiered dedup at insert
    time (reference src/database_manager.py:28-46, storage is per-article
    immediate, science_crawler_main.py:241-249).
    """
    db_dois = set(db_dois or ())
    # --- phase 1: collect links (reference science_crawler_main.py:80-81) ---
    links: list[dict] = []
    url = seed_url
    while True:
        html = pages.get(url)
        if html is None:
            break
        page_links = ec.extract_cards(html)
        for article in page_links:
            doi = article.get("doi")
            if doi and doi in db_dois:
                continue
            links.append(article)
            if len(links) >= max_count:
                break
        if len(links) >= max_count:
            links = links[:max_count]
            break
        if not ec.has_next_page(html):
            break
        # next page URL: the reference clicks the pager; we follow its href
        root = ec.htmlsel.parse_html(html)
        nxt = ec.htmlsel.find_element(root, ec.NEXT_PAGE_SELECTOR)
        href = nxt.get_attribute("href") if nxt is not None else None
        if not href:
            break
        url = ec.complete_url(href)

    # --- phase 2: sequential fetch/parse/store loop ---
    articles: list[dict] = []
    stored_dois: set[str] = set(db_dois)
    stored_md5: set[str] = set()
    stored_titles: set[str] = set()
    for info in links:
        detail_html = pages.get(info["url"])
        if detail_html is None:
            continue
        detail = ec.extract_detail(detail_html)
        pdf_page_url = detail["pdf_page_url"]
        if not pdf_page_url:
            continue
        viewer_html = pages.get(pdf_page_url)
        if viewer_html is None:
            continue
        download_link = ec.find_download_link(viewer_html)
        if not download_link:
            continue
        payload = pages.get(download_link)
        ok = payload is not None and ec.validate_pdf_content(payload, "application/octet-stream", 200)
        md5 = hashlib.md5(payload).hexdigest() if ok else None

        rec = {
            "title": info["title"],
            "url": info["url"],
            "doi": info.get("doi"),
            "journal": info.get("journal"),
            "publication_date": info.get("publication_date"),
            "authors": info.get("authors", []),
            "abstract": detail.get("abstract"),
            "keywords": detail.get("keywords"),
            "pdf_page_url": pdf_page_url,
            "download_link": download_link,
            "downloaded": bool(ok),
            "content_md5": md5,
        }
        # tiered insert dedup (reference src/database_manager.py:28-46)
        if rec["doi"]:
            if rec["doi"] in stored_dois:
                continue
            stored_dois.add(rec["doi"])
        elif rec["content_md5"]:
            if rec["content_md5"] in stored_md5:
                continue
            stored_md5.add(rec["content_md5"])
        elif rec["title"]:
            if rec["title"] in stored_titles:
                continue
            stored_titles.add(rec["title"])
        articles.append(rec)
    return articles, stored_dois
