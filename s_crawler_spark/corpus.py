"""Deterministic synthetic crawl corpus (the ``pages`` table).

Shape per BASELINE.json ``input_hint``:
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

The corpus is derived 1:1 from the driver-provided ``documents`` parquet
(``doc_id, text, lang, source, n_chars``) by pure arithmetic on ``doc_id`` and
string ops on ``text`` — so every value the crawl engine extracts back out of
the HTML is independently reconstructible in ANSI SQL (DuckDB oracle). No
randomness, no wall-clock, no external data.

Each document becomes one article with four page rows:

1. its slot in a paginated search page (20 cards/page, science.org-shaped
   card markup — selectors per reference src/config.py:41-48),
2. a detail page (abstract + PDF-icon anchor, reference src/pdf_processor.py:79,332-342),
3. a PDF-viewer page (download anchor, reference src/pdf_processor.py:172),
4. the PDF payload itself (binary, ``%PDF`` magic).

Deliberate shape choices that exercise the engine:

- **Zipfian host skew**: 70% of articles live on ``www.science.org``, the rest
  on 5 mirror hosts — exercises the salted/capped frontier (SURVEY.md §2.9).
- **Selector-cascade coverage**: card/detail/viewer markup rotates through the
  primary + backup selector variants by ``doc_id % k`` — every cascade branch
  of the reference extractor is hit (reference src/link_collector.py:148-240).
- **Duplicates**: each search page after the first re-lists the previous
  page's last 3 cards — first-occurrence dedup is load-bearing (reference
  src/link_collector.py:49-55).
- **Broken cards**: even pages carry one card with no title (skipped,
  reference src/link_collector.py:168-170).
- **Relative + absolute hrefs**: main-host cards use relative hrefs (URL
  completion path, reference src/link_collector.py:180), mirrors absolute.
- **Unparseable dates**: ``doc_id % 7 == 6`` gets a garbage date → NULL
  (reference src/link_collector.py:286-296).

Scale note: generation is two Arrow-batched passes over ``documents``
(``mapInPandas`` for per-doc pages, ``applyInPandas`` per search page) — fully
distributed, no driver-side loop; at 10^10 URLs the same generator runs as a
one-off Spark job writing the corpus table.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

CARDS_PER_PAGE = 20
DUP_CARRYOVER = 3  # cards of page p-1 re-listed at the head of page p

# subject-term vocabulary for article keywords (golden 1.csv carries
# comma-joined subject terms in its keywords column; 'turnkey synthesis'
# deliberately contains the contract search term 'key')
SUBJECTS = ["Photochemistry", "Electrocatalysis", "turnkey synthesis",
            "Materials chemistry", "Liquid crystals", "Polymer physics",
            "Quantum chemistry"]
BASE_TS = datetime(2024, 1, 1)
SEARCH_URL_FMT = "https://www.science.org/action/doSearch?query=scrawl&startPage={p}"


# --------------------------------------------------------------------------
# Pure per-document derivations (the ground truth the oracle SQL replicates)
# --------------------------------------------------------------------------

def derive_doc(doc_id: int, text: str, lang: str) -> dict:
    """All derived attributes for one document. Pure arithmetic/string ops —
    mirrored exactly by the SQL fragments in plans/oracles.py."""
    words = text.split(" ")
    doi = f"10.1126/scrawl.{doc_id}"
    title = f"Study {doc_id}: " + " ".join(words[:6])
    is_main_host = doc_id % 10 < 7
    host = "www.science.org" if is_main_host else f"mirror{doc_id % 5}.science.org"
    detail_path = f"/doi/{doi}"
    detail_url = f"https://{host}{detail_path}"
    # date text rotates: 4/7 'dd MMM yyyy', 2/7 ISO, 1/7 garbage → NULL
    dv = doc_id % 7
    if dv <= 3:
        day = 10 + doc_id % 18
        month = doc_id % 12 + 1
        year = 2010 + doc_id % 15
        date_text = f"{day:02d} {MONTHS[month - 1]} {year}"
        pub_date = datetime(year, month, day)
    elif dv <= 5:
        day = doc_id % 28 + 1
        month = doc_id % 12 + 1
        year = 2010 + doc_id % 15
        date_text = f"{year:04d}-{month:02d}-{day:02d}"
        pub_date = datetime(year, month, day)
    else:
        date_text = f"Vol {doc_id}"
        pub_date = None
    n_auth = doc_id % 4
    authors = [f"Author {doc_id}{'ABC'[i]}" for i in range(n_auth)]
    journal = "Science Advances" if doc_id % 3 == 0 else "Science"
    has_journal_span = doc_id % 3 == 0  # absent span → default 'Science'
    abstract = f"Abstract {doc_id}. " + " ".join(words[:12])
    # 0/1/2 keywords; two distinct vocabulary picks (indices never collide)
    k1 = doc_id % 7
    k2 = (k1 + 1 + doc_id % 6) % 7
    keywords = [SUBJECTS[k1], SUBJECTS[k2]][:doc_id % 3]
    pdf_page_url = f"https://www.science.org/doi/epdf/{doi}"
    download_url = f"https://www.science.org/doi/pdf/{doi}?download=true"
    payload = (f"%PDF-1.4\nscrawl {doi} " + "x" * (doc_id % 1500)).encode("ascii")
    return {
        "doc_id": doc_id,
        "lang": lang,
        "doi": doi,
        "title": title,
        "host": host,
        "is_main_host": is_main_host,
        "detail_href": detail_path if is_main_host else detail_url,
        "detail_url": detail_url,
        "date_text": date_text,
        "pub_date": pub_date,
        "authors": authors,
        "journal": journal,
        "has_journal_span": has_journal_span,
        "abstract": abstract,
        "keywords": keywords,
        "pdf_page_url": pdf_page_url,
        "download_url": download_url,
        "payload": payload,
        "content_md5": hashlib.md5(payload).hexdigest(),
        "page_num": doc_id // CARDS_PER_PAGE,
    }


# --------------------------------------------------------------------------
# HTML renderers (science.org-shaped markup; selectors per the reference)
# --------------------------------------------------------------------------

def render_filler(d: dict, n_spans: int) -> str:
    """Deterministic inert ballast: related-reading spans that match none of
    the extraction selectors (no card/abstract/pdf/download markup, no 'pdf'
    hrefs). Real Common-Crawl pages are 10-100 KB of mostly-irrelevant DOM;
    this lets the bench corpus reproduce that parse load (BENCH_WEIGHT) while
    keeping every extracted value byte-identical."""
    if n_spans <= 0:
        return ""
    words = (d["title"] + " " + d["abstract"]).split(" ")
    spans = "".join(
        f'<span class="rr-item">{words[i % len(words)]} {i}</span>'
        for i in range(n_spans))
    return f'<div class="related-reading">{spans}</div>'


def render_card(d: dict) -> str:
    href, title = d["detail_href"], d["title"]
    v = d["doc_id"] % 4
    if v == 0:
        t = (f'<div class="card-header"><h2 class="article-title">'
             f'<a href="{href}">{title}</a></h2></div>')
    elif v == 1:
        t = f'<h2 class="article-title"><a href="{href}">{title}</a></h2>'
    elif v == 2:
        t = f'<div class="card-header"><a href="{href}">{title}</a></div>'
    else:
        t = f'<a data-test="article-title" href="{href}">{title}</a>'
    journal = (f'<span class="card-meta__item bullet-left">{d["journal"]}</span>'
               if d["has_journal_span"] else "")
    date = f'<time>{d["date_text"]}</time>'
    authors = "".join(
        f'<span class="hlFld-ContribAuthor">{a}</span>' for a in d["authors"]
    )
    return (f'<div class="card pb-3 mb-4 border-bottom">{t}{journal}{date}'
            f'<div class="card-authors">{authors}</div></div>')


BROKEN_CARD = ('<div class="card pb-3 mb-4 border-bottom">'
               '<div class="card-header"></div><time>01 Jan 2020</time></div>')


def render_search_page(page_num: int, cards_html: list[str], has_next: bool,
                       filler_html: str = "") -> str:
    cards = list(cards_html)
    if page_num % 2 == 0:
        cards.insert(0, BROKEN_CARD)
    cards.append(filler_html)
    pager = ('<ul class="pagination"><li class="page-item active"><a>cur</a></li>'
             + (f'<li class="page-item"><a href="{SEARCH_URL_FMT.format(p=page_num + 1)}">next</a></li>'
                if has_next else "")
             + "</ul>")
    return ("<html><body><div class='search-results'>"
            + "".join(cards) + pager + "</div></body></html>")


def render_detail_page(d: dict, filler: int = 0) -> str:
    v = d["doc_id"] % 3
    if v == 0:
        abstract = f'<div role="paragraph">{d["abstract"]}</div>'
    elif v == 1:
        abstract = f'<div class="abstract">{d["abstract"]}</div>'
    else:
        abstract = f'<div class="article__body"><p>{d["abstract"]}</p></div>'
    epdf_href = f"/doi/epdf/{d['doi']}"
    pv = d["doc_id"] % 4
    if pv in (0, 2):
        pdf = ('<div id="main"><div class="article-container"><article><header><div>'
               '<div class="info-panel"><div class="info-panel__right-content">'
               '<div class="info-panel__formats info-panel__item">'
               f'<a href="{epdf_href}"><i class="icon-pdf"></i></a>'
               "</div></div></div></div></header></article></div></div>")
    elif pv == 1:
        pdf = f'<a href="{epdf_href}"><i class="icon-pdf"></i></a>'
    else:
        pdf = f'<a class="pdf-link" href="{epdf_href}">PDF</a>'
    # subject-terms block (two markup variants exercise the extractor
    # cascade; Nature-style subject list shape, golden 1.csv keywords col)
    if d["keywords"]:
        if d["doc_id"] % 2 == 0:
            kw = ('<ul class="article-keywords">'
                  + "".join(f'<li><a href="/subjects/{i}">{k}</a></li>'
                            for i, k in enumerate(d["keywords"]))
                  + "</ul>")
        else:
            kw = ('<div class="keywords-section">'
                  + "".join(f'<span class="keyword">{k}</span>'
                            for k in d["keywords"])
                  + "</div>")
    else:
        kw = ""
    return (f"<html><body><h1>{d['title']}</h1>{abstract}{pdf}{kw}"
            f"{render_filler(d, filler)}</body></html>")


def render_viewer_page(d: dict) -> str:
    dl = d["download_url"]
    if d["doc_id"] % 5 != 2:
        body = ('<nav id="app-navbar"><div class="btn-group navbar-right">'
                '<div class="grouped right">'
                f'<a href="{dl}"><span class="icon material-icons">download</span></a>'
                "</div></div></nav>")
    else:
        body = f'<a href="{dl}">Download</a>'
    return f"<html><body>{body}<div class='viewer'>PDF viewer</div></body></html>"


# --------------------------------------------------------------------------
# Distributed generation
# --------------------------------------------------------------------------

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def _make_doc_pages_kernel(filler: int):
    """mapInPandas kernel factory: one document → detail + viewer + payload
    rows (closure carries only the plain int, never a DataFrame)."""
    def kernel(batches):
        for pdf_batch in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}

            def emit(url, ts, html, text, lang):
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html if isinstance(html, bytes) else html.encode("utf-8"))
                rows["text"].append(text)
                rows["lang"].append(lang)

            for doc_id, text, lang in zip(pdf_batch["doc_id"], pdf_batch["text"], pdf_batch["lang"]):
                d = derive_doc(int(doc_id), text, lang)
                ts = BASE_TS + timedelta(seconds=int(doc_id))
                emit(d["detail_url"], ts, render_detail_page(d, filler=filler),
                     f"{d['title']} {d['abstract']}", lang)
                emit(d["pdf_page_url"], ts, render_viewer_page(d), "PDF viewer", "en")
                emit(d["download_url"], ts, d["payload"], None, None)
            yield pd.DataFrame(rows)
    return kernel


def _make_search_page_kernel(filler: int):
    """applyInPandas kernel factory: one search page from its (own +
    carried-over) cards."""
    def kernel(key, pdf_group: pd.DataFrame) -> pd.DataFrame:
        page_num = int(key[0])
        g = pdf_group.sort_values(["role", "doc_id"])
        derived = [derive_doc(int(r.doc_id), r.text, r.lang)
                   for r in g.itertuples()]
        cards = [render_card(d) for d in derived]
        filler_html = render_filler(derived[0], filler) if derived else ""
        has_next = bool(g["has_next"].iloc[0])
        html = render_search_page(page_num, cards, has_next, filler_html)
        return pd.DataFrame({
            "url": [SEARCH_URL_FMT.format(p=page_num)],
            "warc_ts": [BASE_TS + timedelta(seconds=page_num)],
            "html": [html.encode("utf-8")],
            "text": ["search results"],
            "lang": ["en"],
        })
    return kernel


def synthesize_pages(spark: SparkSession, sf_dir: str,
                     docs_limit: int | None = None,
                     filler: int = 0) -> DataFrame:
    """Build the ``pages`` corpus DataFrame from ``{sf_dir}/documents.parquet``.

    ``filler`` adds that many inert DOM spans per detail/search page
    (render_filler) — extracted values are unchanged; parse cost grows to
    Common-Crawl-realistic page weights for benchmarking."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    if docs_limit is not None:
        docs = docs.filter(F.col("doc_id") < docs_limit)

    doc_pages = docs.mapInPandas(_make_doc_pages_kernel(filler), schema=PAGES_SCHEMA)

    n_docs_df = docs.agg(F.max("doc_id").alias("mx"))
    max_doc = n_docs_df.collect()[0]["mx"]
    last_page = max_doc // CARDS_PER_PAGE

    own = docs.select(
        (F.col("doc_id") / CARDS_PER_PAGE).cast("int").alias("page_num"),
        F.lit(1).alias("role"), "doc_id", "text", "lang",
    )
    # last DUP_CARRYOVER cards of page p also appear (first) on page p+1
    dup = docs.filter(
        (F.col("doc_id") % CARDS_PER_PAGE >= CARDS_PER_PAGE - DUP_CARRYOVER)
        & ((F.col("doc_id") / CARDS_PER_PAGE).cast("int") < F.lit(last_page))
    ).select(
        ((F.col("doc_id") / CARDS_PER_PAGE).cast("int") + 1).alias("page_num"),
        F.lit(0).alias("role"), "doc_id", "text", "lang",
    )
    assigned = own.unionByName(dup).withColumn(
        "has_next", F.col("page_num") < F.lit(last_page)
    )
    search_pages = assigned.groupBy("page_num").applyInPandas(
        _make_search_page_kernel(filler), schema=PAGES_SCHEMA
    )
    return doc_pages.unionByName(search_pages) \
        .unionByName(_robots_pages(spark))


ALL_HOSTS = ["www.science.org"] + [f"mirror{i}.science.org" for i in range(5)]

# Per-host robots.txt bodies (CRLF, like real servers): Crawl-delay 1 s —
# the politeness budget the wave scheduler materializes — plus a Disallow
# prefix that matches no article URL (the rule path is exercised without
# changing the crawlable set).
ROBOTS_BODY = "User-agent: *\r\nCrawl-delay: 1\r\nDisallow: /admin\r\n"


def _robots_pages(spark: SparkSession) -> DataFrame:
    rows = [(f"https://{h}/robots.txt", BASE_TS,
             ROBOTS_BODY.encode("ascii"), ROBOTS_BODY, "en")
            for h in ALL_HOSTS]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def seed_search_url() -> str:
    return SEARCH_URL_FMT.format(p=0)
