"""Sitemap ingestion — seed discovery from sitemap.xml documents.

The reference seeds its crawl from a search-results URL only
(science_crawler_main.py seed list); a production crawler also ingests
/sitemap.xml, the standard (sitemaps.org) bulk seed channel: an
``<urlset>`` of ``<url><loc/><lastmod/><priority/></url>`` entries, or a
``<sitemapindex>`` of child ``<sitemap><loc/></sitemap>`` pointers.

Parsing is JVM-side column expressions only — ``regexp_extract_all`` over
the XML body with an inline ``(?s)`` dotall flag (RE2/Java-compatible, so
the DuckDB oracle runs the same patterns), posexplode for per-entry rows.
Sitemaps are machine-generated and schema-regular, which is what makes a
regex field-extractor correct here (unlike the HTML cascades, which go
through the real tokenizer/selector engine in extract_core).

``priority`` is decoded through DECIMAL(6,4) into integer basis points —
never a float — so cross-engine comparison is exact.

Scale shape: one pages-scan filter (pushed-down url suffix), per-row
regex + explode; no shuffle at all until the caller enqueues. A 50k-URL
sitemap (the spec maximum) explodes to 50k small rows from one page row —
amplification is bounded by the spec, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one <url>…</url> (or <sitemap>…</sitemap>) block; fields within a block.
# These are spliced into SQL string literals (F.expr), whose parser consumes
# one level of backslash escaping — hence \\s, which reaches the regex
# engine as \s.
URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
LOC_RE = r"(?s)<loc>\\s*(.*?)\\s*</loc>"
LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"
PRIORITY_RE = r"<priority>([^<]*)</priority>"


def parse_sitemaps(sitemaps: DataFrame,
                   url_col: str = "url",
                   xml_col: str = "xml") -> DataFrame:
    """(sitemap url, xml) → one row per ``<url>`` entry.

    Returns (sitemap_url, pos, seed_url, lastmod, priority_bp): ``pos`` is
    the entry's 0-based position in its sitemap (the spec's document order
    — crawl-order input), ``lastmod`` the verbatim W3C datetime string
    (NULL when absent), ``priority_bp`` integer basis points of the 0.0-1.0
    priority (NULL when absent; invalid values are NULL via try-cast, not
    task failures).
    """
    blocks = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(F.expr(f"regexp_extract_all({xml_col}, '{URL_BLOCK_RE}', 1)"))
        .alias("pos", "__b"))
    return blocks.select(
        "sitemap_url", "pos",
        F.expr(f"regexp_extract(__b, '{LOC_RE}', 1)").alias("seed_url"),
        F.expr(f"nullif(regexp_extract(__b, '{LASTMOD_RE}', 1), '')")
        .alias("lastmod"),
        F.expr(
            f"cast(try_cast(regexp_extract(__b, '{PRIORITY_RE}', 1) "
            "as decimal(6,4)) * 10000 as int)").alias("priority_bp"),
    ).filter(F.col("seed_url") != "")


def sitemap_index_entries(sitemaps: DataFrame,
                          url_col: str = "url",
                          xml_col: str = "xml") -> DataFrame:
    """``<sitemapindex>`` → (index_url, pos, child_url) pointer rows."""
    return (sitemaps.select(
        F.col(url_col).alias("index_url"),
        F.posexplode(
            F.expr(f"regexp_extract_all({xml_col}, '{INDEX_BLOCK_RE}', 1)"))
        .alias("pos", "__b"))
        .select("index_url", "pos",
                F.expr(f"regexp_extract(__b, '{LOC_RE}', 1)").alias("child_url"))
        .filter(F.col("child_url") != ""))


def ingest_sitemaps(pages: DataFrame, max_depth: int = 2,
                    _checkpoint: bool = True) -> DataFrame:
    """Full ingestion over a pages corpus: every ``*/sitemap*.xml`` page is
    parsed; index files are followed by joining their child pointers back
    onto the corpus (the same semi-join fetch-hop shape as the crawl wave —
    the html column of non-matching pages is never read past the pushed-down
    url filter). Depth is bounded by ``max_depth`` (the spec allows one
    index level; 2 covers index-of-index abuse without unbounded recursion).
    """
    # endswith is the PUSHABLE coarse filter (parquet StringEndsWith reaches
    # the scan; rlike does not push down), the regex is the precise filter
    # applied to the tiny survivor set after it
    sm = (pages.filter(F.col("url").endswith(".xml"))
          .filter(F.col("url").rlike(r"/sitemap[^/]*\.xml$"))
          .select("url", F.col("html").cast("string").alias("xml")))
    out = parse_sitemaps(sm)
    frontier = sm
    parsed = sm.select("url")  # tiny: one row per sitemap document
    for _ in range(max_depth - 1):
        # anti-join against already-parsed sitemaps: a child whose URL also
        # matches the top-level scan pattern must not be parsed twice
        # both sides of the already-parsed anti-join are sitemap-DOCUMENT
        # sized (one row per sitemap file, never page- or URL-entry-sized),
        # so the parsed set broadcasts
        children = (sitemap_index_entries(frontier)
                    .select(F.col("child_url").alias("url")).distinct()
                    .join(F.broadcast(parsed), on="url", how="left_anti"))
        # broadcast the (tiny) child key set explicitly — the same fetch-hop
        # shape as plans/wave.py. Without the hint, an index tree past the
        # auto-broadcast threshold falls back to a sort-merge join that
        # shuffles the whole pages table INCLUDING html, violating the
        # "html never enters an Exchange" invariant (audit-pinned below).
        frontier = (pages.join(F.broadcast(children), on="url", how="leftsemi")
                    .select("url", F.col("html").cast("string").alias("xml")))
        if _checkpoint:
            # two consumers (parse + next depth's pointer scan); lazy
            # checkpoint stops double execution. ``_checkpoint=False`` is
            # the explain_audit seam: checkpoints hide the hop joins from
            # .explain, and the audit must see the whole plan.
            frontier = frontier.localCheckpoint(eager=False)
        out = out.unionByName(parse_sitemaps(frontier))
        parsed = parsed.unionByName(frontier.select("url"))
    return out


def filter_modified_since(seeds: DataFrame, since_ts) -> DataFrame:
    """Seeds whose ``lastmod`` is strictly newer than ``since_ts`` — the
    sitemap-side trigger for recrawl (operators/recrawl.py schedules by
    observed change; lastmod lets the site declare change). Entries with
    no/unparseable lastmod are conservatively kept (unknown ⇒ fetch)."""
    lm = F.expr("try_cast(lastmod as timestamp)")
    return seeds.filter(lm.isNull() | (lm > F.lit(since_ts).cast("timestamp")))
