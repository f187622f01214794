"""sitemap.py: urlset parsing, index following over a pages corpus,
malformed-entry tolerance, and the lastmod recrawl filter."""

from pyspark.sql import functions as F

from s_crawler_spark.operators import sitemap as sm

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      https://a.org/p1
    </loc>
    <lastmod>2024-03-05</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.org/p2</loc></url>
  <url><loc>https://a.org/p3</loc><priority>bogus</priority></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>https://a.org/sitemap1.xml</loc></sitemap>
  <sitemap><loc>https://a.org/sitemap-missing.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset(spark):
    df = spark.createDataFrame([("https://a.org/sitemap.xml", URLSET)],
                               "url string, xml string")
    rows = {r["pos"]: r.asDict() for r in sm.parse_sitemaps(df).collect()}
    # entry 3 has no <loc> -> dropped; whitespace around loc is trimmed
    assert set(rows) == {0, 1, 2}
    assert rows[0]["seed_url"] == "https://a.org/p1"
    assert rows[0]["lastmod"] == "2024-03-05"
    assert rows[0]["priority_bp"] == 8000
    assert rows[1]["lastmod"] is None and rows[1]["priority_bp"] is None
    assert rows[2]["priority_bp"] is None  # bogus priority -> NULL, not a crash


def test_ingest_follows_index(spark):
    pages = spark.createDataFrame(
        [("https://a.org/sitemap.xml", INDEX.encode()),
         ("https://a.org/sitemap1.xml", URLSET.encode()),
         ("https://a.org/p1", b"<html>not a sitemap</html>")],
        "url string, html binary")
    got = sm.ingest_sitemaps(pages)
    seeds = {(r["sitemap_url"], r["seed_url"]) for r in got.collect()}
    # the index file itself yields no <url> entries; its child (joined back
    # onto the corpus) yields all three; the missing child is just absent
    assert seeds == {("https://a.org/sitemap1.xml", u)
                     for u in ("https://a.org/p1", "https://a.org/p2",
                               "https://a.org/p3")}


def test_filter_modified_since(spark):
    df = spark.createDataFrame(
        [("s", 0, "u1", "2024-03-05", None),
         ("s", 1, "u2", "2023-01-01", None),
         ("s", 2, "u3", None, None),
         ("s", 3, "u4", "not-a-date", None)],
        "sitemap_url string, pos int, seed_url string, lastmod string, "
        "priority_bp int")
    got = {r["seed_url"]
           for r in sm.filter_modified_since(df, "2024-01-01 00:00:00").collect()}
    # newer kept, older dropped, unknown/unparseable conservatively kept
    assert got == {"u1", "u3", "u4"}


def test_ingest_no_double_parse(spark):
    """A child sitemap whose URL also matches the top-level scan pattern
    must yield its entries exactly once."""
    pages = spark.createDataFrame(
        [("https://a.org/sitemap.xml", INDEX.encode()),
         ("https://a.org/sitemap1.xml", URLSET.encode())],
        "url string, html binary")
    got = sm.ingest_sitemaps(pages).collect()
    assert len(got) == 3  # three entries, not six
