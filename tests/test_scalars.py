"""Column-expression kernels ≡ pure-Python twins (the JVM/Python seam)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from s_crawler_spark.functions import scalars
from s_crawler_spark.operators import extract_core as ec


def col_eval(spark, colfn, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {in_type}")
    return [r["out"] for r in df.select(colfn(F.col("v")).alias("out")).collect()]


def test_sanitize_filename_matches_python(spark):
    vals = ['Test/File:Name*with?special<chars>', "  a   b\t\nc ", "中文 标题",
            "x" * 300, "", 'a<>:"/\\|?*b', " \t "]
    got = col_eval(spark, scalars.sanitize_filename, vals)
    assert got == [ec.sanitize_filename(v) for v in vals]


def test_doi_extraction_matches_python(spark):
    vals = ["https://www.science.org/doi/10.1126/science.abc",
            "https://x.org/doi/10.1126/sci.1/extra", "https://x.org/nodoi",
            "/doi/11.1126/x", "/doi/10.99/z?q=1"]
    got = col_eval(spark, scalars.extract_doi_from_url, vals)
    assert got == [ec.extract_doi_from_url(v) for v in vals]


def test_date_parse_matches_python(spark):
    vals = ["10 Aug 2023", " 01 Jan 2010 ", "2023-01-01", "Vol 381", "28 Feb 2011"]
    got = col_eval(spark, scalars.parse_publication_date, vals)
    assert got == [ec.parse_publication_date(v) for v in vals]


def test_url_completion(spark):
    vals = ["/doi/10.1/x", "https://a.b/c", "http://a.b/c"]
    got = col_eval(spark, scalars.complete_url, vals)
    assert got == [ec.complete_url(v) for v in vals]


def test_authors_csv_roundtrip(spark):
    df = spark.createDataFrame([(["A One", "B Two"],), ([],)], schema="v array<string>")
    out = df.select(scalars.authors_to_csv(F.col("v")).alias("out")).collect()
    assert out[0]["out"] == "A One, B Two"
    assert out[1]["out"] is None  # reference inserts NULL for falsy lists
    back = spark.createDataFrame([("A One, B Two",)], schema="v string") \
        .select(scalars.csv_to_authors(F.col("v")).alias("out")).collect()
    assert back[0]["out"] == ["A One", "B Two"]


def test_format_file_size(spark):
    # reference: round(size/1024^i, 2), names B/KB/MB/GB/TB
    vals = [0, 500, 1024, 1536, 1048576, 5 * 1024**3]
    got = col_eval(spark, scalars.format_file_size, vals, in_type="long")
    assert got == ["0 B", "500.0 B", "1.0 KB", "1.5 KB", "1.0 MB", "5.0 GB"]


def test_filename_from_url_and_pdf_url(spark):
    vals = ["https://a.b/p/file.pdf?x=1", "https://a.b/", "https://a.b/dir/epdf/x"]
    got = col_eval(spark, scalars.filename_from_url, vals)
    assert got == ["file.pdf", "download.pdf", "x"]
    valid = col_eval(spark, scalars.is_valid_pdf_url, vals)
    assert valid == [True, False, True]


def test_safe_title_50(spark):
    vals = ["A (nice) title! with-stuff_and 中文 chars", "x" * 80]
    got = col_eval(spark, scalars.safe_title_50, vals)
    assert got[0] == "A nice title with-stuff_and  chars"
    assert got[1] == "x" * 50


def test_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), (["a"], ["a"]), ([], [])],
        schema="a array<string>, b array<string>")
    out = [r["j"] for r in df.select(
        scalars.jaccard_tokens(F.col("a"), F.col("b")).alias("j")).collect()]
    assert out[0] == pytest.approx(2 / 4)
    assert out[1] == 1.0
    assert out[2] == 0.0


def test_backoff_next_eligible(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), 1), (datetime(2024, 1, 1), 3)], "ts timestamp, k int")
    out = df.select(scalars.backoff_next_eligible(F.col("ts"), F.col("k")).alias("e")).collect()
    assert out[0]["e"] == datetime(2024, 1, 1, 0, 0, 2)   # +2^1
    assert out[1]["e"] == datetime(2024, 1, 1, 0, 0, 8)   # +2^3


def test_truncate_error(spark):
    got = col_eval(spark, scalars.truncate_error, ["e" * 1500])
    assert got == ["e" * 1000]


def test_cookie_map(spark):
    got = col_eval(spark, scalars.cookie_str_to_map, ["a=1; b=2;c=x=y"])
    assert got[0] == {"a": "1", "b": "2", "c": "x=y"}


def test_canonicalize_url(spark):
    from s_crawler_spark.functions.scalars import canonicalize_url
    cases = [
        ("HTTP://Example.COM:80/Path?z=1&a=2#frag",
         "http://example.com/Path?a=2&z=1"),
        ("https://h.org:443", "https://h.org/"),
        ("https://h.org:8443/x", "https://h.org:8443/x"),  # non-default kept
        ("http://h.org/p", "http://h.org/p"),              # already canonical
        ("https://h.org/p#a?b=1", "https://h.org/p"),      # '?' inside fragment
        ("https://UserTOK@Host.ORG:443/p",                 # userinfo keeps case
         "https://UserTOK@host.org/p"),
        ("mailto:x@y.z", "mailto:x@y.z"),                  # non-hierarchical
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [c[1] for c in cases]


def test_canonicalize_url_differential(spark):
    """300 generated URLs vs an independent Python normalizer written from
    the RFC (urllib-split based, shares no code or regex with the kernel)."""
    import random
    from urllib.parse import urlsplit

    def py_canon(u):
        try:
            s = urlsplit(u)
        except ValueError:
            return u
        if not s.scheme or "://" not in u:
            return u
        scheme = s.scheme.lower()
        if "@" in s.netloc:  # only scheme and host are case-insensitive
            ui, hp = s.netloc.rsplit("@", 1)
            auth = ui + "@" + hp.lower()
        else:
            auth = s.netloc.lower()
        if scheme == "http" and auth.endswith(":80"):
            auth = auth[:-3]
        elif scheme == "https" and auth.endswith(":443"):
            auth = auth[:-4]
        path = s.path or "/"
        q = "&".join(sorted(s.query.split("&"))) if s.query else ""
        return scheme + "://" + auth + path + ("?" + q if s.query else "")

    rng = random.Random(1234)
    cases = []
    for _ in range(300):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "hTtPs"])
        user = rng.choice(["", "", "", "Tok@", "uS3r:Pw@"])
        host = user + rng.choice(["a.org", "A.ORG", "sub.Ex-ample.com", "X9.net"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/p", "/a/b.html", "/Mixed/Case"])
        nq = rng.randint(0, 3)
        params = [f"{rng.choice('abcz')}={rng.randint(0, 99)}"
                  for _ in range(nq)]
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#f", "#a?x=1"])
        cases.append(scheme + "://" + host + port + path + query + frag)
    from s_crawler_spark.functions.scalars import canonicalize_url
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    exp = [py_canon(c) for c in cases]
    assert got == exp
