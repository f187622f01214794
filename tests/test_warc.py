"""WARC source/sink round-trip + crawl-from-WARC parity (sources/warc.py)."""

from pyspark.sql import functions as F

from s_crawler_spark.corpus import seed_search_url
from s_crawler_spark.plans.wave import run_wave
from s_crawler_spark.sources import warc as wc


def test_warc_roundtrip_exact(spark, pages, tmp_path):
    out = str(tmp_path / "segments")
    n = wc.write_warc(pages, out)
    assert n == pages.count()
    back = wc.read_warc(spark, out)
    assert back.count() == n
    a = {(r["url"], r["warc_ts"], bytes(r["html"]))
         for r in pages.select("url", "warc_ts", "html").collect()}
    b = {(r["url"], r["warc_ts"], bytes(r["html"]))
         for r in back.select("url", "warc_ts", "html").collect()}
    assert a == b


def test_crawl_from_warc_matches_parquet_corpus(spark, pages, tmp_path):
    out = str(tmp_path / "segments")
    wc.write_warc(pages, out)
    from_warc = run_wave(wc.read_warc(spark, out), seed_search_url()) \
        .orderBy("seq").collect()
    from_pq = run_wave(pages, seed_search_url()).orderBy("seq").collect()
    assert [(r["seq"], r["doi"], r["content_md5"]) for r in from_warc] == \
           [(r["seq"], r["doi"], r["content_md5"]) for r in from_pq]


def test_parse_warc_payload_containing_magic(tmp_path):
    """Length-driven parsing: a payload containing the record magic must
    not split the stream."""
    from datetime import datetime
    tricky = b"xx WARC/1.0\r\n deceptive " + b"\r\n\r\n" + b"tail"
    blob = (wc.warc_record("https://a/1", datetime(2024, 1, 1), tricky)
            + wc.warc_record("https://a/2", datetime(2024, 1, 2), b"ok"))
    recs = wc.parse_warc(blob)
    assert [(u, p) for u, _, p in recs] == \
        [("https://a/1", tricky), ("https://a/2", b"ok")]


def test_parse_warc_real_world_shapes(tmp_path):
    """Common-Crawl-shaped input: leading warcinfo record (no target URI),
    WARC/1.1 version line, a request-typed record — all skipped by
    Content-Length framing, responses still extracted."""
    from datetime import datetime
    info_body = b"software: test\r\n"
    warcinfo = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
                + f"Content-Length: {len(info_body)}\r\n\r\n".encode()
                + info_body + b"\r\n\r\n")
    req_body = b"GET / HTTP/1.1\r\n"
    request = (b"WARC/1.1\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://a/1\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
               + f"Content-Length: {len(req_body)}\r\n\r\n".encode()
               + req_body + b"\r\n\r\n")
    resp = wc.warc_record("https://a/1", datetime(2024, 1, 1), b"payload")
    resp11 = resp.replace(b"WARC/1.0", b"WARC/1.1", 1)
    recs = wc.parse_warc(warcinfo + request + resp11)
    assert [(u, p) for u, _, p in recs] == [("https://a/1", b"payload")]


def test_parse_warc_malformed_records(tmp_path):
    """Damaged real-world segments must not fail the task or silently drop
    the remainder: a response missing WARC-Date is skipped (its length still
    advances the scan), 'key:value' headers without the space parse, and a
    record with no Content-Length surfaces as trailing_bytes truncation."""
    from datetime import datetime
    dateless_body = b"no date here"
    dateless = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://a/bad\r\n"
                + f"Content-Length: {len(dateless_body)}\r\n\r\n".encode()
                + dateless_body + b"\r\n\r\n")
    tight_body = b"tight"
    tight = (b"WARC/1.0\r\nWARC-Type:response\r\n"        # no space after :
             b"WARC-Target-URI:https://a/tight\r\n"
             b"WARC-Date:2024-01-03T00:00:00Z\r\n"
             + f"Content-Length:{len(tight_body)}\r\n\r\n".encode()
             + tight_body + b"\r\n\r\n")
    ok = wc.warc_record("https://a/ok", datetime(2024, 1, 2), b"fine")
    unframed = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://a/cut\r\n\r\nrest...")
    recs, stats = wc.parse_warc_full(dateless + tight + ok + unframed)
    assert [(u, p) for u, _, p in recs] == \
        [("https://a/tight", tight_body), ("https://a/ok", b"fine")]
    assert stats["n_skipped"] == 1                 # the dateless response
    assert stats["trailing_bytes"] == len(unframed)  # surfaced, not silent


def test_read_warc_stats(spark, pages, tmp_path):
    out = str(tmp_path / "segments")
    n = wc.write_warc(pages, out)
    st = wc.read_warc_stats(spark, out).collect()
    assert sum(r["n_records"] for r in st) == n
    assert all(r["n_skipped"] == 0 and r["trailing_bytes"] == 0 for r in st)


def test_write_warc_removes_stale_segments(spark, pages, tmp_path):
    out = str(tmp_path / "seg")
    wc.write_warc(pages, out)                      # many partitions
    n = wc.write_warc(pages.coalesce(1), out)      # rerun with 1 partition
    assert wc.read_warc(spark, out).count() == n == pages.count()
