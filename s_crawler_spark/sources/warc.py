"""WARC source/sink: the Common-Crawl container format for the pages table.

The engine's contract input is a ``pages(url, warc_ts, html, text, lang)``
table (BASELINE.json input_hint); real Common-Crawl deliveries arrive as
WARC segments (ISO 28500). This connector round-trips between the two:

- ``write_warc``: pages → one ``.warc`` file per partition, records written
  from Arrow batches inside ``mapInPandas`` (no per-row Python crossing —
  the kernel sees whole batches; file IO is the sink's job). The returned
  manifest (partition, n_records) is the action that drives the write.
  Speculative task re-execution could double-write a part file; a real
  deployment writes to a temp name and renames on commit exactly like
  sources/store.SnapshotStore — this local sink keeps the simple form.
- ``read_warc``: ``binaryFile`` scan of ``*.warc`` → length-driven record
  parser (Content-Length, so payload bytes containing "WARC/1.0" can never
  mis-split a record) → pages rows. ``text``/``lang`` are NULL (WARC does
  not carry them); every downstream crawl plan touches only url/warc_ts/
  html, so a WARC-read corpus is crawlable as-is (pytest drives run_wave
  over it and matches the parquet-corpus catalog byte-for-byte).

Scale notes: one WARC segment per input split parses independently
(mapInPandas over binaryFile rows); segment size is governed by the
upstream writer (Common Crawl ships ~1 GB segments — set
``spark.sql.files.maxPartitionBytes`` accordingly or re-chunk on write).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..corpus import PAGES_SCHEMA

WARC_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"

MANIFEST_SCHEMA = "partition int, n_records long"


def warc_record(url: str, ts: datetime, payload: bytes) -> bytes:
    """One ISO 28500 response record (the header subset the engine needs)."""
    hdr = ("WARC/1.0\r\n"
           "WARC-Type: response\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {ts.strftime(WARC_TS_FMT)}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return hdr + payload + b"\r\n\r\n"


def parse_warc_full(blob: bytes) -> tuple[list[tuple[str, datetime, bytes]], dict]:
    """Length-driven WARC record scan → ([(url, ts, payload)], stats).

    Accepts any WARC/1.x version line. Header lines split on the first
    ``:`` with the value left-trimmed (real segments contain both
    ``key: value`` and ``key:value``). Records without a WARC-Target-URI
    (warcinfo, metadata — every real Common-Crawl segment starts with a
    warcinfo record), without a parseable WARC-Date, or that aren't
    ``response``-typed are SKIPPED, never raised on — their Content-Length
    still advances the scan, so skipping is never guessing at boundaries.
    The scan stops only at a record with no parseable Content-Length (the
    stream is unframed past it) or one whose declared payload runs past
    the blob (mid-payload truncation — emitting the short body would hand
    downstream a silently corrupted page); the stats dict surfaces either
    as ``trailing_bytes`` > 0 instead of hiding it, plus ``n_records`` and
    ``n_skipped`` counts."""
    out = []
    n_skipped = 0
    pos, n = 0, len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/1.", pos):
            break  # trailing padding / truncated tail
        he = blob.find(b"\r\n\r\n", pos)
        if he < 0:
            break
        headers = {}
        for line in blob[pos:he].decode("utf-8", errors="replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.lower()] = v.lstrip(" \t")
        try:
            ln = int(headers["content-length"])
        except (KeyError, ValueError):
            break  # unskippable: without a length the stream is unframed
        if he + 4 + ln > n:
            # declared payload runs past the blob: a mid-payload truncation.
            # Emitting the short body would hand downstream a silently
            # corrupted page; leave the whole record as trailing bytes so
            # the stats surface it (the terminator alone being cut is fine —
            # the payload is complete and the scan just ends).
            break
        body = blob[he + 4:he + 4 + ln]
        url = headers.get("warc-target-uri")
        rtype = headers.get("warc-type", "response")
        ts = None
        if url is not None and rtype == "response":
            try:
                ts = datetime.strptime(headers.get("warc-date", ""), WARC_TS_FMT)
            except ValueError:
                ts = None  # date-less/garbled response: skip, don't fail task
        if ts is not None:
            out.append((url, ts, body))
        else:
            n_skipped += 1
        pos = he + 4 + ln + 4
    stats = {"n_records": len(out), "n_skipped": n_skipped,
             "trailing_bytes": max(0, n - pos)}
    return out, stats


def parse_warc(blob: bytes) -> list[tuple[str, datetime, bytes]]:
    """parse_warc_full without the stats (compat surface)."""
    return parse_warc_full(blob)[0]


def _write_kernel(out_dir: str):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    f.write(warc_record(url, ts.to_pydatetime(), bytes(html)))
                    n += 1
        yield pd.DataFrame({"partition": [pid], "n_records": [n]})
    return kernel


def write_warc(pages: DataFrame, out_dir: str) -> int:
    """pages → ``{out_dir}/part-*.warc`` (one segment per partition).
    Returns the total record count from the per-partition manifest.
    Overwrite semantics: pre-existing ``*.warc`` segments are removed
    first — a rerun with fewer partitions must not leave stale segments
    for read_warc's glob to silently mix in."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".warc"):
            os.unlink(os.path.join(out_dir, f))
    manifest = (pages.select("url", "warc_ts", "html")
                .mapInPandas(_write_kernel(out_dir), schema=MANIFEST_SCHEMA))
    return sum(r["n_records"] for r in manifest.collect())


def _read_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, htmls = [], [], []
        for blob in pdf["content"]:
            for url, ts, body in parse_warc(bytes(blob)):
                urls.append(url)
                tss.append(ts)
                htmls.append(body)
        yield pd.DataFrame({
            "url": urls, "warc_ts": tss, "html": htmls,
            "text": [None] * len(urls), "lang": [None] * len(urls),
        })


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``*.warc`` segments → pages rows (text/lang NULL; the crawl plans
    read only url/warc_ts/html). Malformed records are skipped, truncated
    segments parse up to the break — run ``read_warc_stats`` over the same
    path to audit skips/truncation per segment."""
    blobs = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(path)
             .select("content"))
    return blobs.mapInPandas(_read_kernel, schema=PAGES_SCHEMA)


READ_STATS_SCHEMA = ("path string, n_records long, n_skipped long, "
                     "trailing_bytes long")


def _stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"path": [], "n_records": [], "n_skipped": [],
                "trailing_bytes": []}
        for path, blob in zip(pdf["path"], pdf["content"]):
            _, st = parse_warc_full(bytes(blob))
            rows["path"].append(path)
            rows["n_records"].append(st["n_records"])
            rows["n_skipped"].append(st["n_skipped"])
            rows["trailing_bytes"].append(st["trailing_bytes"])
        yield pd.DataFrame(rows)


def read_warc_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-segment parse audit: (path, n_records, n_skipped,
    trailing_bytes). trailing_bytes > 0 ⇒ the segment is truncated or
    carries an unframed record — surfaced data, not a silent drop."""
    blobs = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(path)
             .select("path", "content"))
    return blobs.mapInPandas(_stats_kernel, schema=READ_STATS_SCHEMA)
