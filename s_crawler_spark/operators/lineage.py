"""Per-partition lineage + fetch/parse metrics (A3; north rule).

The reference keeps a per-run ledger of collected/processed/succeeded/failed
counts and phase timings (science_crawler_main.py:38-46,268-281). At engine
scale that generalizes to a *per-partition* lineage table committed with
every wave's snapshot set: which partition fetched how many pages, how many
parsed successfully, and how long the parse kernel ran — the operational
surface for skew diagnosis and straggler blame on a 1000-executor cluster.

Implementation: the two Python extraction hops (detail-parse, viewer-parse)
run as Arrow-batched ``mapInPandas`` kernels that time themselves per batch
and tag rows with their TaskContext partition id; metrics aggregate with a
plain groupBy afterwards (counts are deterministic and oracle-checked;
``parse_ms`` is wall-clock and therefore pytest-gated for presence/shape
only). The payload hop is pure JVM (md5 + magic bytes), so its lineage rows
carry counts with a NULL parse_ms.

Lineage rows never carry ``html`` — the kernels project the payload away,
so the lineage aggregation shuffles only small count tuples.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import extract_core as ec

LINEAGE_SCHEMA = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("n_fetched", T.LongType(), False),
    T.StructField("n_parsed", T.LongType(), False),
    T.StructField("parse_ms", T.LongType(), True),
])

_DETAIL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("abstract", T.StringType()),
    T.StructField("pdf_page_url", T.StringType()),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("parse_ms", T.LongType()),
])

_VIEWER_SCHEMA = T.StructType([
    T.StructField("pdf_page_url", T.StringType()),
    T.StructField("download_link", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("parse_ms", T.LongType()),
])


def _pid() -> int:
    from pyspark import TaskContext
    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def _batch_ms(ms: int, n: int) -> list:
    """Stamp the batch's kernel time on its FIRST row only (rest 0), so a
    plain sum() per partition recovers total kernel milliseconds."""
    return [ms] + [0] * (n - 1) if n else []


def _detail_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    pid = _pid()
    for pdf in batches:
        t0 = time.perf_counter()
        out = [({"abstract": None, "pdf_page_url": None, "keywords": None}
                if h is None else ec.extract_detail(h))
               for h in pdf["html"]]
        ms = int((time.perf_counter() - t0) * 1000)
        yield pd.DataFrame({
            "url": pdf["url"].values,
            "abstract": [d["abstract"] for d in out],
            "pdf_page_url": [d["pdf_page_url"] for d in out],
            "keywords": [d["keywords"] for d in out],
            "partition_id": pid,
            "parse_ms": _batch_ms(ms, len(pdf)),
        })


def _viewer_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    pid = _pid()
    for pdf in batches:
        t0 = time.perf_counter()
        links = [None if h is None else ec.find_download_link(h)
                 for h in pdf["viewer_html"]]
        ms = int((time.perf_counter() - t0) * 1000)
        yield pd.DataFrame({
            "pdf_page_url": pdf["pdf_page_url"].values,
            "download_link": links,
            "partition_id": pid,
            "parse_ms": _batch_ms(ms, len(pdf)),
        })


def detail_extract_timed(detail_pages: DataFrame) -> DataFrame:
    """(url, html) → (url, abstract, pdf_page_url, keywords, partition_id,
    parse_ms). The extraction itself is extract_core.extract_detail — the
    single source of truth shared with the parity simulator — wrapped with
    per-Arrow-batch self-timing."""
    return detail_pages.select("url", "html").mapInPandas(
        _detail_batches, schema=_DETAIL_SCHEMA)


def viewer_extract_timed(viewer_pages: DataFrame) -> DataFrame:
    """(pdf_page_url, viewer_html) → (pdf_page_url, download_link,
    partition_id, parse_ms)."""
    return viewer_pages.select("pdf_page_url", "viewer_html").mapInPandas(
        _viewer_batches, schema=_VIEWER_SCHEMA)


def stage_metrics(extracted: DataFrame, stage: str, parsed_col: str) -> DataFrame:
    """Per-partition rollup of one timed extraction hop: row/parse counts
    (deterministic, oracle-checked via the stage totals) + total kernel
    milliseconds (sum of per-batch stamps; operational, pytest-gated)."""
    return (extracted
            .groupBy(F.col("partition_id"))
            .agg(F.count("*").alias("n_fetched"),
                 F.count(parsed_col).alias("n_parsed"),
                 F.sum("parse_ms").alias("parse_ms"))
            .select(F.lit(stage).alias("stage"), "partition_id",
                    "n_fetched", "n_parsed", "parse_ms"))


def jvm_stage_metrics(df: DataFrame, stage: str, parsed_col: str) -> DataFrame:
    """Lineage rows for a pure-JVM hop (no Python kernel → NULL parse_ms)."""
    return (df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("n_fetched"),
                 F.count(parsed_col).alias("n_parsed"))
            .select(F.lit(stage).alias("stage"), "partition_id",
                    "n_fetched", "n_parsed",
                    F.lit(None).cast("long").alias("parse_ms")))
