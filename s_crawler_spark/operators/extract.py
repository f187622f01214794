"""Arrow-vectorized extraction operators (SURVEY.md §2.10).

Every custom kernel crosses the JVM↔Python boundary exactly once per Arrow
batch (scalar pandas UDFs) — never per row. The per-element work delegates to
the pure kernels in extract_core.py, which are parity-tested against the
reference's sequential semantics.

Dataflow shape (replaces reference src/link_collector.py + src/pdf_processor.py):

    pages(search) --cards_udf--> array<card> --posexplode--> one row per card
    pages(detail) --detail_udf--> struct(abstract, pdf_page_url)
    pages(viewer) --download_link_udf--> download href
    payloads      --valid_pdf_udf / md5--> validated articles
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import extract_core as ec
from ..functions import scalars

CARD_STRUCT = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("doi", T.StringType()),
    T.StructField("journal", T.StringType()),
    T.StructField("date_text", T.StringType()),
    T.StructField("authors", T.ArrayType(T.StringType())),
])
CARD_ARRAY = T.ArrayType(CARD_STRUCT)

# NOTE: the detail/viewer extraction hops run through the self-timing Arrow
# kernels in operators/lineage.py (same extract_core functions); keeping a
# second pandas-UDF wrapper here would mean two schemas to hand-synchronize.


def _card_tuple(info: dict):
    return (
        info["title"], info["url"], info.get("doi"), info.get("journal"),
        info.get("date_text"), info.get("authors"),
    )


@F.pandas_udf(CARD_ARRAY)
def extract_cards_udf(html: pd.Series) -> pd.Series:
    """P1/S2 — search page HTML → ordered card structs (skips preserved)."""
    return html.map(
        lambda h: [] if h is None
        else [_card_tuple(c) for c in ec.extract_cards(h, parse_dates=False)])


@F.pandas_udf(T.BooleanType())
def has_next_page_udf(html: pd.Series) -> pd.Series:
    """Pagination probe — reference src/link_collector.py:264-275."""
    return html.map(ec.has_next_page)


@F.pandas_udf(T.BooleanType())
def is_page_normal_udf(html: pd.Series) -> pd.Series:
    """P12 — page readiness probe."""
    return html.map(ec.is_page_normal)


@F.pandas_udf(T.BooleanType())
def is_page_abnormal_udf(html: pd.Series) -> pd.Series:
    """P13 — captcha/anti-bot keyword probe."""
    return html.map(ec.is_page_abnormal)


def valid_pdf_content(content: Column) -> Column:
    """P11 as a JVM-side predicate (no Python), for corpus fetches where
    status is always 200 and content-type is octet-stream: the type arm of
    reference src/utils/download_utils.py:48-84 passes, so a payload is valid
    iff it is ≥1000 bytes OR carries the %PDF magic in its first 10 bytes.
    Full HTTP semantics (status / content-type arms) live in valid_pdf_udf.
    """
    magic = F.substring(content, 1, 10).cast("string").contains("%PDF")
    return (F.length(content) >= 1000) | magic


@F.pandas_udf(T.BooleanType())
def valid_pdf_udf(content: pd.Series, content_type: pd.Series, status: pd.Series) -> pd.Series:
    """P11, full semantics including content-type + HTTP status arms."""
    return pd.Series([
        ec.validate_pdf_content(c, ct, int(s))
        for c, ct, s in zip(content, content_type, status)
    ])


def explode_cards(search_pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Search pages → one row per extracted card, with (page_num, card_idx)
    preserved for the crawl-order window (SURVEY.md §2.8).

    ``page_num`` is parsed from the search URL's startPage param; ``card_idx``
    is the card's document-order position on its page (posexplode).
    """
    page_num = F.coalesce(
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("startPage")).cast("int"),
        F.lit(0),
    )
    return (
        search_pages
        .withColumn("page_num", page_num)
        .select("page_num", F.posexplode(extract_cards_udf(F.col(html_col))).alias("card_idx", "card"))
        .select(
            "page_num", "card_idx",
            F.col("card.title").alias("title"),
            F.col("card.url").alias("url"),
            F.col("card.doi").alias("doi"),
            F.col("card.journal").alias("journal"),
            scalars.parse_publication_date(F.col("card.date_text")).alias("publication_date"),
            F.col("card.authors").alias("authors"),
        )
    )
