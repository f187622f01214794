"""Result sinks: JSON array export (S11) and catalog CSV dump (S12).

The reference emits crawl results as a JSON array of article objects
(README.md:159-178, USAGE.md:282-299) and its golden catalog as a CSV with
the `1.csv` header (1.csv:1). These writers reproduce those shapes from the
articles catalog DataFrame — distributed writes (one part per partition;
coalesce only if a single file is explicitly requested, which is a driver
bottleneck at scale and off by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars

# golden CSV header — reference 1.csv:1
CSV_COLUMNS = [
    "id", "doi", "title", "authors", "journal", "abstract", "keywords",
    "publication_date", "url", "pdf_url", "download_path", "original_url",
    "pdf_md5", "created_at", "updated_at",
]


def export_json(catalog: DataFrame, path: str,
                single_file: bool = False) -> None:
    """S11: one JSON object per article (JSON-lines at scale; the
    reference's array-of-objects file is the single_file variant)."""
    out = catalog
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)


def catalog_to_csv_frame(catalog: DataFrame) -> DataFrame:
    """Project the engine catalog onto the reference's golden CSV schema
    (authors list flattened with ', ' — the documented lossy round-trip,
    reference src/database_manager.py:69)."""
    cols = {
        "id": F.col("seq"),
        "doi": F.col("doi"),
        "title": F.col("title"),
        "authors": scalars.authors_to_csv(F.col("authors")),
        "journal": F.col("journal"),
        "abstract": F.col("abstract"),
        "keywords": F.lit(None).cast("string"),
        "publication_date": F.col("publication_date"),
        "url": F.col("url"),
        "pdf_url": F.col("download_link"),
        "download_path": F.lit(None).cast("string"),
        "original_url": F.col("pdf_page_url"),
        "pdf_md5": F.col("content_md5"),
        "created_at": F.lit(None).cast("timestamp"),
        "updated_at": F.lit(None).cast("timestamp"),
    }
    return catalog.select(*[v.alias(k) for k, v in cols.items()])


def export_csv(catalog: DataFrame, path: str,
               single_file: bool = False) -> None:
    """S12: golden-catalog CSV dump with the reference header."""
    out = catalog_to_csv_frame(catalog)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
