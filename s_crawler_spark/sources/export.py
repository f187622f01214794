"""Result sinks: JSON array export (S11) and catalog CSV dump (S12).

The reference emits crawl results as a JSON array of article objects
(README.md:159-178, USAGE.md:282-299) and its golden catalog as a CSV with
the `1.csv` header (1.csv:1). These writers reproduce those shapes from the
articles catalog DataFrame — distributed writes (one part per partition;
coalesce only if a single file is explicitly requested, which is a driver
bottleneck at scale and off by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import scalars

# golden CSV header — reference 1.csv:1
CSV_COLUMNS = [
    "id", "doi", "title", "authors", "journal", "abstract", "keywords",
    "publication_date", "url", "pdf_url", "download_path", "original_url",
    "pdf_md5", "created_at", "updated_at",
]

DOWNLOAD_DIR = "science_downloads"  # reference src/config.py:7


def assign_unique_filenames(catalog: DataFrame, title_col: str = "title",
                            seq_col: str = "seq",
                            ext: str = ".pdf") -> DataFrame:
    """F12: collision-free artifact filenames (reference
    src/pdf_processor.py:228-240, science_crawler_main.py:115-126).

    The reference probes os.path.exists in a counter loop per download:
    the first arrival keeps ``name.pdf``, later collisions (in download
    order) try ``name_1.pdf, name_2.pdf, ...`` until free — including
    collisions with names *generated* for other titles (title "A"'s second
    copy can claim "A_1.pdf", pushing a literal title "A_1" to "A_1_1.pdf").

    Distributed exact form: filenames can only collide within a ROOT group
    — the sanitized base with every trailing ``_<digits>`` run stripped —
    because every name a group generates keeps its root. So: groupBy(root)
    → run the reference's counter loop per group in seq order inside an
    Arrow kernel. Groups are title-derived and tiny (collision chains),
    the shuffle carries only catalog metadata, and the common no-chain
    case degenerates to the rank-window formula (the contract oracle).
    """
    from pyspark.sql import types as T

    base = scalars.sanitize_filename(F.col(title_col))
    with_base = (catalog
                 .withColumn("__fname_base", base)
                 .withColumn("__fname_root",
                             F.regexp_replace(F.col("__fname_base"),
                                              r"(_\d+)+$", "")))
    out_schema = T.StructType(
        with_base.drop("__fname_root").schema.fields
        + [T.StructField("filename", T.StringType())])
    in_cols = [c for c in with_base.columns if c != "__fname_root"]

    def resolve(key, pdf):
        g = pdf.sort_values(seq_col)
        taken, names = set(), []
        for b in g["__fname_base"]:
            name, counter = b + ext, 1
            while name in taken:
                name = f"{b}_{counter}{ext}"
                counter += 1
            taken.add(name)
            names.append(name)
        out = g[in_cols].copy()
        out["filename"] = names
        return out

    return (with_base.groupBy("__fname_root")
            .applyInPandas(resolve, schema=out_schema)
            .drop("__fname_base"))


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
    reference src/database_manager.py:69). download_path carries the
    collision-free artifact path (F12) the reference records after a
    successful download (science_crawler_main.py:116-117)."""
    catalog = assign_unique_filenames(catalog)
    cols = {
        "id": F.col("seq"),
        "doi": F.col("doi"),
        "title": F.col("title"),
        "authors": scalars.authors_to_csv(F.col("authors")),
        "journal": F.col("journal"),
        "abstract": F.col("abstract"),
        "keywords": scalars.authors_to_csv(F.col("keywords")),
        "publication_date": F.col("publication_date"),
        "url": F.col("url"),
        "pdf_url": F.col("download_link"),
        "download_path": F.concat_ws("/", F.lit(DOWNLOAD_DIR), F.col("filename")),
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
