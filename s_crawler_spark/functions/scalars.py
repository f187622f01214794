"""Scalar kernels as JVM-side Column expressions (SURVEY.md §2.7, F1–F15).

Each function re-expresses one scalar computation of the reference crawler as
a built-in-function Column expression — whole-stage-codegen'd, no Python in
the hot path. Pure-Python twins live in operators/extract_core.py where the
HTML kernels need them; these Column versions are the ones used in the
DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCIENCE_BASE_URL = "https://www.science.org"


def sanitize_filename(c: Column) -> Column:
    """F1 — reference src/utils/file_utils.py:16-34: replace ``<>:"/\\|?*``
    with ``_``, collapse whitespace, strip, truncate to 200."""
    s = F.regexp_replace(c, r'[<>:"/\\|?*]', "_")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return F.substring(s, 1, 200)


def extract_doi_from_url(url: Column) -> Column:
    """F3 — reference src/link_collector.py:277-284: regex, NULL on miss."""
    got = F.regexp_extract(url, r"/doi/(10\.\d+/[^/]+)", 1)
    return F.nullif(got, F.lit(""))


def doi_from_doiorg_href(href: Column) -> Column:
    """F4 — reference src/crawlers/science_crawler.py:263-266:
    ``href.split('doi.org/')[-1]``."""
    return F.element_at(F.split(href, r"doi\.org/"), -1)


def parse_publication_date(c: Column) -> Column:
    """F5 — reference src/link_collector.py:286-296: try ``d MMM yyyy``
    ('10 Aug 2023'), then ``yyyy-MM-dd``, else NULL."""
    s = F.trim(c)
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("dd MMM yyyy")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )


def complete_url(href: Column, base: str = SCIENCE_BASE_URL) -> Column:
    """P5 — reference src/link_collector.py:180: relative → absolute."""
    return F.when(href.startswith("http"), href).otherwise(F.concat(F.lit(base), href))


def content_md5(content: Column) -> Column:
    """F6 — reference src/utils/__init__.py:16-22: MD5 hexdigest of bytes."""
    return F.md5(content)


def cookie_str_to_map(c: Column) -> Column:
    """F7 — reference src/pdf_processor.py:243-249: split on ';', then first
    '='; keys/values trimmed of surrounding whitespace."""
    return F.str_to_map(F.regexp_replace(F.trim(c), r"\s*;\s*", ";"), F.lit(";"), F.lit("="))


def authors_to_csv(authors: Column) -> Column:
    """F8 (write side) — reference src/database_manager.py:69: ``', '.join``;
    empty list → NULL (the reference inserts NULL for falsy author lists)."""
    return F.when(F.size(authors) > 0, F.array_join(authors, ", "))


def csv_to_authors(c: Column) -> Column:
    """F8 (read side) — reference pdf_downloader.py:45: ``.split(', ')``."""
    return F.split(c, ", ")


def format_file_size(size_bytes: Column) -> Column:
    """F9 — reference src/utils/download_utils.py:125-144: log1024 bucket to
    ``{rounded} {unit}`` with round(x, 2)."""
    units = F.array(F.lit("B"), F.lit("KB"), F.lit("MB"), F.lit("GB"), F.lit("TB"))
    i = F.floor(F.log(1024.0, size_bytes.cast("double"))).cast("int")
    i = F.greatest(F.least(i, F.lit(4)), F.lit(0))
    scaled = F.round(size_bytes.cast("double") / F.pow(F.lit(1024.0), i.cast("double")), 2)
    return F.when(size_bytes == 0, F.lit("0 B")).otherwise(
        F.concat(scaled.cast("string"), F.lit(" "), F.element_at(units, i + 1))
    )


def is_valid_pdf_url(url: Column) -> Column:
    """P14 — reference src/utils/download_utils.py:147-162: URL path ends
    with .pdf or contains 'pdf' (lowercased)."""
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    return path.endswith(".pdf") | path.contains("pdf")


def filename_from_url(url: Column) -> Column:
    """F10 — reference src/utils/download_utils.py:165-182: basename of URL
    path, default 'download.pdf'."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    base = F.element_at(F.split(path, "/"), -1)
    return F.when((base.isNull()) | (base == ""), F.lit("download.pdf")).otherwise(base)


def safe_title_50(title: Column) -> Column:
    """F11 — reference src/crawlers/science_crawler.py:346-348: keep
    alnum/space/underscore/dash of the first 50 chars, then strip."""
    return F.trim(F.regexp_replace(F.substring(title, 1, 50), r"[^A-Za-z0-9 _\-]", ""))


def jaccard_tokens(a: Column, b: Column) -> Column:
    """F13 — reference check_duplicates.py:52-57: ``|A∩B| / |A∪B|`` on
    lowercase token *sets*."""
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd)).cast("double")
    union = F.size(F.array_union(ad, bd)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def title_tokens(title: Column) -> Column:
    """Tokenization used by F13 (reference check_duplicates.py:50-51):
    lowercase whitespace split."""
    return F.split(F.lower(F.trim(title)), r"\s+")


def backoff_next_eligible(last_attempt_ts: Column, attempts: Column) -> Column:
    """F14 — reference src/utils/download_utils.py:61: ``sleep(2**attempt)``
    re-expressed as frontier *eligibility time* instead of a sleeping task:
    a row retried k times becomes eligible at last_attempt + 2^k seconds."""
    delay = F.pow(F.lit(2.0), attempts.cast("double"))
    return F.timestamp_add("SECOND", delay.cast("long"), last_attempt_ts)


def truncate_error(err: Column) -> Column:
    """Error text truncation — reference src/database_manager.py:125:
    ``last_error[:1000]``."""
    return F.substring(err, 1, 1000)


def url_host(url: Column) -> Column:
    """Politeness/partition key: host of a URL."""
    return F.parse_url(url, F.lit("HOST"))


def canonicalize_url(url: Column) -> Column:
    """RFC 3986 §6 syntax-based normalization — the aliasing-collapse step
    before seen-set keying, so ``HTTP://Host:443/p?b=2&a=1#frag`` and
    ``https://host/p?a=1&b=2`` dedup to one frontier entry.

    Normalizations (all JVM regexp/array expressions, one pass, no UDF):
    fragment stripped; scheme and host lowercased (userinfo keeps its
    case — RFC 3986 §6.2.2.1 makes only scheme and host case-insensitive);
    default ports dropped (:80 for http, :443 for https); empty path →
    ``/``; query parameters sorted bytewise (``&``-split). Percent-decoding is
    deliberately NOT applied (it is only safe for unreserved characters
    and needs a decode table — conservative canonicalizers skip it).
    Non-hierarchical inputs (no ``://``) pass through unchanged.

    Production seen-set composition: canonical_url_hash(canonicalize_url(u)).
    The synthetic corpus emits already-canonical URLs, so the crawl-parity
    suite keys on the raw form — byte-identical either way there.
    """
    base = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth_raw = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    # RFC 3986 §6.2.2.1: only scheme and HOST are case-insensitive —
    # userinfo keeps its case (greedy .*@ takes the last '@' per the grammar)
    userinfo = F.regexp_extract(auth_raw, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(auth_raw, r"^.*@", ""))
    hostport = (F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
                .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
                .otherwise(hostport))
    auth = F.concat(userinfo, hostport)
    path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(base, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        scheme, F.lit("://"), auth, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)))
    return F.when(scheme == "", url).otherwise(canon)


def canonical_url_hash(url: Column) -> Column:
    """Seen-set key: 64-bit hash of the URL (the engine's DOI-analogue —
    reference keys its seen set on DOI, database/create_science_table.sql:19).
    Feed canonicalize_url(url) here when the corpus contains aliased forms."""
    return F.xxhash64(url)
