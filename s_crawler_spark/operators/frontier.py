"""Frontier queue operators (SURVEY.md §2.1 S9/S10, §2.6 T1/T2, §2.9).

The frontier replaces the reference's ``science.downloaded=0`` rows drained
``ORDER BY id ASC LIMIT n`` (reference src/database_manager.py:191-209,
pdf_downloader.py:49-99). Schema (FIXTURES.md §2):

    frontier(url, url_hash, host, priority, wave, seq, status,
             attempts, last_error, next_eligible, discovered_at)

(the crawl loop adds ``robots_ok`` at enqueue — the robots admission
decision evaluated once per URL and stored, politeness.decorate_robots_ok;
``enqueue`` itself stays policy-free.)

Design decisions for 10^10-URL scale:

- ``seq`` is a *monotone composite key*, not a global row_number: a global
  ``row_number() OVER (ORDER BY ...)`` window collapses to one partition.
  ``(wave, page_num, card_idx)`` packed into one long is order-isomorphic to
  the reference's AUTO_INCREMENT id and needs no shuffle at all.
- retry backoff is *data*, not sleeping tasks: a failed row stays pending
  with ``attempts+1`` and ``next_eligible = now + 2^attempts`` seconds
  (reference src/utils/download_utils.py:61 re-expressed as scheduling,
  SURVEY.md F14); rows retire at MAX_ATTEMPTS (reference default 3).
- time is a *logical wave clock* passed in by the driver loop — deterministic
  and testable; wall-clock only enters in production configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars

MAX_ATTEMPTS = 3  # reference src/utils/download_utils.py:16

SEQ_WAVE_SHIFT = 44   # seq = wave<<44 | page_num<<20 | card_idx
SEQ_PAGE_SHIFT = 20   # supports 2^24 pages/wave × 2^20 cards/page

STATUS_PENDING = "pending"
STATUS_DONE = "done"
STATUS_FAILED = "failed"  # retired after MAX_ATTEMPTS

# coarse next_eligible granularity (epoch-hours). Frontier FULL snapshots
# hive-partition by (status, next_eligible_bucket): the per-wave admission
# scan file-prunes not only the done/failed rows but also the pending rows
# backoff/trap-delayed into future buckets — at a 10^10-row frontier where
# most pending rows are waiting out a delay, the one remaining full-table
# read per wave shrinks to the due files only.
ELIGIBLE_BUCKET_SECONDS = 3600


def eligible_bucket(ts_col):
    """Epoch-hour bucket of a timestamp column (int — hive partition
    values stay compact and partition discovery round-trips the type)."""
    return (F.unix_timestamp(ts_col) / F.lit(ELIGIBLE_BUCKET_SECONDS)) \
        .cast("int")


def composite_seq(wave_col, page_col, idx_col):
    """Order-isomorphic crawl-order key, computed without any shuffle
    (SURVEY.md §2.8: seq must sort like (wave, page_num, card_idx))."""
    return (
        (wave_col.cast("long") * F.lit(1 << SEQ_WAVE_SHIFT))
        + (page_col.cast("long") * F.lit(1 << SEQ_PAGE_SHIFT))
        + idx_col.cast("long")
    ).alias("seq")


def enqueue(candidates: DataFrame, wave: int, logical_now) -> DataFrame:
    """Discovered candidates → pending frontier rows (reference
    collect_meta.py:62-65 stamps downloaded=0, dl_attempts=0)."""
    return candidates.select(
        F.col("url"),
        scalars.canonical_url_hash(F.col("url")).alias("url_hash"),
        scalars.url_host(F.col("url")).alias("host"),
        F.coalesce(F.col("priority") if "priority" in candidates.columns else F.lit(None).cast("int"),
                   F.lit(0)).alias("priority"),
        F.lit(wave).alias("wave"),
        composite_seq(F.lit(wave), F.col("page_num"), F.col("card_idx")),
        F.lit(STATUS_PENDING).alias("status"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("last_error"),
        F.lit(logical_now).cast("timestamp").alias("next_eligible"),
        F.lit(logical_now).cast("timestamp").alias("discovered_at"),
    ).withColumn("next_eligible_bucket",
                 eligible_bucket(F.col("next_eligible")))


def eligible_pending(frontier: DataFrame, logical_now) -> DataFrame:
    """P9 + backoff gate: pending rows whose retry delay has elapsed.

    The coarse bucket predicate is redundant with the precise one (bucket
    is derived from next_eligible by flooring, so due rows always pass
    both) but it is a PARTITION filter on the frontier's full snapshots —
    the scan prunes whole future-bucket files before reading a row."""
    now = F.lit(logical_now).cast("timestamp")
    cond = ((F.col("status") == STATUS_PENDING)
            & (F.col("next_eligible") <= now))
    if "next_eligible_bucket" in frontier.columns:
        cond = cond & (F.col("next_eligible_bucket") <= eligible_bucket(now))
    return frontier.filter(cond)


def fifo_dequeue(frontier: DataFrame, logical_now, batch: int | None = None) -> DataFrame:
    """T2 — FIFO batch dequeue, `ORDER BY seq [LIMIT batch]` (reference
    src/database_manager.py:196-201).

    Scale note: a bounded LIMIT is a reference-parity feature (batch ≈ 20-100
    in the reference); wave-sized dequeues at 10^10 scale use the per-host
    budget in politeness.compose_wave instead of a global top-k.
    """
    pend = eligible_pending(frontier, logical_now)
    if batch is not None:
        return pend.orderBy("seq").limit(batch)
    return pend


def record_results(frontier: DataFrame, results: DataFrame, logical_now) -> DataFrame:
    """S10 — merge per-URL wave outcomes back into the frontier.

    ``results`` carries (url_hash, success:boolean, error:string). Success →
    done; failure → attempts+1, truncated error, exponential next_eligible;
    attempts exhausted → failed (retired). Rows not in ``results`` unchanged.
    Returns the *new full frontier state* — the store layer commits it as the
    wave's snapshot (Iceberg ``MERGE INTO`` on a cluster; SURVEY.md S10).
    """
    r = results.select(
        F.col("url_hash").alias("__r_hash"),
        F.col("success").alias("__r_success"),
        F.col("error").alias("__r_error"),
    )
    # results are wave-sized; the frontier side is O(total) on compaction
    # waves — broadcast the outcomes so the merge never shuffles the frontier
    j = frontier.join(F.broadcast(r), frontier["url_hash"] == r["__r_hash"],
                      "left")
    new_attempts = F.col("attempts") + 1
    updated = (
        j.withColumn(
            "status",
            F.when(F.col("__r_success") == True, F.lit(STATUS_DONE))  # noqa: E712
            .when((F.col("__r_success") == False) & (new_attempts >= MAX_ATTEMPTS),
                  F.lit(STATUS_FAILED))
            .otherwise(F.col("status")),
        )
        .withColumn(
            "last_error",
            F.when(F.col("__r_success") == False,  # noqa: E712
                   scalars.truncate_error(F.col("__r_error")))
            .otherwise(F.col("last_error")),
        )
        .withColumn(
            "next_eligible",
            F.when(
                (F.col("__r_success") == False) & (new_attempts < MAX_ATTEMPTS),  # noqa: E712
                scalars.backoff_next_eligible(
                    F.lit(logical_now).cast("timestamp"), new_attempts),
            ).otherwise(F.col("next_eligible")),
        )
        .withColumn(
            "attempts",
            F.when(F.col("__r_success") == False, new_attempts)  # noqa: E712
            .otherwise(F.col("attempts")),
        )
    )
    # keep the coarse partition column in lockstep with next_eligible
    # (derived by flooring — recomputing it for unchanged rows is a no-op)
    updated = updated.withColumn(
        "next_eligible_bucket", eligible_bucket(F.col("next_eligible")))
    return updated.drop("__r_hash", "__r_success", "__r_error")


def salt_partitions(df: DataFrame, n_buckets: int,
                    url_col: str = "url") -> DataFrame:
    """§2.9 skew handling: deterministic fetch-salt so one Zipf-head host's
    rows spread over ``n_buckets`` tasks instead of one. Repartitions by
    (host, salt) — politeness is already enforced by the per-host wave budget,
    so intra-wave parallelism per host is safe."""
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int"))
    return salted.repartition(n_buckets, "host", "salt")
