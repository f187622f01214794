"""Structured-Streaming face of the crawl engine (SURVEY.md §2.9).

The batch wave loop (plans/wave.py) is the primary execution mode per the
north rule; this module exposes the same state machine as a continuous
pipeline for deployments that want incremental frontier ingestion instead of
wave barriers:

- ``stream_discoveries``: file-source ``readStream`` over the frontier
  snapshot directory — each committed wave's parquet becomes a micro-batch.
- ``host_rate_metrics``: event-time windowed per-host discovery counts with a
  watermark for late rows — the streaming analogue of the per-wave metrics
  table (reference science_crawler_main.py:268-281 step ledger).
- ``politeness_admission``: ``applyInPandasWithState`` per-host token-bucket
  — the stateful-operator form of operators/politeness.compose_wave: state
  carries (tokens, last_ts) per host; each micro-batch admits at most the
  tokens accrued since the last batch at 1000/crawl_delay_ms tokens/sec.

Scale notes: the stream is keyed (and therefore shuffled) only on ``host``
— the same partitioning axis as the batch politeness stage, so the Zipf-head
host is one state partition whose admission output is bounded by its own
token budget regardless of input volume. Payload columns never enter the
stream; only frontier metadata rows do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRONTIER_STREAM_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), True),
    T.StructField("host", T.StringType(), True),
    T.StructField("priority", T.IntegerType(), True),
    T.StructField("wave", T.IntegerType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("attempts", T.IntegerType(), True),
    T.StructField("last_error", T.StringType(), True),
    T.StructField("next_eligible", T.TimestampType(), True),
    T.StructField("discovered_at", T.TimestampType(), True),
])


def stream_discoveries(spark: SparkSession, frontier_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over committed frontier snapshots (one parquet dir per
    wave under ``frontier_dir``).

    Full frontier snapshots are hive-partitioned by ``status``
    (sources/store.py ``partition_by``), so in those files the status
    lives ONLY in the directory name — and ``recursiveFileLookup`` (needed
    to span the mixed snap-N layouts) disables partition discovery, which
    would read it back as NULL and silently drop every base-snapshot row
    at the downstream ``status == 'pending'`` filters. Recover it from the
    file path when the data column is absent; delta snapshots (plain
    files, real column) pass through ``coalesce`` untouched.
    """
    reader = (spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
              .option("recursiveFileLookup", "true")
              # stream directly over a live SnapshotStore table dir: skip
              # its MANIFEST.json (and _SUCCESS markers) — only parquet
              # data files are frontier rows
              .option("pathGlobFilter", "*.parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(frontier_dir)
    raw = F.nullif(
        F.regexp_extract(F.input_file_name(), r"/status=([^/]+)/", 1),
        F.lit(""))
    # Normalize the directory encoding back to the column's raw value —
    # delta rows carry the raw column, and the two representations must not
    # diverge for the same logical status. TWO %-escape layers stack here:
    # hive escapes special chars when writing the dir name (value "100%done"
    # → dir "status=100%25done"), then input_file_name URI-encodes the path
    # once more ("100%2525done"), so one decode per layer. Neither layer
    # escapes a literal "+", but url_decode is form-decoding (+ → space) —
    # shield it as %2B before each pass or "a+b" corrupts to "a b".
    def _pct_decode(col):
        return F.url_decode(F.regexp_replace(col, r"\+", "%2B"))

    raw = _pct_decode(_pct_decode(
        F.nullif(raw, F.lit("__HIVE_DEFAULT_PARTITION__"))))
    return df.withColumn("status", F.coalesce(F.col("status"), raw))


def host_rate_metrics(discoveries: DataFrame,
                      window_seconds: int = 60,
                      watermark_seconds: int = 120) -> DataFrame:
    """Per-host discovery rate over event-time windows with late-data
    watermark (streaming A3/A6 analogue)."""
    return (
        discoveries
        .withWatermark("discovered_at", f"{watermark_seconds} seconds")
        .groupBy(F.window("discovered_at", f"{window_seconds} seconds")
                 .alias("win"),
                 F.col("host"))
        .agg(F.count("*").alias("n_discovered"),
             F.sum(F.when(F.col("status") == "pending", 1).otherwise(0))
             .alias("n_pending"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "host", "n_discovered", "n_pending")
    )


_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def dedup_discoveries(discoveries: DataFrame,
                      watermark_seconds: int = 3600) -> DataFrame:
    """Streaming first-occurrence URL dedup — the in-flight (wave-horizon)
    analogue of the batch seen-set ladder.

    Keyed stateful kernel, NOT a bare ``dropDuplicates`` (CLAUDE.md
    invariant: dedup is first-occurrence-by-seq): within the first
    micro-batch that carries a url_hash the MIN-``seq`` row survives
    (bare dropDuplicates keeps whichever row the state store meets first —
    partition order, not crawl order); later batches emit nothing for that
    key. State is one boolean per url_hash (the same partitioning axis as
    the Bloom/cuckoo shards), evicted by event-time timeout one watermark
    horizon after the key's last activity — the durable cross-wave dedup
    is the batch Bloom + exact anti-join; this operator only collapses
    re-discoveries while they are in flight."""
    def first_occurrence(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values("seq")
        # __epoch_ms is computed JVM-side (timestamp → double): Arrow hands
        # pandas UDFs tz-NAIVE timestamps localized to the session zone, so
        # pandas .timestamp() would shift by the session offset (and jump
        # across DST) relative to the true event-time epoch the watermark
        # uses; the cast is tz-correct and null-safe (NaN here, not NaT)
        em = rows["__epoch_ms"].max()
        wm_ms = state.getCurrentWatermarkMs()
        ts_ms = int(em) if pd.notna(em) else wm_ms
        if not state.exists:
            state.update((True,))
            out = rows.head(1)
        else:
            out = rows.head(0)
        state.setTimeoutTimestamp(max(ts_ms, wm_ms + 1)
                                  + watermark_seconds * 1000)
        yield out.drop(columns="__epoch_ms")

    return (discoveries
            .withWatermark("discovered_at", f"{watermark_seconds} seconds")
            .withColumn("__epoch_ms",
                        (F.col("discovered_at").cast("double") * 1000)
                        .cast("long"))
            .groupBy("url_hash")
            .applyInPandasWithState(
                first_occurrence,
                outputStructType=FRONTIER_STREAM_SCHEMA,
                stateStructType=_DEDUP_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


ADMIT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("admitted_at", T.TimestampType(), True),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("tokens", T.DoubleType()),
    T.StructField("last_epoch", T.DoubleType()),
])


def _make_admission_fn(crawl_delay_ms: int, burst: int):
    # the state columns are DoubleType: every value written into them must
    # be a real Python float. An int (e.g. min(burst, ...) returning the
    # int burst itself at steady state) serializes, but restores as NULL
    # after a query RESTART — the bucket silently loses its state two
    # restarts in. Found by the streaming↔batch crawl-order cross-check
    # (tests/test_streaming.py); keep burst float inside the closure and
    # cast the update tuple explicitly.
    burst = float(burst)

    def admit(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # per-host accrual rate from the row-decorated policy (parity with
        # compose_wave: each host earns tokens at 1000/its own delay). The
        # delay rides ON the rows — joined as a broadcast dimension before
        # the host shuffle — so the state closure carries no host map and
        # the policy never materializes on the driver.
        if state.exists:
            tokens, last_epoch = state.get
        else:
            tokens, last_epoch = burst, None
        rows = pd.concat(list(pdfs)).sort_values("seq")
        d = rows["__delay_ms"].dropna()
        # floor at 1 ms, matching compose_wave: a policy delay of 0 means
        # an effectively unbounded rate, not a ZeroDivisionError that
        # kills the streaming query
        delay = float(d.iloc[0]) if len(d) else float(crawl_delay_ms)
        rate = 1000.0 / max(delay, 1.0)
        # token accrual uses event time — deterministic under replay, no
        # wall clock anywhere. __epoch is the JVM-side timestamp→double
        # cast: tz-correct (pandas .timestamp() on the tz-naive Arrow
        # values would shift by the session offset) and NaN-safe when a
        # batch's discovered_at are all null
        em = rows["__epoch"].max()
        now_epoch = float(em) if pd.notna(em) else None
        if last_epoch is not None and now_epoch is not None:
            tokens = min(burst, tokens + rate * max(0.0, now_epoch - last_epoch))
        n_admit = int(tokens)
        admitted = rows.head(n_admit)
        # the stored clock must be MONOTONE: frontier deltas carry the
        # ORIGINAL discovered_at, so a retry-only batch streamed after
        # newer files has an older max — writing it back would rewind the
        # bucket and re-accrue (double-credit) the interval next batch
        known = [e for e in (now_epoch, last_epoch) if e is not None]
        state.update((float(tokens - len(admitted)),
                      float(max(known)) if known else None))
        yield pd.DataFrame({
            "host": admitted["host"] if len(admitted) else pd.Series([], dtype=object),
            "url": admitted["url"],
            "seq": admitted["seq"],
            "admitted_at": admitted["discovered_at"],
        })

    return admit


def politeness_admission(discoveries: DataFrame,
                         crawl_delay_ms: int = 1000,
                         burst: int = 60,
                         host_policy: DataFrame | dict[str, int] | None = None,
                         ) -> DataFrame:
    """Stateful per-host token-bucket admission (the streaming form of
    compose_wave's per-host budget; reference politeness sleeps
    src/pdf_processor.py:213-217 re-expressed as admission control).

    ``host_policy`` carries per-host crawl delays — a {host: delay_ms}
    mapping or the batch host_policy table (host, crawl_delay_ms, ...);
    hosts absent from it accrue at the default ``crawl_delay_ms``. The
    policy joins the micro-batch as a stream-static BROADCAST dimension
    before the host shuffle (the same J4 shape compose_wave uses) and the
    state function reads the rate off its group's rows — no driver
    ``collect()``, no per-task pickled host map: at an open-web host count
    (10^7+) the policy stays a distributed table end to end. A host with
    several policy rows is collapsed to its LARGEST delay before the join
    (most-polite wins): a plain left join would fan each discovery out per
    duplicate row — duplicate admissions that also double-charge the token
    bucket — where the old driver-dict form silently kept one row.

    Admission is PER OFFER: rows beyond the host's current token balance
    are dropped from this operator's output, not queued (unbounded
    overflow must not live in per-host GroupState). The caller owns
    re-offering — in the engine the un-admitted URLs simply stay
    ``pending`` in the frontier store and are re-streamed by the next
    snapshot their host appears in, exactly as the batch ``compose_wave``
    leaves them for the next wave."""
    pending = discoveries.filter(F.col("status") == "pending")
    if host_policy is None:
        decorated = pending.withColumn("__delay_ms",
                                       F.lit(None).cast("int"))
    else:
        if isinstance(host_policy, dict):
            # dict hosts are unique by construction — no collapse needed
            # (it would re-run a pointless hash aggregation of the static
            # side every micro-batch)
            pol = discoveries.sparkSession.createDataFrame(
                list(host_policy.items()), "host string, __delay_ms int")
        else:
            pol = (host_policy.groupBy("host")
                   .agg(F.max(F.col("crawl_delay_ms").cast("int"))
                        .alias("__delay_ms")))
        decorated = pending.join(F.broadcast(pol), on="host", how="left")
    return (
        decorated
        .withColumn("__epoch", F.col("discovered_at").cast("double"))
        .groupBy("host")
        .applyInPandasWithState(
            _make_admission_fn(crawl_delay_ms, burst),
            outputStructType=ADMIT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_metrics_stream(spark: SparkSession, frontier_dir: str,
                       out_dir: str, checkpoint_dir: str) -> None:
    """One-shot (availableNow) metrics pipeline: drain all committed
    snapshots, append windowed per-host metrics to parquet, stop. Restart
    with the same checkpoint resumes from the last processed file.

    Append-mode caveat (inherent to watermark semantics): windows within
    ``watermark_seconds`` of the newest event stay OPEN when the drain
    stops — their rows emit on the next run, once newer snapshots push
    the watermark past them. A run over a quiesced store therefore trails
    its last window(s); downstream readers must treat the newest horizon
    as provisional."""
    q = (
        # one file per micro-batch: the watermark only advances between
        # batches, so later snapshots must land in later batches for
        # append-mode windows over earlier snapshots to close and emit
        host_rate_metrics(stream_discoveries(spark, frontier_dir,
                                             max_files_per_trigger=1))
        .writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
