"""Measure the frontier admission scan under partition pruning — the
round-5 layout claim, as wall clock instead of only an explain pin.

SCALE.md's sizing story says the one remaining full-table read per wave
(the eligible-pending admission scan) is partition-pruned by the frontier
FULL snapshots' (status, next_eligible_bucket) hive layout: done/failed
files are never read, and pending files whose rows are backoff/trap-delayed
into future epoch-hour buckets are skipped too. explain_audit pins the
PartitionFilters; this tool measures what they buy on a synthetic frontier
big enough for file pruning to dominate (default 10^7 rows — ~0.1% of the
north-rule frontier, far past the point where scan cost scales linearly).

Three layouts of the SAME rows, committed through the production
SnapshotStore path and read back composed (merge-on-read, exactly what the
crawl loop's per-wave scan sees):

  flat    — FULL snapshot, no partitioning (pre-round-4 shape)
  status  — partition_by=["status"]          (round-4 shape)
  bucket  — partition_by=["status","next_eligible_bucket"]  (round-5 shape)

Timed action: frontier.eligible_pending(read, now) → count + sum(url_hash)
(forces the scan; result is asserted identical across layouts). Trials are
INTERLEAVED flat/status/bucket per round — this box has ±30-70% co-tenant
drift and only interleaved comparisons are valid (CLAUDE.md).

Two regimes matter and the tool takes the mix as an argument:

  done_pct=85 — mature-frontier steady state: done/failed dominate, so
  the status partition already prunes ~90% and the bucket column's
  marginal value is small at local file sizes;
  done_pct=30 — backoff/trap-heavy regime (the round-5 motivation): most
  of the table is pending-but-delayed, status-only must SCAN it all and
  apply the precise timestamp filter row by row, while the bucket layout
  file-skips straight to the due buckets.

Usage: python tools/bench_partition_prune.py [n_rows] [trials] [done_pct]
Env:   BENCH_PRUNE_CPUS (default 8)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DONE_PCT = int(sys.argv[3]) if len(sys.argv) > 3 else 85
CPUS = int(os.environ.get("BENCH_PRUNE_CPUS", "8"))

NOW = datetime(2024, 1, 1, 12, 0, 0)


def synth_frontier(spark, n_rows, done_pct):
    """Deterministic frontier: ``done_pct``% done, 5% failed (neither
    ever read by admission), the rest pending — of which 9 in 10 are
    backoff/trap-delayed 3-48 h into future epoch-hour buckets. Columns
    match the crawl loop's frontier schema closely enough for the scan
    shape (metadata-width rows, same filter columns)."""
    from pyspark.sql import functions as F

    from s_crawler_spark.operators import frontier as fr

    mix = F.pmod(F.col("id"), F.lit(100))
    status = (F.when(mix < done_pct, F.lit(fr.STATUS_DONE))
              .when(mix < done_pct + 5, F.lit(fr.STATUS_FAILED))
              .otherwise(F.lit(fr.STATUS_PENDING)))
    # pending rows: id%10 == 0 → due now; else delayed 3..48 h (hour id%46+3)
    delay_h = (F.pmod(F.col("id"), F.lit(46)) + F.lit(3)).cast("int")
    now = F.lit(NOW).cast("timestamp")
    next_eligible = (
        F.when(status != fr.STATUS_PENDING, now)
        .when(F.pmod(F.col("id"), F.lit(10)) == 0, now)
        .otherwise(F.timestamp_add("HOUR", delay_h, now)))
    return (spark.range(n_rows)
            .select(
                F.concat(F.lit("https://h"),
                         F.pmod(F.col("id"), F.lit(10_000)).cast("string"),
                         F.lit(".example.com/p/"),
                         F.col("id").cast("string")).alias("url"),
                F.xxhash64(F.col("id")).alias("url_hash"),
                F.concat(F.lit("h"),
                         F.pmod(F.col("id"), F.lit(10_000)).cast("string"),
                         F.lit(".example.com")).alias("host"),
                F.lit(0).alias("priority"),
                F.lit(0).alias("wave"),
                F.col("id").alias("seq"),
                status.alias("status"),
                F.lit(0).alias("attempts"),
                F.lit(None).cast("string").alias("last_error"),
                next_eligible.alias("next_eligible"),
                now.alias("discovered_at"))
            .withColumn("next_eligible_bucket",
                        fr.eligible_bucket(F.col("next_eligible"))))


def main() -> None:
    from pyspark.sql import functions as F

    from s_crawler_spark.operators import frontier as fr
    from s_crawler_spark.session import get_spark
    from s_crawler_spark.sources.store import SnapshotStore

    spark = get_spark("bench-partition-prune", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="prune_bench_")
    layouts = {
        "flat": None,
        "status": ["status"],
        "bucket": ["status", "next_eligible_bucket"],
    }
    try:
        df = synth_frontier(spark, N_ROWS, DONE_PCT)
        stores = {}
        for name, part in layouts.items():
            st = SnapshotStore(os.path.join(root, name))
            st.commit(df, "frontier", 0, partition_by=part)
            stores[name] = st

        def timed_scan(st):
            t0 = time.perf_counter()
            row = (fr.eligible_pending(st.read(spark, "frontier"), NOW)
                   .agg(F.count("*").alias("n"),
                        F.expr("bit_xor(url_hash)").alias("h")).collect()[0])
            return time.perf_counter() - t0, (row["n"], row["h"])

        walls: dict[str, list[float]] = {k: [] for k in layouts}
        checks = set()
        for name, st in stores.items():  # warmup (JIT, page cache)
            _, chk = timed_scan(st)
            checks.add(chk)
        assert len(checks) == 1, f"layouts disagree: {checks}"
        for _ in range(TRIALS):  # interleaved trials
            for name, st in stores.items():
                w, chk = timed_scan(st)
                assert chk in checks
                walls[name].append(w)

        # bytes each layout's PartitionFilters admit to the scan — exact
        # and box-independent (this host's page-cached NVMe + small local
        # files put a task-planning floor under every wall, masking the
        # decode reduction; against cluster object storage the admitted
        # bytes ARE the scan cost). flat admits everything; status admits
        # the pending directory; bucket admits only the due bucket(s)
        # inside it (due rows are stamped at NOW, delayed ones 3-48 h
        # later, so the due bucket is the minimum bucket value present).
        def layout_bytes(name):
            snap = os.path.join(root, name, "frontier", "snap-0")
            total = 0
            pend_buckets: dict[int, int] = {}
            for dirpath, _, files in os.walk(snap):
                sz = sum(os.path.getsize(os.path.join(dirpath, f))
                         for f in files if f.endswith(".parquet"))
                if not sz:
                    continue
                if name == "flat":
                    total += sz
                elif "status=pending" in dirpath:
                    if name == "status":
                        total += sz
                    else:
                        b = int(dirpath.split("next_eligible_bucket=")[1]
                                .split(os.sep)[0])
                        pend_buckets[b] = pend_buckets.get(b, 0) + sz
            if name == "bucket":
                total = pend_buckets[min(pend_buckets)]
            return total

        admitted = {k: layout_bytes(k) for k in layouts}

        med = {k: statistics.median(v) for k, v in walls.items()}
        out = {
            "n_rows": N_ROWS,
            "done_pct": DONE_PCT,
            "cpus": CPUS,
            "due_rows": next(iter(checks))[0],
            "trials": TRIALS,
            "median_s": {k: round(v, 3) for k, v in med.items()},
            "all_s": {k: [round(x, 3) for x in v] for k, v in walls.items()},
            "speedup_vs_flat": {
                k: round(med["flat"] / med[k], 2) for k in ("status", "bucket")},
            "bucket_vs_status": round(med["status"] / med["bucket"], 2),
            "admitted_mb": {k: round(v / 1e6, 1) for k, v in admitted.items()},
            "admitted_ratio_vs_flat": {
                k: round(admitted["flat"] / admitted[k], 1)
                for k in ("status", "bucket")},
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
