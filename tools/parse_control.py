"""No-Spark scaling control for the 4->16 stress run (BENCH.md).

Runs the SAME parse+extract kernel the wave job's hot path runs (htmlsel
parse with in-parse indexing + the extract_core card/detail cascades) in P
plain pinned processes over the same materialized bench corpus, at two
process counts, interleaved. This isolates what the HOST's memory system
allows at 4->16 ways from anything Spark adds (shuffle, Arrow transfer,
JVM threads): if Spark's 4->16 efficiency matches this control, the gap to
1.0 is single-box memory bandwidth, not dataflow serialization.

Usage:
    python tools/parse_control.py [--lo 4] [--hi 16] [--trials 3]
        [--corpus /tmp/scrawl_bench/pages_sf0.1_x4_w2000] [--pages 12000]

Each worker process pins itself to ONE distinct hardware thread
(sched_setaffinity), parses its slice of pages, and runs the reference
extraction cascade per page kind; the trial's wall time is the slowest
worker (same barrier semantics as a Spark stage).
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    core, blobs = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    from s_crawler_spark.operators import extract_core as ec

    t0 = time.perf_counter()
    n = 0
    for kind, html in blobs:
        if kind == "search":
            ec.extract_cards(html, parse_dates=False)
        else:
            ec.extract_detail(html)
        n += 1
    return time.perf_counter() - t0, n


def load_pages(corpus_dir: str, limit: int):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(corpus_dir, "*.parquet"))):
        t = pq.read_table(f, columns=["url", "html"])
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        for u, h in zip(urls, htmls):
            kind = "search" if "startPage" in u else "detail"
            out.append((kind, bytes(h)))
            if len(out) >= limit:
                return out
    return out


def run_trial(pages, nproc: int) -> float:
    chunks = [(c, pages[c::nproc]) for c in range(nproc)]
    with mp.Pool(nproc) as pool:
        res = pool.map(_worker, chunks)
    return max(r[0] for r in res)  # barrier: stage ends at slowest worker


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--corpus",
                    default="/tmp/scrawl_bench/pages_sf0.1_x4_w2000")
    ap.add_argument("--pages", type=int, default=12000)
    args = ap.parse_args()

    pages = load_pages(args.corpus, args.pages)
    print(f"{len(pages)} pages, "
          f"{sum(len(h) for _, h in pages) / 2**20:.0f} MiB html")

    run_trial(pages[: len(pages) // 8], args.hi)  # warmup / import cost
    times = {args.lo: [], args.hi: []}
    for t in range(args.trials):
        order = (args.lo, args.hi) if t % 2 == 0 else (args.hi, args.lo)
        for p in order:
            dt = run_trial(pages, p)
            times[p].append(dt)
            print(f"trial {t} procs={p}: {dt:.2f}s "
                  f"({len(pages) / dt:.0f} pages/s)", flush=True)

    t_lo = statistics.median(times[args.lo])
    t_hi = statistics.median(times[args.hi])
    eff = (t_lo / t_hi) / (args.hi / args.lo)
    print(f"\ncontrol efficiency {args.lo}->{args.hi}: {eff:.2f} "
          f"(medians {t_lo:.2f}s -> {t_hi:.2f}s; "
          f"all lo={sorted(times[args.lo])}, hi={sorted(times[args.hi])})")
    return 0


if __name__ == "__main__":
    main()
