"""Two-parallelism scaling evidence (BASELINE.json north rule).

Runs the identical crawl-wave job at N and 4N local cores over the same
materialized corpus, interleaving trials (lo, hi, lo, hi, ...) so slow
environmental drift cancels, and reports median wall time, throughput at
both levels, and scaling efficiency (T_N / T_4N) / 4. Results are written
between the SCALING_RESULTS markers in BENCH.md.

Usage:
    python tools/bench_scaling.py [--lo 4] [--hi 16] [--trials 3]
                                  [--scale 4] [--weight 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, scale: int, weight: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               BENCH_SCALE=str(scale),
               BENCH_WEIGHT=str(weight),
               BENCH_REPEAT="1",
               BENCH_QUERIES="crawl_wave")
    # taskset pins the WHOLE process tree (JVM scan/shuffle threads + Python
    # workers) to exactly `cpus` hardware threads — local[N] alone only
    # bounds task slots, letting JVM I/O threads ride on extra cores, which
    # inflates small-N throughput and understates scaling efficiency.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "bench.py"]
    out = subprocess.run(cmd, cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1200)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--weight", type=int, default=2000)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    times = {args.lo: [], args.hi: []}
    meta = None
    for t in range(args.trials):
        # alternate leg order so slow environmental drift (co-tenant load,
        # frequency changes) cancels across the trial set
        order = (args.lo, args.hi) if t % 2 == 0 else (args.hi, args.lo)
        for cpus in order:
            r = run_once(cpus, args.scale, args.weight, args.sf_dir)
            meta = r
            dt = r["queries"]["crawl_wave"]
            times[cpus].append(dt)
            print(f"trial {t} cpus={cpus}: {dt:.2f}s "
                  f"({r['n_pages'] / dt:.0f} urls/s)", flush=True)

    t_lo = statistics.median(times[args.lo])
    t_hi = statistics.median(times[args.hi])
    ratio = args.hi / args.lo
    eff = (t_lo / t_hi) / ratio
    n_pages = meta["n_pages"]
    lines = [
        f"Corpus: {meta['n_docs']} articles / {n_pages} pages, "
        f"page weight {args.weight} spans, sf={meta['sf']} ×{args.scale}.",
        "",
        "| cores | median wall (s) | URLs fetched+parsed/s | per-core |",
        "|---|---|---|---|",
        f"| {args.lo} (N) | {t_lo:.2f} | {n_pages / t_lo:.0f} | {n_pages / t_lo / args.lo:.1f} |",
        f"| {args.hi} (4N) | {t_hi:.2f} | {n_pages / t_hi:.0f} | {n_pages / t_hi / args.hi:.1f} |",
        "",
        f"**Scaling efficiency N→4N: {eff:.2f}** "
        f"(speedup {t_lo / t_hi:.2f}× on {ratio:.0f}× cores; "
        f"{args.trials} interleaved trials per level, medians).",
        "",
        f"All trials: N={sorted(times[args.lo])}, 4N={sorted(times[args.hi])} (s).",
    ]
    block = "\n".join(lines)
    print("\n" + block)

    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md) as f:
        content = f.read()
    marker = "<!-- SCALING_RESULTS -->"
    if marker in content:
        pre = content.split(marker)[0]
        post = content.split("<!-- /SCALING_RESULTS -->")[-1] \
            if "<!-- /SCALING_RESULTS -->" in content else \
            content.split(marker, 1)[1]
        content = pre + marker + "\n" + block + "\n<!-- /SCALING_RESULTS -->" + post
        with open(bench_md, "w") as f:
            f.write(content)
        print(f"\nwrote results into {bench_md}")
    return 0


if __name__ == "__main__":
    main()
