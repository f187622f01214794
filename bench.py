"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric follows BASELINE.json: URLs fetched+parsed per second
(per executor — local mode is one executor). The crawl corpus is synthesized
deterministically from the sf documents table once and cached as parquet
(input preparation, untimed — the engine's contract input is a materialized
pages table, per input_hint); the timed portion is the crawl-wave DataFrame
job itself plus the training-pipeline operator suite.

Env knobs:
  SPARK_GRAFT_SF_DIR   input tables dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local parallelism  (default 32)
  BENCH_SCALE          corpus replication factor (default 1) — replicates the
                       documents table with offset doc_ids to grow the crawl
                       corpus deterministically for scaling runs
  BENCH_QUERIES        comma-separated subset to run (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("BENCH_SCALE", "1"))
WEIGHT = int(os.environ.get("BENCH_WEIGHT", "0"))  # filler spans per page
REPEAT = int(os.environ.get("BENCH_REPEAT", "1"))
CACHE_ROOT = os.environ.get("BENCH_CACHE", "/tmp/scrawl_bench")


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from s_crawler_spark.corpus import seed_search_url, synthesize_pages
    from s_crawler_spark.operators import similarity as sim
    from s_crawler_spark.operators import textdedup as td
    from s_crawler_spark.operators import textstats as tstats
    from s_crawler_spark.plans import wave as wv
    from s_crawler_spark.session import get_spark

    spark = get_spark("s_crawler_spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    sf_name = os.path.basename(SF_DIR.rstrip("/"))

    # ---- untimed input prep: materialize the pages corpus once ----------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    if SCALE > 1:
        parts = [docs]
        for r in range(1, SCALE):
            parts.append(docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(r * n_docs)))
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionByName(p)
        n_docs *= SCALE

    corpus_path = f"{CACHE_ROOT}/pages_{sf_name}_x{SCALE}_w{WEIGHT}"
    docs_path = f"{CACHE_ROOT}/docs_{sf_name}_x{SCALE}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        docs.write.mode("overwrite").parquet(docs_path)
        pages_df = _synthesize_from_docs(spark, docs_path, WEIGHT)
        # enough files that any core count up to 64 gets whole input splits
        pages_df.repartition(64).write.mode("overwrite").parquet(corpus_path)
    pages = spark.read.parquet(corpus_path)
    n_pages = pages.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    timings: dict[str, float] = {}
    only = os.environ.get("BENCH_QUERIES")
    only = set(only.split(",")) if only else None

    def bench(name, fn, warm=None, repeat=None):
        if only and name not in only:
            return
        (warm or fn)()  # warmup: JIT/codegen + python-worker pool + AQE paths
        best = None
        for _ in range(repeat if repeat is not None else REPEAT):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # ---- headline: one full crawl wave over the materialized corpus ----
    # best-of-3 for the headline denominator: this box has ±30-70% co-tenant
    # epoch noise, and the driver records ONE bench run — a single timed
    # sample would make the headline rate a coin flip (r03→r04 drafts swung
    # 3.95↔4.78 s on an unchanged plan).
    bench("crawl_wave",
          lambda: _noop_write(wv.run_wave(pages, seed_search_url())),
          warm=lambda: _noop_write(
              wv.run_wave(pages.sample(0.03, seed=1), seed_search_url())),
          repeat=max(REPEAT, 3))

    # ---- training-pipeline operator suite -------------------------------
    bench("dedup_exact", lambda: _noop_write(td.exact_dedup(docs)))
    bench("dedup_minhash_lsh", lambda: _noop_write(
        td.minhash_lsh_pairs(docs.filter(F.col("doc_id") < 2000), threshold=0.7)))
    bench("dedup_simhash", lambda: _noop_write(td.simhash_table(docs)))
    bench("dedup_substring", lambda: _noop_write(td.duplicated_spans(docs)))
    bench("text_quality", lambda: _noop_write(tstats.quality_table(docs)))
    bench("lang_id", lambda: _noop_write(tstats.lang_id_table(docs)))
    bench("doc_fingerprint", lambda: _noop_write(tstats.fingerprint_table(docs)))
    bench("doc_repetition", lambda: _noop_write(tstats.repetition_table(docs)))
    bench("benchmark_contam", lambda: _noop_write(tstats.contamination_table(
        docs, docs.filter(F.col("doc_id") % 37 == 1)
        .select(F.col("doc_id").alias("bench_id"), "text"))))

    # ---- iterative graph ops (fixed-point PageRank, closure contraction) --
    from s_crawler_spark.operators import linkgraph as lg
    from s_crawler_spark.plans import contract as ct
    bench("url_pagerank", lambda: _noop_write(
        lg.pagerank(ct._url_edges(spark, SF_DIR), n_iter=5)))
    bench("dedup_clusters", lambda: _noop_write(td.near_dup_clusters(
        td.minhash_lsh_pairs(docs.filter(F.col("doc_id") < 2000),
                             threshold=0.7))))
    from s_crawler_spark.operators import recrawl as rcw
    bench("recrawl_schedule", lambda: _noop_write(
        rcw.recrawl_schedule(ct._fetch_history(spark, SF_DIR))))
    bench("redirect_resolve", lambda: _noop_write(
        lg.resolve_redirects(ct._redirect_edges(spark, SF_DIR))))
    bench("sitemap_ingest", lambda: _noop_write(
        ct.q_sitemap_ingest(spark, SF_DIR)))
    bench("trap_features", lambda: _noop_write(
        ct.q_trap_features(spark, SF_DIR)))

    # ---- multi-wave loop end-to-end (includes state-commit I/O) ----------
    # plain vs production-defaults composition: AIMD adaptive delays +
    # spider-trap guard + snapshot expiry + PageRank-primed admission
    # priorities, all in ONE loop — the control loops are benched solo
    # above; composition is where extra per-wave scans could stack.
    import tempfile as _tmp

    from s_crawler_spark.operators import extract as ex
    from s_crawler_spark.sources.store import SnapshotStore

    def _loop(**kw):
        import shutil

        root = _tmp.mkdtemp(prefix="bench_loop_")
        try:
            wv.crawl(spark, pages, seed_search_url(), SnapshotStore(root),
                     wave_seconds=1000, max_waves=12, n_shards=8, **kw)
        finally:
            # repeated bench runs must not strand multi-wave parquet
            # stores in /tmp (the rmtree is ~ms against a 30-60 s loop)
            shutil.rmtree(root, ignore_errors=True)

    def _rank_priorities():
        # a real link graph from the corpus itself: search page → card URL
        cards = ex.explode_cards(wv.search_pages(pages, seed_search_url()))
        edges = cards.select(
            F.concat(F.lit("page:"), F.col("page_num").cast("string"))
            .alias("src"),
            F.col("url").alias("dst"))
        return (lg.pagerank(edges, n_iter=3)
                .select("url",
                        (-F.floor(F.col("rank") / 1024)).cast("int")
                        .alias("priority"))
                .localCheckpoint(eager=False))

    bench("multiwave_loop", lambda: _loop(), warm=lambda: None)
    if only is None or "multiwave_composed" in only:
        prio = _rank_priorities()
        bench("multiwave_composed",
              lambda: _loop(adaptive_delay=True, trap_guard=True,
                            expire_keep=2, priority_df=prio),
              warm=lambda: None)

    def _queries_df():
        return emb.filter(F.col("vec_id") < 32).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))

    bench("ann_cosine_topk",
          lambda: _noop_write(sim.brute_force_topk(emb, _queries_df(), k=10)))
    bench("ann_ivf_topk",
          lambda: _noop_write(sim.ivf_topk(emb, _queries_df(), k=10, dim=64)))
    bench("ann_topk_vectorized",
          lambda: _noop_write(sim.topk_vectorized(emb, _queries_df(), k=10)))
    bench("ann_lsh_topk",
          lambda: _noop_write(sim.lsh_topk(emb, _queries_df(), k=10, dim=64)))
    bench("ann_lsh_near_dup",
          lambda: _noop_write(sim.lsh_near_dup_pairs(emb, 0.4, dim=64)))

    total = round(sum(timings.values()), 3)
    wave_s = timings.get("crawl_wave")
    out = {
        # headline value IS the rate the metric names (BASELINE.json);
        # suite wall-time lives under total_suite_sec
        "metric": "urls_fetched_parsed_per_sec_per_executor",
        "value": round(n_pages / wave_s, 2) if wave_s else None,
        "unit": "urls/sec",
        "total_suite_sec": total,
        "queries": timings,
        "sf": sf_name,
        "cpus": CPUS,
        "scale": SCALE,
        "page_weight": WEIGHT,
        "n_docs": n_docs,
        "n_pages": n_pages,
        "urls_per_sec": round(n_pages / wave_s, 2) if wave_s else None,
    }
    print(json.dumps(out))


def _synthesize_from_docs(spark, docs_parquet_dir: str, filler: int = 0):
    """corpus.synthesize_pages, pointed at an arbitrary docs parquet dir.

    synthesize_pages reads {sf_dir}/documents.parquet — give it a dir shaped
    that way via a symlink."""
    from s_crawler_spark import corpus as cg

    shim_dir = docs_parquet_dir + "_shim"
    os.makedirs(shim_dir, exist_ok=True)
    link = os.path.join(shim_dir, "documents.parquet")
    if not os.path.islink(link) and not os.path.exists(link):
        os.symlink(docs_parquet_dir, link)
    return cg.synthesize_pages(spark, shim_dir, filler=filler)


if __name__ == "__main__":
    main()
