"""traps.py: URL shape features and the per-host trap flag vs hand cases."""

from s_crawler_spark.operators import traps as tp


def _feats(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: (r["path_depth"], r["max_repeat_seg"],
                       r["n_query_params"])
            for r in tp.url_trap_features(df).collect()}


def test_url_trap_features_hand(spark):
    got = _feats(spark, [
        "https://h.org/a/b/c",
        "https://h.org/a/b/a/a",            # 'a' x3
        "https://h.org/",                   # empty path
        "https://h.org/p?x=1&y=2&x=3",
        "https://h.org/p?x=1#f&g",          # fragment params don't count
        "https://h.org/cal/2024/01/01/2024/01/01",
    ])
    assert got["https://h.org/a/b/c"] == (3, 1, 0)
    assert got["https://h.org/a/b/a/a"] == (4, 3, 0)
    assert got["https://h.org/"] == (0, 0, 0)
    assert got["https://h.org/p?x=1&y=2&x=3"] == (1, 1, 3)
    assert got["https://h.org/p?x=1#f&g"] == (1, 1, 1)
    assert got["https://h.org/cal/2024/01/01/2024/01/01"] == (7, 4, 0)


def test_trap_hosts_flag(spark):
    # trap.org: 3 of 4 URLs suspicious (>= 50%); ok.org: 0 of 2
    urls = ["https://trap.org/" + "/".join(["loop"] * 8),
            "https://trap.org/a/b/a/a/a",
            "https://trap.org/p?" + "&".join(f"k{i}=1" for i in range(9)),
            "https://trap.org/fine",
            "https://ok.org/a/b",
            "https://ok.org/c?x=1"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["host"]: r.asDict() for r in tp.trap_hosts(df).collect()}
    t = got["trap.org"]
    assert (t["n_urls"], t["n_deep"], t["n_repeat"], t["n_query_heavy"],
            t["n_suspicious"], t["is_trap"]) == (4, 1, 2, 1, 3, 1)
    o = got["ok.org"]
    assert (o["n_suspicious"], o["is_trap"]) == (0, 0)


def test_trap_guard_withholds_admission(spark):
    """The crawl-loop guard composition: flagged hosts' pending rows are
    excluded from admission, clean hosts unaffected."""
    from pyspark.sql import functions as F
    pending = spark.createDataFrame(
        [("https://trap.org/" + "/".join(["p"] * 9), "trap.org", i)
         for i in range(4)]
        + [("https://ok.org/a%d" % i, "ok.org", 10 + i) for i in range(3)],
        "url string, host string, seq long")
    flagged = (tp.trap_hosts(pending)
               .filter(F.col("is_trap") == 1).select("host"))
    kept = pending.join(flagged, on="host", how="left_anti")
    assert {r["host"] for r in kept.collect()} == {"ok.org"}
    assert kept.count() == 3


def test_trap_guard_noop_on_clean_corpus(spark, pages, pages_dict, tmp_path):
    from s_crawler_spark.corpus import seed_search_url
    from s_crawler_spark.plans.reference_sim import simulate_crawl
    from s_crawler_spark.plans.wave import crawl
    from s_crawler_spark.sources.store import SnapshotStore
    from tests.test_wave_parity import assert_parity
    sim, _ = simulate_crawl(pages_dict, seed_search_url(), max_count=10**9)
    store = SnapshotStore(str(tmp_path / "tg"))
    cat = crawl(spark, pages, seed_search_url(), store, wave_seconds=3600,
                max_waves=10, n_shards=4, trap_guard=True)
    assert_parity(cat.collect(), sim)
