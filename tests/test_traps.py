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
