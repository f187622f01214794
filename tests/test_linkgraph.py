"""linkgraph.pagerank vs an independent sequential reimplementation of the
same integer fixed-point recurrence (exactness is the whole contract —
integer sums are shuffle-order-independent, so Spark must equal the
sequential fold bit-for-bit)."""

from pyspark.sql import functions as F

from s_crawler_spark.operators import linkgraph as lg


def pagerank_seq(edges, n_iter=5, damp=lg.DAMPING_BP, scale=lg.RANK_SCALE):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {u: scale // n for u in nodes}
    base = (scale // n) * (10000 - damp) // 10000
    for _ in range(n_iter):
        contrib = {u: 0 for u in nodes}
        for s, d in edges:
            contrib[d] += r[s] // out[s]
        r = {u: base + damp * contrib[u] // 10000 for u in nodes}
    return r


def run(spark, edges, n_iter=5):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {row["url"]: row["rank"]
           for row in lg.pagerank(df, n_iter=n_iter).collect()}
    assert got == pagerank_seq(edges, n_iter)
    return got


def test_pagerank_triangle_with_dangling(spark):
    run(spark, [("A", "B"), ("B", "A"), ("A", "C")])


def test_pagerank_parallel_edges_vote_twice(spark):
    g1 = run(spark, [("A", "B"), ("A", "B"), ("A", "C")])
    g2 = run(spark, [("A", "B"), ("A", "C")])
    assert g1["B"] > g2["B"]  # double listing = double vote


def test_pagerank_star_and_chain(spark):
    hub = [("H", f"L{i}") for i in range(10)] + [(f"L{i}", "H") for i in range(10)]
    got = run(spark, hub + [("L0", "X"), ("X", "Y")])
    assert got["H"] == max(got.values())


def test_priority_from_rank_orders_authority_first(spark):
    edges = [("A", "B"), ("C", "B"), ("A", "C")]
    ranks = lg.pagerank(
        spark.createDataFrame(edges, "src string, dst string"), n_iter=3)
    frontier = spark.createDataFrame(
        [("B", 0, 1), ("C", 0, 2), ("Z", 0, 3)],
        "url string, priority int, seq long")
    got = {r["url"]: r["priority"]
           for r in lg.priority_from_rank(frontier, ranks).collect()}
    seq = pagerank_seq(edges, 3)
    assert got == {"B": -(seq["B"] // 1024), "C": -(seq["C"] // 1024), "Z": 0}
    # admission sorts ascending (priority, seq): 2-in-link B first, then C,
    # then the unranked URL draining FIFO last.
    assert got["B"] < got["C"] < got["Z"]


def test_host_rollup_sums_members(spark):
    edges = [("https://a.org/1", "https://a.org/2"),
             ("https://a.org/2", "https://b.org/1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = lg.pagerank(df, n_iter=3)
    roll = {r["host"]: (r["host_rank"], r["n_urls"])
            for r in lg.host_rank_rollup(ranks).collect()}
    seq = pagerank_seq(edges, 3)
    assert roll["a.org"] == (seq["https://a.org/1"] + seq["https://a.org/2"], 2)
    assert roll["b.org"] == (seq["https://b.org/1"], 1)


def test_host_rollup_key_matches_frontier_host(spark):
    """The rollup key must be parse_url(HOST) — identical to the host the
    frontier stamps at enqueue — or a userinfo/port URL's authority lands
    under a key compose_wave's host_budget join never matches (budget 0 =
    silent starvation under an explicit allocation)."""
    from pyspark.sql import functions as F

    from s_crawler_spark.operators import frontier as fr

    edges = [("https://user@a.org:8443/1", "https://a.org/2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    roll = lg.host_rank_rollup(lg.pagerank(df, n_iter=1))
    cand = spark.createDataFrame(
        [("https://user@a.org:8443/1", 0, 0)],
        "url string, page_num int, card_idx int")
    fhost = fr.enqueue(cand, 0, "2024-01-01").select("host").collect()[0][0]
    hosts = {r["host"] for r in roll.collect()}
    assert fhost in hosts  # the authority key set covers the frontier key


def test_resolve_redirects_chain_and_cycle(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "T"),       # 3-chain to terminal
             ("x", "y"), ("y", "x"),                   # 2-cycle
             ("p", "q")]                               # 1 hop
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    got = {r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
           for r in lg.resolve_redirects(df, max_hops=16).collect()}
    assert got["a"] == ("T", 3, 1)
    assert got["b"] == ("T", 2, 1)
    assert got["c"] == ("T", 1, 1)
    assert got["p"] == ("q", 1, 1)
    # cycle: capped at exactly max_hops steps, never resolved;
    # 16 is even so both cycle members land back on themselves' successor
    assert got["x"] == ("x", 16, 0)
    assert got["y"] == ("y", 16, 0)


def test_resolve_redirects_long_chain_cap(spark):
    n = 25  # longer than max_hops=16
    edges = [(f"n{i}", f"n{i+1}") for i in range(n)]
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    got = {r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
           for r in lg.resolve_redirects(df, max_hops=16).collect()}
    assert got["n0"] == ("n16", 16, 0)   # capped mid-chain, unresolved
    assert got["n10"] == (f"n{n}", n - 10, 1)  # tail fits in the cap
    # non-functional input normalizes to min dst
    df2 = spark.createDataFrame([("a", "z"), ("a", "b"), ("b", "T")],
                                "src_url string, dst_url string")
    got2 = {r["src_url"]: r["final_url"]
            for r in lg.resolve_redirects(df2).collect()}
    assert got2["a"] == "T"  # min("b","z") = "b" -> T
