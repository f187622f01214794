"""recrawl.recrawl_schedule AIMD fold + politeness.adapt_host_policy vs
hand-computed sequences (integer arithmetic, so equality is exact)."""

from pyspark.sql import functions as F

from s_crawler_spark.operators import politeness as po
from s_crawler_spark.operators import recrawl as rc


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, wave int, content_md5 string")


def _sched(spark, rows):
    return {r["url"]: r.asDict()
            for r in rc.recrawl_schedule(_hist(spark, rows)).collect()}


def test_schedule_hand_fold(spark):
    # u1: md5 stream a a b b c  -> flags 0 1 0 1
    #     interval 4 ->5 ->2 ->3 ->1 ; next = 4 + 1
    # u2: static   x x x        -> flags 0 0 -> 4 ->5 ->6 ; next = 2 + 6
    # u3: single fetch          -> no flags  -> 4        ; next = 0 + 4
    rows = ([("u1", w, m) for w, m in enumerate("aabbc")]
            + [("u2", w, "x") for w in range(3)]
            + [("u3", 0, "y")])
    got = _sched(spark, rows)
    assert got["u1"] == {"url": "u1", "n_fetches": 5, "n_changes": 2,
                         "interval": 1, "next_fetch_wave": 5}
    assert got["u2"] == {"url": "u2", "n_fetches": 3, "n_changes": 0,
                         "interval": 6, "next_fetch_wave": 8}
    assert got["u3"] == {"url": "u3", "n_fetches": 1, "n_changes": 0,
                         "interval": 4, "next_fetch_wave": 4}


def test_schedule_clamps(spark):
    # every-fetch change pins the interval at MIN_INTERVAL
    churn = [("c", w, str(w)) for w in range(6)]
    got = _sched(spark, churn)["c"]
    assert got["interval"] == rc.MIN_INTERVAL
    assert got["n_changes"] == 5
    # order of ingestion must not matter (sort_array owns the wave order)
    got_rev = _sched(spark, list(reversed(churn)))["c"]
    assert got == got_rev


def test_due_for_recrawl_filters(spark):
    rows = [("u1", w, m) for w, m in enumerate("aabbc")] \
        + [("u2", w, "x") for w in range(3)]
    sched = rc.recrawl_schedule(_hist(spark, rows))
    due = {r["url"] for r in rc.due_for_recrawl(sched, 5).collect()}
    assert due == {"u1"}  # u1 due at wave 5, u2 not until 8


def _policy(spark, hosts, delay):
    return po.default_host_policy(spark, hosts, crawl_delay_ms=delay)


def _adapt(spark, policy, rows):
    res = spark.createDataFrame(rows, "host string, success boolean")
    return {r["host"]: r["crawl_delay_ms"]
            for r in po.adapt_host_policy(policy, res).collect()}


def test_adapt_branches(spark):
    pol = _policy(spark, ["a", "b", "c"], 1000)
    got = _adapt(spark, pol, [("a", False), ("a", True), ("b", True)])
    assert got == {"a": 2000,   # any failure doubles
                   "b": 750,    # all-success decays 3/4
                   "c": 1000}   # no outcomes -> unchanged


def test_adapt_clamps_and_schema(spark):
    pol = _policy(spark, ["hi", "lo"], po.MAX_CRAWL_DELAY_MS)
    got = _adapt(spark, pol, [("hi", False)])
    assert got["hi"] == po.MAX_CRAWL_DELAY_MS  # already at ceiling
    low = _policy(spark, ["lo"], po.MIN_CRAWL_DELAY_MS)
    assert _adapt(spark, low, [("lo", True)])["lo"] == po.MIN_CRAWL_DELAY_MS
    # output schema is a valid host_policy (compose_wave can consume it)
    out = po.adapt_host_policy(pol, spark.createDataFrame(
        [("hi", True)], "host string, success boolean"))
    assert out.columns == pol.columns


# ---- authority-proportional budget apportionment -------------------------

def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "host string, host_rank long")


def _apportion(spark, rows, budget):
    return {r["host"]: r["host_budget"]
            for r in po.apportion_budget(_rank_df(spark, rows), budget).collect()}


def test_apportion_hamilton_exact(spark):
    # quotas for 10 slots over 5:3:2 -> exact 5,3,2 (no remainders)
    assert _apportion(spark, [("a", 5), ("b", 3), ("c", 2)], 10) == \
        {"a": 5, "b": 3, "c": 2}
    # 7 slots over 1:1:1 -> base 2 each, remainder 1 goes to lowest host name
    assert _apportion(spark, [("a", 1), ("b", 1), ("c", 1)], 7) == \
        {"a": 3, "b": 2, "c": 2}
    # classic Hamilton: 25 slots over 47:29:24 -> quotas 11.75/7.25/6.0
    #  -> base 11,7,6 (sum 24), largest remainder (.75) takes the last slot
    assert _apportion(spark, [("x", 47), ("y", 29), ("z", 24)], 25) == \
        {"x": 12, "y": 7, "z": 6}


def test_apportion_sums_to_budget_and_zero_guard(spark):
    got = _apportion(spark, [("h%d" % i, (i * 37) % 11 + 1) for i in range(20)], 101)
    assert sum(got.values()) == 101
    # zero authority everywhere degrades to zero allocation, not a crash
    assert _apportion(spark, [("a", 0), ("b", 0)], 10) == {"a": 0, "b": 0}


def test_compose_wave_budget_override(spark):
    from tests.test_frontier import T0, make_candidates
    from s_crawler_spark.operators import frontier as fr
    frontier = fr.enqueue(make_candidates(spark, 30), wave=0, logical_now=T0)
    policy = po.default_host_policy(spark, ["h0.org", "h1.org", "h2.org"],
                                    crawl_delay_ms=1000)
    alloc = spark.createDataFrame([("h0.org", 5), ("h1.org", 1)],
                                  "host string, host_budget int")
    batch = po.compose_wave(fr.eligible_pending(frontier, T0), policy,
                            wave_seconds=4, host_budget=alloc)
    got = {r["host"]: r["count"]
           for r in batch.groupBy("host").count().collect()}
    # allocation caps at min(allocated, crawl-delay budget): h0's 5 slots
    # clamp to the politeness budget of 4 (capacity never loosens
    # politeness); h2 absent from the allocation waits
    assert got == {"h0.org": 4, "h1.org": 1}
