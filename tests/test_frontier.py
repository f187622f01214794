"""Frontier: seq ordering, FIFO dequeue, retry/backoff bookkeeping, salting,
politeness wave budgets."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from s_crawler_spark.operators import frontier as fr
from s_crawler_spark.operators import politeness as po

T0 = datetime(2024, 6, 1)


def make_candidates(spark, n=30):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 3).cast("string"),
                 F.lit(".org/doi/10.1/x"), F.col("id").cast("string")).alias("url"),
        (F.col("id") / 10).cast("int").alias("page_num"),
        (F.col("id") % 10).cast("int").alias("card_idx"),
    )


def test_composite_seq_is_order_isomorphic(spark):
    df = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 0, 2), (2, 0, 0), (0, 2, 0)],
        "wave int, page int, idx int")
    out = df.select("wave", "page", "idx",
                    fr.composite_seq(F.col("wave"), F.col("page"), F.col("idx"))) \
        .orderBy("seq").collect()
    assert [(r["wave"], r["page"], r["idx"]) for r in out] \
        == sorted([(0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 0, 2), (2, 0, 0), (0, 2, 0)])


def test_enqueue_and_fifo_dequeue(spark):
    frontier = fr.enqueue(make_candidates(spark), wave=0, logical_now=T0)
    assert frontier.filter(F.col("status") == "pending").count() == 30
    batch = fr.fifo_dequeue(frontier, T0, batch=7).collect()
    assert len(batch) == 7
    seqs = [r["seq"] for r in batch]
    assert seqs == sorted(seqs)
    all_seqs = sorted(r["seq"] for r in frontier.collect())
    assert seqs == all_seqs[:7]  # strictly the FIRST 7 in crawl order


def test_record_results_transitions_and_backoff(spark):
    frontier = fr.enqueue(make_candidates(spark, 4), wave=0, logical_now=T0)
    hashes = [r["url_hash"] for r in frontier.orderBy("seq").collect()]
    results = spark.createDataFrame(
        [(hashes[0], True, None), (hashes[1], False, "boom" * 500)],
        "url_hash long, success boolean, error string")
    updated = fr.record_results(frontier, results, T0)
    rows = {r["url_hash"]: r for r in updated.collect()}
    assert rows[hashes[0]]["status"] == "done"
    r1 = rows[hashes[1]]
    assert r1["status"] == "pending" and r1["attempts"] == 1
    assert len(r1["last_error"]) == 1000                  # truncated
    assert r1["next_eligible"] == T0 + timedelta(seconds=2)   # 2^1
    assert rows[hashes[2]]["status"] == "pending" and rows[hashes[2]]["attempts"] == 0

    # not yet eligible before backoff elapses, eligible after
    assert fr.eligible_pending(updated, T0).filter(
        F.col("url_hash") == hashes[1]).count() == 0
    assert fr.eligible_pending(updated, T0 + timedelta(seconds=2)).filter(
        F.col("url_hash") == hashes[1]).count() == 1

    # third failure retires the row (MAX_ATTEMPTS=3)
    fail = spark.createDataFrame([(hashes[1], False, "x")],
                                 "url_hash long, success boolean, error string")
    u2 = fr.record_results(updated, fail, T0)
    u3 = fr.record_results(u2, fail, T0)
    final = {r["url_hash"]: r for r in u3.collect()}[hashes[1]]
    assert final["status"] == "failed" and final["attempts"] == 3


def test_compose_wave_budget_caps_per_host(spark):
    frontier = fr.enqueue(make_candidates(spark, 30), wave=0, logical_now=T0)
    policy = po.default_host_policy(spark, ["h0.org", "h1.org", "h2.org"],
                                    crawl_delay_ms=1000)
    batch = po.compose_wave(fr.eligible_pending(frontier, T0), policy,
                            wave_seconds=4)  # budget 4 per host
    got = batch.groupBy("host").count().collect()
    assert {r["host"]: r["count"] for r in got} == \
        {"h0.org": 4, "h1.org": 4, "h2.org": 4}
    # within a host, FIFO by seq
    h0 = [r["seq"] for r in batch.filter(F.col("host") == "h0.org").collect()]
    all_h0 = sorted(r["seq"] for r in frontier.filter(F.col("host") == "h0.org").collect())
    assert sorted(h0) == all_h0[:4]


def test_compose_wave_zipf_head_bounded(spark):
    """10^6-row single-host frontier (the Zipf-head shape): two-phase
    admission still returns exactly the budget-first rows by (priority,
    seq) — local pruning is prefix-stable — while the global per-host
    window's input is bounded to budget × partitions rows (plan pin in
    tools/explain_audit.py)."""
    n = 1_000_000
    pending = (spark.range(n).repartition(8)
               .select(F.lit("head.org").alias("host"),
                       F.concat(F.lit("https://head.org/p/"),
                                F.col("id")).alias("url"),
                       F.lit(0).alias("priority"),
                       F.col("id").alias("seq")))
    policy = po.default_host_policy(spark, ["head.org"], crawl_delay_ms=1000)
    batch = po.compose_wave(pending, policy, wave_seconds=60)  # budget 60
    got = sorted(r["seq"] for r in batch.collect())
    assert got == list(range(60))


def test_compose_wave_robots_disallow(spark):
    frontier = fr.enqueue(make_candidates(spark, 9), wave=0, logical_now=T0)
    policy = spark.createDataFrame(
        [("h0.org", 1000, ["/doi/"], [], "ua"),
         ("h1.org", 1000, ["/other/"], [], "ua"),
         ("h2.org", 1000, [], [], "ua")],
        po.HOST_POLICY_SCHEMA)
    batch = po.compose_wave(fr.eligible_pending(frontier, T0), policy, 3600)
    hosts = {r["host"] for r in batch.collect()}
    assert hosts == {"h1.org", "h2.org"}  # all h0 paths start /doi/ → blocked


def test_compose_wave_robots_col_fast_path_matches_fold(spark):
    """The stored-bit admission path (decorate_robots_ok at enqueue +
    compose_wave(robots_col=...)) must admit EXACTLY the rows the
    in-admission fold admits — including Allow-overrides-Disallow
    precedence — while carrying no rule arrays into the wave scan."""
    frontier = fr.enqueue(make_candidates(spark, 9), wave=0, logical_now=T0)
    policy = spark.createDataFrame(
        [("h0.org", 1000, ["/doi/"], [], "ua"),                  # all blocked
         ("h1.org", 1000, ["/doi/"], ["/doi/10.1/x1"], "ua"),    # one allowed
         ("h2.org", 1000, [], [], "ua")],                        # all allowed
        po.HOST_POLICY_SCHEMA)
    slow = po.compose_wave(fr.eligible_pending(frontier, T0), policy, 3600)
    fast = po.compose_wave(
        po.decorate_robots_ok(fr.eligible_pending(frontier, T0), policy),
        policy, 3600, robots_col="robots_ok")
    want = sorted(r["seq"] for r in slow.collect())
    got = sorted(r["seq"] for r in fast.collect())
    assert got == want and want  # non-degenerate: some rows admitted
    # the allow-precedence row survived both paths
    assert {r["url"] for r in fast.collect()
            if r["host"] == "h1.org"} == {"https://h1.org/doi/10.1/x1"}


def test_decorate_robots_ok_collapses_duplicate_policy_hosts(spark):
    """A rules table with duplicate host rows must not fan enqueued URLs
    out into duplicate (persisted!) frontier rows: decorate collapses to
    one row per host with the rule lists unioned — a blocking rule in ANY
    duplicate row blocks."""
    rows = fr.enqueue(make_candidates(spark, 3), wave=0, logical_now=T0)
    rules = spark.createDataFrame(
        [("h0.org", 1000, ["/doi/"], [], "ua"),
         ("h0.org", 2000, [], [], "ua")],
        po.HOST_POLICY_SCHEMA)
    out = po.decorate_robots_ok(rows, rules)
    assert out.count() == 3  # no fan-out
    vals = {r["host"]: r["robots_ok"] for r in out.collect()}
    assert vals["h0.org"] is False   # merged rules: the blocking row wins
    assert vals["h1.org"] is True and vals["h2.org"] is True


def test_salt_partitions_spreads_hot_host(spark):
    frontier = fr.enqueue(make_candidates(spark, 30), wave=0, logical_now=T0)
    salted = fr.salt_partitions(frontier, n_buckets=8)
    assert salted.rdd.getNumPartitions() == 8
    n_salts = salted.filter(F.col("host") == "h0.org") \
        .select("salt").distinct().count()
    assert n_salts > 1  # one host's rows do not collapse into one bucket


# ---------------------------------------------------------------------------
# export sinks (S11 JSON / S12 CSV)
# ---------------------------------------------------------------------------

def test_export_sinks(spark, pages, tmp_path):
    from s_crawler_spark.corpus import seed_search_url
    from s_crawler_spark.plans.wave import run_wave
    from s_crawler_spark.sources import export as ex

    cat = run_wave(pages, seed_search_url(), max_count=30)
    ex.export_json(cat, str(tmp_path / "j"), single_file=True)
    back = spark.read.json(str(tmp_path / "j"))
    assert back.count() == cat.count()
    assert set(back.columns) >= {"doi", "title", "url"}

    ex.export_csv(cat, str(tmp_path / "c"), single_file=True)
    csv = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert csv.columns == ex.CSV_COLUMNS
    assert csv.count() == cat.count()
    dois = {r["doi"] for r in csv.select("doi").collect()}
    assert dois == {r["doi"] for r in cat.select("doi").collect()}


def test_assign_unique_filenames_matches_reference_loop(spark):
    """F12 parity: the set-based ranking window must produce exactly the
    filenames the reference's os.path.exists counter loop would
    (src/pdf_processor.py:231-240), including first-arrival-keeps-base."""
    import re
    from s_crawler_spark.sources import export as ex
    rows = [(i, f"Title <{i % 3}>") for i in range(10)]
    # cross-base collision chain: "A"'s 2nd copy claims A_1.pdf, pushing the
    # literal title "A_1" to A_1_1.pdf (reference probes the filesystem, so
    # generated names block other titles too)
    rows += [(100, "A"), (101, "A"), (102, "A_1"), (103, "A_1"), (104, "A_2")]
    df = spark.createDataFrame(rows, "seq long, title string")
    got = {r["seq"]: r["filename"]
           for r in ex.assign_unique_filenames(df).collect()}
    existing, expect = set(), {}
    for i, title in sorted(rows):
        base = re.sub(r"\s+", " ",
                      re.sub(r'[<>:"/\\|?*]', "_", title)).strip()[:200]
        fname, counter = base + ".pdf", 1
        while fname in existing:
            fname = f"{base}_{counter}.pdf"
            counter += 1
        existing.add(fname)
        expect[i] = fname
    assert got == expect


def test_parse_robots_policy(spark):
    from s_crawler_spark.operators import politeness as po
    rows = [
        ("a.com", "User-agent: *\nCrawl-delay: 7\nDisallow: /private\nDisallow: /tmp\nDisallow:\n"),
        ("b.com", "User-agent: *\nDisallow: /x\n"),   # no delay -> default
        ("c.com", ""),                                 # empty -> allow-all
        ("d.com", "  crawl-DELAY:  12 \n  DISALLOW:   /y  \n"),  # case/space
        # CRLF body + tab padding (real-world files are commonly CRLF)
        ("e.com", "User-agent: *\r\nCrawl-delay:\t3\r\nDisallow:\t/private\r\n\t Disallow: /crlf\r\n"),
        # UA-specific group overrides the * group entirely
        ("f.com", "User-agent: *\nCrawl-delay: 30\nDisallow: /all\n\n"
                  "User-agent: s-crawler-spark\nCrawl-delay: 2\n"
                  "Allow: /doi/open\nDisallow: /doi\n"),
        # adjacent UA lines share one group; comments stripped
        ("g.com", "User-agent: otherbot\nUser-agent: *\n"
                  "Disallow: /z # trailing comment\n# full-line comment\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r["host"]: r for r in po.parse_robots_policy(df).collect()}
    assert got["a.com"]["crawl_delay_ms"] == 7000
    assert list(got["a.com"]["robots_disallow"]) == ["/private", "/tmp"]
    assert got["b.com"]["crawl_delay_ms"] == po.DEFAULT_CRAWL_DELAY_MS
    assert list(got["c.com"]["robots_disallow"]) == []
    assert got["d.com"]["crawl_delay_ms"] == 12000
    assert list(got["d.com"]["robots_disallow"]) == ["/y"]
    assert got["e.com"]["crawl_delay_ms"] == 3000
    assert list(got["e.com"]["robots_disallow"]) == ["/private", "/crlf"]
    assert got["f.com"]["crawl_delay_ms"] == 2000
    assert list(got["f.com"]["robots_disallow"]) == ["/doi"]
    assert list(got["f.com"]["robots_allow"]) == ["/doi/open"]
    assert list(got["g.com"]["robots_disallow"]) == ["/z"]


def test_robots_allowed_longest_prefix(spark):
    from s_crawler_spark.operators import politeness as po
    rows = [
        ("https://h.com/doi/open/x.pdf", True),    # allow /doi/open beats /doi
        ("https://h.com/doi/closed/x.pdf", False), # only /doi matches
        ("https://h.com/other", True),             # nothing matches
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    out = df.withColumn("ok", po.robots_allowed(
        F.col("url"), F.array(F.lit("/doi")), F.array(F.lit("/doi/open"))))
    got = {r["url"]: r["ok"] for r in out.collect()}
    assert got == {u: ok for u, ok in rows}


def _robots_reference(body, agent="s-crawler-spark", default_ms=25_000):
    """Independent pure-Python reimplementation of the documented robots
    group semantics (CRLF split, '#' comments, [ \\t\\r] trim, consecutive
    UA lines head one group, agent groups override '*', headerless file is
    global, first Crawl-delay wins, non-empty Disallow/Allow collected) —
    the differential oracle for parse_robots_policy."""
    import re
    lines = []
    for raw in re.split(r"\r?\n", body):
        line = re.sub(r"#.*", "", raw).strip(" \t\r")
        if line:
            lines.append(line)
    gid, in_ua, tagged, uas = 0, False, [], []
    for line in lines:
        is_ua = line.lower().startswith("user-agent:")
        if is_ua and not in_ua:
            gid += 1
        in_ua = is_ua
        tagged.append((gid, line))
        if is_ua:
            uas.append((gid, line[11:].strip(" \t\r").lower()))
    agent_gids = {g for g, t in uas if t == agent}
    star_gids = {g for g, t in uas if t == "*"}
    if agent_gids:
        sel = [l for g, l in tagged if g in agent_gids]
    elif star_gids:
        sel = [l for g, l in tagged if g in star_gids]
    elif not uas:
        sel = [l for _, l in tagged]
    else:
        sel = []
    delay, dis, alw = None, [], []
    for line in sel:
        m = re.match(r"(?i)^crawl-delay:[ \t]*([0-9]+)", line)
        if m and delay is None:
            delay = int(m.group(1)) * 1000
        low = line.lower()
        if low.startswith("disallow:"):
            v = line[9:].strip(" \t\r")
            if v:
                dis.append(v)
        elif low.startswith("allow:"):
            v = line[6:].strip(" \t\r")
            if v:
                alw.append(v)
    return (delay if delay is not None else default_ms), dis, alw


def test_parse_robots_policy_differential(spark):
    """200 seeded random robots bodies, one Spark job, field-exact match
    vs the independent reference implementation."""
    import random
    rng = random.Random(20240817)
    uas = ["*", "s-crawler-spark", "otherbot", "S-Crawler-Spark"]
    paths = ["/a", "/doi/pdf", "/x y", "/", "/c#frag", "/tabbed"]

    def line():
        r = rng.random()
        if r < 0.25:
            return f"User-agent: {rng.choice(uas)}"
        if r < 0.45:
            return f"Disallow: {rng.choice(paths)}"
        if r < 0.55:
            return f"disallow:\t{rng.choice(paths)} # c"
        if r < 0.65:
            return f"Allow: {rng.choice(paths)}"
        if r < 0.8:
            return f"Crawl-delay: {rng.randrange(100)}"
        if r < 0.9:
            return "# comment only"
        return ""

    bodies = []
    for i in range(200):
        sep = "\r\n" if i % 2 else "\n"
        bodies.append((f"h{i}.com", sep.join(line() for _ in range(rng.randrange(0, 14)))))
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    got = {r["host"]: r for r in po.parse_robots_policy(df).collect()}
    for host, body in bodies:
        exp_delay, exp_dis, exp_alw = _robots_reference(body)
        r = got[host]
        assert r["crawl_delay_ms"] == exp_delay, (host, body)
        assert list(r["robots_disallow"]) == exp_dis, (host, body)
        assert list(r["robots_allow"]) == exp_alw, (host, body)


def test_compose_wave_zero_delay_means_unbounded_not_error(spark):
    """A caller policy with crawl_delay_ms=0 ("no delay for my host") must
    admit everything (delay floored at 1 ms → effectively unbounded
    budget), not raise an ANSI divide-by-zero inside the wave job."""
    frontier = fr.enqueue(make_candidates(spark, 30), wave=0, logical_now=T0)
    policy = po.default_host_policy(spark, ["h0.org", "h1.org", "h2.org"],
                                    crawl_delay_ms=0)
    batch = po.compose_wave(fr.eligible_pending(frontier, T0), policy,
                            wave_seconds=1)
    assert batch.count() == 30
