"""Politeness: broadcast host-policy table + per-host wave budgets (SURVEY.md §2.9).

The reference enforces politeness by sleeping between sequential actions
(uniform(20,30)s before each download, src/pdf_processor.py:213-217; 0.3 s
inter-article, src/driver_manager.py:66; 0.5 s inter-page,
src/link_collector.py:77). Sleeping tasks don't scale; the engine turns the
same budget into *wave composition*: a host with crawl_delay d contributes at
most ``wave_seconds / d`` URLs to a wave, so the sequential-politeness
schedule and the wave schedule fetch the same URL set per unit time — which is
what "same politeness budget ⇒ same order" requires (north rule).

``host_policy(host, crawl_delay_ms, robots_disallow, user_agent)`` is a tiny
dimension — always broadcast (J4; reference cookie/UA decoration
src/driver_manager.py:78-89 is the same broadcast pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference-derived default budget: ~25 s politeness delay per download on a
# host (src/pdf_processor.py:215 midpoint), here a per-host crawl delay.
DEFAULT_CRAWL_DELAY_MS = 25_000
DEFAULT_USER_AGENT = "s-crawler-spark/0.1 (+research; reference science_crawler_main.py:29)"
# product token used to select a UA-specific robots.txt group (RFC 9309 §2.2.1)
AGENT_TOKEN = "s-crawler-spark"

HOST_POLICY_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("crawl_delay_ms", T.IntegerType(), False),
    T.StructField("robots_disallow", T.ArrayType(T.StringType()), False),
    T.StructField("robots_allow", T.ArrayType(T.StringType()), False),
    T.StructField("user_agent", T.StringType(), False),
])


def default_host_policy(spark: SparkSession, hosts: list[str] | DataFrame,
                        crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS) -> DataFrame:
    """Materialize a host_policy table with uniform defaults (robots rules
    and per-host delays would be fetched/parsed in production; the *table
    shape* is the contract)."""
    if isinstance(hosts, DataFrame):
        return hosts.select(
            F.col("host"),
            F.lit(crawl_delay_ms).alias("crawl_delay_ms"),
            F.array().cast("array<string>").alias("robots_disallow"),
            F.array().cast("array<string>").alias("robots_allow"),
            F.lit(DEFAULT_USER_AGENT).alias("user_agent"),
        )
    rows = [(h, crawl_delay_ms, [], [], DEFAULT_USER_AGENT) for h in hosts]
    return spark.createDataFrame(rows, HOST_POLICY_SCHEMA)


def _longest_prefix_len(path, prefixes):
    """Length of the longest prefix in ``prefixes`` matching ``path`` (0 if
    none) — the RFC 9309 §2.4.2 most-specific-rule measure."""
    return F.aggregate(
        prefixes, F.lit(0),
        lambda acc, p: F.when(path.startswith(p) & (F.length(p) > acc),
                              F.length(p)).otherwise(acc))


def robots_allowed(url_col, disallow_col, allow_col=None):
    """RFC 9309 path-prefix check: allowed unless some Disallow prefix
    matches AND no Allow prefix at least as long also matches (longest-match
    precedence; Allow wins ties). JVM-side: parse_url + array aggregates."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    dis_len = _longest_prefix_len(path, disallow_col)
    if allow_col is None:
        return dis_len == 0
    return (dis_len == 0) | (_longest_prefix_len(path, allow_col) >= dis_len)


def compose_wave(pending: DataFrame, host_policy: DataFrame,
                 wave_seconds: int) -> DataFrame:
    """Select this wave's fetch set under per-host politeness budgets.

    Per host: admit the first ``floor(wave_seconds*1000 / crawl_delay_ms)``
    eligible rows by (priority, seq) — FIFO within priority, matching the
    reference's id-ordered drain (src/database_manager.py:199). Hosts missing
    from the policy get the default delay. Robots-disallowed rows are dropped.

    Scale notes: the policy join is an explicit broadcast; the per-host
    ranking window shuffles once on ``host`` — the Zipf-head host's window is
    bounded by its own budget, and the subsequent fetch stage re-spreads rows
    via frontier.salt_partitions, so no task inherits a whole host.
    """
    joined = pending.join(F.broadcast(host_policy), on="host", how="left")
    joined = joined.withColumn(
        "crawl_delay_ms",
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)))
    joined = joined.withColumn(
        "host_budget",
        F.greatest(F.lit(1),
                   (F.lit(wave_seconds * 1000) / F.col("crawl_delay_ms")).cast("int")))
    allowed = joined.filter(
        F.col("robots_disallow").isNull()
        | robots_allowed(F.col("url"), F.col("robots_disallow"),
                         F.coalesce(F.col("robots_allow"),
                                    F.array().cast("array<string>"))))
    w = Window.partitionBy("host").orderBy("priority", "seq")
    return (
        allowed.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= F.col("host_budget"))
        .drop("__rank", "host_budget", "crawl_delay_ms",
              "robots_disallow", "robots_allow", "user_agent")
    )


_WS = " \t\r"  # robots.txt line/value trim set (CRLF bodies leave a trailing
# \r on every split line; tabs are legal blank padding per RFC 9309 §2.2)

_TAGGED_T = "array<struct<gid:int,line:string>>"


def _rule_values(sel, prefix: str):
    """Trimmed non-empty values of ``prefix:`` rule lines in the selected
    group (case-insensitive prefix match on already-trimmed lines)."""
    plen = len(prefix) + 2  # value starts after "<prefix>:"
    return F.filter(
        F.transform(
            F.filter(sel, lambda t: F.lower(t["line"]).startswith(prefix + ":")),
            lambda t: F.btrim(F.substring(t["line"], plen, 100000), F.lit(_WS))),
        lambda p: p != "")


def parse_robots_policy(robots: DataFrame,
                        host_col: str = "host",
                        body_col: str = "robots_txt",
                        default_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
                        agent_token: str = AGENT_TOKEN) -> DataFrame:
    """robots.txt bodies → host_policy rows (north rule: "robots.txt rules
    materialized as a broadcast host-policy table").

    Parses the standard line grammar JVM-side (no UDF) with RFC 9309 group
    semantics: lines split on ``\\r?\\n`` (CRLF-safe), ``#`` comments
    stripped, values trimmed of spaces/tabs/CR. Consecutive ``User-agent``
    lines head one group; a group whose UA token equals ``agent_token``
    (case-insensitive) overrides ``*`` groups; with several matching groups
    their rules merge. A file with no ``User-agent`` line at all is treated
    as one global group (lenient real-world behavior). Per selected group:
    all non-empty ``Disallow``/``Allow`` prefixes, first ``Crawl-delay``
    wins, missing delay → engine default.
    """
    raw = F.split(F.col(body_col), r"\r?\n")
    lines = F.filter(
        F.transform(raw, lambda l: F.btrim(
            F.regexp_replace(l, "#.*", ""), F.lit(_WS))),
        lambda l: l != "")

    # group-id state machine over the line array: gid increments at the first
    # User-agent line of each header run (adjacent UA lines share a group)
    init = F.struct(
        F.lit(0).alias("gid"), F.lit(False).alias("in_ua"),
        F.array().cast(_TAGGED_T).alias("tagged"))

    def _step(s, l):
        is_ua = F.lower(l).startswith("user-agent:")
        gid2 = F.when(is_ua & ~s["in_ua"], s["gid"] + 1).otherwise(s["gid"])
        return F.struct(
            gid2.alias("gid"), is_ua.alias("in_ua"),
            F.concat(s["tagged"], F.array(F.struct(
                gid2.cast("int").alias("gid"), l.alias("line")))).alias("tagged"))

    tagged = F.aggregate(lines, init, _step, lambda s: s["tagged"])

    uas = F.transform(
        F.filter(tagged, lambda t: F.lower(t["line"]).startswith("user-agent:")),
        lambda t: F.struct(
            t["gid"].alias("gid"),
            F.lower(F.btrim(F.substring(t["line"], 12, 100000),
                            F.lit(_WS))).alias("token")))
    agent_gids = F.transform(
        F.filter(uas, lambda u: u["token"] == F.lit(agent_token.lower())),
        lambda u: u["gid"])
    star_gids = F.transform(
        F.filter(uas, lambda u: u["token"] == "*"), lambda u: u["gid"])

    sel = (
        F.when(F.size(agent_gids) > 0,
               F.filter(tagged, lambda t: F.array_contains(agent_gids, t["gid"])))
        .when(F.size(star_gids) > 0,
              F.filter(tagged, lambda t: F.array_contains(star_gids, t["gid"])))
        .when(F.size(uas) == 0, tagged)  # headerless file: rules are global
        .otherwise(F.array().cast(_TAGGED_T)))

    delays = F.filter(
        F.transform(sel, lambda t: F.regexp_extract(
            t["line"], r"(?i)^crawl-delay:[ \t]*([0-9]+)", 1)),
        lambda v: v != "")
    delay_s = F.get(delays, 0).cast("int")  # first Crawl-delay wins

    return robots.select(
        F.col(host_col).alias("host"),
        F.coalesce((delay_s * 1000).cast("int"),
                   F.lit(default_delay_ms)).alias("crawl_delay_ms"),
        _rule_values(sel, "disallow").alias("robots_disallow"),
        _rule_values(sel, "allow").alias("robots_allow"),
        F.lit(DEFAULT_USER_AGENT).alias("user_agent"),
    )
