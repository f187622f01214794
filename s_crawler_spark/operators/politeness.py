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

HOST_POLICY_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("crawl_delay_ms", T.IntegerType(), False),
    T.StructField("robots_disallow", T.ArrayType(T.StringType()), False),
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
            F.lit(DEFAULT_USER_AGENT).alias("user_agent"),
        )
    rows = [(h, crawl_delay_ms, [], DEFAULT_USER_AGENT) for h in hosts]
    return spark.createDataFrame(rows, HOST_POLICY_SCHEMA)


def robots_allowed(url_col, disallow_col):
    """True when no disallow prefix matches the URL path (rules materialized
    as path prefixes per the north rule). JVM-side: parse_url + exists."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    return ~F.exists(disallow_col, lambda p: path.startswith(p))


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
        | robots_allowed(F.col("url"), F.col("robots_disallow")))
    w = Window.partitionBy("host").orderBy("priority", "seq")
    return (
        allowed.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= F.col("host_budget"))
        .drop("__rank", "host_budget", "crawl_delay_ms",
              "robots_disallow", "user_agent")
    )


def parse_robots_policy(robots: DataFrame,
                        host_col: str = "host",
                        body_col: str = "robots_txt",
                        default_delay_ms: int = DEFAULT_CRAWL_DELAY_MS) -> DataFrame:
    """robots.txt bodies → host_policy rows (north rule: "robots.txt rules
    materialized as a broadcast host-policy table").

    Parses the standard line grammar JVM-side (no UDF): the wildcard
    User-agent group's ``Disallow:`` path prefixes and ``Crawl-delay:``
    seconds. Simplified single-group semantics (sufficient for politeness
    scheduling): all Disallow lines apply, first Crawl-delay wins, missing
    delay → engine default. Lines are split on newline; values trimmed;
    empty Disallow (allow-all marker) ignored.
    """
    lines = F.split(F.col(body_col), "\n")
    delay_s = F.nullif(
        F.regexp_extract(F.col(body_col),
                         r"(?im)^[ \t]*crawl-delay:[ \t]*([0-9]+)", 1),
        F.lit("")).cast("int")
    disallow = F.filter(
        F.transform(
            F.filter(lines, lambda l: F.lower(F.trim(l)).startswith("disallow:")),
            lambda l: F.trim(F.substring(F.trim(l), 10, 10000))),
        lambda p: p != "")
    return robots.select(
        F.col(host_col).alias("host"),
        F.coalesce((delay_s * 1000).cast("int"),
                   F.lit(default_delay_ms)).alias("crawl_delay_ms"),
        disallow.alias("robots_disallow"),
        F.lit(DEFAULT_USER_AGENT).alias("user_agent"),
    )
