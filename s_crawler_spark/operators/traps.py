"""Crawler-trap detection — URL-space explosion heuristics.

Spider traps (calendar pages, session-id query strings, self-linking
directory loops) generate unbounded URL spaces under one host; a frontier
that enqueues them faithfully starves real hosts. The reference is immune
only because its seed list is closed — at open-web scale the standard
defense is cheap per-URL shape features rolled up per host, gating
enqueue/admission.

All features are integer column expressions over the URL string (one
pass, no UDF): path depth, maximum repeated path-segment multiplicity
(the ``/a/b/a/a`` loop signal — counted via a single sorted-fold with a
wide accumulator, per the HOF invariant), and query-parameter count.
The host rollup flags a host when at least ``ratio_bp`` basis points of
its pending URLs trip a feature threshold — integer basis points, so the
flag is engine-exact and oracle-checkable.

Scale shape: feature extraction is embarrassingly parallel in the scan
stage; the rollup is one groupBy(host) of small int partial aggregates.
Feed ``trap_hosts(...).filter(is_trap = 1)`` as an anti-join into
compose_wave's pending set (or zero those hosts' budgets via the
host_budget override) — containment is a filter, not a crawl-loop change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH_THRESHOLD = 6        # path segments
REPEAT_THRESHOLD = 3       # same segment appearing >= 3 times
QUERY_THRESHOLD = 8        # query parameters
TRAP_RATIO_BP = 5000       # >= 50% of a host's URLs tripping => trap


def url_trap_features(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL shape features: (url, path_depth, max_repeat_seg,
    n_query_params). ``max_repeat_seg`` is 0 for an empty path."""
    path = F.expr(
        f"regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\\\-]*://[^/?#]*([^?#]*)', 1)")
    segs = F.expr("filter(split(__path, '/'), s -> s != '')")
    # one sorted pass: equal segments are adjacent after array_sort, so a
    # {prev, run, best} accumulator finds the longest run = max multiplicity
    rep = ("aggregate(array_sort(__segs), "
           " named_struct('prev', cast(null as string), "
           "              'run', cast(0 as int), 'best', cast(0 as int)), "
           " (s, x) -> named_struct("
           "   'prev', x, "
           "   'run', cast(if(s.prev is not null and x = s.prev, "
           "                  s.run + 1, 1) as int), "
           "   'best', cast(greatest(s.best, "
           "     if(s.prev is not null and x = s.prev, s.run + 1, 1)) as int)), "
           " s -> s.best)")
    q = F.expr(f"regexp_extract({url_col}, '\\\\?([^#]*)', 1)")
    return (urls.withColumn("__path", path)
            .withColumn("__segs", segs)
            .select(
                F.col(url_col),
                F.expr("size(__segs)").alias("path_depth"),
                F.expr(rep).alias("max_repeat_seg"),
                F.when(q == "", F.lit(0))
                .otherwise(F.size(F.split(q, "&"))).cast("int")
                .alias("n_query_params")))


def trap_hosts(urls: DataFrame, url_col: str = "url",
               depth_threshold: int = DEPTH_THRESHOLD,
               repeat_threshold: int = REPEAT_THRESHOLD,
               query_threshold: int = QUERY_THRESHOLD,
               ratio_bp: int = TRAP_RATIO_BP) -> DataFrame:
    """Per-host trap rollup: counts of URLs tripping each feature and an
    integer trap flag — ``is_trap = 1`` when suspicious URLs reach
    ``ratio_bp`` basis points of the host's total."""
    from ..functions import scalars

    feats = url_trap_features(urls, url_col)
    # the rollup key MUST be scalars.url_host (parse_url HOST) — the same
    # derivation the frontier uses (frontier.enqueue) — so the
    # crawl(trap_guard=True) containment anti-join key is definitionally
    # identical to frontier.host (a separate regexp kept userinfo and
    # silently missed user@host URLs)
    host = scalars.url_host(F.col(url_col))
    sus = ((F.col("path_depth") >= depth_threshold)
           | (F.col("max_repeat_seg") >= repeat_threshold)
           | (F.col("n_query_params") >= query_threshold))
    return (feats.groupBy(host.alias("host"))
            .agg(F.count("*").alias("n_urls"),
                 F.sum((F.col("path_depth") >= depth_threshold).cast("int"))
                 .alias("n_deep"),
                 F.sum((F.col("max_repeat_seg") >= repeat_threshold).cast("int"))
                 .alias("n_repeat"),
                 F.sum((F.col("n_query_params") >= query_threshold).cast("int"))
                 .alias("n_query_heavy"),
                 F.sum(sus.cast("int")).alias("n_suspicious"))
            .withColumn(
                "is_trap",
                (F.expr("n_suspicious * 10000 div n_urls")
                 >= F.lit(ratio_bp)).cast("int")))
