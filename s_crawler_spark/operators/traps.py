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
``trap_hosts`` is the one-shot form; the crawl loop instead maintains the
rollup *incrementally* (``update_trap_state``): the counts are summable and
each feature is a pure function of the URL string, so per-wave maintenance
folds only the wave's enqueued/departed rows — O(wave) extraction + a
host-dimensioned aggregate, never a pending-sized scan — and the
``touched_only=True`` form narrows both the fold and the per-wave commit to
the hosts the wave actually touched (keyed delta + tombstones in the store).
Containment stays a filter: anti-join ``is_trap = 1`` hosts out of
compose_wave's pending set.
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


_COUNT_COLS = ("n_urls", "n_deep", "n_repeat", "n_query_heavy", "n_suspicious")


def host_trap_counts(urls: DataFrame, url_col: str = "url",
                     depth_threshold: int = DEPTH_THRESHOLD,
                     repeat_threshold: int = REPEAT_THRESHOLD,
                     query_threshold: int = QUERY_THRESHOLD,
                     weight: int = 1) -> DataFrame:
    """Per-host summable feature counts. ``weight=-1`` negates every count,
    which is what makes the rollup incrementally maintainable: counts over
    (backlog + enqueued − departed) equal counts over the live pending set,
    because each feature is a pure function of the URL string."""
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
    w = F.lit(weight).cast("long")
    return (feats.groupBy(host.alias("host"))
            .agg(F.sum(w).alias("n_urls"),
                 F.sum(w * (F.col("path_depth") >= depth_threshold).cast("int"))
                 .alias("n_deep"),
                 F.sum(w * (F.col("max_repeat_seg") >= repeat_threshold)
                       .cast("int")).alias("n_repeat"),
                 F.sum(w * (F.col("n_query_params") >= query_threshold)
                       .cast("int")).alias("n_query_heavy"),
                 F.sum(w * sus.cast("int")).alias("n_suspicious")))


def _flag(counts: DataFrame, ratio_bp: int) -> DataFrame:
    # CASE guards the integer div (ANSI): a drained host's n_urls = 0 row
    # (retained as a delete marker by the touched_only fold) flags 0
    return counts.withColumn(
        "is_trap",
        F.when(F.col("n_urls") > 0,
               (F.expr("n_suspicious * 10000 div n_urls")
                >= F.lit(ratio_bp)).cast("int"))
        .otherwise(F.lit(0)))


def trap_hosts(urls: DataFrame, url_col: str = "url",
               depth_threshold: int = DEPTH_THRESHOLD,
               repeat_threshold: int = REPEAT_THRESHOLD,
               query_threshold: int = QUERY_THRESHOLD,
               ratio_bp: int = TRAP_RATIO_BP) -> DataFrame:
    """Per-host trap rollup: counts of URLs tripping each feature and an
    integer trap flag — ``is_trap = 1`` when suspicious URLs reach
    ``ratio_bp`` basis points of the host's total."""
    return _flag(host_trap_counts(urls, url_col, depth_threshold,
                                  repeat_threshold, query_threshold),
                 ratio_bp)


def update_trap_state(state: DataFrame | None,
                      added: DataFrame | None = None,
                      removed: DataFrame | None = None,
                      url_col: str = "url",
                      depth_threshold: int = DEPTH_THRESHOLD,
                      repeat_threshold: int = REPEAT_THRESHOLD,
                      query_threshold: int = QUERY_THRESHOLD,
                      ratio_bp: int = TRAP_RATIO_BP,
                      touched_only: bool = False,
                      added_counts: DataFrame | None = None,
                      removed_counts: DataFrame | None = None) -> DataFrame:
    """Incremental trap-state maintenance — the O(wave) form of
    ``trap_hosts(all_pending)``.

    ``state`` is the prior per-host counts table (``trap_hosts`` schema, or
    None for a fresh crawl); ``added`` / ``removed`` are URL sets entering /
    leaving the pending backlog this wave. Because every feature is a pure
    integer function of the URL string, per-host counts fold exactly:
    feature extraction runs only over the O(wave) delta rows, then one
    groupBy over host-dimensioned partials — never a pending-sized scan or
    shuffle. Hosts whose backlog drains to zero drop out of the state
    (re-adding later restarts them from zero, exactly).

    ``touched_only=True`` is the keyed-delta commit form: it returns ONLY
    the rows of hosts touched by this fold's added/removed URLs — the prior
    state is PRUNED to those hosts with a broadcast semi-join (the
    host-dimensioned state is scanned past a wave-sized key set, never
    shuffled), so both the fold and the resulting commit are O(touched
    hosts), not O(all hosts ever pending). Untouched hosts' rows are
    carried forward unread by the store manifest. Hosts whose counts
    cancel to zero are RETAINED here (``n_urls = 0``, ``is_trap = 0``) as
    MERGE delete markers — commit with
    ``store.commit(..., mode='delta', key=['host'],
    delete_where='n_urls = 0')`` and the composed read drops them, which
    reproduces the default form's drop-out semantics exactly.

    ``added_counts`` / ``removed_counts`` accept PRE-AGGREGATED per-host
    partials (the ``host_trap_counts`` schema, positive counts — removed
    ones are negated here): a caller folding the same URL set into two
    plans (the crawl loop feeds the wave's enqueue partials to both the
    admission flag and the commit fold) computes and checkpoints the
    partials once instead of re-running the per-URL feature extraction
    per consumer.
    """
    partials = []
    for urls, weight in ((added, 1), (removed, -1)):
        if urls is not None:
            partials.append(host_trap_counts(
                urls, url_col, depth_threshold, repeat_threshold,
                query_threshold, weight=weight))
    if added_counts is not None:
        partials.append(added_counts.select("host", *_COUNT_COLS))
    if removed_counts is not None:
        partials.append(removed_counts.select(
            "host", *[(-F.col(c)).alias(c) for c in _COUNT_COLS]))
    if touched_only:
        if not partials:
            raise ValueError(
                "touched_only fold needs added or removed URLs (its output "
                "scope IS the touched-host set)")
        delta = partials[0]
        for p in partials[1:]:
            delta = delta.unionByName(p)
        # two consumers below (touched-host key set + the union itself):
        # a lazy checkpoint stops the partial aggregates re-executing
        delta = delta.localCheckpoint(eager=False)
        if state is not None:
            pruned = (state.select("host", *[F.col(c) for c in _COUNT_COLS])
                      .join(F.broadcast(delta.select("host")),
                            on="host", how="left_semi"))
            delta = pruned.unionByName(delta)
        summed = delta.groupBy("host").agg(
            *[F.sum(c).alias(c) for c in _COUNT_COLS])
        return _flag(summed, ratio_bp)
    parts = ([state.select("host", *[F.col(c) for c in _COUNT_COLS])]
             if state is not None else []) + partials
    if not parts:
        raise ValueError("update_trap_state needs state, added, or removed")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    summed = merged.groupBy("host").agg(
        *[F.sum(c).alias(c) for c in _COUNT_COLS])
    return _flag(summed.filter(F.col("n_urls") > 0), ratio_bp)
