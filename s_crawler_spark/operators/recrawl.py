"""Recrawl (freshness) scheduling — change-rate-adaptive fetch intervals.

The reference crawls each article once (``downloaded=1`` is terminal —
src/database_manager.py status column); a production web crawler re-visits
pages on a freshness schedule. The standard design (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers") is per-URL adaptive:
shrink the revisit interval when consecutive fetches observe changed
content, grow it when content is stable. This module re-expresses that as
one integer-exact DataFrame aggregation over the fetch history table.

Semantics (all integer, engine-exact):

    history(url, wave, content_md5)   -- one row per completed fetch
    changed_i = md5_i != md5_{i-1}    -- in wave order, per url
    interval: start INTERVAL0; fold over changed_1..n-1:
        changed   -> max(MIN_INTERVAL, interval div 2)   (multiplicative ↓)
        unchanged -> min(MAX_INTERVAL, interval + 1)     (additive ↑)
    next_fetch_wave = last_wave + interval

AIMD mirrors TCP congestion control: rapid response to observed change,
conservative decay toward the MAX_INTERVAL ceiling for static pages.

Scale shape: ONE shuffle, groupBy url carrying (wave:int, md5:string)
pairs — id-sized rows, never page content; the per-url fold runs over that
URL's observation list (bounded by the number of completed waves, not by
corpus size). At 10^10 URLs this is the same (key, small-payload)
aggregation shape as the seen-set build. The fold uses a single wide
aggregate accumulator (interval, n_changes) per the HOF invariant — lambda
bodies are interpreted per element, so both outputs come from one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTERVAL0 = 4       # initial revisit interval, in waves
MIN_INTERVAL = 1
MAX_INTERVAL = 64


def recrawl_schedule(history: DataFrame,
                     interval0: int = INTERVAL0,
                     min_interval: int = MIN_INTERVAL,
                     max_interval: int = MAX_INTERVAL) -> DataFrame:
    """Per-URL adaptive revisit schedule from the fetch-history table.

    Returns (url, n_fetches, n_changes, interval, next_fetch_wave); feed
    ``next_fetch_wave <= current_wave`` into frontier re-enqueue to make
    recrawl admission a filter, not a driver loop.
    """
    obs = (history
           .groupBy("url")
           .agg(F.sort_array(
               F.collect_list(F.struct("wave", "content_md5"))).alias("o")))
    # changed flags for observations 2..n (guard: sequence(2,1) would emit a
    # DESCENDING [2,1] when size(o)=1 — Spark sequences reverse when
    # start > stop, so the singleton case must short-circuit to []).
    flags = ("if(size(o) < 2, array(), "
             " transform(sequence(2, size(o)), i -> "
             "  if(element_at(o, i).content_md5 <> "
             "     element_at(o, i - 1).content_md5, 1, 0)))")
    fold = (f"aggregate({flags}, "
            f" named_struct('iv', cast({interval0} as int), "
            "               'ch', cast(0 as int)), "
            " (s, f) -> named_struct("
            f"  'iv', cast(if(f = 1, greatest({min_interval}, s.iv div 2), "
            f"                least({max_interval}, s.iv + 1)) as int), "
            "  'ch', cast(s.ch + f as int)), "
            " s -> s)")
    # materialize the fold ONCE behind a lazy checkpoint — three output
    # columns read it, and CollapseProject would inline the interpreted
    # aggregate into each (textstats.lang_id_table pattern).
    st = obs.select(
        "url",
        F.expr("size(o)").alias("n_fetches"),
        F.expr("element_at(o, size(o)).wave").alias("__last_wave"),
        F.expr(fold).alias("__s"),
    ).localCheckpoint(eager=False)
    return st.select(
        "url", "n_fetches",
        F.col("__s.ch").alias("n_changes"),
        F.col("__s.iv").alias("interval"),
        (F.col("__last_wave") + F.col("__s.iv")).cast("int")
        .alias("next_fetch_wave"))


def due_for_recrawl(schedule: DataFrame, current_wave: int) -> DataFrame:
    """URLs whose revisit interval has elapsed — candidates for re-enqueue
    (frontier.enqueue with the current wave; the seen-set is keyed on
    url_hash so recrawl admission deliberately bypasses it)."""
    return schedule.filter(F.col("next_fetch_wave") <= F.lit(current_wave))
