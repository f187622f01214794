"""Crawl-side dedup operators (SURVEY.md §2.3 J1, §2.4 A5, §2.8).

All dedup here is *order-sensitive*: the reference keeps the first occurrence
in crawl order, so every operator takes an explicit ``seq`` ordering column
instead of relying on ``dropDuplicates`` (whose choice is arbitrary under
parallelism — SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence(df: DataFrame, key: str, seq_col: str = "seq") -> DataFrame:
    """A5 — keep the first row per key in ``seq`` order (reference
    check_duplicates.py:29-35 / src/link_collector.py:49-55 semantics).
    NULL keys are all kept (no key to collide on).

    Scale note: one hash shuffle on ``key``; the window is per-key (no global
    sort). Skewed keys are split by AQE.
    """
    w = Window.partitionBy(key).orderBy(seq_col)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.filter(F.col(key).isNull() | (F.col("__rn") == 1)).drop("__rn")
    )


def anti_join_seen(candidates: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """J1/P8 — candidates ∖ seen on ``key``; NULL-keyed candidates are kept
    (the reference only dedups candidates that *have* a DOI,
    src/link_collector.py:51-52). Equi-left_anti already keeps NULL keys.

    Scale note: when ``seen`` is a per-wave increment it is usually small →
    Spark broadcasts it; when ``seen`` is an O(total) state table use
    :func:`pruned_anti_join` (broadcast semi-prune — the big side is
    scanned, never shuffled); the 10^10-key url case goes through
    operators/seen.py (Bloom prefilter + exact backstop).
    """
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def pruned_anti_join(candidates: DataFrame, seen: DataFrame,
                     key: str, prune_keys: DataFrame | None = None) -> DataFrame:
    """``candidates ∖ seen`` on ``key`` when ``seen`` is O(total) and
    ``candidates`` are wave-sized — same result as ``anti_join_seen``
    (NULL-keyed candidates kept: NULL never equi-matches), different plan:
    ``seen`` is pruned to the candidate key set by a BROADCAST left-semi
    first (the O(total) side is *scanned*, never hash-partitioned or
    broadcast), and the wave-bounded hit set broadcasts back into the
    anti-join. A plain ``left_anti`` against a beyond-broadcast ``seen``
    sort-merge-shuffles the whole table every wave.

    ``candidates`` is referenced twice (key set + anti-join left); callers
    pass a checkpointed or cheap-to-recompute frame — or supply
    ``prune_keys``, any cheap SUPERSET of the candidates' key values
    (extra keys only enlarge the broadcast; they can never drop a row the
    plain anti-join would keep, since a hit must still equi-match a
    candidate).
    """
    if prune_keys is None:
        prune_keys = candidates.select(key)
    wave_keys = prune_keys.select(key).where(F.col(key).isNotNull())
    # distinct: the big side may hold many rows per key (e.g. catalog
    # titles) — without it one hot key would put every matching row into
    # the broadcast build side; distinct bounds it by the wave's key count
    hits = (seen.select(key).where(F.col(key).isNotNull())
            .join(F.broadcast(wave_keys), on=key, how="left_semi")
            .distinct())
    return candidates.join(F.broadcast(hits), on=key, how="left_anti")


def tiered_insert_dedup(df: DataFrame, seq_col: str = "seq",
                        doi_col: str = "doi", md5_col: str = "content_md5",
                        title_col: str = "title",
                        catalog: DataFrame | None = None) -> DataFrame:
    """Exact distributed form of the reference's sequential tiered insert
    dedup (reference src/database_manager.py:28-46): rows are inserted in
    ``seq`` order; a row with a DOI is dropped iff a stored row has that DOI;
    a DOI-less row is dropped iff a stored row shares its MD5; a DOI-less,
    MD5-less row is dropped iff a stored row shares its title.

    The sequential recurrence ("stored" depends on earlier stores) admits a
    closed form because blocking is monotone in seq:

    - tier 1 (has DOI): first-by-seq per DOI survives — later DOI-ful rows
      never consult MD5/title, and DOI-less rows never block them.
    - tier 2 (no DOI, has MD5): survives iff it is first-by-seq in its MD5
      group among tier-2 rows AND no tier-1 *survivor* with the same MD5 has
      smaller seq. (If such a survivor blocks the group's first row it also
      blocks every later one, so group-first + the min-seq check is exact.)
    - tier 3 (no DOI, no MD5): same with titles against tier-1 ∪ tier-2
      survivors' titles.

    ``catalog`` (prior waves) contributes DOI/MD5/title block-sets with
    effective seq -∞.

    Scale note: ONE key-partitioned window (the tiers partition the rows,
    so a single composite tier-prefixed key covers all three group-first
    computations — one shuffle instead of three) + two small aggregate
    joins for the cross-tier block-sets; no global sort, no driver loop.
    The windowed base is lazily checkpointed: all four tier branches and
    both blocker aggregates read it without re-executing the window.
    """
    has_doi = F.col(doi_col).isNotNull()
    has_md5 = F.col(md5_col).isNotNull()
    has_title = F.col(title_col).isNotNull()

    tier = (F.when(has_doi, 1).when(has_md5, 2)
            .when(has_title, 3).otherwise(4))
    # each row is in exactly one tier → one prefixed key, one window.
    # tier-4 rows (no doi/md5/title) always insert: seq is their unique key.
    key = (F.when(has_doi, F.concat(F.lit("d:"), F.col(doi_col)))
           .when(has_md5, F.concat(F.lit("m:"), F.col(md5_col)))
           .when(has_title, F.concat(F.lit("t:"), F.col(title_col)))
           .otherwise(F.concat(F.lit("r:"), F.col(seq_col).cast("string"))))
    firsts = first_occurrence(
        df.withColumn("__tier", tier).withColumn("__key", key),
        "__key", seq_col).drop("__key").localCheckpoint(eager=False)

    # --- tier 1 ---
    # catalog blockers use pruned_anti_join: the catalog is O(total) and
    # grows every wave — a plain anti-join would re-shuffle its full
    # doi/md5/title key columns each wave. prune_keys comes from the
    # checkpointed `firsts` (a superset of each tier's keys), so the
    # anti-join left is referenced once and the big side only scans.
    t1 = firsts.filter(F.col("__tier") == 1)
    if catalog is not None:
        t1 = pruned_anti_join(
            t1, catalog.filter(F.col(doi_col).isNotNull()), doi_col,
            prune_keys=firsts.filter(F.col("__tier") == 1).select(doi_col))

    # --- tier 2 ---
    t1_md5 = t1.filter(F.col(md5_col).isNotNull()).groupBy(md5_col).agg(
        F.min(seq_col).alias("__t1_min_seq"))
    t2 = (firsts.filter(F.col("__tier") == 2)
          .join(t1_md5, on=md5_col, how="left")
          .filter(F.col("__t1_min_seq").isNull()
                  | (F.col("__t1_min_seq") > F.col(seq_col)))
          .drop("__t1_min_seq"))
    if catalog is not None:
        t2 = pruned_anti_join(
            t2, catalog.filter(F.col(md5_col).isNotNull()), md5_col,
            prune_keys=firsts.filter(F.col("__tier") == 2).select(md5_col))

    # --- tier 3 ---
    t12_titles = (t1.select(title_col, seq_col)
                  .unionByName(t2.select(title_col, seq_col))
                  .filter(F.col(title_col).isNotNull())
                  .groupBy(title_col).agg(F.min(seq_col).alias("__t12_min_seq")))
    t3 = (firsts.filter(F.col("__tier") == 3)
          .join(t12_titles, on=title_col, how="left")
          .filter(F.col("__t12_min_seq").isNull()
                  | (F.col("__t12_min_seq") > F.col(seq_col)))
          .drop("__t12_min_seq"))
    if catalog is not None:
        t3 = pruned_anti_join(
            t3, catalog.filter(F.col(title_col).isNotNull()), title_col,
            prune_keys=firsts.filter(F.col("__tier") == 3).select(title_col))

    # rows with no doi, no md5, no title are always inserted (no check applies)
    rest = firsts.filter(F.col("__tier") == 4)

    cols = df.columns
    return (t1.select(cols).unionByName(t2.select(cols))
            .unionByName(t3.select(cols)).unionByName(rest.select(cols)))
