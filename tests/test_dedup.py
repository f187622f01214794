"""Order-sensitive dedup operators vs a sequential fold of the reference's
insert logic (reference src/database_manager.py:28-46)."""

import random

from pyspark.sql import functions as F

from s_crawler_spark.operators import dedup as dd

SCHEMA = "seq long, doi string, content_md5 string, title string"


def sequential_tiered(rows):
    """Literal sequential re-derivation of the reference's insert loop."""
    dois, md5s, titles = set(), set(), set()
    kept = []
    for r in sorted(rows, key=lambda x: x[0]):
        seq, doi, md5, title = r
        if doi:
            if doi in dois:
                continue
        elif md5:
            if md5 in md5s:
                continue
        elif title:
            if title in titles:
                continue
        kept.append(seq)
        if doi:
            dois.add(doi)
        if md5:
            md5s.add(md5)
        if title:
            titles.add(title)
    return sorted(kept)


def run_spark_tiered(spark, rows, catalog_rows=None):
    df = spark.createDataFrame(rows, SCHEMA)
    cat = (spark.createDataFrame(catalog_rows, SCHEMA)
           if catalog_rows is not None else None)
    out = dd.tiered_insert_dedup(df, seq_col="seq", catalog=cat)
    return sorted(r["seq"] for r in out.collect())


def test_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, None), (5, None), (6, "b")],
        "seq long, k string")
    out = dd.first_occurrence(df, "k", "seq")
    assert sorted(r["seq"] for r in out.collect()) == [1, 2, 4, 5]


def test_tiered_basic_doi_dup(spark):
    rows = [(1, "d1", "m1", "t1"), (2, "d1", "m2", "t2"), (3, "d2", "m1", "t1")]
    assert run_spark_tiered(spark, rows) == sequential_tiered(rows) == [1, 3]


def test_tiered_cross_tier_md5(spark):
    # doi-less row blocked by a doi-having row's md5 ONLY if that row stored
    rows = [
        (1, "d1", "M", "t1"),    # stored (tier1)
        (2, "d1", "M2", "t2"),   # dropped (doi dup) — its md5 must NOT block
        (3, None, "M2", "t3"),   # stored: M2 belongs to a DROPPED row
        (4, None, "M", "t4"),    # dropped: M belongs to stored row 1
        (5, None, "M2", "t5"),   # dropped: M2 now stored via row 3
    ]
    assert run_spark_tiered(spark, rows) == sequential_tiered(rows) == [1, 3]


def test_tiered_title_tier(spark):
    rows = [
        (1, "d1", None, "T"),     # stored; title T enters the title index
        (2, None, None, "T"),     # dropped: title T stored
        (3, None, "m9", "T"),     # stored: has md5 → title tier not consulted
        (4, None, None, "U"),     # stored
        (5, None, None, "U"),     # dropped: U stored by row 4
        (6, None, None, None),    # stored: nothing to collide on
    ]
    assert run_spark_tiered(spark, rows) == sequential_tiered(rows) == [1, 3, 4, 6]


def test_tiered_later_tier1_does_not_block_earlier(spark):
    # md5-blocking tier-1 survivor arrives AFTER the doi-less row → no block
    rows = [(1, None, "M", "t1"), (2, "d1", "M", "t2")]
    assert run_spark_tiered(spark, rows) == sequential_tiered(rows) == [1, 2]


def test_tiered_catalog_blocks_all_tiers(spark):
    cat = [(0, "dC", "mC", "tC")]
    rows = [(1, "dC", None, "x"), (2, None, "mC", "y"), (3, None, None, "tC"),
            (4, "dN", "mC", "tC")]  # tier1: only doi checked → stored
    assert run_spark_tiered(spark, rows, cat) == [4]


def test_tiered_randomized_against_sequential(spark):
    rng = random.Random(7)
    dois = [None, "d1", "d2", "d3"]
    md5s = [None, "m1", "m2"]
    titles = [None, "t1", "t2"]
    rows = [(i, rng.choice(dois), rng.choice(md5s), rng.choice(titles))
            for i in range(1, 120)]
    assert run_spark_tiered(spark, rows) == sequential_tiered(rows)


def test_anti_join_keeps_null_keys(spark):
    cand = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "seq long, doi string")
    seen = spark.createDataFrame([("a",)], "doi string")
    out = dd.anti_join_seen(cand, seen, "doi")
    assert sorted(r["seq"] for r in out.collect()) == [2, 3]


def test_pruned_anti_join_equals_plain_anti_join(spark):
    """pruned_anti_join (broadcast semi-prune of the O(total) side) is
    value-identical to a plain left_anti: NULL-keyed candidates pass
    through, duplicate keys on the big side collapse, and a prune_keys
    SUPERSET changes nothing."""
    from s_crawler_spark.operators.dedup import pruned_anti_join

    cand = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n1"), (None, "n2")],
        "k int, v string")
    big = spark.createDataFrame(
        [(2,), (2,), (2,), (9,), (None,)], "k int")
    by_v = lambda t: t[1]  # None keys are not orderable against ints
    exp = sorted(((r["k"], r["v"]) for r in
                  cand.join(big.select("k").distinct(), "k", "left_anti")
                  .collect()), key=by_v)
    got = sorted(((r["k"], r["v"]) for r in
                  pruned_anti_join(cand, big, "k").collect()), key=by_v)
    assert got == exp == [(1, "a"), (3, "c"), (None, "n1"), (None, "n2")]
    sup = spark.createDataFrame([(k,) for k in range(50)], "k int")
    got_sup = sorted(((r["k"], r["v"]) for r in
                      pruned_anti_join(cand, big, "k", prune_keys=sup)
                      .collect()), key=by_v)
    assert got_sup == exp
