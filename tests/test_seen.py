"""URL-seen set: filter kernels + exact-backstop correctness."""

import numpy as np
from pyspark.sql import functions as F

from s_crawler_spark.operators import seen as sn


def rnd_keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63 - 1, size=n, dtype=np.int64).astype(np.uint64)


def test_bloom_no_false_negatives_and_low_fp():
    keys = rnd_keys(5000, 1)
    other = rnd_keys(5000, 2)
    bits = sn.bloom_build(keys, n_bits=5000 * 10)
    assert sn.bloom_probe(bits, keys).all()          # zero false negatives
    fp = sn.bloom_probe(bits, other).mean()
    assert fp < 0.03                                  # ~1% expected at 10 bits/key


def test_cuckoo_probe_and_delete():
    keys = rnd_keys(4000, 3)
    other = rnd_keys(4000, 4)
    n_buckets = int(len(keys) / (0.84 * 4)) + 16
    bits = sn.cuckoo_build(keys, n_buckets)
    assert sn.cuckoo_probe(bits, keys).all()
    assert sn.cuckoo_probe(bits, other).mean() < 0.02
    # deletability — the property blooms lack
    bits2 = sn.cuckoo_delete(bits, keys[:100])
    assert sn.cuckoo_probe(bits2, keys[100:]).all()
    assert sn.cuckoo_probe(bits2, keys[:100]).mean() < 0.05  # mostly gone (fp noise ok)


def test_build_probe_shards_roundtrip(spark):
    seen = spark.range(1000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    shards = sn.build_shards(seen, n_shards=4)
    assert shards.count() == 4
    cand = spark.range(500, 1500).select(
        F.col("id").alias("id"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    probed = sn.probe_shards(cand, shards, n_shards=4)
    rows = {r["id"]: r["maybe_seen"] for r in probed.collect()}
    # no false negatives: every truly-seen candidate flagged
    assert all(rows[i] for i in range(500, 1000))


def test_dedup_against_seen_equals_exact_antijoin(spark):
    seen = spark.range(800).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    cand = spark.range(400, 1200).select(
        F.col("id").alias("id"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    shards = sn.build_shards(seen, n_shards=4)
    with_filter = sn.dedup_against_seen(cand, seen, shards)
    exact = cand.join(seen, "url_hash", "left_anti")
    assert (sorted(r["id"] for r in with_filter.collect())
            == sorted(r["id"] for r in exact.collect())
            == list(range(800, 1200)))


def test_dedup_against_seen_cuckoo_kind(spark):
    seen = spark.range(300).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    cand = spark.range(600).select(
        F.col("id").alias("id"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    shards = sn.build_shards(seen, n_shards=2, kind="cuckoo")
    out = sn.dedup_against_seen(cand, seen, shards)
    assert sorted(r["id"] for r in out.collect()) == list(range(300, 600))


def test_probe_empty_shards_means_unseen(spark):
    cand = spark.range(10).select(F.col("id").alias("url_hash"), F.col("id"))
    empty = spark.createDataFrame([], sn.SHARDS_SCHEMA)
    probed = sn.probe_shards(cand, empty)
    assert all(not r["maybe_seen"] for r in probed.collect())
