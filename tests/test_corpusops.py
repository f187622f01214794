"""Corpus-level pipeline ops: exact quantiles, stratified sampling, shard
packing (operators/corpusops.py) — differential-checked against naive
Python on synthetic inputs; the DuckDB oracles live in plans/contract.py."""

import hashlib

import pytest
from pyspark.sql import functions as F

from s_crawler_spark.functions.texthash import MERSENNE_31
from s_crawler_spark.operators import corpusops as co


def _py_sample_hash(doc_id: int) -> int:
    h = int(hashlib.md5(f"sample:{doc_id}".encode()).hexdigest()[:15], 16)
    return (h % MERSENNE_31) % 10000


def test_score_quantiles_exact(spark):
    """Counting quantiles equal the definition: smallest score with
    count(<=s)*10000 >= q*total, on a skewed integer distribution."""
    vals = [0] * 10 + [5] * 40 + [7] * 25 + [9] * 25
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, quality_score_bp long")
    got = {r["q_bp"]: r["score_at_q"]
           for r in co.score_quantiles(df, (0, 1000, 2500, 5000, 7500,
                                            9999, 10000)).collect()}
    n = len(vals)
    svals = sorted(vals)

    def expected(q):
        for s in sorted(set(svals)):
            if sum(1 for v in svals if v <= s) * 10000 >= q * n:
                return s
        raise AssertionError

    assert got == {q: expected(q) for q in (0, 1000, 2500, 5000, 7500,
                                            9999, 10000)}


def test_stratified_sample_deterministic(spark):
    rates = {"en": 5000, "de": 1000}
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr"))
         for i in range(2000)], "doc_id long, lang string")
    got = {r["doc_id"] for r in
           co.stratified_sample(df, rates, default_bp=0).collect()}
    exp = set()
    for i in range(2000):
        lang = "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr")
        if _py_sample_hash(i) < rates.get(lang, 0):
            exp.add(i)
    assert got == exp
    # rerun selects the identical sample (no RNG anywhere)
    again = {r["doc_id"] for r in
             co.stratified_sample(df, rates, default_bp=0).collect()}
    assert again == got
    # en rate ~50%, de ~10% — sanity that strata differ
    n_en = sum(1 for i in got if i % 2 == 0)
    n_de = len(got) - n_en
    assert n_en > 5 * n_de


@pytest.mark.parametrize("block", [3, 64, 4096])
def test_pack_shards_matches_naive_cumsum(spark, block):
    """The two-level hierarchical cumsum is bit-identical to the naive
    global running sum for any block size, including blocks that split
    mid-shard and ids with gaps."""
    rows = [(i * 7 % 501, 1 + (i * 13) % 40) for i in range(300)]
    rows = list({r[0]: r for r in rows}.values())  # unique ids, shuffled
    df = spark.createDataFrame(rows, "doc_id long, ws_tokens int")
    got = {r["doc_id"]: (r["shard_id"], r["tokens_before"], r["n_tokens"])
           for r in co.pack_shards(df, shard_tokens=100,
                                   block_size=block).collect()}
    cum = 0
    exp = {}
    for did, tok in sorted(rows):
        exp[did] = (cum // 100, cum, tok)
        cum += tok
    assert got == exp
