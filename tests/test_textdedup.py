"""Dedup-ladder operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup (operators/textdedup.py)."""

import pytest
from pyspark.sql import functions as F

from s_crawler_spark.operators import textdedup as td

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
    (3, "completely different words about spark engines here"),
    (4, "spark engines here completely different words about"),  # same token set as 3
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_first_survivor(docs):
    out = {r["text_hash"]: r for r in td.exact_dedup(docs).collect()}
    assert len(out) == 4  # 0/1 collapse
    dup = [r for r in out.values() if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["doc_id"] == 0  # min id survives


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["a_id"], r["b_id"]): (r["n_inter"], r["n_union"])
             for r in td.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert (0, 1) in pairs
    i, u = pairs[(0, 1)]
    assert i == u  # identical docs: jaccard 1
    # 0 vs 2 share 5 of 9 distinct trigrams... verify present at >= 0.5
    assert (0, 2) in pairs
    # token-permuted docs share NO trigrams
    assert (3, 4) not in pairs


def test_minhash_identical_docs_always_pair(docs):
    pairs = {(r["a_id"], r["b_id"])
             for r in td.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # identical shingle sets -> identical signatures -> every band collides
    assert (0, 1) in pairs
    # same token BAG but reordered text shares no 3-gram shingles: under
    # n-gram minhash semantics this is NOT a near-dup pair
    assert (3, 4) not in pairs
    for a, b in pairs:
        assert a < b


def test_minhash_verification_filters_low_jaccard(spark):
    rows = [(i, f"unique{i} tokens{i} nothing{i} shared{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert td.minhash_lsh_pairs(df, threshold=0.5).count() == 0


def test_simhash_deterministic_and_close(docs):
    sh = {r["doc_id"]: r["simhash"] for r in td.simhash_table(docs).collect()}
    assert sh[0] == sh[1]
    assert sh[3] == sh[4]
    assert 0 <= sh[0] < (1 << td.SIMHASH_BITS)
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham02 <= ham03  # near-dup closer than unrelated


def test_simhash_near_pairs_buckets(docs):
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in td.simhash_near_pairs(docs, max_hamming=2).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(3, 4)] == 0


def test_simhash_near_pairs_complete_vs_brute_force(spark):
    """Banding must find EVERY pair at hamming <= 2 — including 1+1 splits
    across bit pieces (the case a two-half scheme misses)."""
    from s_crawler_spark.operators.textdedup import simhash_table
    rows = [(i, f"w{i} common tokens shared across documents {i % 3}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in simhash_table(df).collect()}
    expect = {(a, b) for a in sh for b in sh if a < b
              and bin(sh[a] ^ sh[b]).count("1") <= 2}
    got = {(r["a_id"], r["b_id"])
           for r in td.simhash_near_pairs(df, max_hamming=2).collect()}
    assert got == expect


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # ~1.0 cosine vs 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["a_id"], r["b_id"]) for r in
             td.embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


# --------------------------------------------------------------------------
# Near-dup cluster assignment (large-star/small-star closure)
# --------------------------------------------------------------------------

def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    rows = td.near_dup_clusters(df).collect()
    out = {}
    for r in rows:
        out[r["doc_id"]] = r["cluster_id"]
    assert len(out) == len(rows), "one assignment row per node"
    return out

def test_clusters_chain_and_island(spark):
    # chain 1-2-3-4 (transitive), island {10,11}, pair order/direction mixed
    got = _clusters(spark, [(2, 1), (2, 3), (4, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

def test_clusters_long_path_converges_in_log_rounds(spark):
    # 64-node path: naive min-propagation needs 63 rounds; the alternating
    # star contraction must close it inside the bounded driver loop.
    pairs = [(i, i + 1) for i in range(64)]
    got = _clusters(spark, pairs)
    assert got == {i: 0 for i in range(65)}

def test_clusters_empty_and_self_pairs(spark):
    df = spark.createDataFrame([(5, 5)], "a_id long, b_id long")
    assert td.near_dup_clusters(df).count() == 0

def test_clusters_min_wins_matches_exact_dedup_rule(spark):
    # two components with interleaved ids; root is always the min id
    got = _clusters(spark, [(9, 3), (3, 7), (8, 2), (2, 6)])
    assert got == {3: 3, 7: 3, 9: 3, 2: 2, 6: 2, 8: 2}


# ---------------------------------------------------------------------------
# duplicated_spans (exact repeated-substring coverage)
# ---------------------------------------------------------------------------

def _spans(spark, docs, n=4, min_count=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in td.duplicated_spans(df, n=n, min_count=min_count).collect()}


def test_duplicated_spans_shared_passage(spark):
    # docs 1 and 2 share an 6-word passage inside otherwise-unique text;
    # doc 3 is clean. n=4 ⇒ the shared run is covered by its 3 duplicated
    # 4-gram starts, merging to ONE span of exactly the passage length.
    shared = "alpha beta gamma delta epsilon zeta"
    got = _spans(spark, [
        (1, f"one two three {shared} four five"),
        (2, f"six seven {shared} eight nine ten"),
        (3, "completely unique words with no repeats at all here"),
    ])
    assert got[1]["n_spans"] == 1 and got[1]["dup_tokens"] == 6
    assert got[2]["n_spans"] == 1 and got[2]["dup_tokens"] == 6
    assert got[3]["n_spans"] == 0 and got[3]["dup_token_bp"] == 0
    assert got[1]["dup_token_bp"] == 6 * 10000 // got[1]["n_tokens"]


def test_duplicated_spans_merge_two_overlapping_runs(spark):
    # two shared passages ADJACENT in doc 1 merge into one span there,
    # while they sit apart in docs 2/3 (one span each)
    a, b = "p q r s", "w x y z"
    got = _spans(spark, [
        (1, f"{a} {b} filler0 filler1 filler2"),
        (2, f"lead0 lead1 {a} tail0 tail1 tail2"),
        (3, f"m0 m1 m2 {b} m3 m4 m5"),
    ])
    assert got[1]["n_spans"] == 1 and got[1]["dup_tokens"] == 8
    assert got[2]["n_spans"] == 1 and got[2]["dup_tokens"] == 4
    assert got[3]["n_spans"] == 1 and got[3]["dup_tokens"] == 4


def test_duplicated_spans_within_doc_repeat_counts(spark):
    # the SAME 4-gram appearing twice inside one doc is a corpus-wide
    # count of 2 — both occurrences are duplicated (Lee et al. semantics)
    got = _spans(spark, [
        (1, "a b c d mid0 mid1 a b c d end0"),
        (2, "totally different text goes right here now"),
    ])
    assert got[1]["n_spans"] == 2 and got[1]["dup_tokens"] == 8
    assert got[2]["n_spans"] == 0


def test_duplicated_spans_exact_copy_full_coverage(spark):
    text = "u1 u2 u3 u4 u5 u6 u7 u8"
    got = _spans(spark, [(1, text), (2, text)])
    for d in (1, 2):
        assert got[d]["dup_tokens"] == 8
        assert got[d]["dup_token_bp"] == 10000


def test_duplicated_spans_runs_shorter_than_n_invisible(spark):
    # a 3-word shared run cannot contain any duplicated 4-gram —
    # the documented resolution floor
    got = _spans(spark, [
        (1, "k1 k2 k3 shared1 shared2 shared3 k4 k5"),
        (2, "j1 j2 shared1 shared2 shared3 j3 j4 j5"),
    ])
    assert got[1]["n_spans"] == 0 and got[2]["n_spans"] == 0
