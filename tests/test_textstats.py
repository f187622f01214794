"""Text-analysis operators: language-ID, quality features, token stats,
fingerprints (operators/textstats.py)."""

import hashlib

import pytest

from s_crawler_spark.functions.texthash import MERSENNE_31
from s_crawler_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat is on the mat and it was good"),
        (1, "der hund ist nicht mit der katze und das haus"),
        (2, "el perro es grande y no come con los gatos"),
        (3, "xyzzy plugh quux"),                      # no stopwords anywhere
        (4, "the der le el the the"),                 # en wins 3 vs de 1...
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(docs):
    out = {r["doc_id"]: r for r in ts.lang_id_table(docs).collect()}
    assert out[0]["pred_lang"] == "en"
    assert out[1]["pred_lang"] == "de"
    assert out[2]["pred_lang"] == "es"
    assert out[3]["pred_lang"] == "und"
    assert out[4]["pred_lang"] == "en"
    # the,cat,is,on,the,mat,and,it,was,good -> the,the,is,on,and,was = 6 hits
    assert out[0]["score_en"] == 6


def test_lang_tiebreak_order(spark):
    df = spark.createDataFrame([(0, "der the")], "doc_id long, text string")
    row = ts.lang_id_table(df).collect()[0]
    assert row["score_en"] == row["score_de"] == 1
    assert row["pred_lang"] == "en"  # LANG_ORDER tie-break


def test_quality_integer_exact(spark):
    df = spark.createDataFrame([(0, "aa bbb cccc!")], "doc_id long, text string")
    r = ts.quality_table(df).collect()[0]
    assert r["n_chars"] == 12
    assert r["n_words"] == 3
    # words lowercased: aa(2) bbb(3) cccc!(5) -> 10 chars over 3 words
    assert r["avg_word_len_c"] == 10 * 100 // 3
    assert r["punct_ratio_bp"] == 1 * 10000 // 12
    assert 0 <= r["quality_score_bp"] <= 10000


def test_token_stats(spark):
    df = spark.createDataFrame([(0, "ab 12 cd-ef gh")], "doc_id long, text string")
    r = ts.token_stats_table(df).collect()[0]
    assert r["ws_tokens"] == 4
    # regex tokens: ab,12,cd,-,ef,gh
    assert r["bpe_tokens"] == 6
    assert r["distinct_ws_tokens"] == 4
    assert r["ttr_bp"] == 10000


def test_fingerprint_matches_python(spark):
    text = "abcdefghijklmnopqrstuvwxyz0123456789"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = ts.fingerprint_table(df).collect()[0]["fingerprint"]
    hs = []
    for i in range(0, len(text) - ts.SHINGLE_LEN + 1, ts.SHINGLE_STRIDE):
        sh = text[i:i + ts.SHINGLE_LEN]
        hs.append(int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % MERSENNE_31)
    assert got == min(hs)


def test_keyword_search(spark):
    df = spark.createDataFrame(
        [(0, "alpha keys", "nothing"), (1, "beta", "has key inside"),
         (2, "gamma", "none")],
        "doc_id long, title string, abstract string")
    got = {r["doc_id"] for r in
           ts.keyword_search(df, "key", ("title", "abstract")).collect()}
    assert got == {0, 1}


def test_keyword_search_default_matches_reference_columns(spark):
    """The DEFAULT call searches all three reference columns (title OR
    abstract OR keywords, src/database_manager.py:157-162) — a doc matched
    only through its keywords_csv must be found without passing cols."""
    df = spark.createDataFrame(
        [(0, "alpha keys", "nothing", None),
         (1, "beta", "has key inside", None),
         (2, "gamma", "none", "keyhole, optics"),
         (3, "delta", "none", "plasma")],
        "doc_id long, title string, abstract string, keywords_csv string")
    got = {r["doc_id"] for r in ts.keyword_search(df, "key").collect()}
    assert got == {0, 1, 2}


def test_chunk_table_spans(spark):
    text = " ".join(f"w{i}" for i in range(80))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(ts.chunk_table(df).collect(), key=lambda r: r["chunk_idx"])
    # 80 tokens, window 32, stride 24 → window starts 0, 24, 48
    assert [r["token_start"] for r in rows] == [0, 24, 48]
    assert rows[0]["chunk_text"].split(" ") == [f"w{i}" for i in range(32)]
    assert rows[2]["chunk_text"].split(" ") == [f"w{i}" for i in range(48, 80)]
    # overlap: each consecutive pair shares chunk_tokens - stride = 8 tokens
    a = rows[0]["chunk_text"].split(" ")
    b = rows[1]["chunk_text"].split(" ")
    assert a[-8:] == b[:8]


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [(0, "mail me at a.b+c@x-site.co.uk or 555-123-4567 acct 4111111111111111 ok 123")],
        "doc_id long, text string")
    r = ts.scrub_table(df).collect()[0]
    assert r["clean_text"] == "mail me at <EMAIL> or <PHONE> acct <CARDNUM> ok 123"
    assert r["was_scrubbed"]
    clean = spark.createDataFrame([(1, "no pii here just words")],
                                  "doc_id long, text string")
    r2 = ts.scrub_table(clean).collect()[0]
    assert not r2["was_scrubbed"] and r2["clean_text"] == "no pii here just words"


def test_repetition_metrics(spark):
    rows = [
        (0, "the cat sat on the mat the cat sat again"),
        (1, "a b a b a b a b"),
        (2, "unique words only here today friends"),
        (3, "one. two. one. three. one. two. four"),
        (4, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ts.repetition_table(df).collect()}
    # doc 0: 10 words, 6 distinct; "the cat" x2, "the cat sat" x2
    assert out[0]["n_words"] == 10
    assert out[0]["dup_word_bp"] == 4 * 10000 // 10
    assert out[0]["top2gram_bp"] == 2 * 2 * 10000 // 10
    assert out[0]["top3gram_bp"] == 2 * 3 * 10000 // 10
    # doc 1: "a b" appears 4 times among 7 2-grams → covers 8/8 words;
    # overlapping 3-grams ("a b a" x3) legitimately exceed 10000 bp
    assert out[1]["top2gram_bp"] == 10000
    assert out[1]["top3gram_bp"] == 3 * 3 * 10000 // 8
    assert out[2]["dup_word_bp"] == 0
    # doc 3: 7 '. '-sentences, 4 distinct
    assert out[3]["dup_sent_bp"] == 3 * 10000 // 7
    # doc 4: single word → no 2-/3-grams, all-zero ratios, no crash
    assert out[4]["top2gram_bp"] == 0 and out[4]["top3gram_bp"] == 0


def test_contamination(spark):
    docs = spark.createDataFrame([
        (1, "the cat sat on the mat the cat sat again"),
        (2, "a b a b a b a b"),
        (3, "tiny"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the cat sat on the mat the cat sat zzz")],
        "bench_id long, text string")
    out = {r["doc_id"]: r for r in
           ts.contamination_table(docs, bench, n=3).collect()}
    # doc 1 has 7 distinct 3-grams; all but "cat sat again" appear in bench
    assert out[1]["n_grams"] == 7
    assert out[1]["n_hit_grams"] == 6
    assert out[1]["contam_bp"] == 6 * 10000 // 7
    assert out[2]["n_hit_grams"] == 0 and out[2]["contam_bp"] == 0
    # doc shorter than n: zero grams, guarded ratio
    assert out[3]["n_grams"] == 0 and out[3]["contam_bp"] == 0
