"""ANN similarity search + multimodal plumbing
(operators/similarity.py, operators/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from s_crawler_spark.operators import multimodal as mm
from s_crawler_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))


def test_brute_force_topk_known_geometry(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    out = sim.brute_force_topk(df, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos_sim"] > 0.99
    assert out[2]["cos_sim"] == -1.0


def test_topk_rank_contract(emb):
    out = sim.brute_force_topk(emb, _queries(emb), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_recall_vs_brute_force(emb):
    q = _queries(emb, 8)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in sim.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in sim.lsh_topk(emb, q, k=5, dim=64).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_ivf_recall_vs_brute_force(emb):
    q = _queries(emb, 8)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in sim.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in sim.ivf_topk(emb, q, k=5, dim=64).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_arrow_paths_bit_identical_to_jvm(emb):
    """The Arrow bucketing/cell-assignment fast paths accumulate dots
    left-to-right per dimension, so every output row must equal the JVM
    column-expression form exactly — buckets, candidates, cosines, ranks."""
    q = _queries(emb, 8)
    for fn, kw in [(sim.lsh_topk, dict(k=5, dim=64)),
                   (sim.ivf_topk, dict(k=5, dim=64))]:
        a = {tuple(r) for r in fn(emb, q, arrow=True, **kw).collect()}
        j = {tuple(r) for r in fn(emb, q, arrow=False, **kw).collect()}
        assert a == j, fn.__name__
    a = {tuple(r) for r in
         sim.lsh_near_dup_pairs(emb, 0.4, dim=64, arrow=True).collect()}
    j = {tuple(r) for r in
         sim.lsh_near_dup_pairs(emb, 0.4, dim=64, arrow=False).collect()}
    assert a == j


def test_ivf_cells_partition_corpus(emb):
    cells = emb.select(sim.ivf_cell(F.col("embedding"), 64, 16).alias("c"))
    vals = [r["c"] for r in cells.collect()]
    assert all(0 <= v < 16 for v in vals)
    assert len(set(vals)) > 4  # the quantizer actually spreads the corpus


def test_lsh_buckets_deterministic(emb):
    b1 = {r["vec_id"]: r["b"] for r in emb.select(
        "vec_id", sim.lsh_bucket(F.col("embedding"), 64, 6).alias("b")).collect()}
    b2 = {r["vec_id"]: r["b"] for r in emb.select(
        "vec_id", sim.lsh_bucket(F.col("embedding"), 64, 6).alias("b")).collect()}
    assert b1 == b2
    assert all(0 <= v < 64 for v in b1.values())


# ---------------------------- multimodal ----------------------------------

@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return mm.media_from_documents(docs)


def test_media_meta_header_roundtrip(media):
    """Image/audio payloads carry REAL PNG / WAVE headers packed JVM-side;
    the kernel must parse the fields back with the stdlib header readers —
    a broken encoder or parser breaks the body-length formulas."""
    metas = mm.extract_media_meta(media).collect()
    assert len(metas) == media.count()
    for r in metas[:100]:
        if r["media_type"] == "image":
            n = r["n_bytes"] - 33  # PNG header bytes
            assert r["codec"] == "png"
            assert r["width"] == 16 + n % 640
            assert r["height"] == 16 + (n * 7) % 480
            assert r["sample_rate"] is None and r["n_frames"] is None
        elif r["media_type"] == "audio":
            n = r["n_bytes"] - 44  # RIFF/WAVE header bytes
            assert r["codec"] == "wav"
            assert r["sample_rate"] == 8000 + (n % 5) * 8000
            assert r["n_frames"] == n // 2  # mono 16-bit PCM frames
            assert r["width"] is None
        else:
            n = r["n_bytes"]
            assert r["codec"] == "fake/h264"  # the one stub left (no pyav)
            assert r["n_frames"] == 1 + n % 5


def test_header_parsers_on_real_payloads():
    """The stdlib header parsers against hand-built AND canonical payloads:
    every encoder round-trips, and a known-good byte string (the classic
    1×1 transparent PNG) parses without our own encoder in the loop."""
    from s_crawler_spark.functions import mediahdr as mh
    import base64

    assert mh.parse_header(mh.png_bytes(640, 480, b"xyz")) == {
        "width": 640, "height": 480, "sample_rate": None,
        "n_frames": None, "codec": "png"}
    assert mh.parse_header(mh.jpeg_bytes(1024, 768)) == {
        "width": 1024, "height": 768, "sample_rate": None,
        "n_frames": None, "codec": "jpeg"}
    assert mh.parse_header(mh.gif_bytes(320, 200)) == {
        "width": 320, "height": 200, "sample_rate": None,
        "n_frames": None, "codec": "gif"}
    assert mh.parse_header(mh.bmp_bytes(800, 600)) == {
        "width": 800, "height": 600, "sample_rate": None,
        "n_frames": None, "codec": "bmp"}
    assert mh.parse_header(mh.wav_bytes(44100, b"\x00" * 10)) == {
        "width": None, "height": None, "sample_rate": 44100,
        "n_frames": 5, "codec": "wav"}
    # canonical 1x1 PNG (public-domain minimal fixture)
    png_1x1 = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        b"YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    got = mh.parse_header(png_1x1)
    assert got["width"] == 1 and got["height"] == 1 and got["codec"] == "png"
    # JPEG with fill bytes and an APP0 segment before SOF0 (marker scan)
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    jpg = b"\xff\xd8" + app0 + mh.jpeg_bytes(12, 34)[2:]
    assert mh.parse_header(jpg)["width"] == 12
    # standalone TEM marker (0x01) carries NO length word: treating it as
    # a sized segment would skip two arbitrary bytes and desync the scan
    jpg_tem = b"\xff\xd8" + b"\xff\x01" + app0 + mh.jpeg_bytes(12, 34)[2:]
    assert mh.parse_header(jpg_tem)["width"] == 12
    # top-down BMP (negative height) reports absolute height
    bmp = bytearray(mh.bmp_bytes(10, 20))
    bmp[22:26] = struct.pack("<i", -20)
    assert mh.parse_header(bytes(bmp))["height"] == 20
    # unrecognized bytes → None (callers fall back to the video stub)
    assert mh.parse_header(b"plain text payload") is None


def test_media_meta_drops_payload_column(media):
    meta = mm.extract_media_meta(media)
    assert "payload" not in meta.columns


def test_frame_sampling(media):
    frames = mm.sample_frames(media)
    per_doc = {r["doc_id"]: r["n"] for r in
               frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    vids = {r["doc_id"]: len(r["payload"]) for r in
            media.filter(F.col("media_type") == "video").collect()}
    assert set(per_doc) == set(vids)
    for d, n in per_doc.items():
        assert n == 1 + vids[d] % 5


def test_lsh_near_dup_subset_and_recall(spark, emb):
    from s_crawler_spark.operators import textdedup as td
    exact = {(r["a_id"], r["b_id"])
             for r in td.embedding_near_dup_pairs(emb, threshold=0.4).collect()}
    approx = {(r["a_id"], r["b_id"])
              for r in sim.lsh_near_dup_pairs(emb, threshold=0.4).collect()}
    assert approx <= exact          # every emitted pair is a true near-dup
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"near-dup LSH recall {recall:.2f}"


def test_vectorized_topk_matches_jvm_exact(emb):
    """The numpy matmul fast path must return the identical (query, rank,
    neighbor) result as the JVM-expression baseline; cosines agree to the
    4dp contract rounding."""
    q = _queries(emb, 8)
    a = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
               for r in sim.brute_force_topk(emb, q, k=5).collect())
    b = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
               for r in sim.topk_vectorized(emb, q, k=5).collect())
    assert [x[:3] for x in a] == [x[:3] for x in b]
    assert all(abs(x[3] - y[3]) <= 1e-4 for x, y in zip(a, b))


def test_parse_header_respects_declared_media_family():
    """The sniff is gated by the row's declared media_type: a payload whose
    BODY bytes coincidentally start with another family's magic must not be
    misdecoded (a 'BM…' document is not a bitmap; video has no stdlib
    parser at all, so the deterministic fake stays authoritative)."""
    from s_crawler_spark.functions import mediahdr as mh
    from s_crawler_spark.operators.multimodal import _decode_one

    bm_text = b"BMW recalls 2026 models over parsing defects"
    assert mh.parse_header(bm_text) is not None          # sniff-all form
    assert mh.parse_header(bm_text, "video") is None     # family-gated
    assert mh.parse_header(bm_text, "audio") is None
    wav = mh.wav_bytes(44100, b"\x00" * 4)
    assert mh.parse_header(wav, "image") is None
    assert mh.parse_header(wav, "audio")["codec"] == "wav"
    png = mh.png_bytes(2, 3)
    assert mh.parse_header(png, "image")["codec"] == "png"
    assert mh.parse_header(png, "video") is None
    # the decode kernel: a video payload with an image magic gets the
    # documented deterministic fake, never a garbage BMP decode
    meta = _decode_one("video", bm_text)
    n = len(bm_text)
    assert meta["codec"] == "fake/h264"
    assert meta["width"] == 16 + n % 320
    assert meta["n_frames"] == 1 + n % 5
