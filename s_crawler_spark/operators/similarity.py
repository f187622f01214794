"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
deterministic random-hyperplane LSH bucketing so the candidate join is
per-bucket instead of all-pairs. Dot products are JVM-side higher-order
functions (zip_with + aggregate) — no Python in the hot path.

Scale notes: queries are broadcast (they are the small side by construction);
the corpus side streams through one projection + filter per bucket probe, so
the plan is scan → broadcast-hash-join → per-row dot product → per-query
top-k (window over query_id partitions, which shuffles only (query_id, score,
id) triples — never the vectors).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textdedup import cosine, l2_norm


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     include_self: bool = False) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries: (query_id, query_vec). Returns (query_id, rank, neighbor_id,
    cos_sim) with rank 1..k, ties broken by neighbor_id — fully deterministic.
    """
    base = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("n_vec"))
    j = base.crossJoin(F.broadcast(queries))
    if not include_self:
        j = j.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = j.withColumn("cos", cosine(F.col("n_vec"), F.col("query_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 4).alias("cos_sim"))
    )


TOPK_SELECT_MARGIN = 8  # extra per-batch candidates absorbing BLAS float drift


def topk_vectorized(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k via a numpy matmul SELECTOR + JVM-fold re-rank
    (the Arrow-vectorized fast path; bit-identical to brute_force_topk).

    Two stages, split so BLAS float behavior can never reach the output:

    1. SELECT: the query matrix ships to every task (small side by
       construction — one bounded collect, the broadcast pattern); each
       Arrow batch computes a (batch × queries) cosine matrix with one
       matmul and keeps its local top-(k + margin) ids per query. BLAS
       summation order differs from the engine's left-to-right fold by
       ~1e-15 — far below any margin-crossing rank gap — so the survivor
       set is a superset of the true top-k.
    2. RE-RANK: survivors (≤ (k+margin)·queries·batches id pairs — never
       vectors, never the score matrix) join back to their vectors and the
       authoritative cosine is the SAME ``cosine()`` column expression as
       brute_force_topk, so values, ties, and ranks are bit-identical to
       the JVM baseline and the shared SQL oracle by construction.
    """
    import numpy as np
    from pyspark.sql import types as T

    q_rows = queries.select("query_id", "query_vec").collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["query_vec"] for r in q_rows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    kk_sel = k + TOPK_SELECT_MARGIN

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
    ])

    def batch_select(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            cos = vn @ qn.T  # (batch, n_queries)
            qcol, ncol = [], []
            for j in range(len(q_ids)):
                mask = ids != q_ids[j]
                cand_ids, cand_cos = ids[mask], cos[:, j][mask]
                if not len(cand_ids):
                    continue
                m = min(kk_sel, len(cand_ids))
                order = np.lexsort((cand_ids, -cand_cos))[:m]
                qcol.extend([q_ids[j]] * m)
                ncol.extend(cand_ids[order])
            yield pd.DataFrame({"query_id": qcol, "neighbor_id": ncol})

    survivors = emb.select(id_col, vec_col).mapInPandas(batch_select, out_schema)
    scored = (survivors
              .join(emb.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("n_vec")), on="neighbor_id")
              .join(F.broadcast(queries), on="query_id")
              .withColumn("cos", cosine(F.col("n_vec"), F.col("query_vec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.select("query_id", "neighbor_id", "cos")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 4).alias("cos_sim")))


# --------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic planes — no RNG at plan time)
# --------------------------------------------------------------------------

# Bucketing has two implementations with BIT-IDENTICAL output:
# - lsh_bucket: the definitional JVM column expression (aggregate fold);
# - _exploded_buckets_arrow: one Arrow pass that accumulates each plane dot
#   LEFT-TO-RIGHT per dimension in float64 (numpy elementwise ops are
#   correctly-rounded IEEE doubles, applied in the same order as the JVM
#   fold and the DuckDB list_reduce oracle), so every dot — and therefore
#   every bucket sign — is the same bit pattern. The fold form pays ~1.5k
#   interpreted lambda evaluations per row (24 planes × 64 dims); the Arrow
#   form does 24 × 64 vectorized ops per BATCH. At rest the buckets are the
#   stored table's partition columns (ingest-time cost); these paths price
#   ad-hoc bucketing.


def _plane(plane_idx: int, dim: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random unit hyperplane derived from md5 — the
    same planes regenerate on every executor/run with no shared state."""
    vals = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{table}:{plane_idx}:{d}".encode()).hexdigest()
        vals.append(int(h[:8], 16) / 0xFFFFFFFF - 0.5)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8,
               table: int = 0) -> Column:
    """Signed-projection bucket id in [0, 2^n_planes) for one hash table."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(p, dim, table)])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        out = out + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def _fold_dots(vm, mats):
    """Per-row dots against each of ``mats``'s vectors, accumulated
    left-to-right per dimension — the same op order as the JVM fold and the
    DuckDB list_reduce oracle, so results are bit-identical doubles."""
    import numpy as np
    out = np.zeros((len(mats), vm.shape[0]), dtype=np.float64)
    for j, plane in enumerate(mats):
        acc = np.zeros(vm.shape[0], dtype=np.float64)
        for d in range(vm.shape[1]):
            acc = acc + vm[:, d] * plane[d]
        out[j] = acc
    return out


def _exploded_buckets_arrow(emb: DataFrame, dim: int, n_planes: int,
                            n_tables: int, id_col: str, vec_col: str,
                            out_id: str, include_vec: bool) -> DataFrame:
    """(id[, vec], t, b) rows — one Arrow pass, narrow (no exchange), signs
    bit-identical to lsh_bucket (see module note). The vector column, when
    included, is passed through untouched so downstream map-side cosine
    uses the original values."""
    import pandas as pd
    planes = [[_plane(p, dim, t) for p in range(n_planes)]
              for t in range(n_tables)]
    flat = [pl for tbl in planes for pl in tbl]
    schema = f"{out_id} long, " + \
        (f"n_vec array<float>, " if include_vec else "") + "t int, b long"

    def kernel(batches):
        import numpy as np
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            dots = _fold_dots(vm, flat)  # (T*P, n)
            for t in range(n_tables):
                b = np.zeros(len(pdf), dtype=np.int64)
                for p in range(n_planes):
                    b += (dots[t * n_planes + p] >= 0).astype(np.int64) << p
                cols = {out_id: pdf[id_col].to_numpy()}
                if include_vec:
                    cols["n_vec"] = pdf[vec_col]
                cols["t"] = t
                cols["b"] = b
                yield pd.DataFrame(cols)

    return emb.select(id_col, vec_col).mapInPandas(kernel, schema)


def _with_cosine_arrow(df: DataFrame, a_col: str, b_col: str,
                       keep: list[tuple[str, str]]) -> DataFrame:
    """Append ``cos`` = cosine(a_col, b_col) in one Arrow pass, keeping the
    ``keep`` (name, sql_type) columns. Bit-identical to the JVM ``cosine``
    expression: dot and both norms accumulate left-to-right per dimension
    in float64 (every elementwise op correctly rounded, same order as the
    fold and the DuckDB list_reduce oracle), then sqrt·sqrt and one divide
    in the same association as l2_norm(a) * l2_norm(b)."""
    import pandas as pd
    schema = ", ".join(f"{n} {t}" for n, t in keep) + ", cos double"
    names = [n for n, _ in keep]

    def kernel(batches):
        import numpy as np
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.array(list(pdf[a_col]), dtype=np.float64)
            vb = np.array(list(pdf[b_col]), dtype=np.float64)
            dot = np.zeros(len(pdf))
            na = np.zeros(len(pdf))
            nb = np.zeros(len(pdf))
            for d in range(va.shape[1]):
                dot = dot + va[:, d] * vb[:, d]
                na = na + va[:, d] * va[:, d]
                nb = nb + vb[:, d] * vb[:, d]
            out = {n: pdf[n] for n in names}
            out["cos"] = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema)


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_planes: int = 4, n_tables: int = 6, n_probes: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             arrow: bool = True) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Standard L-tables×k-planes construction: a neighbor is a candidate if it
    shares the query's bucket in ANY of the ``n_tables`` independent tables
    (plus ``n_probes - 1`` single-bit-flip probe buckets per table); exact
    cosine re-rank within candidates. For moderately-similar neighbors
    (cos≈0.5 ⇒ per-plane agreement ≈0.67) a single table recalls
    0.67^planes ≈ 20%; six 4-plane tables with 2 probes push recall past
    one-half while touching a small corpus fraction.

    At 10^10 vectors each table's bucket id is a partition column of the
    stored corpus, so a probe is a partition-pruned scan; the per-table
    candidate join broadcasts only (query, bucket) pairs. Recall vs brute
    force is pytest-gated.

    Physical plan (explain_audit-pinned): the corpus side is EXPLODED into
    one (t, b) row per table so the probe join is a two-column equi-key
    BroadcastHashJoin — never a BroadcastNestedLoopJoin (an element_at(bt,
    t+1) = b predicate referencing both sides extracts no equi-key and
    degrades to a full-corpus nested loop). Cosine is computed map-side
    right after the broadcast join, so the only exchanges downstream of the
    scan carry (query_id, neighbor_id, cos) triples — vectors never shuffle.

    ``arrow=True`` (default) computes corpus buckets in one Arrow pass,
    bit-identical to the JVM fold (module note); ``arrow=False`` keeps the
    pure-column-expression form (the definitional baseline the tests
    cross-check).
    """
    if arrow:
        exploded = _exploded_buckets_arrow(
            emb, dim, n_planes, n_tables, id_col, vec_col,
            out_id="neighbor_id", include_vec=True)
    else:
        exploded = emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"),
            F.explode(F.array(*[
                F.struct(F.lit(t).alias("t"),
                         lsh_bucket(F.col(vec_col), dim, n_planes,
                                    table=t).alias("b"))
                for t in range(n_tables)])).alias("tb"),
        ).select("neighbor_id", "n_vec",
                 F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    qb = queries.select(
        "query_id", "query_vec",
        *[lsh_bucket(F.col("query_vec"), dim, n_planes, table=t).alias(f"qb{t}")
          for t in range(n_tables)])
    probes = []
    for t in range(n_tables):
        probes.append(F.struct(F.lit(t).alias("t"), F.col(f"qb{t}").alias("b")))
        for p in range(min(n_probes - 1, n_planes)):
            probes.append(F.struct(
                F.lit(t).alias("t"),
                F.col(f"qb{t}").bitwiseXOR(F.lit(1 << p)).alias("b")))
    qprobe = (qb.select("query_id", "query_vec",
                        F.explode(F.array(*probes)).alias("pr"))
              .select("query_id", "query_vec",
                      F.col("pr.t").alias("t"), F.col("pr.b").alias("b")))
    # equi-keys (t, b) → BroadcastHashJoin; cosine computed before any
    # exchange; multi-table duplicates collapse in a partial-agg groupBy
    # (cos is identical across a pair's duplicates, so max == the value)
    matched = (exploded.alias("e")
               .join(F.broadcast(qprobe).alias("q"),
                     (F.col("e.t") == F.col("q.t"))
                     & (F.col("e.b") == F.col("q.b"))
                     & (F.col("e.neighbor_id") != F.col("q.query_id"))))
    if arrow:
        scored = _with_cosine_arrow(
            matched.select("query_id", "neighbor_id", "n_vec", "query_vec"),
            "n_vec", "query_vec",
            [("query_id", "long"), ("neighbor_id", "long")])
    else:
        scored = matched.withColumn(
            "cos", cosine(F.col("e.n_vec"), F.col("q.query_vec")))
    j = scored.groupBy("query_id", "neighbor_id").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the standard coarse-quantizer scale path
# --------------------------------------------------------------------------

IVF_SALT = 97  # fixed plane-table salt so centroids are disjoint from LSH planes


def _centroid(cell: int, dim: int) -> list[float]:
    """Deterministic unit centroid for one IVF cell (md5-derived, same
    regeneration property as the LSH planes: every executor/engine can
    rebuild them independently — including the SQL oracle)."""
    return _plane(cell, dim, table=IVF_SALT)


def ivf_cell(vec: Column, dim: int, n_cells: int) -> Column:
    """Coarse-quantizer cell id: argmax over centroids of dot(vec, c)
    (centroids are unit vectors, so dot-argmax ≡ cosine-argmax; |v| is
    constant across cells). First-index tie-break — deterministic.

    The centroid literals sit inside the transform's input array (evaluated
    once); the lambda body only re-reads the plain ``vec`` column reference,
    which is cheap per element (the HOF re-evaluation trap applies to
    expensive constructions, not column refs)."""
    cents = F.array(*[
        F.array(*[F.lit(v) for v in _centroid(c, dim)])
        for c in range(n_cells)])
    dots = F.transform(
        cents,
        lambda cv: F.aggregate(
            F.zip_with(vec, cv, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v))
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def _ivf_cells_arrow(emb: DataFrame, dim: int, n_cells: int,
                     id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, n_vec, cell) via one Arrow pass; argmax over dots that
    are bit-identical to the JVM fold (np.argmax and array_position both
    take the FIRST maximum, so ties break the same way)."""
    import pandas as pd
    cents = [_centroid(c, dim) for c in range(n_cells)]

    def kernel(batches):
        import numpy as np
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            dots = _fold_dots(vm, cents)  # (C, n)
            yield pd.DataFrame({
                "neighbor_id": pdf[id_col].to_numpy(),
                "n_vec": pdf[vec_col],
                "cell": np.argmax(dots, axis=0).astype(np.int32),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, "neighbor_id long, n_vec array<float>, cell int")


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             arrow: bool = True) -> DataFrame:
    """Approximate top-k via IVF: assign every vector to its nearest
    deterministic centroid, probe each query's ``n_probe`` best cells,
    exact cosine re-rank within the probed cells.

    At 10^10 vectors ``cell`` is the table's partition column, so a probe
    is an ``n_probe``-partition pruned scan touching ~n_probe/n_cells of
    the corpus; the query-side probe list is a broadcast. Recall vs brute
    force is pytest-gated; the whole construction (centroids, assignment,
    probe order, re-rank) is deterministic and oracle-checked in SQL.
    ``arrow=True`` (default) assigns corpus cells in one Arrow pass,
    bit-identical to the JVM fold (module note); the query-side probe
    ranking stays a column expression (queries are the tiny side)."""
    if arrow:
        base = _ivf_cells_arrow(emb, dim, n_cells, id_col, vec_col)
    else:
        base = emb.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("n_vec"),
                          ivf_cell(F.col(vec_col), dim, n_cells).alias("cell"))
    cents = F.array(*[
        F.array(*[F.lit(v) for v in _centroid(c, dim)])
        for c in range(n_cells)])
    qdots = F.transform(
        cents,
        lambda cv: F.aggregate(
            F.zip_with(F.col("query_vec"), cv,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v))
    # (dot, cell) structs sorted descending → first n_probe cells
    ranked = F.reverse(F.sort_array(F.zip_with(
        qdots,
        F.sequence(F.lit(0), F.lit(n_cells - 1)),
        lambda d, i: F.struct(d.alias("dot"), i.cast("int").alias("cell")))))
    probes = queries.select(
        "query_id", "query_vec",
        F.explode(F.transform(F.slice(ranked, 1, n_probe),
                              lambda s: s["cell"])).alias("cell"))
    matched = (base.alias("b")
               .join(F.broadcast(probes.alias("p")),
                     (F.col("b.cell") == F.col("p.cell"))
                     & (F.col("b.neighbor_id") != F.col("p.query_id"))))
    if arrow:
        j = _with_cosine_arrow(
            matched.select("query_id", "neighbor_id", "n_vec", "query_vec"),
            "n_vec", "query_vec",
            [("query_id", "long"), ("neighbor_id", "long")])
    else:
        j = matched.withColumn(
            "cos", cosine(F.col("b.n_vec"), F.col("p.query_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        j.select("query_id", "neighbor_id", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 4).alias("cos_sim"))
    )


def embedding_norms(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    return emb.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(l2_norm(F.col(vec_col)), 4).alias("l2_norm"),
    )


def lsh_near_dup_pairs(emb: DataFrame, threshold: float, dim: int = 64,
                       n_planes: int = 4, n_tables: int = 6,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       arrow: bool = True) -> DataFrame:
    """Embedding near-dup pairs, scale path: multi-table LSH bucket
    self-join generates candidates (no all-pairs stage), exact cosine
    verifies. Approximate — recall vs the brute-force operator
    (textdedup.embedding_near_dup_pairs) is pytest-gated; every emitted
    pair is exact (verified), only misses are possible.

    At 10^10 vectors each table's bucket id is a partition/bucket column of
    the stored corpus, so the per-table self-join is co-located.

    Physical plan (explain_audit-pinned): candidate generation is ID-ONLY —
    the corpus explodes into (id, t, b) rows (no vector column) and ONE
    two-column equi-key self-join on (t, b) covers all tables (the same
    exploded-piece pattern as textdedup.simhash_near_pairs); vectors join
    back once per side only at the exact-verify step. No exchange in the
    candidate stage carries an embedding — the round-2 shape (6 per-table
    self-joins each shuffling full vectors on both sides) moved ~12 vector
    copies per row per pass."""
    from .textdedup import cosine

    if arrow:
        keyed = _exploded_buckets_arrow(
            emb, dim, n_planes, n_tables, id_col, vec_col,
            out_id="id", include_vec=False).localCheckpoint(eager=False)
    else:
        keyed = emb.select(
            F.col(id_col).alias("id"),
            F.explode(F.array(*[
                F.struct(F.lit(t).alias("t"),
                         lsh_bucket(F.col(vec_col), dim, n_planes,
                                    table=t).alias("b"))
                for t in range(n_tables)])).alias("tb"),
        ).select("id", F.col("tb.t").alias("t"), F.col("tb.b").alias("b")) \
            .localCheckpoint(eager=False)
    cand = (keyed.alias("x").join(
                keyed.alias("y"),
                (F.col("x.t") == F.col("y.t")) & (F.col("x.b") == F.col("y.b"))
                & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
            .distinct())
    side = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    hydrated = (cand
                .join(side.select(F.col("id").alias("a_id"),
                                  F.col("v").alias("a_v")), "a_id")
                .join(side.select(F.col("id").alias("b_id"),
                                  F.col("v").alias("b_v")), "b_id"))
    if arrow:
        verified = _with_cosine_arrow(
            hydrated, "a_v", "b_v", [("a_id", "long"), ("b_id", "long")])
    else:
        verified = hydrated.withColumn(
            "cos", cosine(F.col("a_v"), F.col("b_v")))
    return (verified
            .filter(F.col("cos") >= threshold)
            .select("a_id", "b_id", F.round("cos", 4).alias("cos_sim")))
