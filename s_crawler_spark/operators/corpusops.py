"""Corpus-level training-data pipeline operators.

Where textstats.py computes per-document features, these operators make
corpus-wide decisions over them — the three a 100 TB pre-training pipeline
runs right after scoring:

- ``score_quantiles``: EXACT distributed quantiles over an integer score
  column (quality-filter threshold selection). Works by counting, not
  sorting: the groupBy histogram is bounded by the score DOMAIN (≤ 10 001
  distinct basis-point values), never by corpus size, so the cumulative
  window over it is a constant-size single task at any scale while the only
  data-sized operation is one partial-agg groupBy.
- ``stratified_sample``: deterministic per-stratum hash sampling (training
  mixture construction). Pure map-side filter — hash(salt, id) % 10 000 <
  rate_bp per stratum — so re-runs, retries, and the SQL oracle all select
  the identical sample with zero shuffle.
- ``pack_shards``: token-budget shard assignment (pack documents into
  ~N-token training shards in a canonical order). The global running token
  sum is a HIERARCHICAL cumsum: a per-block window (parallel, keyed by
  ``id div block_size``) plus a block-offset window over the tiny block
  totals (one task over n_docs/block_size rows — recurse the same trick for
  another 4096× if that ever mattered), then shard_id = cum_before div
  budget. Bit-identical to the naive single global window the SQL oracle
  runs, without its single-task sort of the whole corpus.

No reference analogue (the reference stores everything it crawls); these are
engine-side additions in the same contract style — every operator has an
exact DuckDB oracle (plans/contract.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import md5_hash60

DEFAULT_QUANTILES_BP = (2500, 5000, 7500, 9500)


def score_quantiles(scored: DataFrame,
                    qs_bp: tuple[int, ...] = DEFAULT_QUANTILES_BP,
                    score_col: str = "quality_score_bp") -> DataFrame:
    """Exact lower quantiles of an integer score column, by counting.

    For each requested quantile q (basis points) returns the smallest score
    s with ``count(score <= s) * 10000 >= q * total`` — integer arithmetic
    throughout, so the cut is bit-exact on every engine. Plan shape: one
    map-side-combining groupBy over the corpus → a histogram bounded by the
    score domain → constant-size cumulative window + broadcast quantile
    join. Nothing corpus-sized is ever sorted.
    """
    hist = scored.groupBy(score_col).agg(F.count("*").alias("__n"))
    wcum = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("__cum", F.sum("__n").over(wcum))
    total = hist.agg(F.sum("__n").alias("__total"))
    spark = scored.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in qs_bp], "q_bp int")
    return (cum.crossJoin(F.broadcast(total))
            .join(F.broadcast(qdf),
                  F.col("__cum") * 10000 >= F.col("q_bp").cast("long")
                  * F.col("__total"))
            .groupBy("q_bp")
            .agg(F.min(score_col).alias("score_at_q")))


SAMPLE_SALT = "sample:"  # hash domain separator vs the dedup/minhash hashes


def sample_hash(id_col) -> "F.Column":
    """Deterministic per-row sampling hash in [0, 10000) — md5-based so the
    SQL oracle computes the identical value (texthash construction)."""
    return md5_hash60(F.concat(F.lit(SAMPLE_SALT),
                               id_col.cast("string"))) % 10000


def stratified_sample(docs: DataFrame, rates_bp: dict[str, int],
                      default_bp: int = 0,
                      stratum_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its sampling hash
    falls under its stratum's rate (basis points). The rate table rides as
    a literal CASE expression (it is policy, not data — same idea as the
    broadcast host policy but small enough to inline), so the whole
    operator is one map-side filter: no shuffle, no RNG, idempotent under
    retry/replay, and the SQL oracle regenerates the exact sample."""
    rate = F.lit(default_bp)
    for stratum, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return (docs
            .withColumn("__h", sample_hash(F.col(id_col)))
            .filter(F.col("__h") < rate)
            .drop("__h"))


DEFAULT_SHARD_TOKENS = 1_000_000
PACK_BLOCK = 4096


def pack_shards(token_stats: DataFrame,
                shard_tokens: int = DEFAULT_SHARD_TOKENS,
                id_col: str = "doc_id",
                tok_col: str = "ws_tokens",
                block_size: int = PACK_BLOCK) -> DataFrame:
    """Assign documents (in canonical ``id_col`` order) to ~shard_tokens
    training shards: shard_id = (tokens before this doc) div budget.

    Semantically a global ordered cumsum; physically a two-level cumsum so
    no task ever sorts the corpus: (1) window keyed by block = id div
    block_size computes the local running sum in parallel; (2) the block
    TOTALS (corpus_size / block_size rows) get their own offset window —
    tiny, and the same decomposition recurses if a corpus ever outgrew it;
    (3) offsets broadcast-join back. Output is bit-identical to the naive
    single-window form the SQL oracle uses.
    """
    base = token_stats.select(
        F.col(id_col), F.col(tok_col),
        F.expr(f"{id_col} div {block_size}").alias("__blk"))
    wloc = Window.partitionBy("__blk").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1)
    local = base.withColumn(
        "__local_before", F.coalesce(F.sum(tok_col).over(wloc),
                                     F.lit(0).cast("long")))
    totals = base.groupBy("__blk").agg(F.sum(tok_col).alias("__blk_tokens"))
    woff = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__blk_tokens").over(woff),
                               F.lit(0).cast("long"))).drop("__blk_tokens")
    return (local.join(F.broadcast(offsets), "__blk")
            .select(
                id_col,
                F.col(tok_col).alias("n_tokens"),
                F.expr(f"(__offset + __local_before) div {shard_tokens}")
                .alias("shard_id"),
                (F.col("__offset") + F.col("__local_before"))
                .alias("tokens_before")))
