"""Link-graph authority scoring for frontier prioritization.

The reference schedules its frontier FIFO (reference frontier drain
src/database_manager.py:191-209, `ORDER BY id ASC LIMIT n`) — at web
scale the standard upgrade is link-authority scoring: PageRank over the
URL (or host) graph feeding the frontier's priority column, so the
politeness-budgeted admission (operators/politeness.compose_wave) spends
each host's budget on the most-linked pages first.

Everything here is INTEGER fixed-point arithmetic — ranks in "rank units"
(``scale`` total mass), damping in basis points, floor division (``div``)
everywhere — so every iteration is exactly reproducible across engines:
the DuckDB oracle replays the identical chained-CTE arithmetic and the
contract compare is exact, not epsilon-tolerant. Integer sums are
order-independent, so the shuffle's reduction order cannot perturb the
result (the float-PageRank pitfall).

Scale shape (SCALE.md): per iteration one shuffle of (url, contrib)
partial aggregates keyed on dst and one (url, rank) join keyed on src —
id-and-long rows only, never page content. The edge list with out-degrees
is computed once and lazily localCheckpoint-ed; each iteration's rank
table is checkpointed so lineage stays flat across the fixed iteration
count. Dangling mass (no out-links) is dropped, not redistributed —
documented semantics, mirrored exactly by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING_BP = 8500          # 0.85 in basis points
RANK_SCALE = 10 ** 12      # total rank mass in fixed-point units


def pagerank(edges: DataFrame, n_iter: int = 5,
             damping_bp: int = DAMPING_BP, scale: int = RANK_SCALE,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration integer PageRank over an edge list.

    rank_0(u)   = scale div N
    rank_i+1(u) = base + damping_bp * sum_{(v,u) in E}(rank_i(v) div out(v))
                         div 10000
    base        = (scale div N) * (10000 - damping_bp) div 10000

    Parallel edges are counted (a page linking twice votes twice — matches
    the card-carryover re-listings in the corpus). Returns (url, rank)
    for every node. The driver performs ONE bounded action (the node
    count) before the loop; iterations are fully declarative.
    """
    nodes = (edges.select(F.col(src).alias("url"))
             .union(edges.select(F.col(dst).alias("url")))
             .distinct()
             .localCheckpoint(eager=False))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = scale // n
    base = r0 * (10000 - damping_bp) // 10000
    out = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    e = (edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
         .join(out.select(F.col(src).alias("e_src"), "outdeg"), "e_src")
         .localCheckpoint(eager=False))
    ranks = nodes.select("url", F.lit(r0).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (e.join(ranks, e["e_src"] == ranks["url"])
                   .select(F.col("e_dst").alias("url"),
                           F.expr("rank div outdeg").alias("c"))
                   .groupBy("url")
                   .agg(F.sum("c").alias("s")))
        ranks = (nodes.join(contrib, "url", "left")
                 .select("url",
                         (F.lit(base) + F.expr(
                             f"({damping_bp} * coalesce(s, 0L)) div 10000"))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks


def priority_from_rank(frontier: DataFrame, ranks: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """Replace the frontier's ``priority`` column with link authority.

    compose_wave admits per-host by ascending ``(priority, seq)``, so the
    mapping is ``priority = -(rank div 1024)``: higher-authority pages sort
    first, URLs not yet in the rank table (discovered this wave) keep their
    existing priority and drain FIFO after every ranked page. The div-1024
    scale-down fits the frontier's int priority exactly (a node's rank is
    bounded by the total mass RANK_SCALE = 10^12, and 10^12/1024 < 2^31);
    near-tied ranks that collapse to one bucket fall back to seq — still
    deterministic and engine-exact. NULL rank is handled with an explicit
    isNotNull branch: least()/greatest() IGNORE nulls in both Spark and
    DuckDB, so a coalesce-over-least never sees the miss.

    Scale shape: equi-join on url carrying only (url, rank) longs; the rank
    table at 10^10 URLs shuffles id+long pairs, never page content.
    """
    r = ranks.select(F.col(url_col).alias("__r_url"), F.col("rank"))
    return (frontier.join(r, frontier["url"] == r["__r_url"], "left")
            .withColumn(
                "priority",
                F.when(F.col("rank").isNotNull(),
                       (-F.expr("rank div 1024")).cast("int"))
                .otherwise(F.col("priority")))
            .drop("__r_url", "rank"))


def resolve_redirects(redirects: DataFrame, max_hops: int = 16,
                      src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Terminal-target resolution of HTTP redirect chains by path doubling.

    The reference follows redirects one page at a time inside the fetch
    loop (Selenium just lands on the final URL); at corpus scale redirect
    edges are DATA — a (src_url, dst_url) table distilled from fetch
    responses — and resolution is a graph computation: every source must
    map to the end of its chain so the frontier enqueues (and the seen-set
    keys) the canonical target, not an alias.

    Pointer doubling: state maps u → (position after `hops` steps); each
    round composes the map with itself, so round k covers walks of length
    2^k — ``log2(max_hops)`` rounds instead of a max_hops-step sequential
    walk (the naive per-hop loop is the difference between 4 and 16
    shuffles at max_hops=16). Cycles never terminate, so the walk is
    CAPPED: after the rounds, a cyclic source holds the position after
    exactly ``max_hops`` steps with ``resolved = 0``; an acyclic chain
    holds its terminal with ``hops`` = true distance and ``resolved = 1``.
    max_hops is rounded up to a power of two (the doubling grid).

    Input is normalized to a function (min dst per src) so composition is
    deterministic. Returns (src_url, final_url, hops, resolved).
    ``max_hops`` must be a power of two — the doubling grid can only cap
    at exact powers, and silently rounding up would let hops exceed the
    caller's cap; a non-power value raises.

    Scale shape: every round is one self equi-join on the current-position
    column over (url, url, int) triples — id-only rows, lazily
    checkpointed so lineage stays flat; the terminal check is one
    left-anti-shaped left join against the edge map. Same shuffle
    discipline as pagerank above.
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(
            f"max_hops must be a power of two, got {max_hops} "
            "(pointer doubling caps walks at exactly 2^rounds)")
    rounds = max_hops.bit_length() - 1
    m = (redirects.groupBy(F.col(src).alias("u"))
         .agg(F.min(dst).alias("cur"))
         .localCheckpoint(eager=False))
    state = m.select("u", "cur", F.lit(1).cast("int").alias("hops"))
    for _ in range(rounds):
        nxt = state.select(F.col("u").alias("__u2"),
                           F.col("cur").alias("__cur2"),
                           F.col("hops").alias("__h2"))
        state = (state.join(nxt, state["cur"] == nxt["__u2"], "left")
                 .select("u",
                         F.coalesce("__cur2", "cur").alias("cur"),
                         (F.col("hops")
                          + F.coalesce("__h2", F.lit(0))).cast("int")
                         .alias("hops"))
                 .localCheckpoint(eager=False))
    term = m.select(F.col("u").alias("__t"))
    return (state.join(term, state["cur"] == term["__t"], "left")
            .select(F.col("u").alias("src_url"),
                    F.col("cur").alias("final_url"),
                    "hops",
                    F.when(F.col("__t").isNull(), 1).otherwise(0)
                    .cast("int").alias("resolved")))


def host_rank_rollup(ranks: DataFrame, url_col: str = "url") -> DataFrame:
    """Host-level authority: sum of member-URL ranks (integer, exact).
    Feed into politeness.compose_wave as a priority source: budget goes to
    high-authority hosts' pages first within each wave.

    The rollup key MUST be ``scalars.url_host`` (parse_url HOST) — the
    same derivation as ``frontier.enqueue``'s host column — because the
    downstream consumer is ``apportion_budget`` → ``compose_wave``'s
    host_budget join against frontier hosts: a bare authority regexp that
    keeps userinfo/port would put a ``user@host``/``host:8080`` URL's
    authority under a key the admission join never matches, and under an
    explicit host_budget an unmatched host is admitted NOWHERE (budget 0)
    — silent starvation, the same key-mismatch class as the round-4
    traps.host fix."""
    from ..functions import scalars

    host = scalars.url_host(F.col(url_col))
    return (ranks.groupBy(host.alias("host"))
            .agg(F.sum("rank").alias("host_rank"),
                 F.count("*").alias("n_urls")))
