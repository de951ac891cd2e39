"""Iterative graph analytics on DataFrames: integer-exact PageRank.

The reference has no graph operator, but the repo's north star (the
large-scale training-data pipeline) does: domain- or source-level
PageRank is the standard quality prior for web-scale corpus curation
(e.g. the Common-Crawl-derived pipelines rank hosts by link authority
before sampling).  The dedup family already ships the other graph op
(connected components, ``llm/dedup.py``); this module adds the
fixed-iteration power method.

Exactness contract (the repo's D1 discipline, extended to an ITERATIVE
recurrence): all arithmetic is INTEGER.  Ranks live in units of 1e-12
of the total mass; damping 0.85 is the exact rational 17/20; every
division is an explicit integer floor-div.  The recurrence

    R_0(v)     = 10^12 DIV N
    C_k(u)     = R_k(u) DIV outdeg(u)          (u's per-edge contribution)
    R_{k+1}(v) = BASE + (17 * SUM_{u->v} C_k(u)) DIV 20
    BASE       = (3 * 10^12) DIV (20 * N)      ( = (1-d)/N in units )

is therefore bit-reproducible on any engine — a DuckDB recursive CTE
replays all ``iters`` rounds and hash-matches Spark exactly (the q95 /
q124 / q157 oracle family, extended from greedy recurrences to an
iterative fixpoint).  Floor-division leaks sub-unit mass (standard for
fixed-point PageRank); at 1e-12 units the leak is < outdeg ulps per
node per round — ranking-irrelevant, and identical on both engines.

Scale shape: one shuffle per iteration (the contribution aggregate on
dst), the textbook Pregel superstep.  Ranks and degrees co-partition by
node id and REUSE that partitioning across iterations; the edge table
partitions once by src.  Lineage is truncated with localCheckpoint
every few rounds (an iterative driver loop otherwise builds a
10-iteration-deep plan that re-executes from the scan at every action).
Dangling nodes (outdeg 0) contribute nothing — the simplified form used
by corpus-curation pipelines; the redistribution variant is one extra
broadcast sum per round and is deliberately not defaulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASS = 10**12  # total rank mass in integer units (1e-12 each)


def pagerank_integer(
    edges: DataFrame,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration integer PageRank over an edge DataFrame.

    Returns (node, rank_units) — ``rank_units`` in 1e-12 units of the
    total mass, exact integers (see module contract).  Duplicate edges
    should be pre-deduplicated by the caller if multi-edges are not
    intended; nodes are the union of srcs and dsts.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n = nodes.count()  # one scalar job; drives the exact BASE constant
    if n == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    base = (3 * _MASS) // (20 * n)
    ranks = nodes.withColumn("rank_units", F.lit(_MASS // n).cast("long"))
    # co-partition ranks/degrees by node once; every per-iteration join
    # and the final aggregate reuse this exchange
    ranks = ranks.repartition("node").persist()
    deg = deg.repartition("node").persist()
    e = e.repartition("src").persist()
    ranks.count()
    for k in range(iters):
        contrib = (
            ranks.join(deg, "node")
            .select(
                F.col("node").alias("src"),
                # TRUE integer division (`div`), not double-divide+cast:
                # a double quotient rounds to nearest before truncation
                # and can land one unit high at integer boundaries
                F.expr("rank_units div outdeg").alias("c"),
            )
            .join(e, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(17 * coalesce(s, 0)) div 20")
                )
                .cast("long")
                .alias("rank_units"),
            )
            .repartition("node")
        )
        old = ranks
        if (k + 1) % checkpoint_every == 0 and k + 1 < iters:
            # truncate lineage: a 10-round loop otherwise stacks 10
            # shuffles of plan and re-plans from the scan every action
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        old.unpersist()
        ranks = new_ranks
    # the loop inputs are dead once ranks is materialized (count() /
    # eager checkpoint above) — drop them so repeated calls in one
    # session (bench loops) don't accumulate cached partitions.  The
    # returned ranks stays cached; callers that keep the session alive
    # after consuming it own ranks.unpersist() (advice r11).
    deg.unpersist()
    e.unpersist()
    return ranks
