"""Graph analytics over relational edge lists (engine extension).

Complements the dedup family's connected components (ext/dedup.py) with
PageRank — the canonical iterative-propagation workload — and
multi-source BFS levels (frontier/visited traversal). The reference
has no graph surface; these demonstrate the Spark-first shape for
fixed-point and traversal algorithms: each iteration is one join + one
aggregate on the edge list, lineage cut between iterations where
rounds grow deep.

Cross-engine determinism (the interesting part): float SUMS are
order-dependent, so a naive double PageRank diverges between engines in
the last ulp and the drift compounds per iteration. Ranks are therefore
carried as integer PICORANKS (r · 1e12 as BIGINT): per-edge
contributions are integer floor-divisions (exact in any engine), their
sums are exact integer sums (order-independent), and only the damping
step touches doubles — a fixed sequence of individually
correctly-rounded IEEE ops (one multiply, one add, one round) that is
bit-identical everywhere. Same quench idea as the k-means trained IVF
(round per iteration) and the micro-nat LM gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank scale: 1.0 of rank mass == 1e12 picoranks
_SCALE = 1_000_000_000_000.0


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` exact iterations.

    r_{k+1}(v) = (1-d)/N + d · (Σ_{u→v} r_k(u)/outdeg(u) + D_k/N),
    uniform init, where D_k is the total rank mass held by DANGLING
    nodes (no out-edges) — the standard redistribution term, so rank
    mass is conserved (Σ rank ≈ 1) on any graph, sinks included. The
    dangling mass is an exact integer picorank sum and D_k div N an
    integer floor-division, so the redistribution preserves the
    cross-engine bit-exactness of the core recurrence; on sink-free
    graphs D_k = 0 and the term vanishes exactly. Returns (node, rank)
    with rank rounded to 9 decimals.

    Scale shape: the edge list is the only large frame; every iteration
    is one equi-join of the (node, rank) table onto edges by src plus
    one dst hash-aggregate — shuffles stay keyed on node ids
    throughout, so at 100 TB pre-partitioning/bucketing edges and ranks
    by node makes every round co-located. Degrees are computed once.
    Deep iteration counts should localCheckpoint the rank frame every
    few rounds (same lineage-cut pattern as dedup's label propagation);
    the registered query unrolls a fixed small ``iters`` so the whole
    computation stays ONE declarative plan an external oracle can run.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nn = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", "n", F.round(F.lit(_SCALE) / F.col("n")).cast("bigint").alias("r")
    )
    # dangling ids are loop-INVARIANT (deg never changes): resolve the
    # set once; each iteration only semi-joins ranks against it for the
    # mass sum instead of re-deriving it with a per-round anti-join
    dangling = nodes.join(deg, nodes["node"] == deg["src"], "left_anti").select(
        "node"
    )
    for _ in range(iters):
        dang = ranks.join(dangling, "node", "left_semi").agg(
            F.coalesce(F.sum("r"), F.lit(0)).alias("dmass")
        )
        contrib = (
            e.join(ranks.select("node", "r"), F.col("src") == F.col("node"))
            .join(deg, "src")
            .select("dst", F.expr("r div outdeg").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang))
            .join(contrib, F.col("node") == F.col("dst"), "left_outer")
            .select(
                "node",
                "n",
                F.round(
                    F.lit((1.0 - damping) * _SCALE) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0))
                        + F.expr("dmass div n")
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
        )
    return ranks.select(
        "node", F.round(F.col("r") / F.lit(_SCALE), 9).alias("rank")
    )


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS: (node, level) = shortest hop count from any
    source node, up to ``max_depth`` (unreached nodes are absent).

    Each round expands the current frontier through one edge join, then
    anti-joins the visited set — the standard frontier/visited shape
    whose per-round cost is |frontier|·avg-degree, NOT |edges|·depth.
    Integer levels make the result exactly engine-independent (no float
    anywhere), so a recursive-CTE oracle can verify it value-for-value.
    Like ``pagerank``, a fixed small ``max_depth`` keeps the whole
    computation ONE declarative plan; deep traversals should
    localCheckpoint the visited frame every few rounds (the dedup
    label-propagation lineage-cut pattern).

    Scale shape: every join/dedup keys on node ids — bucket edges by
    src and the expansion never reshuffles the edge list. Edges with a
    NULL endpoint are dropped up front: a NULL dst would re-enter the
    frontier every round (the visited anti-join never matches NULL), so
    one NULL edge from an outer-join-derived edge list would emit a
    duplicate (NULL, level) row per depth."""
    # filter BEFORE the rename, on the caller's column names: filtering
    # after the select only resolves via the analyzer reaching back into
    # the child for a missing reference (fragile), and with default
    # names it would silently bind to the renamed columns instead
    e = edges.filter(
        F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    ).select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    visited = sources.select(
        F.col(sources.columns[0]).alias("node"), F.lit(0).alias("level")
    ).distinct()
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("level"))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    id-ORIENTED unique edges (src < dst, one row per edge) — the
    clustering/cohesion primitive (clustering coefficients, community
    seeds, spam-ring detection are all built on it).

    Wedge enumeration on the oriented edge list: (a<b) ⋈ (b<c) gives
    each candidate wedge exactly once with a<b<c, and the closing
    (a,c) equi-join confirms the triangle — so every triangle is
    counted once with NO dedup pass, and all three joins are
    key-partitioned equi-joins (never a cross product). Per-node
    counts explode each triangle into its three corners and hash-
    aggregate.

    Scale shape: wedge volume is Σ_b d⁻(b)·d⁺(b); at 100 TB the
    standard refinement is to orient by DEGREE (low→high, tie on id)
    instead of by id, which provably bounds per-node wedge work by
    O(√|E|) — same joins, one extra degree computation. Id orientation
    keeps the demo (and its SQL oracle) simple on the bounded edge
    lists the registered query builds."""
    e = edges.select(F.col(src_col).alias("_x"), F.col(dst_col).alias("_y"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1._y") == F.col("e2._x")).select(
        F.col("e1._x").alias("_a"), F.col("e1._y").alias("_b"), F.col("e2._y").alias("_c")
    )
    tri = wedges.join(
        e3, (F.col("_a") == F.col("e3._x")) & (F.col("_c") == F.col("e3._y"))
    ).select("_a", "_b", "_c")
    corners = (
        tri.select(F.col("_a").alias("node"))
        .unionAll(tri.select(F.col("_b").alias("node")))
        .unionAll(tri.select(F.col("_c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))
