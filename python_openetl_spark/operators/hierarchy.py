"""Hierarchy traversal via pointer doubling — recursive-CTE workloads
without per-level iteration.

The naive way to resolve "depth of every node in a parent-pointer
tree" is one join per LEVEL (what a recursive CTE executes): depth-d
trees take d shuffle joins. Pointer doubling (path halving) joins the
current ancestor table WITH ITSELF, so after round r every node knows
its 2^r-step ancestor and the accumulated distance — ``ceil(log2 d)``
rounds total. For a 30-deep hierarchy over 10^9 rows that is 5 joins
instead of 30, and every join is an ordinary equi-shuffle Catalyst can
plan (AQE broadcast when the frontier shrinks).

Termination is data-driven: a node is FINISHED when its ancestor has
no outgoing edge (the root, or the rim of a forest); the loop stops
when no row advanced in a round. Cycles would never finish, so rounds
are capped and the operator raises rather than spinning — a
parent-pointer relation with a cycle is corrupt input.

Reference parity: the reference has no graph/recursive surface at all
(pandas ETL); this covers the WITH RECURSIVE workloads its warehouse
users would run downstream, expressed in Spark's iterative-DataFrame
idiom (the PageRank pattern, operators/linkrank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tree_depths(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    *,
    max_rounds: int = 40,
) -> DataFrame:
    """Resolve ``(node, root, depth)`` for every node in a
    parent-pointer forest. ``edges`` holds one row per non-root node;
    roots (ids that appear only as parents) get no output row — union
    them in with depth 0 if needed. ``max_rounds`` caps path length at
    ``2^max_rounds`` (default: any real hierarchy); a cycle exhausts
    the cap and raises."""
    cur = edges.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("long").alias("depth"),
    ).persist()
    cur.count()  # materialize round 0

    for _ in range(max_rounds):
        hop = cur.select(
            F.col("node").alias("__j_node"),
            F.col("anc").alias("__j_anc"),
            F.col("depth").alias("__j_depth"),
        )
        joined = cur.join(hop, cur.anc == F.col("__j_node"), "left")
        nxt = joined.select(
            "node",
            F.coalesce(F.col("__j_anc"), F.col("anc")).alias("anc"),
            (F.col("depth") + F.coalesce(F.col("__j_depth"), F.lit(0))).alias("depth"),
            F.col("__j_node").isNotNull().alias("__adv"),
        ).persist()
        advanced = nxt.filter(F.col("__adv")).count()  # materializes nxt
        cur.unpersist()
        cur = nxt.drop("__adv")
        if advanced == 0:
            return cur.select("node", F.col("anc").alias("root"), "depth")
    cur.unpersist()
    raise ValueError(
        f"tree_depths did not converge in {max_rounds} doubling rounds "
        f"(path length > 2^{max_rounds}); the parent relation likely has a cycle"
    )
