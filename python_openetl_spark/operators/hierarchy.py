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

Each round ends in ``localCheckpoint`` rather than a bare persist:
the squaring plan references the previous round's frame TWICE, so an
uncut lineage grows exponentially with rounds — caching the DATA but
not truncating the PLAN blew the driver heap during plan
stringification at a mere 10× fixture scale (round-8 spot-bench).
The checkpoint materializes each round once (the loop's count()
already did) and pins the iteration to one snapshot; blocks are freed
by the ContextCleaner as round frames go out of scope, and the count
of live rounds is log-bounded by construction.

Reference parity: the reference has no graph/recursive surface at all
(pandas ETL); this covers the WITH RECURSIVE workloads its warehouse
users would run downstream, expressed in Spark's iterative-DataFrame
idiom (the PageRank pattern, operators/linkrank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.operators.materialize import pin


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
    # pin, not persist: frontier is delta-sized (edge count), re-pinned
    # every round — materialize.py policy (reliable under env knob)
    cur = pin(edges.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("long").alias("depth"),
    ))  # eager: materialize round 0, truncate lineage

    for _ in range(max_rounds):
        hop = cur.select(
            F.col("node").alias("__j_node"),
            F.col("anc").alias("__j_anc"),
            F.col("depth").alias("__j_depth"),
        )
        joined = cur.join(hop, cur.anc == F.col("__j_node"), "left")
        # localCheckpoint, not persist: the self-join references cur
        # twice, so an uncut plan doubles per round (see module note)
        nxt = pin(joined.select(
            "node",
            F.coalesce(F.col("__j_anc"), F.col("anc")).alias("anc"),
            (F.col("depth") + F.coalesce(F.col("__j_depth"), F.lit(0))).alias("depth"),
            F.col("__j_node").isNotNull().alias("__adv"),
        ))
        advanced = nxt.filter(F.col("__adv")).count()
        cur = nxt.drop("__adv")
        if advanced == 0:
            return cur.select("node", F.col("anc").alias("root"), "depth")
    raise ValueError(
        f"tree_depths did not converge in {max_rounds} doubling rounds "
        f"(path length > 2^{max_rounds}); the parent relation likely has a cycle"
    )


def ancestor_closure(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    *,
    max_rounds: int = 40,
) -> DataFrame:
    """Full (node, ancestor, dist) transitive closure of a
    parent-pointer forest by repeated squaring: after round r the
    closure holds every ancestor within 2^r steps, so a depth-d
    hierarchy closes in ``ceil(log2 d)`` self-joins instead of d
    (each an ordinary equi-shuffle). In a forest the node→ancestor
    path is unique, so a pair generated through different split
    points always carries the same dist — ``dropDuplicates`` is
    exact dedup, not an arbitrary choice. Output volume is
    Σ depth(node) rows — inherent to any closure, which is why the
    rollup below aggregates it immediately rather than materializing
    it for storage. Cycles exhaust ``max_rounds`` and raise."""
    # pin: closure frontier, delta-sized per round (materialize.py policy)
    cur = pin(edges.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("long").alias("dist"),
    ))  # eager: materialize + truncate lineage
    prev_n = cur.count()
    for _ in range(max_rounds):
        up = cur.select(
            F.col("node").alias("__m"),
            F.col("anc").alias("__a"),
            F.col("dist").alias("__d"),
        )
        # localCheckpoint, not persist: this plan references cur THREE
        # times (union branch + both join sides), so an uncut lineage
        # triples per round and driver-side plan handling blows up at
        # ~10 rounds even when the DATA is tiny (see module note)
        grown = (
            cur.unionByName(
                cur.join(up, cur.anc == F.col("__m"))
                .select("node", F.col("__a").alias("anc"), (F.col("dist") + F.col("__d")).alias("dist"))
            )
            .dropDuplicates(["node", "anc"])
        )
        grown = pin(grown)
        n = grown.count()
        cur = grown
        if n == prev_n:
            # a cycle CONVERGES here too (reachability is finite once
            # pairs dedup), but it is detectable exactly: some node
            # becomes its own ancestor — corrupt parent-pointer input
            if cur.filter(F.col("node") == F.col("anc")).take(1):
                raise ValueError(
                    "ancestor_closure: node reachable from itself — "
                    "the parent relation has a cycle"
                )
            return cur
        prev_n = n
    raise ValueError(
        f"ancestor_closure did not converge in {max_rounds} squaring rounds "
        f"(path length > 2^{max_rounds})"
    )


def subtree_rollup(
    edges: DataFrame,
    values: DataFrame,
    agg_exprs: list,
    node_col: str = "node",
    parent_col: str = "parent",
    id_col: str = "node",
    *,
    out_col: str | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Aggregate ``values`` over every node's full subtree (self +
    all descendants) — the BOM-explosion / org-rollup shape SQL states
    with a recursive CTE feeding a GROUP BY. Dataflow: ancestor
    closure (log-rounds), union the self-pairs (dist 0), join values
    on the DESCENDANT side, group by the ancestor. ``node_col`` /
    ``parent_col`` name the EDGE columns; ``id_col`` keys ``values``;
    ``out_col`` names the output grouping column (defaults to
    ``id_col``). ``agg_exprs`` are ordinary Column aggregates over the
    joined value columns. Every node present in ``values`` gets a row
    (leaves aggregate just themselves)."""
    closure = ancestor_closure(
        edges, node_col, parent_col, max_rounds=max_rounds
    ).select(F.col("node").alias("__desc"), F.col("anc").alias("__node"))
    self_pairs = values.select(
        F.col(id_col).alias("__desc"), F.col(id_col).alias("__node")
    )
    pairs = closure.unionByName(self_pairs)
    return (
        pairs.join(values, pairs.__desc == values[id_col])
        .groupBy(F.col("__node").alias(out_col or id_col))
        .agg(*agg_exprs)
    )
