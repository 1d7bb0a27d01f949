"""Iterative link analysis: PageRank over an edge table.

The web-corpus quality signal (Page et al. 1999; production pipelines
use link centrality as a crawl-frontier / quality prior — e.g. a
harvest-rank feature accompanying each document). Also the repo's
canonical ITERATIVE-algorithm shape: driver-side Python loop building
one join-aggregate round per iteration, against connected components'
(cluster.py) converge-until-fixpoint shape.

Determinism contract (the BM25/d43 convention): per-edge contributions
``rank/out_degree`` are one IEEE division rounded to 12 decimals and
summed as DECIMAL(28,12) — order-independent under any partitioning —
and each iteration's final rank is rounded to 12, so after any fixed
number of iterations the ranks are bit-identical to the unrolled SQL
oracle.

Scale shape per iteration: ONE action — a single left join
((rank, out_deg) ⋈ edges; the out-degree is folded onto the node
frame once before the loop, not re-joined per round) feeding a single
aggregate whose NULL-id group IS the dangling mass (r13: a dangling
node matches no edge in the left join, so its full rank lands in the
NULL-dst bucket and rides the same contribution shuffle; the old
shape ran the rank⋈degree join TWICE — once under the contribution
shuffle, once under a broadcast exchange for a separate 1-row
dangling aggregate — i.e. two scans and two action trees per
iteration where one suffices, and every extra tiny job is a
disk-latency roll on a virtualized-scratch box). The aggregate is
lazily ``localCheckpoint``-ed and driven by ONE ``collect()`` of its
NULL row (collect scans every partition in a single job, so it both
materializes the checkpoint and fetches the dangling mass; ``first()``
would ramp 1→4→20 partitions as separate partial jobs); the mass
re-enters as a LITERAL (the GraphX aggregate-to-driver shape; a
driver round-trip through a Python float is exact for IEEE doubles).
N is likewise collected once at init: a broadcast exchange executes
its whole subtree as extra jobs at every reference — the pre-r12
crossJoin-broadcast form scheduled 34 Spark jobs per 3-iteration call
where ~7 suffice (measured 3.3 s -> 1.3 s at sf0.1, identical
bit-exact results).
The static frames (edges, degree-annotated nodes) are CACHED before
the loop and each iteration's aggregate is ``localCheckpoint``-ed: without
this, every DataFrame reference re-derives its whole subtree and the
plan grows multiplicatively with iterations — measured 162 file scans
/ 197 exchanges for 3 iterations uncached vs a constant-size
per-iteration plan checkpointed. At any real graph size the exploded
plan recomputes the whole prefix per iteration and the checkpointed
shape is the only viable one, so it is the default
(``checkpoint=False`` exists for plan-inspection and
micro-benchmarks; results are identical either way). Self-loops are
dropped up front (standard PageRank preprocessing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.operators.materialize import pin

#: decimal places for the order-independent contribution sums
_SCALE = 12


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """``(id, rank)`` after ``iters`` rounds from a uniform start.

    ``rank' = (1-d)/N + d * (Σ_in rank/out_deg + dangling_mass/N)``
    — dangling (no-out-edge) nodes redistribute uniformly, keeping the
    ranks a probability distribution.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.cache()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # fold the out-degree onto the node frame ONCE: the rank frame
    # carries (id, out_deg, rank) through the loop, so each iteration
    # is ONE join (ranks ⋈ edges) + ONE shuffle aggregate instead of
    # re-joining degrees every round (r13: at sf0.1 the graph is tiny
    # and the saved join is pure fixed overhead; at 100 TB it is a
    # node-sized shuffle per iteration that never needed to exist)
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    nodes = nodes.join(deg, "id", "left")
    if checkpoint:
        nodes = nodes.cache()
    # N to the driver ONCE (one count job, which also fills the edge and
    # node caches); the engine-side division below is the same IEEE
    # double op the old crossJoin(broadcast(n_row)) form evaluated
    n = nodes.count()
    if n == 0:
        # empty graph: no nodes, no ranks. The old column-form 1/N was
        # never evaluated on an empty frame, but a LITERAL 1/0 is
        # constant-folded at plan time and raises under ANSI mode —
        # short-circuit before any division exists in the plan. The
        # count above filled the caches; release them on this exit
        # path too (r12 advice: the early return leaked the very
        # blocks the end-of-call cleanup exists to release).
        out = nodes.select("id", F.lit(0.0).alias("rank"))
        if checkpoint:
            out = pin(out)
            for frame in (e, nodes):
                frame.unpersist()
        return out
    n_dbl = F.lit(float(n))
    ranks = nodes.select(
        "id", "out_deg", F.round(F.lit(1.0) / n_dbl, _SCALE).alias("rank")
    )

    dec = f"decimal(28,{_SCALE})"
    for _ in range(iters):
        # ONE pass: (rank, out_deg) ⋈ edges as a LEFT join — a node
        # with out-edges fans its rank/out_deg contribution to each
        # dst; a dangling node (out_deg null ⇒ no edge match) lands
        # its FULL rank in the NULL-dst bucket, so the dangling mass
        # rides the same contribution shuffle as one extra group
        # instead of a second scan + broadcast-exchange job.
        agg = (
            ranks.join(e, F.col("id") == F.col("src"), "left")
            .select(
                F.col("dst").alias("id"),
                F.when(
                    F.col("dst").isNull(), F.col("rank").cast(dec)
                )
                .otherwise(
                    F.round(
                        F.col("rank") / F.col("out_deg").cast("double"),
                        _SCALE,
                    ).cast(dec)
                )
                .alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("double").alias("in_mass"))
        )
        if checkpoint:
            # lazy checkpoint + the collect() below = ONE job per
            # iteration: collect scans EVERY partition (unlike
            # .first(), which ramps 1→4→20 partitions in separate
            # partial jobs), so the single action both materializes
            # the checkpoint blocks and fetches the dangling row; the
            # next iteration reads the stored blocks
            agg = pin(agg, eager=False)
        drows = agg.filter(F.col("id").isNull()).select("in_mass").collect()
        dang = (
            float(drows[0][0])
            if drows and drows[0][0] is not None
            else 0.0
        )
        ranks = nodes.join(
            agg.filter(F.col("id").isNotNull()), "id", "left"
        ).select(
            "id",
            "out_deg",
            F.round(
                # the teleport constant is computed in PYTHON (one
                # double op) and enters both engines as the same
                # shortest-repr literal — engine-side 1.0 - d would
                # hit DuckDB's decimal literal arithmetic instead;
                # the dangling mass likewise re-enters as a literal
                # (exact IEEE double round-trip)
                F.lit(1.0 - damping) / n_dbl
                + F.lit(damping)
                * (
                    F.coalesce(F.col("in_mass"), F.lit(0.0))
                    + F.lit(dang) / n_dbl
                ),
                _SCALE,
            ).alias("rank"),
        )
    ranks = ranks.select("id", "rank")
    if checkpoint:
        # Bound the operator's storage footprint: materialize the final
        # ranks (eager checkpoint of the already-lazy plan — the
        # caller's first action would have paid this anyway; the plan
        # is one small join over the last iteration's checkpointed
        # aggregate), then release the static caches. Without this
        # every pagerank call LEAKS its edge/node/degree blocks plus
        # iters checkpoint RDDs into executor storage until the
        # context cleaner happens to collect them — on a long-lived
        # session (the bench's repeated calls; any production driver
        # invoking this per corpus snapshot) leaked blocks pile up and
        # evictions/GC stalls show up as latency variance in UNRELATED
        # queries.
        # rank vector: one double per node, delta-sized (policy)
        ranks = pin(ranks)
        for frame in (e, nodes):
            frame.unpersist()
    return ranks
