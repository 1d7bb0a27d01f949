"""Round-5 production-recall bench twins for the LSH family.

The r4 verdict's watch item: x04/d14 run fixture-recall settings
(planes=3, tables=20 — recall 1.0 on fixtures so their exact-pairs
oracles stay green), which is NOT the configuration anyone runs at
100 TB (3 planes = n/8-row buckets = quadratic bucket self-joins on a
big corpus). These twins bench the PRODUCTION configuration — the
operator defaults, planes=8 / tables=6 (AND-OR amplification sized so
buckets are n/256 per table and recall concentrates on genuinely
near-duplicate pairs) — with a recall-floor invariant oracle (the
x05/x09 pattern) instead of exact-pairs equality, so the bench trend
tracks the scale-relevant configuration while legitimate ANN recall
noise cannot flip the driver row.

Because the embeddings fixture contains no high-cosine pairs (every
exact pair at threshold 0.45 sits in the 0.45-0.7 borderline band,
where sub-unit recall is the *designed* trade at production settings —
measured 0.14-0.36 across sf0.001/0.01/0.1), the twins plant their own
near-duplicate signal: every 7th vector is re-appended under an offset
id with a deterministic ~0.05-radian angular perturbation
(x_i * (1 + 0.08*sin(i + 1))), giving planted pairs cosine ~0.998.
Per-plane collision probability 1 - 0.08/pi ~ 0.975, so one table
catches a planted pair with p^8 ~ 0.81 and six tables amplify to
~0.99995 — recall on the planted set is robustly above the 0.5 floor
at any corpus scale, while a broken bucketing kernel, table seeding,
or bucket join (recall 0) hash-mismatches.

Registered after ``relational3`` in ``_MODULES``; x04p/d14p take the
last two ``_WINDOW_R5`` slots so they get driver rows immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.operators import similarity
from python_openetl_spark.workload.util import t

#: every Nth vector gets a planted near-dup twin
_TWIN_MOD = 7
#: planted-twin id offset (matches the d38/_OFF convention)
_OFF_TWIN = 40_000_000
#: recall floor on the planted high-cosine set; measured ~1.0 at
#: sf0.001/0.01/0.1, theory says >=0.9999 at these settings, so 0.5 is
#: a broad >10-sigma envelope that only a broken path can cross
_RECALL_FLOOR = 0.5


def _emb_with_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus a deterministically perturbed twin of every
    ``_TWIN_MOD``-th vector. The perturbation is a JVM ``transform``
    expression (engine-deterministic; never oracle-mirrored — the
    oracle only states the planted-set invariant)."""
    emb = t(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % _TWIN_MOD == 0).select(
        (F.col("vec_id") + _OFF_TWIN).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: (
                x * (F.lit(1.0) + F.lit(0.08) * F.sin(i.cast("double") + F.lit(1.0)))
            ).cast("float"),
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(twins)


def _planted_recall_row(pairs: DataFrame, planted: DataFrame, ok_col: str) -> DataFrame:
    """One row: (n_planted, <ok_col>) — found planted pairs / planted
    >= floor. ``pairs`` must carry (id_a, id_b) with id_a < id_b."""
    hits = pairs.join(
        planted,
        (pairs["id_a"] == planted["orig"]) & (pairs["id_b"] == planted["twin"]),
    )
    return (
        planted.agg(F.count(F.lit(1)).alias("n_planted"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_planted",
            # vacuous truth on an empty corpus (no planted pairs ->
            # nothing to recall; also keeps ANSI mode from div-by-zero)
            F.when(F.col("n_planted") == 0, F.lit(True))
            .otherwise(
                F.col("n_hit").cast("double") / F.col("n_planted").cast("double")
                >= F.lit(_RECALL_FLOOR)
            )
            .alias(ok_col),
        )
    )


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _TWIN_MOD == 0)
        .select(
            F.col("vec_id").alias("orig"),
            (F.col("vec_id") + _OFF_TWIN).alias("twin"),
        )
    )


def x04p_lsh_production_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-settings hyperplane LSH (the operator defaults:
    planes=8, tables=6 — see module docstring for why these, not x04's
    recall-1.0 fixture settings, are what a 100 TB corpus runs) over
    the twinned corpus; emits the planted-set recall invariant."""
    pairs = similarity.lsh_cosine_pairs(
        _emb_with_twins(spark, sf_dir), threshold=0.45, num_planes=8, num_tables=6
    )
    return _planted_recall_row(pairs, _planted(spark, sf_dir), "recall_ok")


def d14p_dup_clusters_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d14's cluster resolution at production LSH settings: the planted
    twin must land in the SAME connected component as its original for
    >= the floor fraction of planted pairs — tracking the components
    cost at production candidate volume, where the pair graph is
    sparser but each pair is a genuine near-dup."""
    from python_openetl_spark.operators.cluster import connected_components

    pairs = similarity.lsh_cosine_pairs(
        _emb_with_twins(spark, sf_dir), threshold=0.45, num_planes=8, num_tables=6
    )
    comps = connected_components(pairs, "id_a", "id_b")
    planted = _planted(spark, sf_dir)
    a = comps.select(F.col("id").alias("orig"), F.col("cluster_id").alias("ca"))
    b = comps.select(F.col("id").alias("twin"), F.col("cluster_id").alias("cb"))
    same = (
        planted.join(a, "orig")
        .join(b, "twin")
        .filter(F.col("ca") == F.col("cb"))
        .agg(F.count(F.lit(1)).alias("n_same"))
    )
    return (
        planted.agg(F.count(F.lit(1)).alias("n_planted"))
        .crossJoin(same)
        .select(
            "n_planted",
            F.when(F.col("n_planted") == 0, F.lit(True))
            .otherwise(
                F.col("n_same").cast("double") / F.col("n_planted").cast("double")
                >= F.lit(_RECALL_FLOOR)
            )
            .alias("same_cluster_ok"),
        )
    )


QUERIES = {
    "x04p_lsh_production_recall": x04p_lsh_production_recall,
    "d14p_dup_clusters_production": d14p_dup_clusters_production,
}

# The oracle states the planted-set size and the invariant (x05/x09
# pattern): the LSH/perturbation internals are Spark-deterministic and
# never mirrored — a broken approximate path flips the boolean.
ORACLE = {
    "x04p_lsh_production_recall": f"""
        SELECT COUNT(*) AS n_planted, TRUE AS recall_ok
        FROM embeddings WHERE vec_id % {_TWIN_MOD} = 0
    """,
    "d14p_dup_clusters_production": f"""
        SELECT COUNT(*) AS n_planted, TRUE AS same_cluster_ok
        FROM embeddings WHERE vec_id % {_TWIN_MOD} = 0
    """,
}
