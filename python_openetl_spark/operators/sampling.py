"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` draws per-partition pseudo-random rows: reproducible
only for a fixed partitioning, and never reproducible by another
engine. Production data pipelines instead sample by *content hash* —
a row is in the sample iff ``hash(key) mod D < rate·D`` — which is

- deterministic under any partitioning, retries, or engine (the DuckDB
  oracle computes the identical md5-derived hash),
- stable across dataset versions (a row's membership never flips when
  unrelated rows are added — crucial for train/test hygiene),
- cheap: one hash per row, no shuffle, fully pushed into the scan
  projection.

The hash reuses the engine's portable 60-bit md5 scheme
(functions.text.token_hash60); ``salt`` derives independent samples
from the same keys (e.g. one salt per experiment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import token_hash60

#: Hash-space denominator: rates are expressed in 1/10000ths.
SAMPLE_D = 10_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from a key column (any type)."""
    return token_hash60(F.concat(F.lit(f"{salt}:"), key.cast("string"))) % SAMPLE_D


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by key hash (exact membership,
    approximate rate)."""
    return df.filter(sample_bucket(F.col(key_col), salt) < int(fraction * SAMPLE_D))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float], *, salt: str = ""
) -> DataFrame:
    """Per-stratum rates (e.g. downsample common languages, keep all of
    rare ones). Strata missing from ``fractions`` are dropped."""
    bucket = sample_bucket(F.col(key_col), salt)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(strata_col) == stratum) & (bucket < int(frac * SAMPLE_D)))
    return df.filter(cond)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, *, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """(train, test) with hash-disjoint membership: a key's side never
    changes as the dataset grows."""
    bucket = sample_bucket(F.col(key_col), salt)
    cut = int(test_fraction * SAMPLE_D)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    test_fraction: float = 0.1,
    val_fraction: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Train/val/test assignment by DUPLICATE CLUSTER, not by document.

    A plain per-document hash split leaks: near-duplicate pairs straddle
    the boundary and the eval set silently contains paraphrases of
    training rows — the classic train/test contamination failure of web
    corpora. Here every document inherits the hash bucket of its dup
    cluster's representative (min reachable id via connected components;
    singletons represent themselves), so an entire near-dup cluster
    always lands on ONE side.

    Returns ``(id_col, rep_id, split)`` with split in
    {'train','val','test'}. Deterministic under any partitioning (the
    bucket is a content hash of rep_id), and stable as the corpus grows
    *except* where new edges merge clusters — which is exactly the case
    where re-assignment is the safe behavior.

    Scale shape: the pair graph is orders of magnitude smaller than the
    corpus (it only contains near-dup candidates); components run on it
    alone, then one broadcast-friendly left join attaches rep_id to the
    corpus — document text never shuffles.
    """
    from python_openetl_spark.operators.cluster import connected_components

    comps = connected_components(pairs, a_col, b_col)
    rep = docs.select(id_col).join(
        comps, docs[id_col] == comps["id"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("rep_id"),
    )
    bucket = sample_bucket(F.col("rep_id"), salt)
    test_cut = int(test_fraction * SAMPLE_D)
    val_cut = test_cut + int(val_fraction * SAMPLE_D)
    return rep.select(
        id_col,
        "rep_id",
        F.when(bucket < test_cut, F.lit("test"))
        .when(bucket < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def quantile_banded_sample(
    df: DataFrame,
    score_col: str,
    key_col: str,
    rates: dict[int, float],
    *,
    bands: int = 4,
    salt: str = "",
) -> DataFrame:
    """Curriculum-style banded sampling: rows are banded by exact score
    quantiles (band 1 = lowest scores) and each band keeps its own
    hash-membership rate — the standard way to shape a training mixture
    by a quality signal (keep the mid-distribution, thin the tails)
    without a global sort.

    Scale shape: ONE scalar aggregate computes the ``bands-1``
    interpolated quantile thresholds (map-side partial rank sketch...
    exact percentile here — swap in ``percentile_approx`` at extreme
    scale), broadcast to every row; banding is a comparison chain and
    membership is the engine-portable md5 bucket — no shuffle at all
    beyond the 1-row threshold aggregate. Thresholds and scores are
    rounded to 6 decimals so banding is engine-reproducible.

    Bands missing from ``rates`` are dropped (same convention as
    ``stratified_hash_sample``).
    """
    probs = [i / bands for i in range(1, bands)]
    # quantiles are taken over the ROUNDED scores (not merely rounded
    # after), so thresholds and the banding comparisons below see the
    # same 6-decimal value space end to end
    th = df.agg(
        *[
            F.round(F.expr(f"percentile(round({score_col}, 6), {p})"), 6).alias(
                f"__t{i}"
            )
            for i, p in enumerate(probs)
        ]
    )
    x = df.crossJoin(F.broadcast(th))
    band = F.lit(1)
    # the score enters every band comparison rounded to the same 6
    # decimals as the thresholds, so the docstring's reproducibility
    # claim holds even for callers with unrounded scores (the output
    # column itself is left untouched)
    score6 = F.round(F.col(score_col), 6)
    for i in range(len(probs)):
        band = band + (score6 > F.col(f"__t{i}")).cast("int")
    x = x.withColumn("band", band)
    bucket = sample_bucket(F.col(key_col), salt)
    cond = F.lit(False)
    for b, frac in rates.items():
        cond = cond | ((F.col("band") == b) & (bucket < int(frac * SAMPLE_D)))
    return x.filter(cond).drop(*[f"__t{i}" for i in range(len(probs))])


def balanced_shards(
    df,
    n_shards: int,
    size_col: str,
    id_col: str = "doc_id",
):
    """Deterministic size-balanced shard assignment: documents ranked
    by (size DESC, id) and dealt round-robin across ``n_shards`` — the
    export-time step that keeps training shards near-equal in token
    count (greedy round-robin on the sorted sizes bounds shard skew by
    one maximum document, vs unbounded skew from hash sharding when
    sizes are heavy-tailed).

    Scale shape: the global index comes from
    ``operators.ranking.global_row_number`` — deterministic quantile
    bands, per-band partitioned windows, broadcast prefix offsets — so
    neither a partitionless window nor the RDD layer is involved.
    (Through round 5 this was the engine's single RDD dependency, via
    ``zipWithIndex``; the banded rank computes the same integers with
    DataFrame ops only, keeping the whole engine on the Catalyst path.)
    """
    from pyspark.sql import functions as F

    from python_openetl_spark.operators.ranking import global_row_number

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    ordered = df.select(F.col(id_col), F.col(size_col).cast("long").alias("__sz"))
    ranked, _n = global_row_number(
        ordered, "__sz", [id_col], descending=True, out_col="__rn"
    )
    return ranked.select(
        F.col(id_col),
        F.col("__sz").alias(size_col),
        ((F.col("__rn") - 1) % n_shards).cast("int").alias("shard_id"),
    )


def es_sample_key(key: Column, weight: Column, *, salt: str = "") -> Column:
    """Efraimidis–Spirakis weighted-sampling key: ``ln(u) / w`` with
    ``u`` a deterministic uniform in (0, 1] derived from the row key.

    Taking the top-k rows by this key DESC is exactly weighted random
    sampling *without replacement* with inclusion probability
    proportional to ``w`` (Efraimidis & Spirakis 2006: the classic
    formulation keeps the k largest ``u^(1/w)``; ``ln(u)/w`` is a
    monotone transform of it, numerically safer for tiny weights).
    Determinism comes from the same portable 60-bit md5 scheme as
    ``hash_sample``: ``u = (hash60(salt:key) + 1) / 2^60`` — so the
    sample is reproducible under any partitioning, any engine, and
    stable per-row as unrelated rows are added (a row's key never
    changes; only the top-k cutoff moves).

    The key is rounded to 9 decimals so cross-engine float agreement is
    at the same tolerance the rest of the workload uses; callers must
    break ties on the row key. Rows with NULL or non-positive weight
    have no defined inclusion probability — the sampler drops them.
    """
    u = (token_hash60(F.concat(F.lit(f"es{salt}:"), key.cast("string"))) + 1) / F.lit(
        float(2**60)
    )
    return F.round(F.log(u) / weight.cast("double"), 9)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    strata_col: str | None = None,
    salt: str = "",
    candidate_buckets: int = 64,
    out_col: str = "sample_rank",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement: keep the ``k`` rows
    (per stratum, if ``strata_col`` is given) with the largest
    Efraimidis–Spirakis keys. Appends ``es_key`` and 1-based
    ``out_col`` rank columns.

    This is the sampling verb quality-weighted corpus selection needs
    ("draw a 10M-doc epoch where P(doc) ∝ quality·length") that
    ``hash_sample`` (Bernoulli, unweighted) cannot express.

    Scale shape: a single-stratum window would drag every row of a
    stratum through one task. Instead the classic two-phase top-k: rows
    are first hashed into ``candidate_buckets`` sub-buckets and ranked
    with a window partitioned by (stratum, bucket) — fully parallel,
    partitions bounded by N/(strata·buckets) — keeping at most ``k``
    per sub-bucket (any row outside its sub-bucket top-k is provably
    outside the stratum top-k). The final window ranks only the
    surviving ≤ buckets·k rows per stratum: bounded state, no skew.
    Rows with NULL or non-positive weight are dropped (no defined
    inclusion probability — see ``es_sample_key``).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = df.filter(F.col(weight_col).cast("double") > 0).withColumn(
        "es_key", es_sample_key(F.col(key_col), F.col(weight_col), salt=salt)
    )
    bucket = (
        token_hash60(F.concat(F.lit("esb:"), F.col(key_col).cast("string")))
        % candidate_buckets
    )
    strata = [strata_col] if strata_col else []
    order = [F.col("es_key").desc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(*strata, bucket).orderBy(*order)
    survivors = (
        scored.withColumn("__lr", F.row_number().over(w1))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    # final pass: ≤ candidate_buckets·k rows per stratum (a bounded,
    # broadcast-sized set even when strata_col is None)
    w2 = Window.partitionBy(*strata).orderBy(*order)
    return (
        survivors.withColumn(out_col, F.row_number().over(w2).cast("int"))
        .filter(F.col(out_col) <= k)
    )
