"""Count-Min Sketch over a token stream: heavy-hitter counting in
fixed memory (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005).

The 100 TB shape: exact token counting keeps a counter per DISTINCT
token (vocabulary-sized state, unbounded for raw web text — URLs,
typos, hex blobs); a CMS keeps ``depth x width`` counters TOTAL,
regardless of vocabulary. Estimates only ever OVER-count (every
guarantee is one-sided): ``est(t) >= true(t)`` always, and
``est(t) <= true(t) + eps*N`` with probability ``1 - delta`` for
``width = ceil(e/eps)``, ``depth = ceil(ln 1/delta)``.

Scale shape:

- the build is ONE pass: each token emits its ``depth`` (row, bucket)
  cells via posexplode, then a map-side-combined groupBy — the shuffle
  carries at most ``depth x width`` rows per partition after partial
  aggregation, never the token stream;
- the sketch table itself is ``depth x width`` rows (16 KiB of longs at
  the defaults) — broadcastable to any estimator join;
- estimation for a candidate set is a broadcast join on (row, bucket) +
  a min-reduce per candidate — no rescan of the corpus.

Hashing is the engine's portable 60-bit md5 device (functions/
text.token_hash60) salted per row, so a DuckDB oracle reproduces the
sketch BIT-FOR-BIT — the driver hash-checks actual sketch contents,
not just invariants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import token_hash60, tokens

#: Defaults: eps ~ e/2048 ~ 0.13% of stream length, delta ~ e^-4 ~ 1.8%.
CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_bucket(tok: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-salted bucket index in [0, width)."""
    return token_hash60(F.concat(F.lit(f"cms{row}:"), tok)) % width


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One corpus pass -> the sketch table ``(row, bucket, cnt)``.

    Cells never touched by any token are absent (implicitly zero) —
    the estimator treats a missing cell as 0, which can only lower an
    estimate and therefore preserves the one-sided guarantee.
    """
    ex = df.select(F.explode(tokens(text_col)).alias("tok"))
    cells = ex.select(
        F.posexplode(
            F.array(*[cms_bucket(F.col("tok"), j, width) for j in range(depth)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    tok_col: str = "tok",
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for a candidate token set: min over the token's
    ``depth`` cells. Candidates keep all their columns; the estimate is
    appended as ``cms_est``. The sketch side broadcasts (depth x width
    rows max)."""
    probes = candidates.select(
        "*",
        F.posexplode(
            F.array(*[cms_bucket(F.col(tok_col), j, width) for j in range(depth)])
        ).alias("row", "bucket"),
    )
    others = [c for c in candidates.columns]
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Exact top-k tokens annotated with their CMS estimates — the
    verification shape: ``(tok, true_count, cms_est, overestimates)``
    where ``overestimates`` must be TRUE for every row (the one-sided
    CMS guarantee, checked in-plan).

    At 100 TB the exact top-k side would be replaced by a candidate
    stream (e.g. per-partition local heavy hitters); here it doubles as
    the ground truth the driver hash-checks the sketch against.
    """
    ex = df.select(F.explode(tokens(text_col)).alias("tok"))
    top = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), "tok")
        .limit(k)
    )
    cms = cms_build(df, text_col, depth=depth, width=width)
    est = cms_estimate(cms, top, "tok", depth=depth, width=width)
    return est.select(
        "tok",
        "true_count",
        "cms_est",
        (F.col("cms_est") >= F.col("true_count")).alias("overestimates"),
    )


def feature_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Population Stability Index between two snapshots of an
    integer-bucketed feature — the standard "has this distribution
    shifted enough to re-weight/retrain" monitor (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted), the numeric-feature sibling of
    textops.token_kl_divergence's vocabulary drift.

    ``PSI = Σ_b (p_b - q_b) · ln(p_b / q_b)`` over the JOINT bucket
    set with add-one smoothing (both distributions strictly positive,
    finite on buckets unique to one side). Determinism contract (the
    token_kl_divergence convention): exact integer counts, one IEEE
    division per probability, ``ln`` rounded to 9 decimals, each
    contribution to 12, summed as DECIMAL(28,12) — order-independent
    and bit-matchable by a SQL oracle.

    Scale shape: one hash-agg per side (shuffle carries (bucket,
    count) rows — bounded by the bucket range, never the data), a
    bucket-sized full outer join, scalar totals broadcast via
    crossJoin. Output is ONE row:
    ``(n_buckets, n_a, n_b, psi)``."""
    ca = df_a.groupBy(F.col(bucket_col).alias("b")).agg(F.count(F.lit(1)).alias("ca"))
    cb = df_b.groupBy(F.col(bucket_col).alias("b")).agg(F.count(F.lit(1)).alias("cb"))
    joint = ca.join(cb, "b", "full_outer").select(
        "b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    totals = joint.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    x = joint.crossJoin(F.broadcast(totals)).select(
        "v",
        "na",
        "nb",
        ((F.col("ca") + F.lit(1.0)) / (F.col("na") + F.col("v"))).alias("p"),
        ((F.col("cb") + F.lit(1.0)) / (F.col("nb") + F.col("v"))).alias("q"),
    )
    contrib = x.select(
        "v",
        "na",
        "nb",
        F.round(
            (F.col("p") - F.col("q")) * F.round(F.log(F.col("p") / F.col("q")), 9),
            12,
        )
        .cast("decimal(28,12)")
        .alias("c"),
    )
    return contrib.agg(
        F.max("v").cast("bigint").alias("n_buckets"),
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sum("c").cast("double").alias("psi"),
    )
