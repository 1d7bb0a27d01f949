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

from pyspark.sql import Column, DataFrame
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
