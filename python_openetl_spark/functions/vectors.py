"""Vector math over ``ArrayType(FloatType)`` embedding columns.

Two tiers, per SURVEY §2.3 / the 100 TB design note:

1. **JVM-side expressions** (`dot`, `norm`, `cosine`): built from
   ``zip_with``/``aggregate`` in DOUBLE — fully codegen'd, no Python in
   the loop, and *bit-identical* to DuckDB's sequential
   ``list_dot_product`` (verified on the fixture embeddings), which is
   what makes cosine values oracle-checkable.
2. **Arrow-batched pandas UDF kernels** (see operators/similarity.py):
   for the O(n·m) brute-force similarity inner loop, a numpy matmul per
   Arrow batch beats per-row expressions by orders of magnitude and is
   the idiomatic Spark escape hatch when built-ins can't express the
   computation shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (order matches DuckDB)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bucket(v: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id for cosine similarity: one bit per random
    hyperplane (bit = dot(v, plane) >= 0). Vectors in the same bucket
    are near-neighbor candidates; at scale this turns the all-pairs
    cross join into a per-bucket join."""
    bucket = F.lit(0).cast("long")
    for plane in planes:
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(v, p) >= 0).cast("long")
        bucket = F.shiftleft(bucket, 1) + bit
    return bucket


def l2_normalize(v: Column) -> Column:
    """Unit-normalize an embedding (zero vectors pass through as-is).

    Normalizing at ingest turns every cosine downstream into a plain
    dot product — one multiply-add per dimension instead of three
    aggregates per pair, the standard trick for similarity at scale.
    """
    n = norm(v)
    return F.when(n == 0.0, _as_double(v)).otherwise(
        F.transform(_as_double(v), lambda x: x / n)
    )


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale, q) with
    ``x ≈ scale * q``, q ∈ [-127, 127].

    4x smaller embeddings = 4x less shuffle/storage for ANN at 100 TB;
    scoring dequantizes on the fly (``dequantize_int8``) or works in
    int8 domain with one final rescale. Deterministic round-half-up via
    floor(x + 0.5), reproducible across engines.
    """
    vd = _as_double(v)
    amax = F.array_max(F.transform(vd, F.abs))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    q = F.transform(vd, lambda x: F.floor(x / scale + 0.5).cast("tinyint"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qv: Column) -> Column:
    """Inverse of quantize_int8: array<double> ≈ the original vector."""
    return F.transform(qv["q"], lambda x: x.cast("double") * qv["scale"])
