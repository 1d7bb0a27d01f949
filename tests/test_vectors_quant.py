"""Embedding normalization / int8 quantization semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_openetl_spark.functions.vectors import (
    dequantize_int8,
    l2_normalize,
    quantize_int8,
)

VECS = [
    (1, [3.0, 4.0]),
    (2, [0.0, 0.0]),
    (3, [-1.5, 0.25, 8.0]),
    (4, [1e-8, -1e-8]),
]


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id long, v array<double>")


def test_l2_normalize_unit_norm_and_zero_passthrough(spark):
    out = _df(spark).select(
        "vec_id", l2_normalize(F.col("v")).alias("n")
    ).collect()
    rows = {r["vec_id"]: r["n"] for r in out}
    assert math.isclose(sum(x * x for x in rows[1]) ** 0.5, 1.0, rel_tol=1e-12)
    assert rows[2] == [0.0, 0.0]
    assert math.isclose(rows[1][0], 0.6, rel_tol=1e-12)


def test_quantize_roundtrip_error_bounded_by_half_scale(spark):
    out = _df(spark).select(
        "vec_id",
        quantize_int8(F.col("v")).alias("qv"),
        F.col("v"),
    ).select(
        "vec_id",
        F.col("qv.scale").alias("scale"),
        F.col("qv.q").alias("q"),
        F.zip_with(F.col("v"), dequantize_int8(F.col("qv")), lambda a, b: F.abs(a - b)).alias("err"),
    ).collect()
    for r in out:
        assert all(-127 <= int(x) <= 127 for x in r["q"])
        assert max(r["err"]) <= r["scale"] / 2 + 1e-15
    scales = {r["vec_id"]: r["scale"] for r in out}
    assert math.isclose(scales[1], 4.0 / 127.0, rel_tol=1e-12)
    assert scales[2] == 1.0  # zero vector: unit scale, all-zero codes


def test_quantized_extremes_hit_full_range(spark):
    out = _df(spark).filter("vec_id = 3").select(
        quantize_int8(F.col("v")).alias("qv")
    ).collect()[0]["qv"]
    assert max(out["q"]) == 127  # the max-magnitude component saturates
