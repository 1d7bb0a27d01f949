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


def test_maxsim_score_hand_computed(spark):
    """m=2, dsub=2: maxsim = sum over query halves of the best dot
    against either doc half — computed by hand."""
    from pyspark.sql import functions as F

    from python_openetl_spark.operators.late_interaction import maxsim_score

    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0, 2.0], [3.0, 0.0, 0.0, 5.0])],
        "q array<double>, d array<double>",
    )
    got = df.select(
        maxsim_score(F.col("q"), F.col("d"), m=2, dsub=2).alias("s")
    ).collect()[0].s
    # q1=[1,0]: dots 3 (d1), 0 (d2) -> 3; q2=[0,2]: dots 0, 10 -> 10
    assert got == 13.0


def test_maxsim_topk_guard_and_self_exclusion(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from python_openetl_spark.operators.late_interaction import maxsim_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, float(i % 3)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = maxsim_topk(emb, q, k=3, m=2).collect()
    assert len(out) == 3
    assert all(r.vec_id != 1 for r in out)          # self excluded
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    with _pytest.raises(ValueError, match="max_rows"):
        maxsim_topk(emb, q, k=3, m=2, max_rows=5)
