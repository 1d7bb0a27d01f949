"""operators/tuning.py — corpus-size-derived parameters.

The key property (r5 verdict item 5): the oracle-checked invariant
booleans (x05/x09 recall_ok, q58 est_ok) must survive a fixture-size
perturbation of +/-2x, because the index parameters now derive from
``count()`` instead of being pinned to one fixture generation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.tuning import hll_rel_tol, ivf_params, pq_params
from tests.conftest import SF_DIR


def test_ivf_params_scale_with_sqrt_n():
    assert ivf_params(500)["nlist"] == 22
    assert ivf_params(2000)["nlist"] == 45
    for n in (1, 10, 500, 2000, 10**6, 10**9):
        p = ivf_params(n)
        assert 4 <= p["nlist"] <= 4096
        assert 1 <= p["nprobe"] <= p["nlist"]
    # monotone: a bigger corpus never gets a smaller index
    ns = [10, 100, 1000, 10**4, 10**6]
    assert [ivf_params(n)["nlist"] for n in ns] == sorted(
        ivf_params(n)["nlist"] for n in ns
    )


def test_pq_params_bounds():
    for n in (1, 16, 250, 500, 2000, 10**6):
        p = pq_params(n, 64)
        assert p["ksub"] <= 256 and p["ksub"] <= max(n, 1)
        assert p["m"] == 8 and 64 % p["m"] == 0
        assert 10 <= p["rerank_factor"] <= 50
    # the r5 cliff: 2000 vectors must get more than 16 centroids
    assert pq_params(2000, 64)["ksub"] > 16
    # odd dims still get a valid subspace split
    assert 63 % pq_params(10, 63)["m"] == 0


def test_hll_rel_tol_matches_published_bound():
    assert abs(hll_rel_tol(12) - 3 * 1.04 / 64.0) < 1e-12
    assert hll_rel_tol(14) < hll_rel_tol(12)


@pytest.fixture(scope="module")
def perturbed_dirs(spark, tmp_path_factory):
    """sf0.001 embeddings at 0.5x (every other vector) and 2x (union
    with reversed-vector copies) — a stand-in for a fixture
    regeneration at a different scale."""
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = {}
    base = tmp_path_factory.mktemp("perturb")
    half = src.filter((F.col("vec_id") % 2 == 0) | F.col("vec_id").isin(1, 5, 9))
    double = src.unionByName(
        src.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
            *[c for c in src.columns if c not in ("vec_id", "embedding")],
        ).select(*src.columns)
    )
    for name, df in (("half", half), ("double", double)):
        d = base / name
        df.write.parquet(str(d / "embeddings.parquet"))
        out[name] = str(d)
    return out


@pytest.mark.parametrize("which", ["half", "double"])
def test_x05_recall_boolean_survives_perturbation(spark, perturbed_dirs, which):
    from python_openetl_spark.workload.llm import x05_ivf_topk

    rows = x05_ivf_topk(spark, perturbed_dirs[which]).collect()
    assert rows and all(r["recall_ok"] for r in rows)


@pytest.mark.parametrize("which", ["half", "double"])
def test_x09_recall_boolean_survives_perturbation(spark, perturbed_dirs, which):
    from python_openetl_spark.workload.llm6 import x09_ivf_pq_topk

    rows = x09_ivf_pq_topk(spark, perturbed_dirs[which]).collect()
    assert rows and all(r["recall_ok"] for r in rows)


def test_q58_envelope_is_derived_not_pinned(spark):
    from python_openetl_spark.workload.relational3 import q58_hll_distinct_sketch

    rows = q58_hll_distinct_sketch(spark, SF_DIR).collect()
    assert rows and all(r["est_ok"] for r in rows)
