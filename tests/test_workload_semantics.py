"""Semantic checks for queries without a SQL oracle: approx-aggregate
error bounds vs their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.workload.relational import q28_approx_aggs
from tests.conftest import SF_DIR


def test_train_test_split_disjoint_and_stable(spark):
    from python_openetl_spark.operators.sampling import train_test_split

    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    train, test = train_test_split(d, "doc_id", test_fraction=0.2)
    n, ntr, nte = d.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "doc_id").count() == 0  # hash-disjoint
    assert 0.1 * n <= nte <= 0.3 * n
    # growth stability: membership of existing keys never flips
    grown = d.unionByName(d.select((F.col("doc_id") + 10_000_000).alias("doc_id")))
    _, test2 = train_test_split(grown, "doc_id", test_fraction=0.2)
    old_test2 = test2.filter(F.col("doc_id") < 10_000_000)
    assert sorted(r["doc_id"] for r in old_test2.collect()) == sorted(
        r["doc_id"] for r in test.collect()
    )


def test_approx_aggs_within_error_bounds(spark):
    """q28 now emits its error-bound checks as hash-verified booleans;
    this test asserts every bound actually holds (not vacuously true)
    and the exact anchors agree with a direct aggregation."""
    approx = {r["o_orderstatus"]: r for r in q28_approx_aggs(spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("o_custkey").alias("nd"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for status, row in approx.items():
        assert row["n_orders"] == exact[status]["n"]
        assert row["exact_customers"] == exact[status]["nd"]
        assert row["ndv_ok"] and row["p25_ok"] and row["p50_ok"] and row["p75_ok"]


def test_corpus_key_fingerprints_fixture_state(tmp_path):
    # memo keys must change when the corpus is mutated in place
    # (r14 verdict #7: sf_dir alone serves stale derived state)
    import os
    import shutil

    from python_openetl_spark.workload.util import corpus_key

    d = tmp_path / "corpus"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "documents.parquet")
    k1 = corpus_key(str(d))
    assert corpus_key(str(d)) == k1  # immutable dir -> stable key
    os.utime(d / "documents.parquet")  # touch: content-state changed
    assert corpus_key(str(d)) != k1


def test_shared_towers_memo_misses_on_mutated_corpus(spark, tmp_path):
    # a corpus mutated in place must MISS the _TOWERS memo and
    # recompute rather than serve stale towers
    import os
    import shutil

    from python_openetl_spark.workload import llm15

    d = tmp_path / "sf"
    d.mkdir()
    for name in ("documents", "embeddings"):
        shutil.copy(f"{SF_DIR}/{name}.parquet", d / f"{name}.parquet")
    before = len(llm15._TOWERS)
    llm15._shared_towers(spark, str(d))
    assert len(llm15._TOWERS) == before + 1
    llm15._shared_towers(spark, str(d))  # unchanged corpus -> memo hit
    assert len(llm15._TOWERS) == before + 1
    os.utime(d / "documents.parquet")  # mutate in place
    llm15._shared_towers(spark, str(d))
    assert len(llm15._TOWERS) == before + 2  # miss -> recomputed
