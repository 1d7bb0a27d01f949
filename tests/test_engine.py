"""Engine facade: source dispatch, Dataset transparency, pipeline verbs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.engine import Dataset, Engine
from python_openetl_spark.operators.merge import PrimaryKeyConflict
from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def test_read_and_dataset_transparency(eng):
    ds = eng.read({"format": "parquet", "path": f"{SF_DIR}/nation.parquet"})
    assert isinstance(ds, Dataset)
    # DataFrame verbs chain and stay wrapped
    out = ds.filter(F.col("n_regionkey") == 0).select("n_name").orderBy("n_name")
    assert isinstance(out, Dataset)
    assert out.count() == 5
    # non-DataFrame returns pass through
    assert isinstance(ds.columns, list)


def test_sql_path(eng):
    eng.table(SF_DIR, "nation").createOrReplaceTempView("e_nation")
    assert eng.sql("SELECT count(*) c FROM e_nation").collect()[0]["c"] == 25


def test_seed_and_upsert_verbs(eng, spark, tmp_path):
    src = eng.table(SF_DIR, "events").limit(100).withColumnRenamed("event_id", "id")
    src = src.withColumn("updated_at", F.col("ts"))
    table = eng.seed(src, str(tmp_path / "t"))
    assert table.read(spark).count() == 100
    metrics = eng.upsert_sync(src, str(tmp_path / "t"), pk="id", ts_col="updated_at",
                              anchor="2099-01-01 00:00:00", data_interval_hours=1)
    assert metrics.rows_deleted == 0  # converged


def test_operator_methods_and_safe_append(eng, spark):
    docs = eng.table(SF_DIR, "documents")
    sampled = docs.hash_sample("doc_id", 0.5)
    assert 0 < sampled.count() < docs.count()
    twins = docs.df.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    dupes = docs.unionByName(twins)
    assert dupes.exact_dedup_keep().count() == docs.count()

    target = spark.createDataFrame([(1, "a")], "id long, v string")
    fresh = spark.createDataFrame([(2, "b")], "id long, v string")
    assert eng.safe_append(target, fresh, pk="id").count() == 2
    with pytest.raises(PrimaryKeyConflict):
        eng.safe_append(target, target, pk="id")


def test_new_operator_methods(eng, spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    comps = Dataset(pairs).dedup_clusters()
    assert {tuple(r) for r in comps.collect()} == {(1, 1), (2, 1), (3, 1)}

    docs = spark.createDataFrame([(i, "x") for i in range(5)], "doc_id long, text string")
    assert Dataset(docs).canonicalize(pairs).count() == 3

    prof = Dataset(docs).profile()
    assert {r["col_name"] for r in prof.collect()} == {"doc_id", "text"}

    points = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    ivs = spark.createDataFrame([(0.0, 10.0, "a")], "lo double, hi double, nm string")
    rj = Dataset(points).range_join(ivs, "x", "lo", "hi", bin_width=5.0)
    assert rj.count() == 1

    from python_openetl_spark.operators.scd import scd2_init
    hist = Dataset(scd2_init(docs, "2024-01-01 00:00:00"))
    delta = spark.createDataFrame([(0, "changed")], "doc_id long, text string")
    merged = hist.scd2_merge(delta, "doc_id", "2024-02-01 00:00:00")
    assert merged.count() == 6  # one closed + one opened version


def test_prep_operator_methods(eng, spark):
    docs = Dataset(
        spark.createDataFrame(
            [(1, "alpha beta alpha beta alpha beta", "en"),
             (2, "mail jane@corp.io now", "en"),
             (3, "one two three four five six seven eight", "de")],
            "doc_id long, text string, lang string",
        )
    )
    stats = {r["doc_id"]: r for r in docs.repetition_stats().collect()}
    assert not stats[1]["keep"] and stats[3]["keep"]
    red = docs.redact_pii().filter("doc_id = 2").collect()[0]
    assert red["n_emails"] == 1 and "[EMAIL]" in red["text_redacted"]
    packed = docs.pack_sequences(ctx=4, by="lang")
    assert packed.count() == 3
    bench = docs.filter("doc_id = 3")
    cont = docs.filter("doc_id != 3").contamination_check(bench)
    assert cont.count() == 2
    mixed = docs.mixture_resample({"en": 0.5, "de": 0.5}, target_fraction=1.0)
    assert mixed.count() >= 1


def test_retrieval_operator_method(eng, spark):
    docs = Dataset(
        spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry durian")],
            "doc_id long, text string",
        )
    )
    q = spark.createDataFrame([(10, "apple")], "query_id long, qtext string")
    out = docs.bm25_topk(q, k=2).collect()
    assert [r.doc_id for r in out] == [1]


def test_facade_quality_and_privacy(spark):
    from python_openetl_spark.engine import Dataset
    from python_openetl_spark.operators import quality as Q

    ds = Dataset(spark.createDataFrame([(1, "en"), (1, "en"), (2, None)],
                                       "k long, lang string"))
    checks = {r.check: r.n_violations for r in
              ds.run_checks([Q.not_null("k"), Q.unique("k")], "t").collect()}
    assert checks == {"not_null(k)": 0, "unique(k)": 1}
    rep = ds.k_anonymity_report(["lang"], k=2).collect()[0]
    assert rep.n_violating_groups == 1 and not rep.is_k_anonymous


def test_facade_bpe_timeseries_matryoshka(spark):
    import datetime

    from python_openetl_spark.engine import Dataset

    docs = Dataset(
        spark.createDataFrame([(1, "abc abc abd")], "doc_id long, text string")
    )
    m = docs.bpe_train(iters=1).collect()
    assert (m[0].left_tok, m[0].right_tok, m[0].pair_freq) == ("a", "b", 3)

    d = datetime.date
    daily = Dataset(
        spark.createDataFrame(
            [("a", d(2024, 1, 1), 1), ("a", d(2024, 1, 3), 2)], "g string, day date, n long"
        )
    )
    filled = daily.gap_fill(["g"], "day", zero_cols=["n"]).collect()
    assert len(filled) == 3 and {r.n for r in filled} == {0, 1, 2}

    emb = Dataset(
        spark.createDataFrame(
            [(i, [float(i == j) for j in range(8)]) for i in range(4)],
            "vec_id long, embedding array<float>",
        )
    )
    q = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7)], "query_id long, embedding array<float>"
    )
    top = emb.matryoshka_topk(q, prefix_dims=4, k=2, rerank_factor=2).collect()
    assert len(top) == 2 and top[0].query_id == 0


def test_retrieval_rerank_and_eval_facade(eng, spark):
    """r12 verbs stay chainable through the Dataset facade: shortlist
    -> feature_rerank -> retrieval_eval, Datasets accepted everywhere."""
    shortlist = Dataset(
        spark.createDataFrame([(1, 1), (1, 2)], "query_id long, doc_id long")
    )
    lexical = Dataset(
        spark.createDataFrame(
            [(1, 1, 2.0), (1, 2, 1.0)], "query_id long, doc_id long, score double"
        )
    )
    dense = Dataset(
        spark.createDataFrame(
            [(1, 1, 0.9)], "query_id long, doc_id long, cos_sim double"
        )
    )
    dl = Dataset(spark.createDataFrame([(1, 10), (2, 10)], "doc_id long, dl int"))
    ranked = shortlist.feature_rerank(lexical, dense, dl, topk=2)
    assert isinstance(ranked, Dataset)
    rows = {r["doc_id"]: r["rank"] for r in ranked.collect()}
    assert rows == {1: 1, 2: 2}  # doc 1 wins every feature
    qrels = Dataset(
        spark.createDataFrame([(1, 1, 1)], "query_id long, doc_id long, rel int")
    )
    report = ranked.retrieval_eval(qrels, k=2)
    assert isinstance(report, Dataset)
    row = report.collect()[0]
    assert row["mrr"] == 1.0 and row["ndcg"] == 1.0 and row["recall"] == 1.0
