"""Semantic unit tests for BPE merge training (operators/bpe.py),
time-series gap filling (operators/timeseries.py), and Matryoshka
two-stage retrieval (operators/similarity.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.bpe import SEP, bpe_train, word_counts
from python_openetl_spark.operators.timeseries import date_spine, gap_fill


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


# ------------------------------------------------------------------- BPE --


def test_word_counts_lowercases_and_drops_empties(spark):
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(_docs(spark, ["The  the a", " a THE "])).collect()
    }
    assert wc == {"the": 3, "a": 2}


def test_bpe_learns_most_frequent_pair_first(spark):
    # "ab" appears in every word; pair (a,b) freq = 5+3 = 8 beats all
    words = _docs(spark, ["abc abc abc abc abc abd abd abd"])
    m = bpe_train(word_counts(words), iters=2).collect()
    assert (m[0]["left_tok"], m[0]["right_tok"], m[0]["pair_freq"]) == ("a", "b", 8)
    # after merging a+b -> "ab", the runner-up is (ab, c) with freq 5
    assert (m[1]["left_tok"], m[1]["right_tok"], m[1]["pair_freq"]) == ("ab", "c", 5)


def test_bpe_greedy_left_to_right_on_repeats(spark):
    # "aaaa": pairs (a,a) x3 -> merge 1 learns (a,a) with freq 3;
    # greedy L2R application yields [aa][aa], so merge 2 sees (aa,aa)
    m = bpe_train(word_counts(_docs(spark, ["aaaa"])), iters=2).collect()
    assert (m[0]["left_tok"], m[0]["right_tok"], m[0]["pair_freq"]) == ("a", "a", 3)
    assert (m[1]["left_tok"], m[1]["right_tok"]) == ("aa", "aa")


def test_bpe_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both have freq 2 -> deterministic winner (a,b)
    m = bpe_train(word_counts(_docs(spark, ["ab cd ab cd"])), iters=1).collect()
    assert (m[0]["left_tok"], m[0]["right_tok"]) == ("a", "b")


def test_bpe_exhausted_vocabulary_stops_early(spark):
    # single-char words have no pairs after the first merge possibility
    m = bpe_train(word_counts(_docs(spark, ["a b a"])), iters=3).collect()
    assert m == []


def test_bpe_rejects_bad_iters(spark):
    with pytest.raises(ValueError):
        bpe_train(word_counts(_docs(spark, ["ab"])), iters=0)


def test_bpe_sep_is_unprintable():
    assert SEP == "\x1f" and not SEP.isprintable()


# ------------------------------------------------------------ timeseries --


def _daily(spark):
    d = datetime.date
    rows = [
        ("a", d(2024, 1, 1), 2, 10.0, 5.0),
        ("a", d(2024, 1, 4), 1, 8.0, 8.0),
        ("b", d(2024, 1, 2), 3, 9.0, 3.0),
    ]
    return spark.createDataFrame(rows, ["g", "day", "cnt", "rev", "price"])


def test_date_spine_covers_per_group_range(spark):
    s = date_spine(_daily(spark), ["g"], "day").collect()
    got = {(r["g"], str(r["day"])) for r in s}
    assert got == {
        ("a", "2024-01-01"),
        ("a", "2024-01-02"),
        ("a", "2024-01-03"),
        ("a", "2024-01-04"),
        ("b", "2024-01-02"),
    }


def test_gap_fill_zero_and_ffill(spark):
    out = {
        (r["g"], str(r["day"])): (r["cnt"], r["rev"], r["price"])
        for r in gap_fill(
            _daily(spark), ["g"], "day", zero_cols=["cnt", "rev"], ffill_cols=["price"]
        ).collect()
    }
    assert out[("a", "2024-01-02")] == (0, 0.0, 5.0)  # zero-filled, price carried
    assert out[("a", "2024-01-03")] == (0, 0.0, 5.0)
    assert out[("a", "2024-01-04")] == (1, 8.0, 8.0)  # observed row untouched
    assert len(out) == 5


def test_date_spine_max_days_guard(spark):
    d = datetime.date
    wide = spark.createDataFrame(
        [("a", d(2000, 1, 1)), ("a", d(2024, 1, 1))], ["g", "day"]
    )
    with pytest.raises(Exception, match="max_days"):
        date_spine(wide, ["g"], "day", max_days=30).collect()


# ------------------------------------------------------------ matryoshka --


def test_matryoshka_matches_exact_topk_on_fixtures(spark):
    """With rerank_factor large enough to cover the corpus, the
    two-stage result must equal exact brute-force top-k."""
    from python_openetl_spark.operators.similarity import cosine_topk, matryoshka_topk
    from tests.conftest import SF_DIR
    from python_openetl_spark.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings").limit(200).cache()
    q = emb.filter(F.col("vec_id").isin(1, 5)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=3)
    mat = matryoshka_topk(emb, q, prefix_dims=16, k=3, rerank_factor=100)
    e = {(r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()}
    m = {(r["query_id"], r["vec_id"], r["rank"]) for r in mat.collect()}
    assert e == m
    emb.unpersist()


def test_matryoshka_rejects_bad_params(spark):
    from python_openetl_spark.operators.similarity import matryoshka_topk

    df = spark.range(1)
    with pytest.raises(ValueError):
        matryoshka_topk(df, df, prefix_dims=0)
