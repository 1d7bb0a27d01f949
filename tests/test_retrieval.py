"""BM25 retrieval operator: hand-computed scores + plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.retrieval import bm25_topk, build_postings


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry cherry"),
        ],
        "doc_id long, text string",
    )


def test_postings(spark, corpus):
    rows = {(r.term, r.doc_id): r.tf for r in build_postings(corpus).collect()}
    assert rows[("apple", 1)] == 2
    assert rows[("cherry", 3)] == 3
    assert rows[("banana", 2)] == 1
    assert len(rows) == 6


def test_bm25_hand_computed(spark, corpus):
    """N=3, avgdl=3; query 'apple cherry' -> doc1 > doc3 > doc2 with
    the Lucene-idf Okapi scores computed by hand below."""
    queries = spark.createDataFrame([(10, "apple cherry")], "query_id long, qtext string")
    out = bm25_topk(corpus, queries, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in out] == [1, 3, 2]
    assert [r.rank for r in out] == [1, 2, 3]

    idf_apple = round(math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0), 9)
    idf_cherry = round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0), 9)
    exp = {
        # doc1: tf(apple)=2, dl=3: tfn = 2*2.2 / (2 + 1.2*(0.25+0.75*1))
        1: round(idf_apple * (2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * (3 / 3)))), 7),
        # doc3: tf(cherry)=3, dl=4
        3: round(idf_cherry * (3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * (4 / 3)))), 7),
        # doc2: tf(cherry)=1, dl=2
        2: round(idf_cherry * (1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * (2 / 3)))), 7),
    }
    for r in out:
        assert r.score == pytest.approx(exp[r.doc_id], abs=1e-9)


def test_bm25_unknown_terms_and_ties(spark, corpus):
    queries = spark.createDataFrame(
        [(1, "zzz qqq"), (2, "banana")], "query_id long, qtext string"
    )
    out = bm25_topk(corpus, queries, k=5)
    rows = out.collect()
    # query 1 has no term in the corpus -> zero candidate docs
    assert not [r for r in rows if r.query_id == 1]
    # 'banana' hits docs 1 and 2 with tf=1 each; dl breaks the score,
    # equal scores would break on doc_id
    q2 = sorted((r.rank, r.doc_id) for r in rows if r.query_id == 2)
    assert [d for _, d in q2] == [2, 1]  # shorter doc scores higher


def test_bm25_plan_broadcasts_query_side(spark, corpus):
    queries = spark.createDataFrame([(10, "apple")], "query_id long, qtext string")
    plan = bm25_topk(corpus, queries, k=3)._jdf.queryExecution().executedPlan().toString()
    # query terms, query vocab, dfreq and the stats row all broadcast;
    # the corpus side must never be broadcast-collected
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rrf_fuse_hand_computed(spark):
    from python_openetl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r.doc_id: (r.rank, r.rrf_score) for r in rrf_fuse([lex, dense], topk=4).collect()}
    # doc 11 appears in both (ranks 2 and 1) and must fuse on top
    exp = {
        11: round(round(1 / 62, 9) + round(1 / 61, 9), 9),
        10: round(1 / 61, 9),
        13: round(1 / 62, 9),
        12: round(1 / 63, 9),
    }
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in order] == [11, 10, 13, 12]
    for rank, (doc, score) in enumerate(order, start=1):
        assert out[doc][0] == rank
        assert abs(out[doc][1] - score) < 1e-12


def test_update_postings_edit_is_delete_then_insert(spark, corpus):
    """Re-ingesting an EXISTING doc_id replaces its postings: stale
    terms drop out, surviving terms keep df (no double count), planted
    terms appear."""
    from python_openetl_spark.operators.retrieval import update_postings

    store = build_postings(corpus)
    # doc 1 edited: loses 'banana', keeps 'apple' (tf 2 -> 1), gains 'zzz'
    batch = spark.createDataFrame([(1, "apple zzz")], "doc_id long, text string")
    rows = {(r.term, r.doc_id): r.tf for r in update_postings(store, batch).collect()}
    assert rows[("apple", 1)] == 1          # replaced, not summed (would be 3)
    assert ("banana", 1) not in rows        # stale posting deleted
    assert rows[("zzz", 1)] == 1            # new term inserted
    assert rows[("banana", 2)] == 1         # untouched docs keep postings
    assert rows[("cherry", 3)] == 3
    # df('apple') must stay 1 — a bare union would make it 2
    assert sum(1 for (t, _d) in rows if t == "apple") == 1


def test_update_postings_new_doc_appends(spark, corpus):
    from python_openetl_spark.operators.retrieval import update_postings

    store = build_postings(corpus)
    batch = spark.createDataFrame([(9, "durian durian")], "doc_id long, text string")
    rows = {(r.term, r.doc_id): r.tf for r in update_postings(store, batch).collect()}
    assert rows[("durian", 9)] == 2
    assert rows[("durian", 3)] == 1
    assert len(rows) == len(build_postings(corpus).collect()) + 1


def test_bm25_stopword_term_still_prunes_before_shuffle(spark):
    """A query term hitting >50% of documents (stop-word shape) must
    not change the plan shape: the query-vocab broadcast semi-join
    stays BELOW the (term, doc) aggregate — i.e. only query-term rows
    ever reach the postings shuffle, regardless of how many documents
    the term matches (document frequency prunes nothing; vocabulary
    membership does, and that is decided map-side on the exploded
    tokens)."""
    import re

    docs = spark.createDataFrame(
        [(i, "common filler" + (" rare" if i == 0 else "")) for i in range(10)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "common rare")], "query_id long, qtext string")
    out = bm25_topk(docs, q, k=10)

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    m_agg = re.search(r"Aggregate \[term#\d+, doc_id#\d+L?\]", plan)
    assert m_agg, "postings (term, doc) aggregate missing"
    m_join = re.search(r"Join Inner, \(term#\d+ = term#\d+\)[^\n]*broadcast", plan[m_agg.end():])
    assert m_join, "vocab broadcast join not below the postings aggregate"
    m_gen = re.search(r"Generate explode\(toks#\d+\)", plan[m_agg.end() + m_join.end():])
    assert m_gen, "vocab join not directly over the exploded corpus tokens"

    # semantics: 'common' hits 10/10 docs (df = N -> idf = ln(1 + 0.5/10.5),
    # still positive with the Lucene variant); the rare term dominates
    rows = out.orderBy("rank").collect()
    assert len(rows) == 10            # every doc matches the stop-word term
    assert rows[0].doc_id == 0        # the doc with the rare term on top
    assert all(r.score > 0 for r in rows)


def test_feature_rerank_hand_computed(spark):
    """Hand-computed rerank over a 3-candidate shortlist covering every
    feature edge: a lexical-only hit, a dense-only hit, a both-tower
    hit, a zero-length document, and min-max normalization with a
    corpus-average length prior."""
    import math

    from python_openetl_spark.operators.retrieval import feature_rerank

    shortlist = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3)], "query_id long, doc_id long"
    )
    lexical = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 5.0)], "query_id long, doc_id long, score double"
    )
    dense = spark.createDataFrame(
        [(1, 2, 0.8), (1, 3, 0.5)], "query_id long, doc_id long, cos_sim double"
    )
    # corpus of 4 docs; avgdl = (10+20+0+10)/4 = 10
    dl = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 0), (4, 10)], "doc_id long, dl int"
    )
    got = {
        r["doc_id"]: (r["rerank_score"], r["rank"])
        for r in feature_rerank(shortlist, lexical, dense, dl).collect()
    }
    lp2 = round(1.0 / (1.0 + abs(round(math.log(20.0 / 10.0), 9))), 9)
    exp = {
        1: round(0.5 * 1.0, 9) + round(0.2 * 1.0, 9),          # lex max + ideal length
        2: round(0.3 * 0.9, 9) + round(0.2 * lp2, 9),          # lex min -> 0
        3: round(0.3 * 0.75, 9),                               # dense-only, dl=0
    }
    assert set(got) == {1, 2, 3}
    for d in exp:
        assert got[d][0] == pytest.approx(exp[d], abs=1e-12), (d, got[d])
    assert [got[d][1] for d in (1, 2, 3)] == [1, 2, 3]  # score order

    # all-tied lexical scores normalize to 1.0, not 0/0
    tied = spark.createDataFrame(
        [(1, 1, 7.0), (1, 2, 7.0)], "query_id long, doc_id long, score double"
    )
    got2 = {
        r["doc_id"]: r["rerank_score"]
        for r in feature_rerank(
            shortlist.filter(F.col("doc_id") <= 2), tied, dense, dl
        ).collect()
    }
    assert got2[1] == pytest.approx(0.5 + 0.2, abs=1e-12)
    assert got2[2] == pytest.approx(
        round(0.5 * 1.0, 9) + round(0.3 * 0.9, 9) + round(0.2 * lp2, 9), abs=1e-12
    )


def test_feature_rerank_shortlist_never_shuffles_corpus(spark, corpus):
    """The dl join must be broadcast-pruned: the executed plan carries
    no shuffle of the corpus-sized length frame (only the bounded
    window exchange), keeping the rerank O(queries x topk) at scale."""
    from python_openetl_spark.operators.retrieval import (
        bm25_topk,
        doc_lengths,
        feature_rerank,
        rrf_fuse,
    )

    queries = corpus.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 20).alias("qtext"),
    )
    lexical = bm25_topk(corpus, queries, k=5)
    fused = rrf_fuse([lexical.select("query_id", "doc_id", "rank")], topk=5)
    dense = lexical.select(
        "query_id", "doc_id", (F.col("score") * 0).alias("cos_sim")
    )
    out = feature_rerank(fused, lexical, dense, doc_lengths(corpus), topk=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() > 0


def test_retrieval_eval_hand_computed(spark):
    """nDCG/MRR/recall on a hand-worked judgment set: graded gains, an
    irrelevant rank-1 hit, a query the ranking misses entirely (all
    metrics 0), and an all-zero-relevance query (no row)."""
    import math

    from python_openetl_spark.operators.retrieval import retrieval_eval

    ranking = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 2), (1, 11, 3), (1, 21, 4), (1, 22, 5),
         (2, 40, 1)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (1, 12, 1), (1, 13, 0),
         (2, 30, 1),
         (3, 50, 0)],
        "query_id long, doc_id long, rel int",
    )
    got = {
        r["query_id"]: (r["mrr"], r["ndcg"], r["recall"])
        for r in retrieval_eval(ranking, qrels, k=5).collect()
    }
    assert set(got) == {1, 2}  # q3 has no positive relevance -> no row
    dcg = round(3 / math.log2(3), 9) + round(1 / math.log2(4), 9)
    idcg = (
        round(3 / math.log2(2), 9)
        + round(1 / math.log2(3), 9)
        + round(1 / math.log2(4), 9)
    )
    assert got[1][0] == pytest.approx(0.5, abs=1e-12)
    assert got[1][1] == pytest.approx(round(dcg / idcg, 9), abs=1e-12)
    assert got[1][2] == pytest.approx(round(2 / 3, 9), abs=1e-12)
    assert got[2] == (0.0, 0.0, 0.0)  # judged but never retrieved

    # ideal-cutoff edge: more relevant docs than k -> IDCG uses only
    # the k best gains, so a perfect top-k ranking scores ndcg 1.0
    big_qrels = spark.createDataFrame(
        [(9, d, 1) for d in range(100, 108)], "query_id long, doc_id long, rel int"
    )
    perfect = spark.createDataFrame(
        [(9, 100 + i, i + 1) for i in range(5)],
        "query_id long, doc_id long, rank int",
    )
    row = retrieval_eval(perfect, big_qrels, k=5).collect()[0]
    assert row["ndcg"] == pytest.approx(1.0, abs=1e-12)
    assert row["recall"] == pytest.approx(round(5 / 8, 9), abs=1e-12)


def test_feature_rerank_hostile_shapes(spark):
    """r12 verdict item 6 planted fixtures: every candidate
    single-tower (all lex-null, then all cos-null), one scored
    candidate per query (min==max on a singleton), and an EMPTY corpus
    dl frame (the sum-null driver guard) — each must produce finite,
    deterministic scores, never 0/0 or NULL rows."""
    from python_openetl_spark.operators.retrieval import feature_rerank

    shortlist = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 9)], "query_id long, doc_id long"
    )
    no_lex = spark.createDataFrame([], "query_id long, doc_id long, score double")
    dense = spark.createDataFrame(
        [(1, 1, 0.5), (1, 2, -1.0), (2, 9, 1.0)],
        "query_id long, doc_id long, cos_sim double",
    )
    dl = spark.createDataFrame([(1, 10), (2, 10), (9, 10)], "doc_id long, dl int")
    # all candidates lexical-null: lex term 0 everywhere, cos decides
    got = {
        (r["query_id"], r["doc_id"]): (r["rerank_score"], r["rank"])
        for r in feature_rerank(shortlist, no_lex, dense, dl).collect()
    }
    assert got[(1, 1)] == (pytest.approx(0.3 * 0.75 + 0.2, abs=1e-12), 1)
    assert got[(1, 2)] == (pytest.approx(0.2, abs=1e-12), 2)  # cos -1 -> 0
    assert got[(2, 9)] == (pytest.approx(0.3 + 0.2, abs=1e-12), 1)

    # all candidates dense-null + singleton scored lexical per query:
    # min==max on ONE row must normalize to 1.0
    one_lex = spark.createDataFrame(
        [(1, 2, 3.5), (2, 9, 0.0)], "query_id long, doc_id long, score double"
    )
    no_dense = spark.createDataFrame(
        [], "query_id long, doc_id long, cos_sim double"
    )
    got2 = {
        (r["query_id"], r["doc_id"]): r["rerank_score"]
        for r in feature_rerank(shortlist, one_lex, no_dense, dl).collect()
    }
    assert got2[(1, 2)] == pytest.approx(0.5 + 0.2, abs=1e-12)
    assert got2[(1, 1)] == pytest.approx(0.2, abs=1e-12)  # unscored
    # a 0.0 lexical score on a singleton still normalizes to 1.0
    assert got2[(2, 9)] == pytest.approx(0.5 + 0.2, abs=1e-12)

    # EMPTY corpus dl frame: sum(dl) is NULL -> the driver-side guard
    # must not raise; every len_prior is 0 and scores stay finite
    empty_dl = spark.createDataFrame([], "doc_id long, dl int")
    got3 = {
        (r["query_id"], r["doc_id"]): r["rerank_score"]
        for r in feature_rerank(shortlist, one_lex, dense, empty_dl).collect()
    }
    assert got3[(1, 2)] == pytest.approx(0.5 + 0.0, abs=1e-12)
    assert all(v is not None for v in got3.values())


def test_retrieval_eval_hostile_shapes(spark):
    """r12 verdict item 6: qrels with rel=0-only queries (no row) plus
    k LARGER than the judgment set (recall can reach 1.0 and ndcg
    normalizes by the full, shorter ideal), and an empty ranking
    (judged queries all-zero metrics)."""
    from python_openetl_spark.operators.retrieval import retrieval_eval

    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1),   # 2 judged docs, k=5 > judgment set
         (2, 20, 0), (2, 21, 0)],  # rel-0-only query: no output row
        "query_id long, doc_id long, rel int",
    )
    ranking = spark.createDataFrame(
        [(1, 11, 1), (1, 99, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank int",
    )
    rows = {r["query_id"]: r for r in retrieval_eval(ranking, qrels, k=5).collect()}
    assert set(rows) == {1}
    dcg = round(1 / math.log2(2), 9) + round(2 / math.log2(4), 9)
    idcg = round(2 / math.log2(2), 9) + round(1 / math.log2(3), 9)
    assert rows[1]["mrr"] == pytest.approx(1.0, abs=1e-12)
    assert rows[1]["ndcg"] == pytest.approx(round(dcg / idcg, 9), abs=1e-12)
    assert rows[1]["recall"] == pytest.approx(1.0, abs=1e-12)

    # empty ranking: judged queries emit all-zero metrics, not no rows
    empty = spark.createDataFrame([], "query_id long, doc_id long, rank int")
    rows2 = {r["query_id"]: r for r in retrieval_eval(empty, qrels, k=5).collect()}
    assert set(rows2) == {1}
    assert (rows2[1]["mrr"], rows2[1]["ndcg"], rows2[1]["recall"]) == (0.0, 0.0, 0.0)
