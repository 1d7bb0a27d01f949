"""Semantic tests for the training-corpus preparation operators
(operators/prep.py) beyond the oracle gate: planted-pattern detection,
packing invariants, mixture convergence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.operators import prep
from tests.conftest import SF_DIR


def test_repetition_stats_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one token repeated
            (2, "alpha beta gamma delta epsilon zeta"),  # all distinct
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in prep.repetition_stats(docs).collect()}
    assert out[1]["dup_token_frac"] > 0.8 and out[1]["top_bigram_frac"] == 1.0
    assert not out[1]["keep"]
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["keep"]


def test_contamination_flags_verbatim_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (2, "completely unrelated words appear in this document here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in prep.contamination_check(corpus, bench).collect()}
    assert out[1]["contaminated"] and out[1]["overlap_frac"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0


def test_redact_pii_rewrites_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jane.doe@corp.io or call 555-0199 twice 555-0200")],
        "doc_id long, text string",
    )
    row = prep.redact_pii(df).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 2
    assert "@" not in row["text_redacted"]
    assert row["text_redacted"].count("[PHONE]") == 2


def test_pack_sequences_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = prep.pack_sequences(docs, ctx=64, by="lang").toPandas()
    # spans are contiguous within each lang shard, in doc_id order
    for _, g in out.sort_values("doc_id").groupby("lang"):
        starts = g["start_tok"].to_numpy()
        ends = (g["start_tok"] + g["n_tokens"]).to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == ends[:-1]).all()
        assert (g["first_window"] == g["start_tok"] // 64).all()
        assert (g["last_window"] >= g["first_window"]).all()


def test_mixture_resample_hits_target_proportions(spark):
    docs = load_table(spark, SF_DIR, "documents")
    weights = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.1, "zh": 0.1}
    out = prep.mixture_resample(docs, weights, target_fraction=0.4)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    # each stratum lands within a few points of its target share (hash
    # sampling is approximate at 500 docs) unless capped by availability
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, w in weights.items():
        want = w * 0.4 * sum(avail.values())
        capped = min(avail[lang], want)
        assert abs(got.get(lang, 0) - capped) <= max(10, 0.35 * capped), (lang, got)
    # membership is deterministic: rerun matches exactly
    again = {r["lang"]: r["n"] for r in
             prep.mixture_resample(docs, weights, target_fraction=0.4)
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == again


def test_incremental_dedup_statuses(spark):
    from python_openetl_spark.functions.text import fingerprint
    from python_openetl_spark.operators.dedup import incremental_dedup

    store_docs = spark.createDataFrame(
        [(1, "old content alpha"), (2, "old content beta")], "doc_id long, text string"
    )
    store = store_docs.select(fingerprint("text").alias("fp")).distinct()
    batch = spark.createDataFrame(
        [
            (10, "old content alpha"),   # dup_of_store
            (11, "brand new gamma"),     # new (first of pair)
            (12, "brand new gamma"),     # dup_in_batch
            (13, "brand new delta"),     # new
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in incremental_dedup(batch, store).collect()}
    assert out == {10: "dup_of_store", 11: "new", 12: "dup_in_batch", 13: "new"}


def test_training_shuffle_is_partitioning_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = prep.training_shuffle(docs, num_shards=8)
    b = prep.training_shuffle(docs.repartition(13), num_shards=8)
    assert a.unionByName(b).select("doc_id", "shard", "pos").distinct().count() == docs.count()
    # each shard's positions are a contiguous 0..n-1 permutation
    bad = (
        a.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert bad == 0


def test_prepare_corpus_gates_compose(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = prep.prepare_corpus(corpus, bench)
    rows = out.count()
    assert 0 < rows <= corpus.count()
    # survivors carry no un-redacted PII and no contaminated docs
    assert out.filter(F.col("overlap_frac") >= 0.5).count() == 0
    assert out.filter(F.col("text_redacted").rlike(prep.EMAIL_RE)).count() == 0


def test_contamination_keeps_short_docs(spark):
    bench = spark.createDataFrame([(100, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "alpha beta gamma delta epsilon")],  # doc 1: < 3 tokens
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in prep.contamination_check(corpus, bench).collect()}
    assert set(out) == {1, 2}, "short docs must not be dropped"
    assert out[1]["n_shingles"] == 0 and out[1]["overlap_frac"] == 0.0
    assert not out[1]["contaminated"]


def test_pack_sequences_zero_token_doc_span_not_inverted(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "...!!!"), (3, "five six")],  # doc 2: 0 tokens
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in prep.pack_sequences(docs, ctx=4).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["last_window"] >= rows[2]["first_window"]
    assert all(r["last_window"] >= r["first_window"] for r in rows.values())


def test_prepare_corpus_keeps_short_docs(spark):
    bench = spark.createDataFrame([(100, "alpha beta gamma delta")], "doc_id long, text string")
    # doc 1: 1 token -> no bigrams (passes quality), no 3-shingles
    # (must pass contamination as trivially uncontaminated, not vanish);
    # doc 2: long unrelated text passes every gate
    corpus = spark.createDataFrame(
        [(1, "hello"), (2, "some fresh unrelated content appears right here today")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in prep.prepare_corpus(corpus, bench).collect()}
    assert kept == {1, 2}


def test_vocab_encode_roundtrip_invariants(spark):
    from python_openetl_spark.operators.prep import build_vocab, vocab_encode
    from python_openetl_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents")
    vocab = build_vocab(d, vocab_size=20)
    assert vocab.count() == 20
    ids = [r["tid"] for r in vocab.orderBy("tid").collect()]
    assert ids == list(range(1, 21))  # contiguous, 1-based
    enc = vocab_encode(d, vocab)
    assert enc.count() == d.count()
    row = enc.select(
        F.min(F.size("token_ids") == F.col("n_tokens")).alias("len_ok"),
        F.max(F.array_max("token_ids")).alias("max_tid"),
        F.min(F.array_min("token_ids")).alias("min_tid"),
    ).collect()[0]
    assert row["len_ok"] and 0 <= row["min_tid"] and row["max_tid"] <= 20
    # OOV accounting: n_oov equals the zeros in the sequence
    bad = enc.filter(
        F.size(F.filter("token_ids", lambda x: x == 0)) != F.col("n_oov")
    ).count()
    assert bad == 0


def test_temperature_mixture_upweights_small_sources(spark):
    """alpha=0.5 temperature sampling: keep RATE must be higher for the
    small source than the large one (sqrt weights flatten the mix),
    membership is content-hash deterministic, and alpha=1 degrades to
    proportional sampling (equal keep rates)."""
    from python_openetl_spark.io import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    # lang is the skewed stratum in the fixtures (en dominates); the
    # source column is uniform, where temperature has nothing to do
    counts = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    assert counts[big] > counts[small]

    out = prep.temperature_mixture(docs, alpha=0.5, strata_col="lang")
    kept = {r["lang"]: r["cnt"] for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    rate = {s: kept.get(s, 0) / counts[s] for s in counts}
    assert rate[small] > rate[big]
    # deterministic: same inputs, same membership
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            prep.temperature_mixture(docs, alpha=0.5, strata_col="lang")
            .select("doc_id").collect()}
    assert ids1 == ids2
    # alpha=1 (proportional): every stratum keeps ~target_fraction via
    # the same bucket device -> per-stratum accept thresholds are equal
    prop = prep.temperature_mixture(docs, alpha=1.0, strata_col="lang")
    kept_p = {r["lang"]: r["cnt"] for r in
              prop.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # identical accept_bp across strata: the rate gap must shrink vs alpha=0.5
    rate_p = {s: kept_p.get(s, 0) / counts[s] for s in counts}
    assert abs(rate_p[small] - rate_p[big]) <= abs(rate[small] - rate[big])


def test_epoch_mixture_upsamples_small_strata(spark):
    """d56: a small stratum's multiplier exceeds 1 (documents emit
    multiple copies with distinct copy_idx), the dominant stratum
    down-samples below 1, total output stays within a few percent of
    the corpus size, and the expansion is deterministic."""
    from python_openetl_spark.operators.prep import epoch_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_mixture(df, alpha=0.5, strata_col="lang")
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # sqrt weights: w_small/w_big = sqrt(100/900) = 1/3 -> m_small =
    # (0.25 * 1000)/100 = 2.5x, m_big = (0.75 * 1000)/900 ~ 0.83x
    assert per["small"] > 100 * 2 and per["small"] < 100 * 3
    assert per["big"] < 900
    total = sum(per.values())
    assert abs(total - 1000) < 60
    # full epochs carry every doc: copy_idx 0 and 1 present for ALL
    # small docs, copy_idx 2 only for the fractional-keep subset
    small = out.filter(F.col("lang") == "small")
    assert small.filter(F.col("copy_idx") == 1).count() == 100
    n2 = small.filter(F.col("copy_idx") == 2).count()
    assert 0 < n2 < 100
    # deterministic: second run identical
    again = epoch_mixture(df, alpha=0.5, strata_col="lang")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_epoch_mixture_null_stratum_dropped_without_skew(spark):
    """r9 advice: NULL-stratum rows used to count in pw_sum/total but
    be silently dropped by the equi-join, undershooting the ~N output
    contract. They are now filtered BEFORE the count agg: output size
    tracks the NON-NULL corpus and no NULL rows appear. Also covers
    the hostile single-doc stratum with multiplier < 1 (r9 verdict #5):
    a 1-doc stratum among big ones keeps w*N/1 >= 1, so it must emit
    at least its own copy."""
    from python_openetl_spark.operators.prep import epoch_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    rows += [(5000 + i, None) for i in range(500)]  # NULL stratum
    rows.append((9999, "solo"))  # single-doc stratum
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_mixture(df, alpha=0.5, strata_col="lang")
    assert out.filter(F.col("lang").isNull()).count() == 0
    total = out.count()
    # ~N of the NON-NULL corpus (1001), not of the padded 1501
    assert abs(total - 1001) < 80, total
    # the solo stratum's multiplier is w*N/1 > 1 -> several copies
    assert out.filter(F.col("lang") == "solo").count() >= 1
