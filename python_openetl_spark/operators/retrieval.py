"""Distributed BM25 full-text retrieval over a documents table.

The missing sibling of the similarity family (operators/similarity.py
covers dense-vector search; this covers sparse lexical search): build
an inverted index (postings) with one shuffle, then score a query set
against it with Okapi BM25 and return the top-k documents per query.
In a training-data pipeline this is the workhorse for benchmark
decontamination sweeps (query = eval question, hits = candidate
contaminated docs — the lexical complement of e02/e03's n-gram paths)
and for quality-targeted retrieval of pretraining subsets.

Reference context: the reference engine (tmccall8829/python-openetl)
has no text retrieval at all — this is a BASELINE.json north-star
extension; the tokenizer is the shared engine-wide one
(functions/text.py TOKEN_SPLIT_RE) so postings compose with the dedup
and text-stats operators.

Scale shape (the 100 TB story):
- The corpus is touched by three embarrassingly parallel column-pruned
  scans: postings build, per-doc length, and the (N, sum_dl) scalar
  aggregate (map-side partial, two longs per partition) — in a
  materialized-index deployment the last two ship with the index and
  query time touches only postings.
- Postings are built per-document JVM-side (explode -> groupBy term,
  doc) and immediately SEMI-PRUNED to the query vocabulary via a
  broadcast join BEFORE the term/doc shuffle, so the only rows that
  ever shuffle are (query-term, doc_id, tf) triples — for a bounded
  query set this is a vanishing fraction of the corpus, and raw text
  never shuffles at all.
- Document frequencies are computed on the pruned postings (one more
  shuffle on term, rows = pruned postings).
- The query set is broadcast everywhere it appears; the final top-k is
  a per-query window over candidate docs only.
- No Python UDFs anywhere: the whole plan is whole-stage-codegen
  expressions.

Determinism contract (the oracle story): per-(query,term,doc) score
contributions are doubles computed by the IDENTICAL expression tree in
Spark and the DuckDB oracle — every input (tf, df, dl, N, sum_dl) is
an exact integer and avgdl enters as one IEEE division, so the only
non-portable step is ln(); the idf is therefore rounded to 9 decimals
and the final contribution to 7 decimals, then cast to DECIMAL(20,7)
*before* the per-document SUM — making the sum exact and
order-independent (partition-layout-proof), the same convention as the
rest of the workload (workload/__init__.py module docstring). Ranking
ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import tokens


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf)``.

    One explode + one (term, doc_id) hash aggregate; the aggregate's
    map-side partial combine collapses within-document repeats before
    the shuffle, so shuffled rows are bounded by distinct
    (term, document) pairs, never raw token streams.
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token count ``(doc_id, dl)`` — no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).alias("dl")
    )


def update_postings(
    store: DataFrame,
    batch_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged inverted index after ingesting a document batch: the
    materialized postings store unioned with postings built from the
    BATCH ONLY — the indexed corpus is never re-read or re-tokenized
    (the d23/d29 incremental story, for the retrieval index). Document
    frequency and corpus scalars update additively (df' = df + batch
    df; Σdl' = Σdl + batch Σdl), which is what makes the inverted
    index maintainable at 100 TB: ingest cost scales with the batch,
    not the corpus.

    Re-ingest of an EDITED document (a batch ``doc_id`` already in the
    store — the natural update case) is handled delete-then-insert: the
    store is left-anti-joined on the batch's doc_ids before the union,
    so the edited document's stale postings drop out instead of
    silently double-counting tf/df. The anti-join's build side is the
    batch's distinct doc_ids (broadcast — batches are driver-bounded),
    so the store is touched by one streamed map-side pass, never
    re-tokenized. Pure deletions compose as the same anti-join with an
    empty-postings batch.
    """
    batch_ids = batch_docs.select(F.col(id_col).alias("doc_id")).distinct()
    kept = store.join(F.broadcast(batch_ids), "doc_id", "left_anti")
    return kept.unionByName(build_postings(batch_docs, text_col, id_col))


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 60,
    topk: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09): fused score =
    Σ over rankings of ``1 / (k + rank)``. The standard way to combine
    a lexical (BM25) and a dense (embedding) ranking without score
    calibration — ranks are comparable where raw scores are not.

    Scale shape: each input ranking is already top-k-per-query (tiny);
    the fusion is a union + one aggregate on (query, doc) over
    O(queries × k × #rankings) rows — negligible next to the rankings
    themselves. Determinism: each reciprocal contribution is one IEEE
    division rounded to 9 decimals, summed as exact DECIMAL; ties
    break on doc id.
    """
    contribs = [
        r.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.round(
                F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double")), 9
            )
            .cast("decimal(20,9)")
            .alias("c"),
        )
        for r in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        allc.groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_dec"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "doc_id",
            F.col("score_dec").cast("double").alias("rrf_score"),
            "rank",
        )
    )


def bm25_rank_topk(
    postings: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """The SINGLE construction site of the Okapi BM25 scoring tail
    (r13 verdict #5 — the expression tree was hand-duplicated between
    :func:`bm25_topk` and postings_store.postings_store_topk with a
    bit-identical contract; one drifting literal would silently break
    their parity). Inputs:

    - ``postings``: ``(term, doc_id, tf)`` already pruned to the query
      vocabulary (from a corpus scan or a persisted store — document
      frequency is computed HERE, as a window over the pruned rows, so
      both callers count df over identical live rows);
    - ``dl``: live ``(doc_id, dl)``; ``stats``: one row
      ``(n_docs, sum_dl)``; ``qterms``: ``(query_id, term)``,
      driver-bounded (broadcast).

    Score = Lucene idf variant ``ln(1 + (N - df + .5)/(df + .5))``
    rounded to 9 decimals, times the k1/b tf normalization, rounded to
    7 decimals and cast DECIMAL(20,7) BEFORE the per-document sum —
    exact, order-independent, and mirrored literal-for-literal in the
    DuckDB oracles (module docstring's determinism contract). Ranking
    ties break on doc_id."""
    postings = postings.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    # idf rounded to 9 decimals: ln() is the one step whose last ulp is
    # not guaranteed identical across engines (module docstring)
    idf = F.round(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    # written with explicit literals/parenthesization mirrored verbatim
    # in the SQL oracle so every double op is the same IEEE op
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    tfn = F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom
    contrib = F.round(idf * tfn, 7).cast("decimal(20,7)")
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_dec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("score_dec").cast("double").alias("score"),
            "rank",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Okapi BM25 top-k: ``(query_id, doc_id, score, rank)``.

    ``score`` uses the Lucene idf variant ``ln(1 + (N - df + .5)/(df + .5))``
    (always positive, so stop-word query terms dilute rather than
    invert rankings). ``queries`` must be driver-bounded (it is
    broadcast); the corpus side is unbounded.
    """
    from python_openetl_spark.operators.materialize import materialize

    # qterms is referenced three times (qvocab's derivation + two
    # broadcast builds) and dl twice (the stats aggregate + the
    # per-document scoring join) — each extra reference re-runs a
    # corpus tokenize (plan audit: bm25_topk tokenized the corpus three
    # times). Size-adaptive pins: UNCONDITIONAL checkpoints were
    # measured SLOWER at fixture scale (d34 2.70s -> 3.44s, x10 3.37s
    # -> 4.45s — three barrier jobs cost more than the re-scans they
    # saved), so the pin engages only above the materialize threshold,
    # where re-scanning a corpus per reference dominates any barrier.
    # Both frames are pin-safe at any scale: qterms is driver-bounded
    # by contract, dl is one fixed-width (doc_id, dl) row per document.
    qterms = materialize(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens(query_text_col))).alias("term"),
        ).distinct()
    )
    qvocab = qterms.select("term").distinct()

    # corpus scalars: one map-side-combined scan -> a single broadcast row
    dl = materialize(doc_lengths(docs, text_col, id_col))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # prune to the query vocabulary BEFORE the (term, doc) aggregate:
    # the broadcast join runs map-side on the exploded tokens, so only
    # query-term rows ever reach the shuffle (a join placed after the
    # groupBy would not be pushed below the aggregate by Catalyst)
    postings = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qvocab), "term")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency is computed INSIDE bm25_rank_topk as a window
    # count over these pruned postings — a groupBy+join here would make
    # Spark recompute the whole postings subtree (a second corpus scan)
    return bm25_rank_topk(postings, dl, stats, qterms, k=k, k1=k1, b=b)


def feature_rerank(
    shortlist: DataFrame,
    lexical: DataFrame,
    dense: DataFrame,
    dl: DataFrame,
    *,
    w_lex: float = 0.5,
    w_cos: float = 0.3,
    w_len: float = 0.2,
    topk: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    lex_score_col: str = "score",
    cos_col: str = "cos_sim",
) -> DataFrame:
    """Feature-scored reranking of a retrieval shortlist — the third
    stage of the standard retrieval pipeline (tower top-k → rank fusion
    → rerank), the deterministic stand-in for a cross-encoder tier:
    where a learned reranker scores (query, doc) pairs with a model,
    this scores them with an explicit feature blend so the result is
    reproducible and SQL-oracle-checkable end to end.

    ``rerank_score = w_lex·lex_n + w_cos·cos_n + w_len·len_prior`` with

    - ``lex_n``: the candidate's BM25 score min-max normalized PER
      QUERY over the shortlist's scored members ((s−min)/(max−min);
      1.0 when the query's scored candidates all tie; 0.0 when the
      candidate reached the shortlist without a lexical score — a
      dense-tower-only hit has no lexical evidence);
    - ``cos_n``: cosine rescaled to [0,1] via (c+1)/2; 0.0 when the
      candidate carries no dense score (lexical-only hit);
    - ``len_prior``: ``1 / (1 + |ln(dl / avgdl)|)`` — favors documents
      near the corpus mean length, the classic verbosity/fragment
      penalty (0.0 for empty documents, where the ratio is undefined).

    Each term is one IEEE expression rounded to 9 decimals and summed
    as exact DECIMAL(20,9) (the engine-wide order-independence
    contract); final ranking ties break on doc id.

    Scale shape: the shortlist is per-query bounded (queries × fused
    top-k rows), so every feature join is broadcast-sized; ``dl``
    (``doc_lengths``: one column-pruned corpus scan) is semi-pruned to
    the shortlist's ids via a broadcast BEFORE its join, and the corpus
    average enters as one map-side-combined 1-row aggregate collected
    to the driver and re-entered as a literal (kept in-plan it would be
    re-scanned at every reference — the linkrank rule) — the corpus is
    never shuffled, and the rerank itself touches only
    O(queries × topk) rows. Reference parity: the reference has no
    retrieval surface; this completes the north-star pipeline x10's
    fusion starts (r11 verdict item 7).
    """
    on = ["query_id", "doc_id"]
    cand = shortlist.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")
    )
    lex = lexical.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(lex_score_col).alias("__lex"),
    )
    den = dense.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(cos_col).alias("__cos"),
    )
    dl = dl.select(F.col(id_col).alias("doc_id"), F.col("dl"))
    # corpus scalars to the driver once (the linkrank rule: a 1-row
    # aggregate kept in-plan is re-scanned at every reference; the
    # integer sums round-trip a Python int exactly and the division
    # below is the same IEEE op either way)
    srow = dl.agg(
        F.sum("dl").alias("__sum_dl"), F.count(F.lit(1)).alias("__n_docs")
    ).first()
    sum_dl = F.lit(float(srow["__sum_dl"] or 0))
    n_docs = F.lit(float(srow["__n_docs"] or 1))
    dl_short = dl.join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    feats = (
        cand.join(lex, on, "left")
        .join(den, on, "left")
        .join(F.broadcast(dl_short), "doc_id", "left")
    )
    w = Window.partitionBy("query_id")
    smin, smax = F.min("__lex").over(w), F.max("__lex").over(w)
    lex_n = F.when(F.col("__lex").isNull(), F.lit(0.0)).otherwise(
        F.when(smax == smin, F.lit(1.0)).otherwise(
            F.round((F.col("__lex") - smin) / (smax - smin), 9)
        )
    )
    cos_n = F.when(F.col("__cos").isNull(), F.lit(0.0)).otherwise(
        F.round((F.col("__cos") + F.lit(1.0)) / F.lit(2.0), 9)
    )
    avgdl = sum_dl / n_docs
    len_prior = F.when(
        F.coalesce(F.col("dl"), F.lit(0)) <= 0, F.lit(0.0)
    ).otherwise(
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.abs(F.round(F.log(F.col("dl").cast("double") / avgdl), 9))
            ),
            9,
        )
    )

    def _dec(term):
        return F.round(term, 9).cast("decimal(20,9)")

    scored = feats.select(
        "query_id",
        "doc_id",
        (
            _dec(F.lit(w_lex) * lex_n)
            + _dec(F.lit(w_cos) * cos_n)
            + _dec(F.lit(w_len) * len_prior)
        ).alias("score_dec"),
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "doc_id",
            F.col("score_dec").cast("double").alias("rerank_score"),
            "rank",
        )
    )


def retrieval_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Ranking-quality report — the evaluation verb that closes the
    retrieval loop (tower top-k → fusion → rerank → EVALUATE): per
    query with at least one relevant document, the three standard
    graded-relevance metrics at cutoff ``k``:

    - ``mrr`` — 1/rank of the first relevant hit in the top-k (0 if
      none);
    - ``ndcg`` — DCG@k / IDCG@k with gain ``rel / log2(rank + 1)``
      (Järvelin & Kekäläinen 2002), the ideal ordering being ``qrels``
      sorted by relevance desc, doc id asc, cut to k;
    - ``recall`` — |relevant ∩ top-k| / |relevant|.

    ``qrels`` is the graded relevance table ``(query_id, doc_id,
    rel)`` with integer gains (0 allowed, ignored); queries whose
    qrels are all zero emit no row (every metric is 0/0 there).

    Determinism: gains are integers; each DCG/IDCG term is one IEEE
    ``rel / log2(rank+1)`` rounded to 9 decimals and summed as exact
    DECIMAL(20,9) (log2's last ulp is the only cross-engine risk — the
    same treatment ln() gets everywhere in this engine); mrr is one
    exact division; ndcg/recall are single divisions rounded to 9.

    Scale shape: both inputs are (query, doc)-keyed and per-query
    bounded (rankings are top-k by construction; qrels are judgment
    sets); two hash aggregates and one per-query join — nothing
    corpus-sized is touched, no window spans more than a judgment
    set. Reference parity: the reference has no retrieval surface;
    this is BASELINE.json north-star extension surface.
    """
    q, d = "query_id", "doc_id"
    rk = ranking.select(
        F.col(query_id_col).alias(q),
        F.col(id_col).alias(d),
        F.col(rank_col).alias("__rank"),
    ).filter(F.col("__rank") <= k)
    qr = qrels.select(
        F.col(query_id_col).alias(q),
        F.col(id_col).alias(d),
        F.col(rel_col).cast("long").alias("__rel"),
    )

    def _gain(rel, pos):
        return F.round(
            rel.cast("double") / F.log2(pos.cast("double") + F.lit(1.0)), 9
        ).cast("decimal(20,9)")

    hit = rk.join(qr, [q, d]).filter(F.col("__rel") > 0)
    got = hit.groupBy(q).agg(
        F.sum(_gain(F.col("__rel"), F.col("__rank"))).alias("__dcg"),
        F.round(F.lit(1.0) / F.min("__rank").cast("double"), 9).alias("mrr"),
        F.count(F.lit(1)).alias("__hits"),
    )
    iw = Window.partitionBy(q).orderBy(F.col("__rel").desc(), F.col(d).asc())
    rel_only = qr.filter(F.col("__rel") > 0)
    ideal = (
        rel_only.withColumn("__pos", F.row_number().over(iw))
        .filter(F.col("__pos") <= k)
        .groupBy(q)
        .agg(F.sum(_gain(F.col("__rel"), F.col("__pos"))).alias("__idcg"))
    )
    totals = rel_only.groupBy(q).agg(F.count(F.lit(1)).alias("__n_rel"))
    return (
        totals.join(ideal, q)
        .join(got, q, "left")
        .select(
            q,
            F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg").cast("double"), F.lit(0.0))
                / F.col("__idcg").cast("double"),
                9,
            ).alias("ndcg"),
            F.round(
                F.coalesce(F.col("__hits"), F.lit(0)).cast("double")
                / F.col("__n_rel").cast("double"),
                9,
            ).alias("recall"),
        )
    )
