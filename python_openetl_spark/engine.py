"""The engine facade — the one-import public API (SURVEY §7).

A user of the reference library drives three pipeline classes
(`/root/reference/pyopenetl/pipelines.py:45-127`: Seed, Update,
CrunchbaseFlatfile) plus raw-SQL escape hatches. Here the same surface
is one object::

    from python_openetl_spark import Engine

    eng = Engine()                       # or Engine(spark) to bring your own
    ds = eng.read({"format": "parquet", "path": ".../lineitem.parquet"})
    ds.filter(...).select(...)           # Dataset wraps DataFrame, same verbs
    eng.sql("SELECT ... FROM lineitem")  # SQL path over registered views

    eng.seed(ds, "/tables/lineitem")               # C1 snapshot
    eng.upsert_sync(src_df, "/tables/t", pk="id")  # C2 incremental
    eng.ingest_tarball("dump.tar.gz", "/tables")   # C3 flat files
    eng.safe_append(target, rows, pk="id")         # K6

`Dataset` is a thin, transparent wrapper: every unknown attribute
forwards to the underlying DataFrame (so the whole DataFrame API is the
operator surface — SURVEY §2.3 row 1), plus the engine's own operators
(dedup/similarity/sampling/asof/...) mounted as methods. `.df` exposes
the raw DataFrame at any point; nothing is hidden.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.plans.pipelines import (
    ParquetTable,
    SyncMetrics,
    ingest_tarball,
    seed,
    upsert_sync,
)
from python_openetl_spark.session import get_spark, tune_session
from python_openetl_spark.sources import registry


class Dataset:
    """A DataFrame plus the engine's operator surface.

    Transparent: any DataFrame attribute/method works and returns
    Datasets where it would return DataFrames.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self.df, name)
        if callable(attr):
            def wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                return Dataset(out) if isinstance(out, DataFrame) else out

            return wrapped
        return Dataset(attr) if isinstance(attr, DataFrame) else attr

    # --- engine operators mounted as methods --------------------------------
    def exact_dedup_keep(self, text_col: str = "text", id_col: str = "doc_id") -> "Dataset":
        from python_openetl_spark.operators.dedup import exact_dedup_keep

        return Dataset(exact_dedup_keep(self.df, text_col, id_col))

    def minhash_candidates(self, text_col: str = "text", id_col: str = "doc_id", **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import minhash_lsh_candidates

        return Dataset(minhash_lsh_candidates(self.df, text_col, id_col, **kw))

    def hash_sample(self, key_col: str, fraction: float, **kw) -> "Dataset":
        from python_openetl_spark.operators.sampling import hash_sample

        return Dataset(hash_sample(self.df, key_col, fraction, **kw))

    def asof_join(self, right: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.asof import asof_join

        r = right.df if isinstance(right, Dataset) else right
        return Dataset(asof_join(self.df, r, **kw))

    def normalize_timestamps(self, **kw) -> "Dataset":
        from python_openetl_spark.functions.normalize import normalize_timestamps

        return Dataset(normalize_timestamps(self.df, **kw))

    def dedup_clusters(self, src_col: str = "doc_a", dst_col: str = "doc_b", **kw) -> "Dataset":
        """Resolve near-dup *pairs* (this Dataset) into duplicate clusters."""
        from python_openetl_spark.operators.cluster import connected_components

        return Dataset(connected_components(self.df, src_col, dst_col, **kw))

    def canonicalize(self, pairs: "Dataset | DataFrame", id_col: str = "doc_id", **kw) -> "Dataset":
        """Drop every clustered duplicate except each cluster's min-id row."""
        from python_openetl_spark.operators.cluster import canonicalize_corpus

        p = pairs.df if isinstance(pairs, Dataset) else pairs
        return Dataset(canonicalize_corpus(self.df, p, id_col, **kw))

    def scd2_merge(self, delta: "Dataset | DataFrame", pk, as_of, **kw) -> "Dataset":
        from python_openetl_spark.operators.scd import scd2_merge

        d = delta.df if isinstance(delta, Dataset) else delta
        return Dataset(scd2_merge(self.df, d, pk, as_of, **kw))

    def profile(self, cols: list[str] | None = None, **kw) -> "Dataset":
        from python_openetl_spark.operators.profile import profile

        return Dataset(profile(self.df, cols, **kw))

    def range_join(
        self, intervals: "Dataset | DataFrame", point_col: str,
        start_col: str, end_col: str, **kw,
    ) -> "Dataset":
        from python_openetl_spark.operators.rangejoin import binned_interval_join

        iv = intervals.df if isinstance(intervals, Dataset) else intervals
        return Dataset(binned_interval_join(self.df, iv, point_col, start_col, end_col, **kw))

    # --- training-corpus preparation (operators/prep.py) --------------------
    def repetition_stats(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import repetition_stats

        return Dataset(repetition_stats(self.df, **kw))

    def contamination_check(self, benchmark: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import contamination_check

        b = benchmark.df if isinstance(benchmark, Dataset) else benchmark
        return Dataset(contamination_check(self.df, b, **kw))

    def redact_pii(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import redact_pii

        return Dataset(redact_pii(self.df, **kw))

    def pack_sequences(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import pack_sequences

        return Dataset(pack_sequences(self.df, **kw))

    def mixture_resample(self, weights: dict[str, float], **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import mixture_resample

        return Dataset(mixture_resample(self.df, weights, **kw))

    def training_shuffle(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import training_shuffle

        return Dataset(training_shuffle(self.df, **kw))

    def incremental_dedup(self, seen_fps: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import incremental_dedup

        s = seen_fps.df if isinstance(seen_fps, Dataset) else seen_fps
        return Dataset(incremental_dedup(self.df, s, **kw))

    def prepare_corpus(self, benchmark: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import prepare_corpus

        b = benchmark.df if isinstance(benchmark, Dataset) else benchmark
        return Dataset(prepare_corpus(self.df, b, **kw))

    def kmeans(self, **kw) -> "tuple":
        """Spherical k-means: returns (centroids ndarray, Dataset of
        multi-probe assignments). See operators/kmeans.py."""
        from python_openetl_spark.operators.kmeans import spherical_kmeans

        cents, assigned = spherical_kmeans(self.df, **kw)
        return cents, Dataset(assigned)

    def semantic_dedup(self, threshold: float, **kw) -> "Dataset":
        from python_openetl_spark.operators.kmeans import semantic_dedup

        return Dataset(semantic_dedup(self.df, threshold=threshold, **kw))

    def band_keys(self, **kw) -> "Dataset":
        """LSH band-key index rows (the persisted near-dup store)."""
        from python_openetl_spark.operators.dedup import minhash_band_keys

        return Dataset(minhash_band_keys(self.df, **kw))

    def incremental_near_dedup(self, band_store: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import incremental_near_dedup

        s = band_store.df if isinstance(band_store, Dataset) else band_store
        return Dataset(incremental_near_dedup(self.df, s, **kw))

    def build_vocab(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import build_vocab

        return Dataset(build_vocab(self.df, **kw))

    def vocab_encode(self, vocab: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import vocab_encode

        v = vocab.df if isinstance(vocab, Dataset) else vocab
        return Dataset(vocab_encode(self.df, v, **kw))

    def leakage_safe_split(self, pairs: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.sampling import leakage_safe_split

        p = pairs.df if isinstance(pairs, Dataset) else pairs
        return Dataset(leakage_safe_split(self.df, p, **kw))

    def unigram_logprob(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.textops import unigram_logprob_score

        return Dataset(unigram_logprob_score(self.df, **kw))

    def cms_heavy_hitters(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.sketches import cms_heavy_hitters

        return Dataset(cms_heavy_hitters(self.df, **kw))

    def exact_contamination(self, benchmark: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import exact_contamination

        b = benchmark.df if isinstance(benchmark, Dataset) else benchmark
        return Dataset(exact_contamination(self.df, b, **kw))

    def neardup_contamination(self, benchmark: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.prep import neardup_contamination

        b = benchmark.df if isinstance(benchmark, Dataset) else benchmark
        return Dataset(neardup_contamination(self.df, b, **kw))

    def containment_pairs(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import containment_pairs

        return Dataset(containment_pairs(self.df, **kw))

    def chunk_documents(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.textops import chunk_documents

        return Dataset(chunk_documents(self.df, **kw))

    def dispatch_modalities(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.multimodal import dispatch_modalities

        return Dataset(dispatch_modalities(self.df, **kw))

    def update_postings(self, batch_docs: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.retrieval import update_postings

        b = batch_docs.df if isinstance(batch_docs, Dataset) else batch_docs
        return Dataset(update_postings(self.df, b, **kw))

    def bm25_topk(self, queries: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.retrieval import bm25_topk

        q = queries.df if isinstance(queries, Dataset) else queries
        return Dataset(bm25_topk(self.df, q, **kw))

    def ivf_pq_topk(self, queries_pdf, **kw) -> "Dataset":
        from python_openetl_spark.operators.pq import ivf_pq_topk

        return Dataset(ivf_pq_topk(self.df, queries_pdf, **kw))

    def feature_rerank(
        self, lexical, dense, dl, **kw
    ) -> "Dataset":
        """self = the fused shortlist (r12 retrieval tier 3)."""
        from python_openetl_spark.operators.retrieval import feature_rerank

        un = lambda x: x.df if isinstance(x, Dataset) else x  # noqa: E731
        return Dataset(feature_rerank(self.df, un(lexical), un(dense), un(dl), **kw))

    def retrieval_eval(self, qrels, **kw) -> "Dataset":
        """self = a (query_id, doc_id, rank) ranking (r12 eval verb)."""
        from python_openetl_spark.operators.retrieval import retrieval_eval

        q = qrels.df if isinstance(qrels, Dataset) else qrels
        return Dataset(retrieval_eval(self.df, q, **kw))

    def maxsim_topk(self, queries: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.late_interaction import maxsim_topk

        q = queries.df if isinstance(queries, Dataset) else queries
        return Dataset(maxsim_topk(self.df, q, **kw))

    def blocked_fuzzy_pairs(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import blocked_fuzzy_pairs

        return Dataset(blocked_fuzzy_pairs(self.df, **kw))

    def paragraph_dedup(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.dedup import paragraph_dedup

        return Dataset(paragraph_dedup(self.df, **kw))

    def cdc_chunk_near_dup(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.multimodal import cdc_chunk_near_dup

        return Dataset(cdc_chunk_near_dup(self.df, **kw))

    def url_dedup(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.urlops import url_dedup

        return Dataset(url_dedup(self.df, **kw))

    def domain_cap_sample(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.urlops import domain_cap_sample

        return Dataset(domain_cap_sample(self.df, **kw))

    def token_kl_divergence(self, other: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.textops import token_kl_divergence

        o = other.df if isinstance(other, Dataset) else other
        return Dataset(token_kl_divergence(self.df, o, **kw))

    def pagerank(self, **kw) -> "Dataset":
        from python_openetl_spark.operators.linkrank import pagerank

        return Dataset(pagerank(self.df, **kw))

    def run_checks(self, checks: list, table_name: str = "dataset") -> "Dataset":
        from python_openetl_spark.operators.quality import run_checks

        return Dataset(run_checks(self.df, checks, table_name))

    def quarantine_split(self, checks: list) -> "tuple[Dataset, Dataset]":
        from python_openetl_spark.operators.quality import quarantine_split

        good, bad = quarantine_split(self.df, checks)
        return Dataset(good), Dataset(bad)

    def k_anonymity_report(self, quasi_cols: list[str], k: int = 5) -> "Dataset":
        from python_openetl_spark.operators.privacy import k_anonymity_report

        return Dataset(k_anonymity_report(self.df, quasi_cols, k))

    def bpe_train(self, iters: int = 3, text_col: str = "text", **kw) -> "Dataset":
        from python_openetl_spark.operators.bpe import bpe_train, word_counts

        return Dataset(bpe_train(word_counts(self.df, text_col), iters=iters, **kw))

    def gap_fill(self, keys, date_col: str, **kw) -> "Dataset":
        from python_openetl_spark.operators.timeseries import gap_fill

        return Dataset(gap_fill(self.df, keys, date_col, **kw))

    def matryoshka_topk(self, queries: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.similarity import matryoshka_topk

        q = queries.df if isinstance(queries, Dataset) else queries
        return Dataset(matryoshka_topk(self.df, q, **kw))

    def quantized_topk(self, queries: "Dataset | DataFrame", **kw) -> "Dataset":
        from python_openetl_spark.operators.similarity import quantized_topk

        q = queries.df if isinstance(queries, Dataset) else queries
        return Dataset(quantized_topk(self.df, q, **kw))


class Engine:
    """Session + sources + pipeline verbs in one handle."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = tune_session(spark) if spark is not None else get_spark()

    def doctor(self) -> list:
        """Which environment-gated features would activate here
        (doctor.doctor with this engine's live session — probes the JVM
        classpath for connector jars and Python for codec/credential
        runtimes)."""
        from python_openetl_spark.doctor import doctor

        return doctor(self.spark)

    # --- sources (S1-S8 via the registry) -----------------------------------
    def read(self, spec: dict) -> Dataset:
        return Dataset(registry.read(self.spark, spec))

    def table(self, sf_dir: str, name: str) -> Dataset:
        from python_openetl_spark.io import load_table

        return Dataset(load_table(self.spark, sf_dir, name))

    def sql(self, query: str) -> Dataset:
        """The raw-SQL surface (K4) — parameterize via temp views."""
        return Dataset(self.spark.sql(query))

    # --- pipeline verbs (C1-C3, K6) -----------------------------------------
    def seed(self, source: Dataset | DataFrame, dest: str, **kw) -> ParquetTable:
        df = source.df if isinstance(source, Dataset) else source
        return seed(df, dest, **kw)

    def upsert_sync(self, source: Dataset | DataFrame, dest: str, **kw) -> SyncMetrics:
        df = source.df if isinstance(source, Dataset) else source
        return upsert_sync(self.spark, df, dest, **kw)

    def ingest_tarball(self, tar_path: str, dest_dir: str, **kw) -> dict[str, ParquetTable]:
        return ingest_tarball(self.spark, tar_path, dest_dir, **kw)

    def publish_all(self, publishes: list) -> None:
        """Multi-table atomic publish (plans.txn.publish_all): pass a
        list of ``txn.Publish(table, df, partition_by)``."""
        from python_openetl_spark.plans.txn import publish_all

        publish_all(publishes)

    def safe_append(
        self, target: Dataset | DataFrame, rows: Dataset | DataFrame, pk: str = "id"
    ) -> Dataset:
        from python_openetl_spark.operators.merge import safe_append

        t = target.df if isinstance(target, Dataset) else target
        r = rows.df if isinstance(rows, Dataset) else rows
        return Dataset(safe_append(t, r, pk))
