"""Distributed BPE tokenizer merge training (byte-pair encoding).

The tokenizer-training step of a large-scale training-data pipeline:
given a document corpus, learn the first ``iters`` BPE merges by
globally counting adjacent symbol pairs and greedily merging the most
frequent pair each round (Sennrich et al. 2016, public algorithm).

Spark-first design for 100 TB corpora:

- The corpus collapses to the **distinct-word frequency table** first
  (one shuffle, map-side combined). Every later iteration runs over
  the vocabulary (``|V|`` rows, millions at web scale), never the raw
  corpus — the classic trick that makes BPE training corpus-size
  independent after one pass.
- Each word is represented as its symbol sequence joined by an
  unprintable separator (``\\x1f``). Pair counting is pure JVM
  expressions (split → slice → arrays_zip → explode → sum), fully
  whole-stage-codegen'd; applying a merge is a token-exact left-to-
  right fold (``aggregate`` over the split sequence): append each
  token, fusing it into the previous one exactly when the previous
  WHOLE token is ``l`` and the current is ``r``. A plain string
  ``replace`` of ``l+SEP+r`` would also match when ``l`` is merely the
  *suffix* of a longer merged token (e.g. pair ``(b,c)`` corrupting
  ``[ab, c]`` into ``[abc]``) — the fold can't, and it reproduces
  BPE's greedy non-overlapping order including ``l==r`` chains
  (``aaaa -> [aa][aa]``). Property-tested against a single-node
  reference trainer (tests/test_properties.py).
- Per iteration the driver collects **one row** (the winning pair) —
  the same tiny driver action per merge that single-node BPE trainers
  perform; the vocabulary itself never leaves the executors. The
  seed vocabulary is cached so iteration *k* re-runs only the *k*
  accumulated ``replace`` expressions, not the corpus scan.
- Ties are broken (freq DESC, left ASC, right ASC) so the learned
  merge table is deterministic across partitionings and engines.

For learning thousands of merges, batch variants pick the top-m
non-interacting pairs per round to amortize the per-iteration job;
the greedy top-1 loop here is the reference semantics the batch
variant must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: symbol separator inside a word's sequence encoding (unprintable, so
#: it cannot collide with corpus text symbols)
SEP = "\x1f"

MERGES_SCHEMA = StructType(
    [
        StructField("iteration", LongType(), False),
        StructField("left_tok", StringType(), False),
        StructField("right_tok", StringType(), False),
        StructField("pair_freq", LongType(), False),
    ]
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table: lowercase, split on whitespace,
    drop empties. One map-side-combined shuffle over the corpus."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the sequence column, weighted by
    word count. All JVM expressions — no Python in the loop."""
    arr = F.split(F.col("seq"), SEP)
    n = F.size(arr)
    step = seqs.select(
        "cnt",
        F.slice(arr, F.lit(1), n - 1).alias("ls"),
        F.slice(arr, F.lit(2), n - 1).alias("rs"),
    )
    return (
        step.select("cnt", F.explode(F.arrays_zip("ls", "rs")).alias("p"))
        .select("cnt", F.col("p.ls").alias("l"), F.col("p.rs").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("cnt").alias("freq"))
    )


def _apply_merge(seq, left: str, right: str):
    """Greedy left-to-right merge of adjacent tokens (left, right) in a
    SEP-joined sequence, token-exact (see module docstring)."""
    sep_l = F.lit(SEP + left)

    def step(acc, x):
        prev_is_left = (acc == F.lit(left)) | acc.endswith(sep_l)
        return (
            F.when(acc == F.lit(""), x)
            .when(prev_is_left & (x == F.lit(right)), F.concat(acc, x))
            .otherwise(F.concat(acc, F.lit(SEP), x))
        )

    return F.aggregate(F.split(seq, SEP), F.lit(""), step)


def bpe_train(words: DataFrame, iters: int = 3) -> DataFrame:
    """Learn the first ``iters`` BPE merges from a word-frequency table
    (output of :func:`word_counts`). Returns the merge table
    ``(iteration, left_tok, right_tok, pair_freq)`` in learned order.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = words.sparkSession
    seqs = words.select(
        "cnt", F.array_join(F.split(F.col("word"), ""), SEP).alias("seq")
    ).cache()
    try:
        merges: list[tuple[int, str, str, int]] = []
        cur = seqs
        for it in range(1, iters + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("freq"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:  # vocabulary fully merged / single-char words only
                break
            row = top[0]
            merges.append((it, row["l"], row["r"], row["freq"]))
            cur = cur.withColumn(
                "seq", _apply_merge(F.col("seq"), row["l"], row["r"])
            )
        return spark.createDataFrame(merges, MERGES_SCHEMA)
    finally:
        seqs.unpersist()
