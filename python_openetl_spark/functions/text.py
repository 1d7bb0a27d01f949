"""Text-analysis column functions for the LLM-data pipeline operators.

All functions are built from JVM-side `pyspark.sql.functions` (no Python
UDFs — they stay inside whole-stage codegen and scale linearly with
executors). Each has an exact DuckDB-SQL twin used by the oracle tests;
the shared definitions (token pattern, shingle construction, hash
scheme) are documented here and mirrored in workload/llm.py.

Hash scheme note: MinHash uses the *lexicographic min of
``md5(seed || ':' || shingle)`` hex strings* — md5 produces identical
lowercase hex in Spark and DuckDB, and min-of-hash over a random-oracle
hash family is the standard min-wise scheme (the seed prefix gives
independent permutations). SimHash derives a 60-bit integer from the
first 15 md5 hex chars. This keeps every operator engine-checkable
without custom UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Word tokenizer: lowercase, split on non-alphanumerics, drop empties.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: BPE-ish token pattern: runs of letters, runs of digits, or single
#: non-space punctuation — a cheap proxy for subword token counting.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

#: Stopword sets for the n-gram/stopword language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}


def tokens(col: Column | str) -> Column:
    """lower → split on non-alphanumeric → drop empty strings."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count via regexp extraction (cheap BPE proxy)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), F.lit(0)))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) from a token array; empty when the
    document has fewer than ``n`` tokens."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, make).otherwise(F.array().cast("array<string>"))


def text_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-grams straight from raw text: exactly
    ``shingles(tokens(col), n)`` but one codegen'd regex pass.

    ``shingles`` is a higher-order ``transform`` whose per-index
    ``slice`` + ``array_join`` falls out of whole-stage codegen and
    allocates per shingle (~13× slower on the documents fixture).
    Here the normalized text (single-space tokens, the same
    tokenization as ``tokens``) is scanned once with a lookahead
    capture — ``(?=(tok (n-1 times) tok))tok ?`` — which emits the
    n-gram starting at every token position. Verified element-equal
    to ``shingles(tokens(col), n)`` for n∈{2,3,5} on the fixture
    corpus (tests/test_llm_ops.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    pat = "(?=((?:[a-z0-9]+ ){%d}[a-z0-9]+))[a-z0-9]+ ?" % (n - 1)
    return F.regexp_extract_all(normalized_text(c), F.lit(pat), 1)


def seeded_hash(col: Column, seed: int) -> Column:
    """Deterministic, engine-portable hash: md5 hex of ``seed:value``."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def _seeded_hasher(seed: int):
    # single-arg lambda on purpose: F.transform passes the array INDEX as a
    # second argument to two-arg callables, which would clobber the seed
    return lambda x: seeded_hash(x, seed)


def minhash_signature(sh: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: per seed, the lexicographic min md5 over the
    shingle set. NULL-free only when the shingle array is non-empty."""
    return F.array(*[F.array_min(F.transform(sh, _seeded_hasher(s))) for s in range(num_hashes)])


def lsh_band_keys(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into bands; each band key = md5 of its rows.
    Docs sharing ANY band key become near-dup candidates."""
    return F.array(
        *[
            F.md5(F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band)))
            for b in range(num_bands)
        ]
    )


def token_hash60(tok: Column) -> Column:
    """60-bit integer hash of a token (first 15 md5 hex chars).

    ``conv(hex, 16, 10)`` in Spark ≡ ``('0x'||hex)::UBIGINT`` in DuckDB —
    both exact for 15 hex digits (< 2^60, no sign issues).
    """
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact-dedup fingerprinting: lowercase,
    non-alphanumerics collapsed to single spaces, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_RE, " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


def stopword_hits(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(words, x)))


def lang_id(col: Column | str) -> Column:
    """Stopword-ratio language heuristic with CJK char detection.

    Deterministic argmax (ties broken by fixed language order); 'und'
    (undetermined) when no stopwords hit at all.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(c.rlike("[\\u4e00-\\u9fff]"), F.lit("zh")).when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # fixed iteration order = deterministic tie-break
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Heuristic quality score in [0,1]: rewards mid-length documents,
    low punctuation density, and a natural stopword rate.

    score = 0.4*min(n_tokens/100,1) + 0.3*(1-punct_ratio) + 0.3*min(stop_ratio*5,1)

    Pure per-row double arithmetic — bit-identical across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(c).cast("double")
    n_punct = F.size(F.regexp_extract_all(c, F.lit("[^a-zA-Z0-9\\s]"), F.lit(0))).cast("double")
    en_stop = stopword_hits(toks, "en").cast("double")
    punct_ratio = F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, en_stop / n_tok).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
