"""URL canonicalization + URL-level dedup/cap operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.functions.urls import canonical_url, url_domain, url_host
from python_openetl_spark.operators.urlops import domain_cap_sample, url_dedup

CASES = [
    # (raw, canonical)
    ("https://WWW.Example.COM/Path/", "https://www.example.com/Path"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("https://example.com/a#section-2", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&q=1", "https://example.com/a?q=1"),
    ("https://example.com/a?q=1&utm_campaign=y", "https://example.com/a?q=1"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&fbclid=z&q=1", "https://example.com/a?q=1"),
    ("https://example.com/a?q=1&b=2", "https://example.com/a?q=1&b=2"),
    ("HTTPS://EXAMPLE.COM", "https://example.com"),
    ("https://example.com///", "https://example.com"),
    # query case preserved; path case preserved
    ("https://example.com/CaseS?Q=V", "https://example.com/CaseS?Q=V"),
    # scheme-less: pass through (fragment still stripped)
    ("example.com/x#f", "example.com/x"),
    (None, None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _want) in enumerate(CASES)], "i long, url string"
    )
    got = {r.i: r.c for r in df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r} want {want!r}"


def test_url_host_and_domain(spark):
    df = spark.createDataFrame(
        [
            (1, "https://News.Example.co:8080/x"),
            (2, "http://user:pw@sub.site.org/y"),
        ],
        "i long, url string",
    )
    rows = {r.i: (r.h, r.d) for r in df.select(
        "i", url_host("url").alias("h"), url_domain("url").alias("d")
    ).collect()}
    assert rows[1] == ("news.example.co", "example.co")
    assert rows[2] == ("sub.site.org", "site.org")


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.com/x?utm_source=f"),
            (2, "https://a.com/x"),
            (3, "https://a.com/x/"),
            (4, "https://a.com/other"),
        ],
        "doc_id long, url string",
    )
    got = {r.canonical_url: (r.keeper_id, r.n_dups) for r in url_dedup(df).collect()}
    assert got == {
        "https://a.com/x": (1, 3),
        "https://a.com/other": (4, 1),
    }


def test_domain_cap_sample(spark):
    rows = [(i, f"https://big.site.com/p{i}") for i in range(20)]
    rows += [(100, "https://small.org/only")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_cap_sample(df, cap=5)
    kept = out.groupBy("domain").count().collect()
    got = {r.domain: r["count"] for r in kept}
    assert got == {"site.com": 5, "small.org": 1}
    # deterministic: same call -> identical kept set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in domain_cap_sample(df, cap=5).collect()}
    assert a == b
