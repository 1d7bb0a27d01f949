"""Data-quality expectations + k-anonymity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.operators import privacy
from python_openetl_spark.operators import quality as Q


def test_run_checks_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT", 100),
            (1, "F", -5.0, "9-bad", 100),       # dup key, range, regexp
            (None, "X", 20.0, "2-HIGH", 999),   # null key, bad status, orphan fk
            (3, "P", None, "3-MEDIUM", 100),    # null price
        ],
        "k long, status string, price double, prio string, fk long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "ck long")
    out = {
        r.check: (r.n_violations, r.passed)
        for r in Q.run_checks(
            df,
            [
                Q.not_null("k"),
                Q.unique("k"),
                Q.in_range("price", 0.0, 100.0),
                Q.accepted_values("status", ["O", "F", "P"]),
                Q.matches("prio", r"^[0-9]-[A-Z]+$"),
                Q.ref_integrity("fk", dim, "ck"),
            ],
            "t",
        ).collect()
    }
    assert out["not_null(k)"] == (1, False)
    assert out["unique(k)"] == (1, False)          # 3 non-null keys, 2 distinct
    assert out["in_range(price)"] == (1, False)    # -5.0 (NULL not counted)
    assert out["accepted_values(status)"] == (1, False)
    assert out["matches(prio)"] == (1, False)      # '9-bad'
    assert out["ref_integrity(fk)"] == (1, False)  # 999


def test_run_checks_single_pass_plan(spark):
    """Every non-referential check rides ONE aggregate over ONE scan —
    adding checks must not add scans."""
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    out = Q.run_checks(
        df, [Q.not_null("a"), Q.unique("a"), Q.in_range("b", 0, 10)], "t"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


def test_run_checks_all_green(spark):
    df = spark.createDataFrame([(1,), (2,)], "a long")
    rows = Q.run_checks(df, [Q.not_null("a"), Q.unique("a")], "t").collect()
    assert all(r.passed and r.n_violations == 0 for r in rows)
    assert {r.table_name for r in rows} == {"t"}


def test_k_anonymity_report_and_groups(spark):
    df = spark.createDataFrame(
        [("en", "a")] * 5 + [("en", "b")] * 2 + [("de", "a")] * 1,
        "lang string, src string",
    )
    rep = privacy.k_anonymity_report(df, ["lang", "src"], k=3).collect()[0]
    assert rep.n_groups == 3
    assert rep.n_violating_groups == 2
    assert rep.n_rows_at_risk == 3
    assert rep.min_group_size == 1
    assert not rep.is_k_anonymous
    groups = {
        (r.lang, r.src): r.group_size
        for r in privacy.k_anonymity_groups(df, ["lang", "src"], k=3).collect()
    }
    assert groups == {("en", "b"): 2, ("de", "a"): 1}


def test_k_anonymity_null_quasi_values_form_groups(spark):
    df = spark.createDataFrame(
        [("en",), (None,), (None,), (None,)], "lang string"
    )
    rep = privacy.k_anonymity_report(df, ["lang"], k=3).collect()[0]
    # the lone 'en' row violates; the NULL group has 3 members and passes
    assert rep.n_violating_groups == 1
    assert rep.n_rows_at_risk == 1


def test_pseudonymize_deterministic_joinable_nullsafe(spark):
    df = spark.createDataFrame(
        [(1, "alice@x.com", "en"), (2, "alice@x.com", "de"),
         (3, "bob@y.org", "en"), (4, None, "fr")],
        "id long, email string, lang string",
    )
    out = privacy.pseudonymize(df, ["email"], salt="s1").collect()
    toks = {r.id: r.email for r in out}
    assert toks[1] == toks[2]                      # equal value -> equal token
    assert toks[1] != toks[3]                      # distinct stays distinct
    assert toks[4] is None                         # NULL stays NULL
    assert toks[1].startswith("tok_") and len(toks[1]) == 16
    # a different salt breaks cross-dataset linkage
    other = {r.id: r.email for r in
             privacy.pseudonymize(df, ["email"], salt="s2").collect()}
    assert other[1] != toks[1]
    # untouched columns intact
    assert {r.lang for r in out} == {"en", "de", "fr"}


def test_quarantine_split_row_level_reasons(spark):
    from python_openetl_spark.operators import quality as Q

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", 100),   # clean
            (2, -1.0, "O", 100),   # range
            (3, 5.0, "Z", 100),    # accepted_values
            (4, None, "O", 100),   # NULL price: not a range violation
            (5, 5.0, "O", 999),    # orphan custkey
            (6, 5.0, "O", 100),    # duplicated key below
            (6, 7.0, "O", 100),
        ],
        "k long, price double, status string, ck long",
    )
    cust = spark.createDataFrame([(100,), (101,)], "c long")
    checks = [
        Q.in_range("price", 0.0, 50.0),
        Q.accepted_values("status", ["O", "F"]),
        Q.unique("k"),
        Q.ref_integrity("ck", cust, "c"),
    ]
    good, bad = Q.quarantine_split(df, checks)
    assert good.columns == df.columns
    assert sorted(r["k"] for r in good.collect()) == [1, 4]
    got = {(r["k"], r["price"]): r["dq_reasons"] for r in bad.collect()}
    assert got[(2, -1.0)] == "in_range(price)"
    assert got[(3, 5.0)] == "accepted_values(status)"
    assert got[(5, 5.0)] == "ref_integrity(ck)"
    assert got[(6, 5.0)] == got[(6, 7.0)] == "unique(k)"


def test_quarantine_multi_reason_order_is_declaration_order(spark):
    from python_openetl_spark.operators import quality as Q

    df = spark.createDataFrame([(1, -1.0, "Z")], "k long, price double, status string")
    bad = Q.quarantine(
        df, [Q.in_range("price", 0.0, 50.0), Q.accepted_values("status", ["O"])]
    ).filter("NOT dq_valid")
    assert bad.collect()[0]["dq_reasons"] == "in_range(price),accepted_values(status)"


def test_canonicalize_prefer_col_keeps_best_member(spark):
    from python_openetl_spark.operators.cluster import canonicalize_corpus

    docs = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 9), (3, "c", 9), (4, "d", 1)],
        "doc_id long, text string, score long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    # min-id policy keeps 1; prefer=score keeps 2 (score 9, tie vs 3 -> min id)
    kept_min = {r["doc_id"] for r in canonicalize_corpus(docs, pairs).collect()}
    assert kept_min == {1, 4}
    kept_best = {
        r["doc_id"]
        for r in canonicalize_corpus(docs, pairs, prefer_col="score").collect()
    }
    assert kept_best == {2, 4}
