"""operators/funnel.py — generalized strict-sequence matching
(r9 verdict #8: q80's window-adjacency device as a parameterized
operator with per-step predicates and per-transition time bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.funnel import funnel_report, match_sequence

US = 1_000_000


def _events(spark, rows):
    # rows: (event_id, user_id|None, sec, event_type, value)
    return spark.createDataFrame(
        [
            (eid, uid, sec * US, et, v)
            for eid, uid, sec, et, v in rows
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


def _steps3():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.col("event_type") == "a",
        F.col("event_type") == "b",
        F.col("event_type") == "c",
    ]


def test_adjacency_is_strict(spark):
    """An intervening event between steps kills the match — that is
    the contract that distinguishes this from q61's eventually-funnel."""
    ok = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 10, "b", 1.0), (3, 1, 20, "c", 1.0)])
    gap = _events(
        spark,
        [(1, 2, 0, "a", 1.0), (2, 2, 5, "x", 1.0), (3, 2, 10, "b", 1.0), (4, 2, 20, "c", 1.0)],
    )
    assert match_sequence(ok, _steps3()).count() == 1
    assert match_sequence(gap, _steps3()).count() == 0
    r = match_sequence(ok, _steps3()).first()
    assert r["start_us"] == 0 and r["end_us"] == 20 * US
    assert r["step_us"] == [0, 10 * US, 20 * US]


def test_per_transition_gap_bounds(spark):
    """Gaps are per-TRANSITION: [15s, 5s] accepts (0,10,14) but not
    (0,10,16); a single int applies to every transition."""
    ev = _events(
        spark,
        [(1, 1, 0, "a", 1.0), (2, 1, 10, "b", 1.0), (3, 1, 14, "c", 1.0),
         (4, 2, 0, "a", 1.0), (5, 2, 10, "b", 1.0), (6, 2, 16, "c", 1.0)],
    )
    got = {
        r["user_id"]
        for r in match_sequence(ev, _steps3(), max_gap_us=[15 * US, 5 * US]).collect()
    }
    assert got == {1}
    assert match_sequence(ev, _steps3(), max_gap_us=20 * US).count() == 2
    assert match_sequence(ev, _steps3(), max_gap_us=None).count() == 2


def test_overlapping_matches_all_report(spark):
    """a b a b c: the trailing (a b c)? No — strict adjacency means
    only rows 3,4,5 form a match; rows 1,2 are broken by row 3.
    But a a b c yields one match (second a); a b c b c from a
    predicate that repeats yields every aligned occurrence."""
    ev = _events(
        spark,
        [(1, 1, 0, "a", 1.0), (2, 1, 1, "b", 1.0), (3, 1, 2, "a", 1.0),
         (4, 1, 3, "b", 1.0), (5, 1, 4, "c", 1.0)],
    )
    rows = match_sequence(ev, _steps3()).collect()
    assert len(rows) == 1 and rows[0]["start_us"] == 2 * US


def test_string_predicates_and_null_handling(spark):
    """SQL-string steps work; a NULL predicate result (NULL value
    compared) is a non-match, not an error."""
    ev = _events(
        spark,
        [(1, 1, 0, "a", None), (2, 1, 1, "b", 2.0),
         (3, 2, 0, "a", 5.0), (4, 2, 1, "b", 2.0)],
    )
    m = match_sequence(ev, ["event_type = 'a' AND value > 1", "event_type = 'b'"])
    assert {r["user_id"] for r in m.collect()} == {2}


def test_single_step_and_errors(spark):
    ev = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 1, "b", 1.0)])
    m = match_sequence(ev, [F.col("event_type") == "b"])
    r = m.first()
    assert m.count() == 1 and r["start_us"] == r["end_us"] == 1 * US
    with pytest.raises(ValueError, match="non-empty"):
        match_sequence(ev, [])
    with pytest.raises(ValueError, match="gap bounds"):
        match_sequence(ev, _steps3(), max_gap_us=[1])


def test_tiebreak_totalizes_same_timestamp(spark):
    """Same-ts events order by event_id, so the match is deterministic
    under any partitioning (the q77 tiebreak rule)."""
    ev = _events(
        spark,
        [(2, 1, 0, "b", 1.0), (1, 1, 0, "a", 1.0), (3, 1, 1, "c", 1.0)],
    )
    assert match_sequence(ev, _steps3()).count() == 1


def test_one_exchange_and_no_payload_in_window(spark):
    """Plan shape: exactly one shuffle (the user partitioning) feeds
    the window; the lead columns are booleans + micros, so the sort
    never carries event payloads."""
    ev = _events(spark, [(i, i % 7, i, "a", 1.0) for i in range(100)])
    plan = (
        match_sequence(ev, _steps3(), max_gap_us=60 * US)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_report_counts_and_one_shuffle(spark):
    """q82's operator: per-prefix match and entity counts over one lead
    frame; a user matching twice counts twice in n_matches, once in
    n_entities; steps with zero matches report (0, 0); one exchange."""
    ev = _events(
        spark,
        [
            # user 1: two full a->b runs, no c close enough
            (1, 1, 0, "a", 1.0), (2, 1, 1, "b", 1.0),
            (3, 1, 10, "a", 1.0), (4, 1, 11, "b", 1.0),
            (5, 1, 100, "c", 1.0),
            # user 2: a only
            (6, 2, 0, "a", 1.0),
        ],
    )
    rep = funnel_report(
        ev,
        _steps3(),
        max_gap_us=[5 * US, 5 * US],
    )
    rows = {r["step"]: (r["n_matches"], r["n_entities"]) for r in rep.collect()}
    assert rows == {1: (3, 2), 2: (2, 1), 3: (0, 0)}
    # event rows cross exactly one exchange (the window's); the
    # per-entity rollup partial-aggregates map-side, so its exchange
    # carries entity-sized partials — 2 hash exchanges total, and
    # crucially NO multi-distinct Expand replan (which would re-shuffle
    # event-sized data once per step)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Expand" not in plan, plan


def test_funnel_report_null_entity_semantics(spark):
    """A NULL user's matching rows count in n_matches but never in
    n_entities — SQL COUNT(DISTINCT user_id) ignores NULL, and the
    q82 oracle relies on that agreement."""
    ev = _events(
        spark,
        [(1, 1, 0, "a", 1.0), (2, None, 0, "a", 1.0), (3, None, 5, "a", 1.0)],
    )
    rows = {
        r["step"]: (r["n_matches"], r["n_entities"])
        for r in funnel_report(ev, [F.col("event_type") == "a"]).collect()
    }
    assert rows == {1: (3, 1)}


def test_first_touch_relaxed_vs_strict(spark):
    """r10 verdict #2: the relaxed funnel converts on 'step i ANY TIME
    after step i-1's first touch' — an intervening event (which kills
    the strict match) does not matter."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = _events(
        spark,
        [(1, 2, 0, "a", 1.0), (2, 2, 5, "x", 1.0), (3, 2, 10, "b", 1.0), (4, 2, 20, "c", 1.0)],
    )
    assert match_sequence(ev, _steps3()).count() == 0
    r = funnel_first_touch(ev, _steps3()).first()
    assert (r["step_us_1"], r["step_us_2"], r["step_us_3"], r["depth"]) == (
        0, 10 * US, 20 * US, 3
    )


def test_first_touch_chains_from_first_match_only(spark):
    """First-touch means FIRST: a step-2 event within the gap of a
    LATER step-1 event but not of the first one does NOT convert —
    the subtlety that makes the semantics deterministic and the
    min-of-first-match oracle formulation exact."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = _events(
        spark,
        [
            (1, 1, 0, "a", 1.0),      # first touch of step 1
            (2, 1, 100, "a", 1.0),    # later step-1 event
            (3, 1, 105, "b", 1.0),    # within 10s of the LATER a only
        ],
    )
    r = funnel_first_touch(
        ev, [F.col("event_type") == "a", F.col("event_type") == "b"],
        max_gap_us=10 * US,
    ).first()
    assert r["step_us_1"] == 0 and r["step_us_2"] is None and r["depth"] == 1


def test_first_touch_gap_boundary_and_ties(spark):
    """The gap bound is inclusive (<=); a same-timestamp step-2 event
    is NOT 'strictly after' step 1 and never converts."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    steps2 = [F.col("event_type") == "a", F.col("event_type") == "b"]
    at_bound = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 10, "b", 1.0)])
    r = funnel_first_touch(at_bound, steps2, max_gap_us=10 * US).first()
    assert r["step_us_2"] == 10 * US and r["depth"] == 2
    past_bound = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 11, "b", 1.0)])
    r = funnel_first_touch(past_bound, steps2, max_gap_us=10 * US).first()
    assert r["step_us_2"] is None and r["depth"] == 1
    tie = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 0, "b", 1.0)])
    r = funnel_first_touch(tie, steps2).first()
    assert r["step_us_2"] is None and r["depth"] == 1


def test_first_touch_entities_without_step1_dropped(spark):
    """Only entities that entered the funnel report rows; a NULL
    entity forms one group like SQL GROUP BY."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = _events(
        spark,
        [
            (1, 1, 0, "b", 1.0),          # never did step 1 -> no row
            (2, None, 0, "a", 1.0),       # NULL group enters funnel
            (3, None, 5, "b", 1.0),
        ],
    )
    rows = funnel_first_touch(
        ev, [F.col("event_type") == "a", F.col("event_type") == "b"]
    ).collect()
    assert len(rows) == 1 and rows[0]["user_id"] is None
    assert rows[0]["depth"] == 2


def test_first_touch_report_mode_and_errors(spark):
    """funnel_report(mode='first_touch'): one match per entity, NULL
    group in n_matches only; unknown modes and wrong gap counts raise."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = _events(
        spark,
        [
            (1, 1, 0, "a", 1.0), (2, 1, 5, "b", 1.0),
            (3, 1, 10, "a", 1.0), (4, 1, 15, "b", 1.0),  # same entity again
            (5, None, 0, "a", 1.0), (6, None, 5, "b", 1.0),
            (7, 2, 0, "a", 1.0),
        ],
    )
    steps2 = [F.col("event_type") == "a", F.col("event_type") == "b"]
    rows = {
        r["step"]: (r["n_matches"], r["n_entities"])
        for r in funnel_report(ev, steps2, mode="first_touch").collect()
    }
    # entity 1 converts ONCE (first touch), NULL group converts but is
    # excluded from n_entities, entity 2 stops at step 1
    assert rows == {1: (3, 2), 2: (2, 1)}
    with pytest.raises(ValueError, match="mode"):
        funnel_report(ev, steps2, mode="loose")
    with pytest.raises(ValueError, match="gap bounds"):
        funnel_first_touch(ev, steps2, max_gap_us=[1, 2])


def test_first_touch_one_exchange_plan(spark):
    """Scale shape: the chained running-min windows share ONE sort +
    ONE exchange (same window spec); the per-entity rollup adds one
    entity-sized exchange; no Expand, no self-joins."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = _events(spark, [(i, i % 7, i, "abc"[i % 3], 1.0) for i in range(100)])
    df = funnel_first_touch(ev, _steps3(), max_gap_us=60 * US)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Expand" not in plan, plan
    assert plan.count("Sort ") <= 2, plan
    assert "Join" not in plan, plan


def test_strict_gap_exactly_at_boundary_and_all_null_entities(spark):
    """r10 verdict #4 hostile shapes for q82's operator: a transition
    gap landing EXACTLY on the bound converts (<=, both engines); a
    stream whose every entity is NULL reports n_matches > 0 with
    n_entities == 0 on every step."""
    steps2 = [F.col("event_type") == "a", F.col("event_type") == "b"]
    at_bound = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 10, "b", 1.0)])
    rows = {
        r["step"]: (r["n_matches"], r["n_entities"])
        for r in funnel_report(at_bound, steps2, max_gap_us=10 * US).collect()
    }
    assert rows == {1: (1, 1), 2: (1, 1)}
    past = _events(spark, [(1, 1, 0, "a", 1.0), (2, 1, 11, "b", 1.0)])
    rows = {
        r["step"]: (r["n_matches"], r["n_entities"])
        for r in funnel_report(past, steps2, max_gap_us=10 * US).collect()
    }
    assert rows == {1: (1, 1), 2: (0, 0)}
    all_null = _events(
        spark,
        [(1, None, 0, "a", 1.0), (2, None, 5, "b", 1.0), (3, None, 50, "a", 1.0)],
    )
    for mode in ("strict", "first_touch"):
        rows = {
            r["step"]: (r["n_matches"], r["n_entities"])
            for r in funnel_report(
                all_null, steps2, max_gap_us=10 * US, mode=mode
            ).collect()
        }
        expected_m1 = 2 if mode == "strict" else 1
        assert rows == {1: (expected_m1, 0), 2: (1, 0)}, (mode, rows)
