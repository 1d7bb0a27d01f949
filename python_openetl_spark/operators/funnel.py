"""Strict-sequence pattern matching over event streams — the common
MATCH_RECOGNIZE shape (Flink CEP / Trino MATCH_RECOGNIZE / product-
analytics "did the session convert directly"), generalized from the
q80 window-adjacency device to arbitrary step lists with per-step
predicates and per-transition time bounds.

Reference parity note: tmccall8829/python-openetl has no event-pattern
operator (it is row-level ETL, openetl/etl.py); this module is part of
the beyond-reference analytics surface (SURVEY.md §2, r9 verdict #8).

Why not a self-join per step: an n-step pattern as n-1 time-range
self-joins explodes on hot users (every funnel builder's first
mistake) and re-shuffles the event table n times. The window-adjacency
form pays ONE shuffle — partition by the entity, order by event time —
and evaluates every step predicate as a cheap boolean projection
BEFORE the window, so the only values carried through ``lead`` are
booleans and the event-time micros, never the event payload. Matching
is then a single filter: row r starts a match iff p0(r) and
p1(lead(r,1)) … and every transition gap is within its bound. All
JVM-side, one WholeStageCodegen span around the projection + filter;
scale-wise the cost is the one sort-shuffle of (entity, us, n booleans)
— the same shape at 100 TB, with AQE handling hot-entity skew.

Strictness semantics: steps must be ADJACENT events in the entity's
ordered stream (MATCH_RECOGNIZE with no gaps allowed, q80's contract).
Overlapping matches all report (a row may participate in several
matches at different offsets); total order within an entity comes from
``(time_col, tiebreak_col)`` so ties cannot flip matches between
engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lead_frame(
    events: DataFrame,
    steps: Sequence[Column | str],
    partition_col: str,
    time_col: str,
    tiebreak_col: str,
    max_gap_us: "int | Sequence[int] | None",
    caller: str,
):
    """Shared core of :func:`match_sequence` and :func:`funnel_report`:
    validate steps/gaps, project the step predicates to booleans BEFORE
    the one entity-partitioned window, lead the (bool × n, micros)
    frame, and return ``(led, prefix_conds)`` where ``prefix_conds[i]``
    is the full match condition truncated after step i — the two
    public operators differ only in what they do with the conditions,
    and sharing the frame keeps their semantics in lockstep (q80/q81
    pin one, q82 the other, against the same oracle frame)."""
    n = len(steps)
    if n == 0:
        raise ValueError(f"{caller}: steps must be non-empty")
    preds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    if max_gap_us is None:
        gaps: "list[int | None]" = [None] * (n - 1)
    elif isinstance(max_gap_us, int):
        gaps = [max_gap_us] * (n - 1)
    else:
        gaps = list(max_gap_us)
        if len(gaps) != n - 1:
            raise ValueError(
                f"{caller}: {n} steps need {n - 1} gap bounds, got {len(gaps)}"
            )
    w = Window.partitionBy(partition_col).orderBy(time_col, tiebreak_col)
    base = events.select(
        partition_col,
        time_col,
        tiebreak_col,
        F.unix_micros(F.col(time_col)).alias("__us0"),
        *[
            F.coalesce(p.cast("boolean"), F.lit(False)).alias(f"__p{i}")
            for i, p in enumerate(preds)
        ],
    )
    led = base.select(
        partition_col,
        "__us0",
        "__p0",
        *[F.lead(f"__p{i}", i).over(w).alias(f"__q{i}") for i in range(1, n)],
        *[F.lead("__us0", i).over(w).alias(f"__us{i}") for i in range(1, n)],
    )
    conds = []
    cond = F.col("__p0")
    for i in range(n):
        if i > 0:
            cond = cond & F.coalesce(F.col(f"__q{i}"), F.lit(False))
            if gaps[i - 1] is not None:
                cond = cond & (
                    F.col(f"__us{i}") - F.col(f"__us{i - 1}")
                    <= F.lit(int(gaps[i - 1]))
                )
        conds.append(cond)
    return led, conds


def funnel_first_touch(
    events: DataFrame,
    steps: Sequence[Column | str],
    *,
    partition_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_gap_us: "int | Sequence[int] | None" = None,
) -> DataFrame:
    """Relaxed ("eventually-after") funnel — the semantics product
    analytics tools actually ship: per entity, step i counts if it
    happened ANY TIME strictly after the entity's first-touch time of
    step i-1 (optionally within a per-transition bound), not as the
    adjacent next event. First-touch chaining is the standard
    definition: ``t1`` is the FIRST step-1 event; ``t_i`` is the first
    step-i event with ``us > t_{i-1}`` (and ``us - t_{i-1} <=
    max_gap_us[i-1]`` when bounded). A step-2 event that is within the
    gap of a LATER step-1 event but not of the first one does NOT
    convert — both this operator and any min-of-first-match SQL
    formulation agree on that, which is what makes the semantics
    deterministic.

    Not n self-joins: each ``t_i`` is a RUNNING MIN over the same
    ``(entity, time, tiebreak)``-sorted frame — ``r_{i-1}(q)`` (the
    first-touch of step i-1 as of row q) is already a column when step
    i's qualifying condition is projected, so the whole chain is n
    stacked Window operators over ONE exchange + ONE sort (Spark only
    re-sorts when the child ordering changes), carrying micros +
    booleans, never the payload. The per-entity rollup then
    partial-aggregates map-side. Same one-shuffle shape at 100 TB as
    the strict funnel; hot-entity skew lands on AQE like every other
    entity-partitioned window here.

    Returns one row per entity that entered the funnel (``step_us_1``
    non-NULL): ``(partition_col, step_us_1 .. step_us_n, depth)`` where
    ``step_us_i`` is the first-touch micros of step i (NULL after the
    drop-off point) and ``depth`` is the number of completed steps. A
    NULL entity forms one group, exactly like SQL GROUP BY; callers
    that want it gone filter it (q83 does, so its oracle can use plain
    equi-joins, where NULL keys never match)."""
    n = len(steps)
    if n == 0:
        raise ValueError("funnel_first_touch: steps must be non-empty")
    preds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    if max_gap_us is None:
        gaps: "list[int | None]" = [None] * (n - 1)
    elif isinstance(max_gap_us, int):
        gaps = [max_gap_us] * (n - 1)
    else:
        gaps = list(max_gap_us)
        if len(gaps) != n - 1:
            raise ValueError(
                f"funnel_first_touch: {n} steps need {n - 1} gap bounds, "
                f"got {len(gaps)}"
            )
    w_run = (
        Window.partitionBy(partition_col)
        .orderBy(time_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = events.select(
        partition_col,
        time_col,
        tiebreak_col,
        F.unix_micros(F.col(time_col)).alias("__us"),
        *[
            F.coalesce(p.cast("boolean"), F.lit(False)).alias(f"__p{i}")
            for i, p in enumerate(preds)
        ],
    )
    # __f0 is the qualifying time of step 1 (no predecessor); each
    # __r{i} is that step's running first-touch, consumed by step i+1's
    # qualifying condition one select later. All the same window spec.
    cur = cur.withColumn("__f0", F.when(F.col("__p0"), F.col("__us")))
    for i in range(1, n):
        cur = cur.withColumn(f"__r{i - 1}", F.min(f"__f{i - 1}").over(w_run))
        cond = F.col(f"__p{i}") & (F.col("__us") > F.col(f"__r{i - 1}"))
        if gaps[i - 1] is not None:
            cond = cond & (
                F.col("__us") - F.col(f"__r{i - 1}")
                <= F.lit(int(gaps[i - 1]))
            )
        cur = cur.withColumn(f"__f{i}", F.when(cond, F.col("__us")))
    per_entity = cur.groupBy(partition_col).agg(
        *[F.min(f"__f{i}").alias(f"step_us_{i + 1}") for i in range(n)]
    )
    depth = None
    for i in range(n):
        hit = F.col(f"step_us_{i + 1}").isNotNull().cast("int")
        depth = hit if depth is None else depth + hit
    return per_entity.filter(F.col("step_us_1").isNotNull()).select(
        partition_col,
        *[f"step_us_{i + 1}" for i in range(n)],
        depth.alias("depth"),
    )


def match_sequence(
    events: DataFrame,
    steps: Sequence[Column | str],
    *,
    partition_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_gap_us: "int | Sequence[int] | None" = None,
) -> DataFrame:
    """Match a strict (adjacent-event) sequence pattern per entity.

    Parameters
    ----------
    steps:
        One row-predicate per step — a boolean ``Column`` or a SQL
        expression string over the event columns (evaluated with
        ``F.expr``). NULL predicate results count as non-matches.
    max_gap_us:
        Per-transition upper bound on ``us[i+1] - us[i]`` in
        microseconds: a single int (applied to every transition), a
        sequence of ``len(steps) - 1`` ints, or None (no time bound).
        Gaps are measured between CONSECUTIVE steps, not from the
        match start.

    Returns one row per match: ``(partition_col, start_us, end_us,
    step_us array<long>)`` where ``start_us``/``end_us`` are the
    event-time micros of the first/last step. Callers roll up from
    there (see ``q80``'s count + first-match aggregate).
    """
    n = len(steps)
    led, conds = _lead_frame(
        events, steps, partition_col, time_col, tiebreak_col, max_gap_us,
        "match_sequence",
    )
    return led.filter(conds[-1]).select(
        partition_col,
        F.col("__us0").alias("start_us"),
        F.col(f"__us{n - 1}" if n > 1 else "__us0").alias("end_us"),
        F.array(*[F.col(f"__us{i}") for i in range(n)]).alias("step_us"),
    )


def funnel_report(
    events: DataFrame,
    steps: Sequence[Column | str],
    *,
    partition_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_gap_us: "int | Sequence[int] | None" = None,
    mode: str = "strict",
) -> DataFrame:
    """The drop-off report over the same one-shuffle adjacency frame:
    for every step prefix ``1..n``, how many strict-sequence matches
    begin somewhere in the stream and how many distinct entities have
    at least one — the "funnel chart" numbers product analytics reads
    (step 1 = entities that did the first action at all; conversion
    ratios are counts the caller divides, kept as exact longs here).

    One window, one event-sized shuffle: every prefix condition comes
    from the SAME :func:`_lead_frame` ``match_sequence`` uses (a
    prefix match is the full-match condition truncated at step i), so
    adding steps widens the projection, never adds shuffles; the
    per-entity rollup exchange carries map-side-combined partials
    only. A NULL entity's rows count in ``n_matches`` but never in
    ``n_entities`` (matching SQL ``COUNT(DISTINCT entity)``, which
    ignores NULL — the q82 oracle's semantics). Returns ``(step,
    n_matches, n_entities)`` with ``step`` 1-based in declaration
    order.

    ``mode="first_touch"`` reports the relaxed
    :func:`funnel_first_touch` semantics instead (step i any time
    after step i-1's first touch): each entity converts at most once,
    so ``n_matches`` counts converting entities including a NULL
    entity group while ``n_entities`` keeps the COUNT(DISTINCT)
    NULL-exclusion, mirroring strict mode's columns."""
    if mode == "first_touch":
        ft = funnel_first_touch(
            events,
            steps,
            partition_col=partition_col,
            time_col=time_col,
            tiebreak_col=tiebreak_col,
            max_gap_us=max_gap_us,
        )
        n = len(steps)
        agg = ft.agg(
            *[
                F.sum(
                    F.col(f"step_us_{i + 1}").isNotNull().cast("long")
                ).alias(f"__nm{i}")
                for i in range(n)
            ],
            *[
                F.sum(
                    (
                        F.col(f"step_us_{i + 1}").isNotNull()
                        & F.col(partition_col).isNotNull()
                    ).cast("long")
                ).alias(f"__ne{i}")
                for i in range(n)
            ],
        )
        stack = ", ".join(f"{i + 1}, __nm{i}, __ne{i}" for i in range(n))
        return agg.select(
            F.expr(f"stack({n}, {stack}) as (step, n_matches, n_entities)")
        ).select(
            F.col("step").cast("int").alias("step"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce("n_entities", F.lit(0)).cast("long").alias("n_entities"),
        )
    if mode != "strict":
        raise ValueError(f"funnel_report: unknown mode {mode!r}")
    n = len(steps)
    led, conds = _lead_frame(
        events, steps, partition_col, time_col, tiebreak_col, max_gap_us,
        "funnel_report",
    )
    marked = led.select(
        partition_col, *[c.alias(f"__m{i}") for i, c in enumerate(conds)]
    )
    # per-entity rollup FIRST (sum + max of each flag), which removes
    # every count_distinct — the multi-distinct Expand plan would
    # re-shuffle EVENT-sized data n times. Here event rows cross one
    # exchange (the window's); the rollup partial-aggregates map-side,
    # so its exchange carries one row per (entity, task) — entity-
    # sized. The global agg then reads one row per entity.
    per_entity = marked.groupBy(partition_col).agg(
        *[
            F.sum(F.col(f"__m{i}").cast("long")).alias(f"__nm{i}")
            for i in range(n)
        ],
        *[F.max(F.col(f"__m{i}")).alias(f"__e{i}") for i in range(n)],
    )
    agg = per_entity.agg(
        *[F.sum(f"__nm{i}").alias(f"__nm{i}") for i in range(n)],
        *[
            F.sum(
                (
                    F.col(f"__e{i}") & F.col(partition_col).isNotNull()
                ).cast("long")
            ).alias(f"__ne{i}")
            for i in range(n)
        ],
    )
    stack = ", ".join(f"{i + 1}, __nm{i}, __ne{i}" for i in range(n))
    return agg.select(
        F.expr(f"stack({n}, {stack}) as (step, n_matches, n_entities)")
    ).select(
        F.col("step").cast("int").alias("step"),
        F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        # SUM over an empty frame is NULL; the report's contract is 0
        F.coalesce("n_entities", F.lit(0)).cast("long").alias("n_entities"),
    )
