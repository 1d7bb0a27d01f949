"""Incremental view maintenance (IVM) for JOIN views — the counting
algorithm (Gupta & Mumick, "Maintenance of Materialized Views:
Problems, Techniques, and Applications", IEEE DE Bulletin 1995).

The reference maintains derived tables by re-running the defining
query on a sliding window (tmccall8829/python-openetl
operations.py:515-609 — correct only when changes are recent);
m07/m18 already maintain AGGREGATE views incrementally. This module
closes the remaining verb: a materialized JOIN view maintained from
CDC deltas of BOTH inputs without ever re-joining the full tables:

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

with every term MULTIPLICITY-weighted (+1 inserts, −1 deletes,
products multiply), then merged into the view's per-row counts; rows
whose count reaches 0 disappear. Multiset-exact for any mix of
inserts and deletes, duplicates included — the algebra, not a
special case.

Scale shape: the three delta terms are delta-sized joins (ΔA against
B_old shuffles ΔA fully but only B_old's matching keys — at 100 TB
that is the whole point: the view is maintained for the price of the
delta, not the price of A ⋈ B). The count merge is a groupBy over
view rows, map-side combinable. The view itself stays distributed;
nothing collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.operators.materialize import pin

#: multiplicity column carried by CDC deltas and view rows
MULT = "mult"


def _narrow_over_pinned(df: DataFrame) -> bool:
    """True iff ``df`` is a narrow plan (no join/aggregate/window/
    generator) whose every leaf is an already-materialized scan
    (LogicalRDD / LocalRelation). Recomputing such a plan per reference
    costs a filter/projection over pinned rows — cheaper than another
    eager localCheckpoint job. Conservative: any doubt returns False
    (the caller then pins)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves()
        for i in range(leaves.size()):
            name = leaves.apply(i).nodeName()
            if name not in ("LogicalRDD", "LocalRelation"):
                return False
        s = plan.toString()
        return not any(
            tok in s for tok in ("Join", "Aggregate", "Window", "Generate")
        )
    except Exception:
        return False


def join_view(a: DataFrame, b: DataFrame, on: "str | Sequence[str]") -> DataFrame:
    """Materialize the counting-form join view: A ⋈ B with per-row
    multiplicities (duplicate join outputs become one row with
    ``mult = n``). The shape :func:`maintain_join_view` maintains."""
    cols = [c for c in a.join(b, on).columns]
    return (
        a.join(b, on)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("long").alias(MULT))
    )


def cdc_to_counting_delta(
    cdc: DataFrame,
    key_cols: "str | Sequence[str]",
    value_cols: Sequence[str],
) -> DataFrame:
    """Bridge the engine's two incremental formats (r10 verdict #6):
    a Debezium-style I/U/D feed — exactly what
    ``operators.merge.snapshot_diff(include_old=True)`` emits — into
    the counting-delta shape :func:`maintain_join_view` consumes.

    I → the new row at ``mult +1``; D → the old row at ``mult -1``
    (``snapshot_diff`` D rows already carry old values in the value
    columns); U → BOTH: the before-image (``old_<col>``) at −1 and the
    new row at +1. Snapshots are pk-unique, so every emitted row is
    ±1 and the result is multiset-exact. Requires the ``old_<col>``
    before-image columns (``include_old=True``) — without them a U row
    cannot be retracted and the function raises rather than corrupt
    the view. Three filters over one delta-sized frame, no shuffle."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    missing = [c for c in value_cols if f"old_{c}" not in cdc.columns]
    if missing:
        raise ValueError(
            "cdc_to_counting_delta: before-image columns missing for "
            f"{missing} — produce the feed with snapshot_diff(..., "
            "include_old=True)"
        )
    # The three filters below each reference ``cdc``; when the feed is a
    # live ``snapshot_diff`` plan (a full-outer snapshot join), that
    # meant three recomputations of the diff — and maintain_join_view
    # then reads the delta twice more (r14 plan audit: the m23 plan held
    # 6 copies of each side's diff subtree, 56 parquet scans). The feed
    # is delta-sized by definition, so materialize it once (pin:
    # materialize.py policy — reliable checkpoint under the env knob).
    cdc = pin(cdc)
    plus = cdc.filter(F.col("change_type").isin("I", "U")).select(
        *keys, *value_cols, F.lit(1).cast("long").alias(MULT)
    )
    minus_u = cdc.filter(F.col("change_type") == "U").select(
        *keys,
        *[F.col(f"old_{c}").alias(c) for c in value_cols],
        F.lit(-1).cast("long").alias(MULT),
    )
    minus_d = cdc.filter(F.col("change_type") == "D").select(
        *keys, *value_cols, F.lit(-1).cast("long").alias(MULT)
    )
    return plus.unionByName(minus_u).unionByName(minus_d)


def maintain_join_view(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    on: "str | Sequence[str]",
) -> DataFrame:
    """One maintenance step of the counting algorithm.

    ``view`` is the current materialization (``join_view`` shape: data
    columns + ``mult``). ``a_old``/``b_old`` are the PRE-delta
    snapshots. ``delta_a``/``delta_b`` carry a ``mult`` column
    (+k inserts of a row, −k deletes); either may be empty. Returns
    the post-delta view — identical, row for row and count for count,
    to ``join_view(a_new, b_new, on)``.

    The three terms each multiply multiplicities (a base-table row
    has implicit mult 1); ΔA ⋈ ΔB is REQUIRED for correctness when
    both sides change in one step (inserting matching rows on both
    sides yields a view row none of the two cross terms sees)."""
    data_cols = [c for c in view.columns if c != MULT]

    def weighted(df: DataFrame, w) -> DataFrame:
        return df.select(*data_cols, w.alias(MULT))

    # each delta joins twice (its cross term + ΔA ⋈ ΔB); deltas are
    # small by contract, so pin them once instead of recomputing the
    # upstream CDC plan per term — EXCEPT when the delta is already a
    # narrow plan over pinned rows (the cdc_to_counting_delta shape:
    # filters/unions over a checkpointed diff), where recomputing per
    # term is a projection over materialized rows and a second
    # checkpoint job only adds a barrier (m23 carried five eager
    # checkpoint jobs, two of them re-pinning already-pinned data)
    def _pin(df: DataFrame) -> DataFrame:
        if _narrow_over_pinned(df):
            return df
        return pin(df)

    da = _pin(delta_a.withColumnRenamed(MULT, "__ma"))
    db = _pin(delta_b.withColumnRenamed(MULT, "__mb"))
    t1 = weighted(da.join(b_old, on), F.col("__ma"))
    t2 = weighted(a_old.join(db, on), F.col("__mb"))
    t3 = weighted(da.join(db, on), F.col("__ma") * F.col("__mb"))
    return (
        view.unionByName(t1)
        .unionByName(t2)
        .unionByName(t3)
        .groupBy(*data_cols)
        .agg(F.sum(MULT).cast("long").alias(MULT))
        .filter(F.col(MULT) != 0)
    )
