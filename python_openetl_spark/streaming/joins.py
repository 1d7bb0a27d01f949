"""Streaming joins: stream-static enrichment and stream-stream
interval joins with watermark-bounded state.

- Stream-static: each micro-batch broadcast-joins the static dim —
  no state, the streaming analogue of the engine's broadcast dim joins.
- Stream-stream: both sides buffered in the state store; the event-time
  range condition + watermarks bound how long either side waits, so
  state size is O(rate × window), independent of stream lifetime. This
  is the continuous version of the batch as-of/interval join
  (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Per-micro-batch broadcast join against a static dimension."""
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), keys, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within ``(left_ts - max_delay,
    left_ts]`` for the same key.

    Both inputs MUST carry distinct timestamp column names. Watermarks
    on both sides plus the two-sided time bound let Spark evict buffered
    rows once they can no longer match — bounded state, late data
    dropped per watermark.
    """
    # explicit aliases: when both inputs derive from the same source (a
    # self-join on one stream), bare l[by] == r[by] is ambiguous and can
    # silently resolve to a trivially-true predicate
    l = left.withWatermark(left_ts, watermark).alias("__ij_l")
    r = right.withWatermark(right_ts, watermark).alias("__ij_r")
    lc, rc = (lambda c: F.col(f"__ij_l.{c}")), (lambda c: F.col(f"__ij_r.{c}"))
    cond = (
        (lc(by) == rc(by))
        & (rc(right_ts) <= lc(left_ts))
        & (rc(right_ts) > lc(left_ts) - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").drop(rc(by))


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer stream-stream interval join: like :func:`interval_join`
    but every left row is emitted exactly once even with no match —
    NULL right columns — after the watermark proves no match can still
    arrive. The streaming shape behind "every purchase, with its
    preceding click if any": inner joins silently drop unmatched rows,
    which for audit/attribution pipelines is data loss.

    Same bounded-state story as the inner join; the only extra cost is
    that unmatched left rows are held until the right watermark passes
    ``left_ts``, so emission latency for NULL rows is the watermark
    delay. In batch (the oracle twin) this is exactly a left join.
    """
    l = left.withWatermark(left_ts, watermark).alias("__ij_l")
    r = right.withWatermark(right_ts, watermark).alias("__ij_r")
    lc, rc = (lambda c: F.col(f"__ij_l.{c}")), (lambda c: F.col(f"__ij_r.{c}"))
    cond = (
        (lc(by) == rc(by))
        & (rc(right_ts) <= lc(left_ts))
        & (rc(right_ts) > lc(left_ts) - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "left_outer").drop(rc(by))
