"""Windowed feature operators: lag/lead, rolling aggregates, gap-based
sessionization, dedup-latest, rank-bucketing.

Reference parity (SURVEY.md §2.5): the reference's only window fns are
dedup-latest (W1, ``item_feature_preprocessing.py:79-91``) and rank-bucket
(W2, ``online_feature_preprocessing.py:81-99``); its "rolling 30-day" stats
are interval joins (J3, ``online_feature_preprocessing.py:70-75``).  The
north rule additionally requires real lag/lead, rolling aggregates and
session windows — implemented here as pure built-in window frames (no UDFs):
``rangeBetween`` over epoch seconds for time-based rolling windows, and the
classic 3-step gap sessionization (lag → gap flag → running sum).

Determinism at any parallelism: every orderBy includes the caller's
tiebreak columns, so repeated timestamps cannot produce run-to-run drift
(SURVEY.md §7.4 hard point #1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from feature_store_spark.operators.asof import duration_to_us


def _order(ts: str, tiebreak: list[str] | None):
    return [F.col(ts).asc()] + [F.col(c).asc() for c in (tiebreak or [])]


def with_lag_lead(
    df: DataFrame,
    entity: str,
    ts: str,
    cols: dict[str, tuple[str, int]],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add lag/lead columns. ``cols`` maps output name → (source_col, offset)
    where negative offset = lag, positive = lead."""
    w = Window.partitionBy(entity).orderBy(*_order(ts, tiebreak))
    for out, (src, off) in cols.items():
        fn = F.lag(src, -off) if off < 0 else F.lead(src, off)
        df = df.withColumn(out, fn.over(w))
    return df


def with_rolling(
    df: DataFrame,
    entity: str,
    ts: str,
    aggs: dict[str, Column],
    window: str | int = "7d",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Time-based rolling aggregates over ``(now - window, now]`` per entity.

    ``aggs`` maps output name → aggregate Column (e.g. ``F.sum("v")``).
    Bounds are inclusive both ends, ``[now - window, now]`` — identical to
    SQL ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW``.
    Uses ``rangeBetween`` on epoch seconds — scales as one shuffle by entity
    with partition-local sorted frames; replaces the reference's broadcast
    interval-join pattern (J3) which replicates every event per window.
    """
    us = duration_to_us(window)
    epoch = "__epoch_us"
    df = df.withColumn(epoch, F.unix_micros(F.col(ts).cast("timestamp")))
    w = (
        Window.partitionBy(entity)
        .orderBy(F.col(epoch))
        .rangeBetween(-us, 0)
    )
    for out, agg in aggs.items():
        df = df.withColumn(out, agg.over(w))
    return df.drop(epoch)


def sessionize(
    df: DataFrame,
    entity: str,
    ts: str,
    gap: str | int = "30m",
    session_col: str = "session_id",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per entity) exceeds ``gap``.  Sessions are numbered
    0..k-1 per entity in time order; ``session_col`` is
    ``entity#session_index`` for global uniqueness."""
    gap_us = duration_to_us(gap)
    w = Window.partitionBy(entity).orderBy(*_order(ts, tiebreak))
    brk = (
        F.when(
            F.unix_micros(F.col(ts).cast("timestamp"))
            - F.unix_micros(F.lag(ts, 1).over(w).cast("timestamp"))
            > F.lit(gap_us),
            1,
        )
        .otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = df.withColumn("__brk", brk).withColumn(
        "__sess_idx", F.sum("__brk").over(wsum)
    )
    return (
        df.withColumn(
            session_col,
            F.concat_ws("#", F.col(entity), F.col("__sess_idx").cast("string")),
        )
        .withColumn(f"{session_col}_idx", F.col("__sess_idx").cast("long"))
        .drop("__brk", "__sess_idx")
    )


def dedup_latest(
    df: DataFrame,
    keys: list[str],
    order_desc: list[str],
) -> DataFrame:
    """Keep the latest row per key, ordering by ``order_desc`` descending —
    the reference's W1 (``row_number() over (partition by item_id order by
    modifydate desc, filename_date desc) = 1``,
    ``item_feature_preprocessing.py:79-91``)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_desc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def rank_bucket(
    df: DataFrame,
    partition: list[str],
    order_desc: list[str],
    buckets: list[tuple[int, int]],
    rank_col: str = "rank",
    bucket_col: str = "bucket",
    default_bucket: int = 0,
) -> DataFrame:
    """Rank rows per partition then map rank ranges to bucket labels — the
    reference's W2 popularity grouping (``online_feature_preprocessing.py:
    81-99``: rank ≤100 → 1, ≤300 → 2, ... else 0).  ``buckets`` is a list of
    (max_rank_inclusive, label) tried in order."""
    w = Window.partitionBy(*partition).orderBy(
        *[F.col(c).desc() for c in order_desc]
    )
    df = df.withColumn(rank_col, F.row_number().over(w))
    expr = F.lit(default_bucket)
    for max_rank, label in reversed(buckets):
        expr = F.when(F.col(rank_col) <= max_rank, F.lit(label)).otherwise(expr)
    return df.withColumn(bucket_col, expr)
