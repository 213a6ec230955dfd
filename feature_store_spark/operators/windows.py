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


def rolling_at(
    obs: DataFrame,
    events: DataFrame,
    on: str,
    obs_time: str,
    event_time: str,
    aggs: dict[str, tuple[Column, str | int]],
) -> DataFrame:
    """Trailing-window aggregates evaluated AT observation times — the
    point-in-time form of :func:`with_rolling` (Feathr
    ``WindowAggTransformation`` semantics: the window ends at the
    observation timestamp, so events that aged out between their own time
    and the observation time are NOT counted).

    ``aggs`` maps output name → (aggregate Column over *event* columns,
    window duration).  For each obs row the aggregate runs over events with
    ``event_time ∈ [obs_time - window, obs_time]`` (inclusive both ends,
    same bounds as :func:`with_rolling`).

    Plan shape: union-tag obs and events, ONE shuffle by entity, range
    frames anchored at each obs row.  Obs rows contribute NULLs to the
    event columns, so aggregates must reference event columns (``F.sum(c)``
    / ``F.count(c)``), never ``count(*)`` — they then ignore interleaved
    obs rows for free.  All obs columns pass through unchanged.
    """
    tag = "__rat_tag"
    ts = "__rat_ts"
    collide = (set(obs.columns) & set(events.columns)) - {on}
    if collide:
        raise ValueError(
            f"rolling_at: obs and events share value columns {sorted(collide)}"
            " — rename the event columns (the union would conflate them)"
        )
    ev_cols = [c for c in events.columns if c != on]
    e = events.select(
        F.col(on),
        F.col(event_time).cast("timestamp").alias(ts),
        F.lit(0).alias(tag),
        *[F.col(c) for c in ev_cols if c != event_time],
    )
    o = obs.select(
        *[F.col(c) for c in obs.columns],
        F.col(obs_time).cast("timestamp").alias(ts),
        F.lit(1).alias(tag),
    )
    u = e.unionByName(o, allowMissingColumns=True)
    epoch = "__rat_epoch"
    u = u.withColumn(epoch, F.unix_micros(F.col(ts)))
    for out_name, (agg, window) in aggs.items():
        us = duration_to_us(window)
        w = Window.partitionBy(on).orderBy(F.col(epoch)).rangeBetween(-us, 0)
        u = u.withColumn(out_name, agg.over(w))
    return u.where(F.col(tag) == 1).select(
        *[F.col(c) for c in obs.columns], *[F.col(n) for n in aggs]
    )


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
