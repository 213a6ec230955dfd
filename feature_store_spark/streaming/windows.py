"""Event-time windowed aggregates over streams: tumbling/sliding windows
with watermark-based late-data handling.

The reference has no streaming operators (SURVEY.md §2.9); this completes
the engine's streaming surface (ingest → stateful sessions → windowed
aggs) with the built-in Structured Streaming operators — no custom state:
``withWatermark`` + ``groupBy(window(...))`` compiles to the incremental
stateful aggregation Spark already ships, so at scale the state store
(RocksDB in production) and the shuffle-by-(window, entity) partitioning
are the engine's, not ours.

Semantics (append mode, the default for exactly-once sinks): a window
emits ONCE, when the watermark — max observed event time minus the
allowed lateness — passes the window end; rows later than the watermark
are dropped, bounding state by (windows in flight × entities), not by
history.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from feature_store_spark.operators.asof import duration_to_us


def _interval(d: str | int) -> str:
    """'10m' / '1h' / seconds → Spark CalendarInterval string."""
    us = duration_to_us(d)
    if us % 60_000_000:
        return f"{us // 1_000_000} seconds"
    return f"{us // 60_000_000} minutes"


def windowed_agg(
    stream: DataFrame,
    ts: str = "event_time",
    window: str = "10m",
    slide: str | None = None,
    watermark: str = "10m",
    entity: str | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding, with ``slide``) window aggregates,
    optionally per entity.  ``aggs`` maps output name → aggregate Column
    (default: row count as ``n``).  Works on batch DataFrames too (same
    expression, no watermark state) — used by the parity test to pin the
    streaming output against the batch computation.
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts, _interval(watermark))
    win = F.window(F.col(ts), _interval(window),
                   _interval(slide) if slide else None)
    keys = [win] + ([F.col(entity)] if entity else [])
    out = df.groupBy(*keys).agg(*[a.alias(n) for n, a in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *([entity] if entity else []),
        *aggs.keys(),
    )
