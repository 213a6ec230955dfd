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
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from feature_store_spark.io.tables import PartitionedTable
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


def stream_windowed_agg_to_table(
    spark: SparkSession,
    source_dir: str,
    table: PartitionedTable,
    checkpoint_dir: str,
    schema: str,
    ts: str = "event_time",
    window: str = "10m",
    slide: str | None = None,
    watermark: str = "10m",
    entity: str | None = None,
    aggs: dict[str, Column] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously materialize closed windows into a
    :class:`PartitionedTable` (partitioned by the window-start date) —
    streaming feature tables the batch engine consumes like any other
    (as-of joins, snapshot reads, resume).

    Exactly-once end-to-end, same contract as the ingest sink
    (``ingest.make_batch_committer``): append mode emits each window
    exactly once when the watermark passes its end, and a replayed
    micro-batch (crash between table commit and checkpoint advance) is
    skipped via the ``(checkpoint, batch_id)`` recorded in the snapshot
    manifest.
    """
    from feature_store_spark.streaming.ingest import make_batch_committer

    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = windowed_agg(
        stream, ts=ts, window=window, slide=slide, watermark=watermark,
        entity=entity, aggs=aggs,
    ).withColumn(
        table.partition_col, F.date_format("window_start", "yyyy-MM-dd")
    )
    writer = (
        out.writeStream.foreachBatch(
            make_batch_committer(table, checkpoint_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
