"""Stateful streaming sessionization — the streaming form of the engine's
batch ``sessionize`` (north-rule session windows), built on
``applyInPandasWithState`` (Arrow-batched per-key state, no per-row
Python dispatch at the JVM boundary).

A session CLOSES when either (a) a later event for the same entity
arrives more than ``gap`` after the previous one (closure decided inside
the batch that sees the later event), or (b) the event-time watermark
passes ``last_event + gap`` with no new event (event-time timeout).
Closed sessions are emitted exactly once in append mode:
``(entity, session_start, session_end, n_events, session_idx)`` —
``session_idx`` counts sessions per entity from stream start, matching
the batch operator's ``session_id_idx`` numbering.

State per entity is four scalars (start, last, count, idx) — bounded,
shardable by the grouping key, exactly what a 10^9-entity feed needs.
The reference has no streaming surface (SURVEY.md §2.9); this extends the
batch engine's ingestion seam (``streaming/ingest.py``) with the operator
the north rule names.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feature_store_spark.operators.asof import duration_to_us
from feature_store_spark.streaming.ingest import IMAGES_DDL

SESSION_OUTPUT_DDL = (
    "image_id string, session_start timestamp, session_end timestamp, "
    "n_events bigint, session_idx bigint"
)
_STATE_DDL = "start_us bigint, last_us bigint, n bigint, idx bigint"


_OUT_COLS = ["image_id", "session_start", "session_end",
             "n_events", "session_idx"]


def _make_session_fn(gap_us: int, ts_col: str, ttl_us: int):
    def close_row(key: str, start_us: int, last_us: int, n: int, idx: int):
        return {
            "image_id": key,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
            "session_idx": idx,
        }

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (entity,) = key
        closed: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start_us, last_us, n, idx = state.get
            if start_us >= 0:
                # close the open session; keep a sentinel (start=-1) so
                # session_idx numbering survives the close — the entity's
                # NEXT session continues the count, matching the batch
                # operator's per-entity numbering.
                closed.append(close_row(entity, start_us, last_us, n, idx))
                state.update((-1, last_us, 0, idx + 1))
                state.setTimeoutTimestamp(max(
                    (last_us + gap_us + ttl_us) // 1000,
                    state.getCurrentWatermarkMs() + 1,
                ))
            else:
                # sentinel idle past its TTL: EVICT — state stays bounded
                # by the active-entity set at 10^9 entities, at the cost
                # of session_idx restarting at 0 if the entity returns
                # after ttl of silence
                state.remove()
            yield pd.DataFrame(closed, columns=_OUT_COLS)
            return

        events = pd.concat(list(pdfs))
        ts = (
            events[ts_col]
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
            .tolist()
        )
        if state.exists:
            start_us, last_us, n, idx = state.get
            if start_us < 0:  # sentinel: no open session, idx is pre-bumped
                start_us = last_us = ts[0]
                n = 1
                ts = ts[1:]
        else:
            # first event of a brand-new entity opens its session
            start_us = last_us = ts[0]
            n, idx = 1, 0
            ts = ts[1:]
        for t in ts:
            if t - last_us > gap_us:
                closed.append(close_row(entity, start_us, last_us, n, idx))
                idx += 1
                start_us, n = t, 1
            else:
                n += 1
            last_us = max(last_us, t)
        state.update((start_us, last_us, n, idx))
        # event-time timeout: close the open session once the watermark
        # passes last_event + gap (GroupState timeouts are in millis, and
        # must be beyond the current watermark — clamp for already-expired
        # sessions so they close at the next batch)
        timeout_ms = max(
            last_us // 1000 + gap_us // 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    return fn


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap: str | int = "30m",
    watermark: str = "1 hour",
    schema: str = IMAGES_DDL,
    ts_col: str = "event_time",
    available_now: bool = True,
    sink_dir: str | None = None,
    sentinel_ttl: str | int = "7d",
) -> StreamingQuery:
    """Tail ``source_dir`` for parquet event files and emit closed sessions
    (append mode) to ``sink_dir`` (parquet) or an in-memory table named
    ``sessions`` when ``sink_dir`` is None (tests).

    ``sentinel_ttl``: how long a CLOSED entity's numbering sentinel
    survives with no new events before being evicted (event-time).  Keeps
    state bounded by the recently-active entity set; an entity returning
    after the TTL restarts its session numbering at 0."""
    gap_us = duration_to_us(gap)
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(ts_col, watermark)
        .groupBy("image_id")
        .applyInPandasWithState(
            _make_session_fn(gap_us, ts_col, duration_to_us(sentinel_ttl)),
            outputStructType=SESSION_OUTPUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if sink_dir is not None:
        writer = writer.format("parquet").option("path", sink_dir)
    else:
        writer = writer.format("memory").queryName("sessions")
    writer = writer.outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
