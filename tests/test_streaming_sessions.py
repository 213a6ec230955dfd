"""Stateful streaming sessionization: closed sessions match the batch
sessionize semantics, across micro-batch boundaries and via event-time
timeout."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from feature_store_spark.pipeline.datagen import write_parquet
from feature_store_spark.streaming.sessions import sessionize_stream

T0 = dt.datetime(2024, 1, 1)


EVENTS_DDL = "image_id string, event_time timestamp"


def _ev(entity, minutes):
    return {
        "image_id": entity,
        "event_time": T0 + dt.timedelta(minutes=minutes),
    }


def test_streaming_sessions_close_on_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sessions_out")

    # batch 1: u1 has two sessions split by a 40m gap (gap=30m);
    # u2 has one session still open at the end of the batch
    b1 = pd.DataFrame([
        _ev("u1", 0), _ev("u1", 10), _ev("u1", 50), _ev("u1", 60),
        _ev("u2", 0), _ev("u2", 5),
    ])
    write_parquet(b1, str(src / "b1.parquet"))
    q = sessionize_stream(spark, str(src), ckpt, gap="30m",
                          watermark="10 minutes", schema=EVENTS_DDL,
                          sink_dir=sink)
    q.awaitTermination(120)
    got1 = (
        spark.read.parquet(sink).toPandas()
        .sort_values("image_id").reset_index(drop=True)
    )
    # u1's first session closes on the in-batch gap; u2's closes via
    # event-time timeout once the watermark (max_event - 10m = 00:50)
    # passes its last event + gap (00:35).  u1's second session (timeout
    # 01:30 > watermark) stays open.
    assert [(r.image_id, r.session_idx, r.n_events)
            for r in got1.itertuples()] == [("u1", 0, 2), ("u2", 0, 2)]
    r = got1.iloc[0]
    assert r["session_start"] == T0
    assert r["session_end"] == T0 + dt.timedelta(minutes=10)

    # batch 2: much later events — watermark passes old sessions' gap,
    # closing u1's second session and u2's first via event-time timeout;
    # u1's new event opens session idx 2
    b2 = pd.DataFrame([_ev("u1", 600), _ev("u2", 610)])
    write_parquet(b2, str(src / "b2.parquet"))
    q = sessionize_stream(spark, str(src), ckpt, gap="30m",
                          watermark="10 minutes", schema=EVENTS_DDL,
                          sink_dir=sink)
    q.awaitTermination(120)
    got2 = (
        spark.read.parquet(sink).toPandas()
        .sort_values(["image_id", "session_idx"]).reset_index(drop=True)
    )
    # u1 sessions 0 (from batch 1) and 1; u2 session 0
    assert [(r.image_id, r.session_idx, r.n_events)
            for r in got2.itertuples()] == [
        ("u1", 0, 2), ("u1", 1, 2), ("u2", 0, 2),
    ]
    u1s1 = got2[(got2.image_id == "u1") & (got2.session_idx == 1)].iloc[0]
    assert u1s1["session_start"] == T0 + dt.timedelta(minutes=50)
    assert u1s1["session_end"] == T0 + dt.timedelta(minutes=60)


def test_streaming_sessions_match_batch_numbering(spark, tmp_path):
    """session_idx numbering equals the batch sessionize operator's
    session_id_idx for every CLOSED session."""
    import pyspark.sql.functions as F

    from feature_store_spark.operators.windows import sessionize

    src = tmp_path / "incoming"
    src.mkdir()
    rows = []
    for e, offsets in {
        "a": [0, 5, 45, 50, 120, 125],      # 3 sessions
        "b": [0, 40, 80],                   # 3 singleton sessions
    }.items():
        rows += [_ev(e, m) for m in offsets]
    pdf = pd.DataFrame(rows)
    write_parquet(pdf, str(src / "all.parquet"))
    # a far-future heartbeat per entity forces every real session closed
    hb = pd.DataFrame([_ev("a", 10_000), _ev("b", 10_000)])
    write_parquet(hb, str(src / "heartbeat.parquet"))

    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "sessions_out2")
    for _ in range(2):  # two drains so the watermark passes all gaps
        q = sessionize_stream(spark, str(src), ckpt, gap="30m",
                              watermark="1 minutes", schema=EVENTS_DDL,
                              sink_dir=sink)
        q.awaitTermination(120)
    got = (
        spark.read.parquet(sink)
        .select("image_id", "session_idx", "n_events")
        .toPandas()
        .sort_values(["image_id", "session_idx"]).reset_index(drop=True)
    )

    batch = sessionize(
        spark.createDataFrame(pdf[["image_id", "event_time"]]),
        "image_id", "event_time", gap="30m",
    )
    want = (
        batch.groupBy("image_id", F.col("session_id_idx").alias("session_idx"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .sort_values(["image_id", "session_idx"]).reset_index(drop=True)
    )
    assert got[["image_id", "session_idx", "n_events"]].values.tolist() == \
        want.values.tolist()


def test_sentinel_ttl_evicts_closed_entities(spark, tmp_path):
    """A closed entity's numbering sentinel is evicted after sentinel_ttl
    of event-time silence (state stays bounded by the active-entity set);
    if the entity returns AFTER the TTL its numbering restarts at 0,
    within the TTL it continues (round-2 scale note, now enforced)."""
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_ttl")
    sink = str(tmp_path / "out_ttl")

    def drain(name, rows):
        write_parquet(pd.DataFrame(rows), str(src / f"{name}.parquet"))
        q = sessionize_stream(spark, str(src), ckpt, gap="30m",
                              watermark="10 minutes", schema=EVENTS_DDL,
                              sink_dir=sink, sentinel_ttl="1h")
        q.awaitTermination(120)

    # u1's session; u2 is the watermark driver
    drain("b1", [_ev("u1", 0), _ev("u1", 5), _ev("u2", 0)])
    # wm -> 590: u1 times out (close idx 0), sentinel set, evict@ 5+30+60=95
    drain("b2", [_ev("u2", 600)])
    # wm -> 790 > 95: sentinel evicted
    drain("b3", [_ev("u2", 800)])
    # u1 returns after the TTL -> numbering restarts at 0
    drain("b4", [_ev("u1", 900)])
    # wm far ahead: u1's new session closes -> emitted with idx 0 again
    drain("b5", [_ev("u2", 2000)])

    got = (
        spark.read.parquet(sink).toPandas()
        .query("image_id == 'u1'")
        .sort_values("session_start").reset_index(drop=True)
    )
    assert got["session_idx"].tolist() == [0, 0]  # reset after eviction
    assert got["n_events"].tolist() == [2, 1]


def test_sentinel_continues_numbering_within_ttl(spark, tmp_path):
    """Within the TTL the sentinel keeps per-entity numbering continuous
    across a timeout close (the batch-parity contract)."""
    src = tmp_path / "incoming2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_ttl2")
    sink = str(tmp_path / "out_ttl2")

    def drain(name, rows):
        write_parquet(pd.DataFrame(rows), str(src / f"{name}.parquet"))
        q = sessionize_stream(spark, str(src), ckpt, gap="30m",
                              watermark="10 minutes", schema=EVENTS_DDL,
                              sink_dir=sink, sentinel_ttl="100d")
        q.awaitTermination(120)

    drain("b1", [_ev("u1", 0), _ev("u1", 5), _ev("u2", 0)])
    drain("b2", [_ev("u2", 600)])     # closes u1 idx 0 via timeout
    drain("b3", [_ev("u1", 700)])     # within TTL -> continues as idx 1
    drain("b4", [_ev("u2", 2000)])    # closes u1 idx 1

    got = (
        spark.read.parquet(sink).toPandas()
        .query("image_id == 'u1'")
        .sort_values("session_start").reset_index(drop=True)
    )
    assert got["session_idx"].tolist() == [0, 1]
