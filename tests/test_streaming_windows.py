"""Watermarked windowed aggregates: append-mode emission and late-data
drop, pinned against deterministic per-batch watermark arithmetic and the
batch computation of the same expression."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from feature_store_spark.pipeline.datagen import write_parquet
from feature_store_spark.streaming.windows import windowed_agg

_SCHEMA = "user_id string, v double, event_time timestamp"


def _events(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "v": [float(r[2]) for r in rows],
            "event_time": pd.to_datetime(
                [f"2024-01-01 {r[1]}" for r in rows]
            ),
        }
    )


def _drain(spark, src, name):
    """availableNow drain, ONE FILE PER MICRO-BATCH so the watermark
    advances between files exactly like a live stream between triggers."""
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_agg(
        stream, ts="event_time", window="10m", watermark="10m",
        aggs={"n": F.count(F.lit(1)), "v_sum": F.sum("v")},
    )
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    got["window_start"] = got["window_start"].astype(str)
    return got.sort_values("window_start").reset_index(drop=True)


def test_windowed_agg_append_emission_and_late_drop(spark, tmp_path):
    """Empirically-pinned Spark semantics (verified with recentProgress):
    the watermark computed at the end of batch N filters input from batch
    N+1 on — so a late row is dropped once it arrives AFTER the batch
    where its window closed, and a window emits in the first batch whose
    effective watermark passes its end (the availableNow final empty
    batch flushes the last closed windows)."""
    import os
    import time

    (tmp_path / "incoming").mkdir()
    src = str(tmp_path / "incoming")
    # batch0: [10:00,10:10) gets 2 rows; 10:31 pushes the watermark that
    # will become 10:21
    write_parquet(_events([("u1", "10:00:00", 1), ("u2", "10:05:00", 2),
                           ("u1", "10:31:00", 4)]),
                  f"{src}/f1.parquet")
    # batch1 (wm 10:21 effective): [10:00,10:10) closes with n=2
    write_parquet(_events([("u1", "10:52:00", 16)]), f"{src}/f2.parquet")
    # batch2 (wm 10:42): LATE row at 10:02 — its window closed a batch
    # ago -> dropped from both state and output; 11:20 advances the wm
    write_parquet(_events([("u3", "10:02:00", 8), ("u2", "11:20:00", 32)]),
                  f"{src}/f3.parquet")
    # batch3 (wm 11:10) closes [10:50,11:00); the final empty batch
    # (wm 11:30) flushes [11:20,11:30); [11:40,...) stays open
    write_parquet(_events([("u1", "11:40:00", 64)]), f"{src}/f4.parquet")
    # the file source processes files in MODIFICATION-TIME order; writes
    # above can land in the same clock tick, so pin strictly increasing
    # mtimes or f2 can run before f1 (observed: the late row slipped in
    # under a still-zero watermark)
    now = time.time()
    for i, f in enumerate(["f1", "f2", "f3", "f4"]):
        os.utime(f"{src}/{f}.parquet", (now + 10 * i, now + 10 * i))

    got = _drain(spark, src, "win_agg_t1")
    assert got["window_start"].tolist() == [
        "2024-01-01 10:00:00", "2024-01-01 10:30:00",
        "2024-01-01 10:50:00", "2024-01-01 11:20:00",
    ]
    assert got["n"].tolist() == [2, 1, 1, 1]
    assert got["v_sum"].tolist() == [3.0, 4.0, 16.0, 32.0]  # late 8 dropped

    # batch parity: the same expression over the same NON-LATE rows equals
    # the emitted windows (restricted to the closed ones)
    batch = spark.createDataFrame(
        _events([("u1", "10:00:00", 1), ("u2", "10:05:00", 2),
                 ("u1", "10:31:00", 4), ("u1", "10:52:00", 16),
                 ("u2", "11:20:00", 32), ("u1", "11:40:00", 64)])
    )
    want = (
        windowed_agg(batch, ts="event_time", window="10m",
                     aggs={"n": F.count(F.lit(1)), "v_sum": F.sum("v")})
        .toPandas()
    )
    want["window_start"] = want["window_start"].astype(str)
    want = (
        want[want["window_start"].isin(got["window_start"])]
        .sort_values("window_start").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["window_start", "n", "v_sum"]],
        want[["window_start", "n", "v_sum"]],
    )


def test_stream_windowed_agg_to_table_exactly_once(spark, tmp_path):
    """Closed windows land in a PartitionedTable exactly once: a second
    drain over the same checkpoint appends only newly-closed windows,
    and re-running with nothing new commits nothing."""
    import os
    import time

    from feature_store_spark.io.tables import PartitionedTable
    from feature_store_spark.streaming.windows import (
        stream_windowed_agg_to_table,
    )

    (tmp_path / "incoming").mkdir()
    src = str(tmp_path / "incoming")
    table = PartitionedTable(str(tmp_path / "tables"), "win_feats", "date")
    ckpt = str(tmp_path / "ckpt")
    now = time.time()

    write_parquet(_events([("u1", "10:00:00", 1), ("u2", "10:05:00", 2),
                           ("u1", "10:31:00", 4)]), f"{src}/f1.parquet")
    write_parquet(_events([("u1", "10:52:00", 16)]), f"{src}/f2.parquet")
    os.utime(f"{src}/f1.parquet", (now, now))
    os.utime(f"{src}/f2.parquet", (now + 10, now + 10))

    def drain():
        q = stream_windowed_agg_to_table(
            spark, src, table, ckpt, schema=_SCHEMA,
            ts="event_time", window="10m", watermark="10m",
            aggs={"n": F.count(F.lit(1)), "v_sum": F.sum("v")},
        )
        q.awaitTermination(120)

    drain()
    # wm reaches 10:42 -> [10:00,10:10) and [10:30,10:40) are closed
    got1 = table.read(spark).toPandas().sort_values("window_start")
    assert [str(s) for s in got1["window_start"]] == [
        "2024-01-01 10:00:00", "2024-01-01 10:30:00"]
    assert got1["n"].tolist() == [2, 1]
    n_snaps = len(table._read_manifest())

    # nothing new: no windows close, no snapshot committed
    drain()
    assert len(table._read_manifest()) == n_snaps
    assert table.read(spark).count() == 2

    # one more file closes [10:50,11:00) ONLY — earlier windows are not
    # re-emitted or duplicated
    write_parquet(_events([("u2", "11:20:00", 32)]), f"{src}/f3.parquet")
    os.utime(f"{src}/f3.parquet", (now + 20, now + 20))
    drain()
    got2 = table.read(spark).toPandas().sort_values("window_start")
    assert [str(s) for s in got2["window_start"]] == [
        "2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-01-01 10:50:00"]
    assert got2["v_sum"].tolist() == [3.0, 4.0, 16.0]
    assert set(table.partitions()) == {"2024-01-01"}


def test_windowed_agg_per_entity_sliding(spark, tmp_path):
    """Sliding windows + entity grouping: each event lands in
    window/slide overlapping windows per its entity (batch mode — the
    expression is identical streaming or not)."""
    batch = spark.createDataFrame(
        _events([("u1", "10:04:00", 1), ("u1", "10:14:00", 2),
                 ("u2", "10:04:00", 4)])
    )
    got = (
        windowed_agg(batch, ts="event_time", window="10m", slide="5m",
                     entity="user_id", aggs={"n": F.count(F.lit(1))})
        .toPandas()
    )
    got["window_start"] = got["window_start"].astype(str)
    # 10:04 -> windows starting 09:55 and 10:00; 10:14 -> 10:05 and 10:10
    u1 = got[got.user_id == "u1"].sort_values("window_start")
    assert u1["window_start"].tolist() == [
        "2024-01-01 09:55:00", "2024-01-01 10:00:00",
        "2024-01-01 10:05:00", "2024-01-01 10:10:00",
    ]
    assert u1["n"].tolist() == [1, 1, 1, 1]
    assert got[got.user_id == "u2"]["n"].sum() == 2
