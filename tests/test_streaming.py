"""Streaming ingestion: watermarked dedup + incremental snapshot commits."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from feature_store_spark.io.tables import PartitionedTable
from feature_store_spark.pipeline.datagen import generate_images, write_parquet
from feature_store_spark.streaming.ingest import stream_images_to_table


def test_stream_ingest_incremental_and_dedup(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    img = generate_images(n_rows=120, n_entities=10, seed=21)
    # feed in event-time order (a realistic log tail); wide watermark so the
    # dedup-state test isn't confounded by late-row dropping
    img = img.sort_values("event_time", kind="stable").reset_index(drop=True)
    first, second = img.iloc[:70], img.iloc[70:]
    write_parquet(first, str(src / "batch1.parquet"))

    table = PartitionedTable(str(tmp_path / "tables"), "images", "event_date")
    ckpt = str(tmp_path / "ckpt")

    q = stream_images_to_table(spark, str(src), table, ckpt,
                               watermark="365 days")
    q.awaitTermination(120)
    n1 = table.read(spark).count()
    assert n1 == 70
    snaps1 = len(table._read_manifest())

    # second drop includes NEW rows plus a re-delivery of old rows (dup feed)
    write_parquet(pd.concat([second, first.iloc[-10:]]), str(src / "batch2.parquet"))
    q = stream_images_to_table(spark, str(src), table, ckpt,
                               watermark="365 days")
    q.awaitTermination(120)
    n2 = table.read(spark).count()
    # 50 new rows land; the 10 re-delivered duplicates are dropped by
    # dropDuplicatesWithinWatermark state carried in the stream checkpoint
    assert n2 == 120
    assert len(table._read_manifest()) > snaps1
    # partitions match event dates
    assert set(table.partitions()) == set(
        img["event_time"].dt.strftime("%Y-%m-%d").unique()
    )


def test_replayed_batch_commits_once(spark, tmp_path):
    """A micro-batch re-delivered with the same batch_id (failure between
    sink commit and checkpoint advance) must not append a second snapshot."""
    from feature_store_spark.streaming.ingest import (
        committed_batch_ids,
        make_batch_committer,
    )

    img = generate_images(n_rows=30, n_entities=5, seed=22)
    img["event_date"] = img["event_time"].dt.strftime("%Y-%m-%d")
    df = spark.createDataFrame(img)
    table = PartitionedTable(str(tmp_path / "tables"), "replay", "event_date")
    ckpt = str(tmp_path / "ckpt")

    commit = make_batch_committer(table, ckpt)
    commit(df, 7)
    n1 = table.read(spark).count()
    snaps1 = len(table._read_manifest())
    commit(df, 7)  # replay: same batch id → skipped
    assert table.read(spark).count() == n1 == 30
    assert len(table._read_manifest()) == snaps1
    assert committed_batch_ids(table, ckpt) == {7}
    # a different checkpoint is a different stream → not deduped against
    assert committed_batch_ids(table, ckpt + "_other") == set()
    commit(df, 8)  # new batch id commits normally
    assert table.read(spark).count() == 60
