"""Point-in-time feature materialization with per-partition lineage and
checkpoint/resume (north rule: "resumable from Iceberg-snapshot checkpoints,
per-partition lineage records — input snapshot id, row counts, skew metrics,
watermark").

Lifecycle per observation-date partition D:
  1. skip if the checkpoint manifest already records (input_snapshot, D)
  2. read feature history pruned to ``event_time <= end(D)`` (and
     ``>= start(D) - lookback`` when a lookback bounds history)
  3. decode → window features → as-of join for obs rows in D
  4. overwrite exactly partition D of the output (idempotent)
  5. append a lineage record + mark D done in the checkpoint

Because each partition is self-contained and keyed by the *input snapshot
id*, any partition's features can be re-derived deterministically (the
backfill contract, reference X3 ``materialize_pipeline.py:74-107``), and a
killed job resumes by skipping completed partitions (reference X1 date-diff
``base/feature_preprocessing.py:290-312``, rebuilt on snapshots).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.functions.images import with_image_features
from feature_store_spark.io.tables import PartitionedTable
from feature_store_spark.operators.asof import asof_join, duration_to_us
from feature_store_spark.operators.windows import (
    sessionize,
    with_lag_lead,
    with_rolling,
)

FEATURE_COLS = [
    "phash", "dec_w", "dec_h", "mean_r", "mean_g", "mean_b",
    "std_r", "std_g", "std_b", "caption",
    "roll_cnt_1d", "roll_mean_r_1d", "lag_phash", "session_id",
]


class CheckpointManifest:
    """Done-partition log keyed by (input snapshot id, partition)."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def done_partitions(self, input_snapshot: str) -> set[str]:
        return {
            e["partition"] for e in self._load()
            if e["input_snapshot"] == input_snapshot
        }

    def mark_done(self, input_snapshot: str, partition: str) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"input_snapshot": input_snapshot,
                                "partition": partition}) + "\n")


class LineageLog:
    """Append-only per-partition lineage records (JSONL)."""

    def __init__(self, path: str):
        self.path = path

    def append(self, record: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def compute_features(images: DataFrame) -> DataFrame:
    """Decode + window features over the image event history.

    Bytes are dropped inside ``with_image_features`` BEFORE any shuffle —
    windows and the as-of join move only the small numeric feature vector.
    """
    feats = with_image_features(images)
    feats = with_rolling(
        feats,
        "image_id",
        "event_time",
        {"roll_cnt_1d": F.count(F.lit(1)),
         "roll_mean_r_1d": F.avg("mean_r")},
        window="1d",
    )
    feats = with_lag_lead(
        feats, "image_id", "event_time",
        {"lag_phash": ("phash", -1)}, tiebreak=["phash"],
    )
    feats = sessionize(
        feats, "image_id", "event_time", gap="30m", tiebreak=["phash"]
    )
    return feats


def materialize(
    spark: SparkSession,
    images_table: PartitionedTable,
    obs_table: PartitionedTable,
    out_table: PartitionedTable,
    checkpoint: CheckpointManifest,
    lineage: LineageLog,
    dates: list[str] | None = None,
    lookback: str | None = None,
    asof_strategy: str = "sliced",
) -> list[str]:
    """Materialize PIT features per observation-date partition.

    ``dates=None`` → incremental: all obs partitions not yet checkpointed
    for the current input snapshot.  Explicit ``dates`` → backfill those
    partitions (idempotent overwrite).  Returns the partitions processed.
    """
    snap = images_table.current_snapshot()
    if snap is None:
        raise ValueError("images table has no committed snapshot")
    obs_parts = obs_table.partitions()
    if dates is None:
        done = checkpoint.done_partitions(snap.snapshot_id)
        todo = [p for p in obs_parts if p not in done]
    else:
        todo = [p for p in obs_parts if p in set(dates)]

    processed = []
    for part in todo:
        obs = obs_table.read(spark, partitions=[part])
        # history pruning, twice: (1) manifest-level partition pruning —
        # only image partitions at or before this horizon are even opened
        # (file-level skip, the Iceberg partition-pruning equivalent);
        # (2) a row-level event_time predicate for exactness.
        visible = [p for p in images_table.partitions() if p <= part]
        if lookback is not None:
            lb_days = duration_to_us(lookback) // 86_400_000_000 + 2
            lo = (
                F.to_timestamp(F.lit(part)) - F.expr(f"INTERVAL {lb_days} DAYS")
            )
            import datetime as _dt

            lo_str = (
                _dt.datetime.strptime(part, "%Y-%m-%d")
                - _dt.timedelta(days=lb_days)
            ).strftime("%Y-%m-%d")
            visible = [p for p in visible if p >= lo_str]
        part_end = F.to_timestamp(F.lit(part)) + F.expr("INTERVAL 1 DAY")
        if not visible:
            images = images_table.read(spark).where(F.lit(False))
        else:
            images = images_table.read(spark, partitions=visible).where(
                F.col("event_time") < part_end
            )
        if lookback is not None:
            images = images.where(F.col("event_time") >= lo)

        feats = compute_features(images)
        result = asof_join(
            obs,
            feats,
            on="image_id",
            obs_time="obs_time",
            feature_time="event_time",
            feature_cols=FEATURE_COLS,
            tiebreak_cols=["phash", "caption"],
            lookback=lookback,
            strategy=asof_strategy,
            slice_duration="1d",
        ).withColumn(obs_table.partition_col, F.lit(part))

        # lineage inputs: row counts + skew before writing
        n_obs = obs.count()
        ent_counts = obs.groupBy("image_id").count()
        stats = ent_counts.agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).first()
        watermark = images.agg(F.max("event_time")).first()[0]

        out_table.write(result, mode="overwrite_partitions")
        n_out = out_table.read(spark, partitions=[part]).count()

        lineage.append(
            {
                "partition": part,
                "input_snapshot": snap.snapshot_id,
                "rows_obs": n_obs,
                "rows_out": n_out,
                "skew_max_over_mean": (
                    round(float(stats["mx"]) / float(stats["mean"]), 3)
                    if stats["mean"] else None
                ),
                "watermark": str(watermark) if watermark is not None else None,
            }
        )
        checkpoint.mark_done(snap.snapshot_id, part)
        processed.append(part)
    return processed
