"""Partitioned-table IO with snapshot manifests (Iceberg-style, parquet
fallback).

The reference tracks incremental state by diffing hive partition directories
(``featurestore/base/feature_preprocessing.py:290-312``) and re-lays folders
after writes (``materialize_pipeline.py:178-201``).  Here every committed
write records a deterministic *snapshot* (content-addressed manifest entry),
so incremental processing, checkpoint/resume, and lineage all key off
snapshot ids instead of directory listings — the Iceberg model (SURVEY.md
§1.4) without requiring the Iceberg runtime jar (unavailable in-sandbox; the
IO seam is this one module, so swapping in ``df.writeTo(...)`` is local).

Layout:  <root>/<table>/<partition_col>=<value>/*.parquet
         <root>/<table>/_manifest.json   (ordered snapshot log)
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: str
    partitions: dict[str, int]  # partition value -> row count
    op: str


class PartitionedTable:
    """One partitioned parquet table + manifest."""

    def __init__(self, root: str, name: str, partition_col: str):
        self.path = os.path.join(root, name)
        # data lives under data/ so a full-table overwrite (which removes
        # the data directory) cannot wipe the snapshot log
        self.data_path = os.path.join(self.path, "data")
        self.partition_col = partition_col
        self._manifest_path = os.path.join(self.path, "_manifest.json")

    # -- manifest ------------------------------------------------------
    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)

    def _append_manifest(self, entry: dict) -> None:
        log = self._read_manifest()
        log.append(entry)
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def current_snapshot(self) -> Snapshot | None:
        log = self._read_manifest()
        if not log:
            return None
        e = log[-1]
        return Snapshot(e["snapshot_id"], e["partitions"], e["op"])

    def partitions(self) -> list[str]:
        snap = self.current_snapshot()
        return sorted(snap.partitions) if snap else []

    # -- IO ------------------------------------------------------------
    def read(self, spark: SparkSession, partitions: list[str] | None = None) -> DataFrame:
        df = spark.read.parquet(self.data_path)
        if partitions is not None:
            df = df.where(F.col(self.partition_col).isin(partitions))
        return df

    def write(self, df: DataFrame, mode: str = "overwrite_partitions") -> Snapshot:
        """Write partitioned data.  ``overwrite_partitions`` replaces only
        the partitions present in ``df`` (idempotent re-runs — the backfill
        contract); ``append`` adds files; ``overwrite`` replaces the table.
        """
        writer = df.write.partitionBy(self.partition_col)
        if mode == "overwrite_partitions":
            spark = df.sparkSession
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                writer.mode("overwrite").parquet(self.data_path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        elif mode == "append":
            writer.mode("append").parquet(self.data_path)
        elif mode == "overwrite":
            writer.mode("overwrite").parquet(self.data_path)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return self._commit(mode)

    def _commit(self, op: str) -> Snapshot:
        """Record a deterministic snapshot: content hash over the partition
        → row-count map (no wall clock, reproducible across reruns)."""
        spark = SparkSession.getActiveSession()
        counts = (
            spark.read.parquet(self.data_path)
            .groupBy(self.partition_col)
            .count()
            .collect()
        )
        parts = {str(r[0]): int(r[1]) for r in counts}
        digest = hashlib.sha256(
            json.dumps(parts, sort_keys=True).encode()
        ).hexdigest()[:16]
        prev = self.current_snapshot()
        seq = len(self._read_manifest())
        snap_id = f"snap-{seq:04d}-{digest}"
        self._append_manifest(
            {
                "snapshot_id": snap_id,
                "parent": prev.snapshot_id if prev else None,
                "op": op,
                "partitions": parts,
            }
        )
        return Snapshot(snap_id, parts, op)

    # -- incremental bookkeeping (reference X1 semantics) ---------------
    def new_partitions_vs(self, processed: list[str]) -> list[str]:
        """Partitions present here but not yet processed — the reference's
        raw-minus-saved date diff, off the manifest instead of the dirs."""
        return sorted(set(self.partitions()) - set(processed))


def apply_filter_spec(df: DataFrame, spec: list[tuple]) -> DataFrame:
    """Reference P2/S4 filter-op interpreter (``fileops.py:236-319``):
    tuples ``(col, op, value)`` with op in
    ``in / not in / = / != / < / > / <= / >=``; a DataFrame value for
    ``in``/``not in`` becomes a semi/anti join (J4/J5)."""
    for col, op, val in spec:
        if op == "in":
            if isinstance(val, DataFrame):
                df = df.join(val, on=col, how="left_semi")
            else:
                df = df.where(F.col(col).isin(list(val)))
        elif op == "not in":
            if isinstance(val, DataFrame):
                df = df.join(val, on=col, how="left_anti")
            else:
                df = df.where(~F.col(col).isin(list(val)))
        elif op in ("=", "=="):
            df = df.where(F.col(col) == val)
        elif op == "!=":
            df = df.where(F.col(col) != val)
        elif op == "<":
            df = df.where(F.col(col) < val)
        elif op == ">":
            df = df.where(F.col(col) > val)
        elif op == "<=":
            df = df.where(F.col(col) <= val)
        elif op == ">=":
            df = df.where(F.col(col) >= val)
        else:
            raise ValueError(f"unknown filter op {op!r}")
    return df
