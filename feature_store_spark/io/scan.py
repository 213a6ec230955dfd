"""Scan-parallelism helpers.

``fan_out`` fixes the small-input/heavy-CPU mismatch (optimization guide
§2.5 "input skew"): a few MB of compressed parquet produce one or two scan
splits, so a map stage whose per-row cost is large (md5 shingle hashing,
vector math) runs on 1-2 cores while the rest of the cluster idles.  The
repartition is ADAPTIVE — it only fires when the scan's split count is
below the cluster's parallelism, so at production scale (thousands of
splits) it is a no-op and adds no shuffle.

Round-robin ``repartition(n)`` is retry-safe here: Spark sorts input rows
before round-robin assignment (``spark.sql.execution.sortBeforeRepartition``,
on by default, SPARK-23207) so a re-run task reproduces the same
row-to-partition mapping, and every downstream operator in this engine is
partition-count-invariant by contract (no ``F.rand``, total-order
tiebreaks everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when its
    current partitioning has fewer slots — otherwise return it unchanged.

    Use on a SCAN that feeds CPU-heavy per-row work (hashing, shingling,
    per-pair vector math).  The data moved is the scan's own (small)
    output; the unlocked parallelism is worth orders more than the local
    exchange when the input is a handful of splits.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    return df.repartition(target)
