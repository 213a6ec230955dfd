"""Composite-phase scaling measurement (round-5): time the DECODE stage
and the FULL composite (decode → rolling+session → sliced as-of) in ONE
JVM on the cached input.  Driven interleaved at two masters by
scripts/bench_scaling_cluster.sh; per-JVM decode+full walls let the
report split capacity (decode, CPU-bound) from the shuffle tail.

The warm pass runs the FULL pipeline shape on a deterministic ~8% subset
(hash-sampled): python-worker spawn, codegen for every stage, shuffle
buffer pools — without paying a whole extra full pass per JVM.

Run: spark-submit --master <M> --py-files engine.zip \
       scripts/bench_phase_decompose.py <data_root> <n_images> <n_obs>
Prints one JSON line ``DECOMPJSON {...}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main() -> None:
    data_root = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    n_obs = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000

    spark = SparkSession.builder.getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.shuffle.partitions": "64",
    }.items():
        spark.conf.set(k, v)

    from feature_store_spark.functions.images import with_image_features
    from feature_store_spark.operators.asof import asof_join
    from feature_store_spark.operators.windows import sessionize, with_rolling

    img_path = os.path.join(data_root, f"images_{n_images}.parquet")
    obs_path = os.path.join(data_root, f"imgobs_{n_obs}.parquet")

    def decode(images):
        return with_image_features(images)

    def full(images, obs):
        f = with_rolling(decode(images), "image_id", "event_time",
                         {"roll_cnt": F.count(F.lit(1))}, window="1d")
        f = sessionize(f, "image_id", "event_time", gap="30m",
                      tiebreak=["phash"])
        return asof_join(
            obs, f,
            feature_cols=["phash", "mean_r", "mean_g", "std_r", "roll_cnt",
                          "session_id"],
            tiebreak_cols=["phash"], strategy="sliced", slice_duration="1d",
        )

    images = spark.read.parquet(img_path)
    obs = spark.read.parquet(obs_path)

    out = {"cores": spark.sparkContext.defaultParallelism,
           "n_images": n_images, "n_obs": n_obs}
    # pipeline-shaped warm on a deterministic ~8% subset
    sub = F.pmod(F.xxhash64("image_id"), F.lit(12)) == 0
    full(images.where(sub), obs.where(sub)) \
        .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    t0 = time.time()
    decode(images).write.format("noop").mode("overwrite").save()
    out["decode_sec"] = round(time.time() - t0, 2)

    spark.catalog.clearCache()
    t0 = time.time()
    full(images, obs).write.format("noop").mode("overwrite").save()
    out["full_sec"] = round(time.time() - t0, 2)

    out["tail_sec"] = round(out["full_sec"] - out["decode_sec"], 2)
    out["cores_end"] = spark.sparkContext.defaultParallelism
    print("DECOMPJSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
