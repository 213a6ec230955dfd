"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "feature_rows_per_sec": ...}

Each query is forced to full materialization via the noop sink (count()
alone can let Catalyst prune the computed columns).  The image-feature
materialization benchmark (decode → windows → as-of, the north-rule
pipeline) runs over a cached deterministic dataset in BENCH/data/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "data")

# headline operator queries from the registry (run at SF_DIR)
HEADLINE = [
    "asof_join",
    "asof_lookback",
    "rolling",
    "sessionize",
    "lag_lead",
    "rollup_sum_max",
    "broadcast_join",
    "range_join",
    "minhash_signatures",
    "lsh_pairs",
    "simhash",
    "cosine_topk",
]

N_BENCH_IMAGES = 30_000
N_BENCH_ENTITIES = 300
N_BENCH_OBS = 30_000


def ensure_image_bench_data() -> tuple[str, str]:
    """Generate-once (deterministic) images + observations parquet."""
    os.makedirs(BENCH_DATA, exist_ok=True)
    img_path = os.path.join(BENCH_DATA, f"images_{N_BENCH_IMAGES}.parquet")
    obs_path = os.path.join(BENCH_DATA, f"obs_{N_BENCH_OBS}.parquet")
    if not (os.path.exists(img_path) and os.path.exists(obs_path)):
        from feature_store_spark.pipeline.datagen import (
            generate_images,
            generate_observations,
            write_parquet,
        )

        img = generate_images(n_rows=N_BENCH_IMAGES, n_entities=N_BENCH_ENTITIES, seed=42)
        obs = generate_observations(img, n_obs=N_BENCH_OBS, seed=43)
        write_parquet(img, img_path)
        write_parquet(obs, obs_path)
    return img_path, obs_path


def bench_image_pipeline(spark, img_path: str, obs_path: str) -> tuple[float, int]:
    """The flagship materialization: decode → rolling → session → as-of."""
    import pyspark.sql.functions as F

    from feature_store_spark.functions.images import with_image_features
    from feature_store_spark.operators.asof import asof_join
    from feature_store_spark.operators.windows import sessionize, with_rolling

    images = spark.read.parquet(img_path)
    obs = spark.read.parquet(obs_path)
    t0 = time.time()
    feats = with_image_features(images)
    feats = with_rolling(
        feats, "image_id", "event_time",
        {"roll_cnt": F.count(F.lit(1)), "roll_mean_r": F.avg("mean_r")},
        window="1d",
    )
    feats = sessionize(feats, "image_id", "event_time", gap="30m", tiebreak=["phash"])
    result = asof_join(
        obs, feats,
        feature_cols=["phash", "mean_r", "mean_g", "mean_b", "std_r",
                      "roll_cnt", "roll_mean_r", "session_id"],
        tiebreak_cols=["phash"],
        strategy="sliced",
        slice_duration="1d",
    )
    result.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    return dt, N_BENCH_OBS


def main() -> None:
    from feature_store_spark.registry import REGISTRY
    from feature_store_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS) * 2,
        # the 30k-image bench parquet is ~40MB; split ~1MB so decode
        # parallelism matches the core count (split sizing = rows/byte x
        # per-row CPU, not byte volume)
        extra_conf={"spark.sql.files.maxPartitionBytes": "1m"},
    )
    times: dict[str, float] = {}

    img_path, obs_path = ensure_image_bench_data()
    # warm the JVM (codegen, window exec, Arrow workers) at tiny scale so
    # the first timed query doesn't absorb one-time JIT cost
    warm_fn, _ = REGISTRY["asof_join"]
    warm_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()

    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    img_sec, n_obs = bench_image_pipeline(spark, img_path, obs_path)
    times["image_feature_pipeline"] = round(img_sec, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline query wall-clock (noop sink) + image feature materialization",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "feature_rows_per_sec": round(n_obs / img_sec, 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
