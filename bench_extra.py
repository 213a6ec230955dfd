"""Round-6 optimization harness: per-query noop-sink timing in ONE session
(interleaved min-of-N), plus image-pipeline stage decomposition.

This is the §1.4-style isolation bench the optimization guide asks for;
``bench.py`` itself is FROZEN for driver measurement and stays untouched.

Usage:
  python bench_extra.py q1 q2 ...            # registry/composite names
  python bench_extra.py --rounds 5 q1 q2
  python bench_extra.py image_stages         # decode / windows / asof split

Prints one JSON line: {"queries": {name: min_sec}, "samples": {...}, ...}.
Session shape matches bench.py exactly (local[$SPARK_GRAFT_CPUS],
shuffle = 2x cores, maxPartitionBytes=1m) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DATA = os.path.join(REPO, "BENCH", "data")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    rounds = 3
    if args and args[0] == "--rounds":
        rounds = int(args[1])
        args = args[2:]
    names = args or ["winnow_fingerprint", "minhash_signatures", "lsh_pairs"]

    import pyspark.sql.functions as F

    from feature_store_spark.functions.images import with_image_features
    from feature_store_spark.operators.asof import asof_join, release_sliced_caches
    from feature_store_spark.operators.windows import sessionize, with_rolling
    from feature_store_spark.registry import REGISTRY
    from feature_store_spark.session import get_spark

    spark = get_spark(
        "bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": "1m"},
    )

    img_path = os.path.join(BENCH_DATA, "images_150000.parquet")
    obs_path = os.path.join(BENCH_DATA, "obs_150000.parquet")
    ev_path = os.path.join(BENCH_DATA, "skew_events_2000000.parquet")
    sobs_path = os.path.join(BENCH_DATA, "skew_obs_200000.parquet")

    def image_full():
        images = spark.read.parquet(img_path)
        obs = spark.read.parquet(obs_path)
        feats = with_image_features(images)
        feats = with_rolling(
            feats, "image_id", "event_time",
            {"roll_cnt": F.count(F.lit(1)), "roll_mean_r": F.avg("mean_r")},
            window="1d")
        feats = sessionize(feats, "image_id", "event_time", gap="30m",
                           tiebreak=["phash"])
        return asof_join(
            obs, feats,
            feature_cols=["phash", "mean_r", "mean_g", "mean_b", "std_r",
                          "roll_cnt", "roll_mean_r", "session_id"],
            tiebreak_cols=["phash"], strategy="sliced", slice_duration="1d")

    def image_decode():
        return with_image_features(spark.read.parquet(img_path))

    def image_windows():
        feats = with_image_features(spark.read.parquet(img_path))
        feats = with_rolling(
            feats, "image_id", "event_time",
            {"roll_cnt": F.count(F.lit(1)), "roll_mean_r": F.avg("mean_r")},
            window="1d")
        return sessionize(feats, "image_id", "event_time", gap="30m",
                          tiebreak=["phash"])

    def skew(strategy):
        events = spark.read.parquet(ev_path)
        obs = spark.read.parquet(sobs_path)
        return asof_join(
            obs, events, on="entity_id", obs_time="obs_time",
            feature_time="event_time", feature_cols=["fv1", "fv2"],
            tiebreak_cols=["seq"], strategy=strategy, slice_duration="1d")

    composites = {
        "image_feature_pipeline": image_full,
        "image_decode": image_decode,
        "image_windows": image_windows,
        "asof_skew_union": lambda: skew("union"),
        "asof_skew_sliced": lambda: skew("sliced"),
    }
    if names == ["image_stages"]:
        names = ["image_decode", "image_windows", "image_feature_pipeline"]

    def build(name):
        if name in composites:
            return composites[name]()
        fn, _ = REGISTRY[name]
        return fn(spark, SF_DIR)

    # warm-up: JVM codegen + Python/Arrow worker spawn at tiny scale
    warm_fn, _ = REGISTRY["asof_join"]
    _noop(warm_fn(spark, "/root/testdata/sf0.001"))
    warm_py, _ = REGISTRY["cosine_topk"]
    _noop(warm_py(spark, "/root/testdata/sf0.001"))
    release_sliced_caches()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {}
    for _ in range(rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            _noop(build(name))
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
            release_sliced_caches()
            spark.catalog.clearCache()
    out = {
        "queries": {q: min(v) for q, v in samples.items()},
        "samples": samples,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "rounds": rounds,
    }
    print("EXTRAJSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
