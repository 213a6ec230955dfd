"""Capture .explain("formatted") for every registry query + the bench
composites, into plans/<tag>/<query>.txt — the round-6 optimization
evidence trail (judge checks plan claims against these files).

Run:  python scripts/capture_plans.py <tag> [query ...]
Uses the SAME session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle=2x cores, maxPartitionBytes=1m) so plans match what the driver's
bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    only = set(sys.argv[2:])
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from feature_store_spark.registry import REGISTRY
    from feature_store_spark.session import get_spark

    spark = get_spark(
        "capture_plans", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": "1m"},
    )

    # bench composites (mirror bench.py's construction, plans only)
    import pyspark.sql.functions as F

    from feature_store_spark.functions.images import with_image_features
    from feature_store_spark.operators.asof import asof_join
    from feature_store_spark.operators.windows import sessionize, with_rolling

    def image_feature_pipeline():
        images = spark.read.parquet(
            os.path.join(REPO, "BENCH", "data", "images_150000.parquet"))
        obs = spark.read.parquet(
            os.path.join(REPO, "BENCH", "data", "obs_150000.parquet"))
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

    def skew(strategy):
        events = spark.read.parquet(
            os.path.join(REPO, "BENCH", "data", "skew_events_2000000.parquet"))
        obs = spark.read.parquet(
            os.path.join(REPO, "BENCH", "data", "skew_obs_200000.parquet"))
        return asof_join(
            obs, events, on="entity_id", obs_time="obs_time",
            feature_time="event_time", feature_cols=["fv1", "fv2"],
            tiebreak_cols=["seq"], strategy=strategy, slice_duration="1d")

    composites = {
        "image_feature_pipeline": image_feature_pipeline,
        "asof_skew_union": lambda: skew("union"),
        "asof_skew_sliced": lambda: skew("sliced"),
    }

    skip_exec = {"image_pipeline", "resize_roundtrip"}  # they write sidecars
    names = list(REGISTRY) + list(composites)
    for name in names:
        if only and name not in only:
            continue
        if name in skip_exec and not only:
            continue
        try:
            if name in composites:
                df = composites[name]()
            else:
                fn, _ = REGISTRY[name]
                df = fn(spark, SF_DIR)
            text = explain_str(df)
        except Exception as e:  # pragma: no cover - diagnostic tool
            text = f"ERROR building/explaining {name}: {e!r}"
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path)
    from feature_store_spark.operators.asof import release_sliced_caches
    release_sliced_caches()
    spark.stop()


if __name__ == "__main__":
    main()
