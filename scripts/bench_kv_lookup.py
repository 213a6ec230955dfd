"""Micro-bench: online KV point lookups, ranged vs unranged layout.

Measures the claim behind ``ParquetKVSink``'s range-partitioned + sorted
snapshot layout (round-4 commit 312b6e7): ``multi_get``'s pyarrow key
predicate prunes to the files/row-groups whose stats overlap the request,
so a point lookup reads a couple of files instead of the whole snapshot.

Run: python scripts/bench_kv_lookup.py [n_keys] [n_files] [reps]
Prints one JSON line with median multi_get latency (16-key request) over
a ~n_keys-entity snapshot for both layouts, plus bytes-touched figures.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    from feature_store_spark.pipeline.infer import OnlineStore, ParquetKVSink
    from feature_store_spark.session import get_spark

    spark = get_spark("bench_kv_lookup")
    tmp = tempfile.mkdtemp(prefix="fss_kv_bench_")

    # realistic serving row: string key + a dozen feature columns
    snap = spark.range(n_keys).select(
        F.concat(F.lit("user_"), F.lpad(F.col("id").cast("string"), 9, "0"))
        .alias("user_id"),
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        *[
            ((F.col("id") * (i + 3)) % 9973 / 7.0).alias(f"f{i}")
            for i in range(12)
        ],
    )

    ranged = OnlineStore(f"{tmp}/ranged",
                         sink=ParquetKVSink(f"{tmp}/ranged", n_files=n_files))
    ranged.publish("grp", snap, key="user_id")

    # unranged: same rows, same file count, keys scattered across files
    unranged = OnlineStore(f"{tmp}/unranged",
                           sink=ParquetKVSink(f"{tmp}/unranged"))
    snap.repartition(n_files, F.md5("user_id")).write.mode(
        "overwrite").parquet(unranged.sink.path("grp"))

    import numpy as np

    rng = np.random.default_rng(7)

    def bench(store):
        lat = []
        for _ in range(reps):
            keys = [f"user_{k:09d}"
                    for k in rng.integers(0, n_keys, 16)]
            t0 = time.perf_counter()
            got = store.multi_get("grp", keys, "user_id")
            lat.append(time.perf_counter() - t0)
            assert len(got) == len(set(keys))
        return lat

    bench(ranged)  # warm the filesystem cache on both layouts
    bench(unranged)
    lat_r = bench(ranged)
    lat_u = bench(unranged)

    med_r = statistics.median(lat_r)
    med_u = statistics.median(lat_u)
    print(json.dumps({
        "metric": "online_kv_multi_get_median_sec",
        "n_keys": n_keys,
        "n_files": n_files,
        "request_size": 16,
        "reps": reps,
        "ranged_sec": round(med_r, 4),
        "unranged_sec": round(med_u, 4),
        "speedup": round(med_u / med_r, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
