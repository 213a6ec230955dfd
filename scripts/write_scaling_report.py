"""Assemble BENCH/BASELINE.md from the raw scaling-run JSON files."""

from __future__ import annotations

import json
import os

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

rows = {}
for phase in ("asof", "image"):
    for cores in (8, 32):
        p = f"BENCH/raw_{phase}_{cores}.json"
        if os.path.exists(p):
            with open(p) as f:
                rows[(phase, cores)] = json.load(f)

lines = [
    "# BENCH baseline — two-cluster-size scaling evidence",
    "",
    "Protocol (BASELINE.md / north rule): identical deterministic input, the",
    "same spark-submit --py-files job at local[8] (N) and local[32] (4N);",
    "each phase in its own JVM, warm pass then min-of-3 measured passes;",
    "efficiency = throughput(4N) / (4 x throughput(N)).",
    "",
    "Input: 4M feature events / 2M observations (md5-derived, Zipf-skewed",
    "entities, skew_power=2) and 1M encoded images / 1M observations",
    "(executor-side deterministic codec), cached in BENCH/data/scaling.",
    "",
    "| phase | rows/sec @ local[8] | rows/sec @ local[32] | speedup | efficiency |",
    "|---|---|---|---|---|",
]
for phase, key, label in (
    ("asof", "asof_rows_per_sec",
     "windowed features + sliced as-of (2M obs)"),
    ("image", "image_rows_per_sec",
     "image materialization: decode->windows->as-of (1M obs)"),
):
    a = rows.get((phase, 8))
    b = rows.get((phase, 32))
    if not (a and b):
        continue
    sp = b[key] / a[key]
    lines.append(
        f"| {label} | {a[key]:,.0f} | {b[key]:,.0f} | {sp:.2f}x | {sp/4:.2f} |"
    )
lines += [
    "",
    "Raw per-run JSON: `BENCH/raw_<phase>_<cores>.json`.",
    "",
    "Notes",
    "- The image phase is the realistic 100 TB regime (CPU-bound decode in",
    "  Arrow-batched pandas UDFs); the as-of phase at this scale is",
    "  stage-latency/shuffle-bound in local mode, which understates cluster",
    "  scaling - every stage is a hash shuffle by entity that would",
    "  parallelize across real executors.",
    "- `spark.sql.files.maxPartitionBytes=2m` for binary image tables:",
    "  input splits sized for per-row decode CPU, not byte volume.",
    "- Lineage/skew/watermark records per partition are exercised by the",
    "  materialize pipeline (see `feature_store_spark/pipeline/materialize.py`",
    "  and tests/test_pipeline_e2e.py).",
]
with open("BENCH/BASELINE.md", "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
