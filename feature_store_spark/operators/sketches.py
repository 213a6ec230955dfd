"""Mergeable sketches — the scale path for corpus statistics.

At 100 TB you do not re-scan history to count distincts or refresh
percentiles: you keep a small MERGEABLE summary per partition (day,
shard) and combine summaries.  Everything here is Spark's built-in
JVM-side sketch machinery (DataSketches HLL, GK percentiles) — no Python
in the aggregation path; this module only fixes the engine's shapes
(per-key × per-partition sketch tables, merge step, estimate step).

These are ESTIMATES, so they have no DuckDB value-oracle gate row (the
gate demands exact hash equality); their correctness contract is the
tolerance + mergeability property tests in tests/test_sketches.py:
estimate within the sketch's error bound of the exact answer, and
sketch-of-union == merge-of-sketches.

Exact counterparts in the engine: ``count_distinct`` (gate query, A4)
and ``operators/grouped.exact_quantiles`` (applyInPandas, whole-group
memory bound) — use those below the scale where sketches pay.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# HLL log2(K): 12 → 4096 buckets, ~1.6% relative standard error, ~2.5 KB
# per sketch — per-key-per-day sketch tables stay tiny at any corpus size
DEFAULT_LGK = 12


def distinct_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    lgk: int = DEFAULT_LGK,
    out_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per key group over ``col`` — the per-partition
    summary you persist (binary column) next to the partition it
    describes.  Map-side combinable: Spark's hll_sketch_agg has partial
    merge, so a hot key shuffles K buckets, not its rows."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(out_col)
    )


def merge_distinct_sketches(
    df: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Combine per-partition sketches to an estimate per key: union is
    associative/commutative, so any grouping of partitions gives the
    same sketch — the whole point (re-aggregation without re-scan)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).cast("long").alias(out_col)
    )


def kll_value_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 200,
    out_col: str = "sketch",
) -> DataFrame:
    """One KLL quantile sketch (DataSketches, mergeable binary) per key
    group over double ``col`` — the persistable counterpart of
    :func:`approx_quantiles` (GK summaries aren't exposed as columns;
    KLL is, with ~1.65% rank error at the default k=200 and a few KB per
    sketch).  Map-side combinable like the HLL."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(k))
        .alias(out_col)
    )


def merge_kll_sketches(
    df: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Combine per-partition KLL sketches and read quantile estimates per
    key (column names q50/q90/… match ``exact_quantiles``).  KLL merge is
    associative — any grouping of partitions estimates the union."""
    from feature_store_spark.operators.grouped import _quantile_names

    names = _quantile_names(quantiles)
    merged = df.groupBy(*keys).agg(
        F.kll_merge_agg_double(F.col(sketch_col)).alias("__m")
    )
    return merged.select(
        *keys,
        *[
            F.kll_sketch_get_quantile_double("__m", F.lit(q)).alias(name)
            for q, name in zip(quantiles, names)
        ],
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key approximate percentiles via the GK summary
    (``percentile_approx`` — rank error ≤ 1/accuracy, map-side
    combinable).  Column names match ``exact_quantiles`` (q50, q90, …)
    so the two are drop-in interchangeable across the scale boundary."""
    from feature_store_spark.operators.grouped import _quantile_names

    names = _quantile_names(quantiles)
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.percentile_approx(
            F.col(value_col), F.lit(q), F.lit(accuracy)
        ).alias(name)
        for q, name in zip(quantiles, names)
    ]
    return df.groupBy(*keys).agg(*aggs)
