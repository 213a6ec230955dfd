"""Mergeable sketches: tolerance vs exact, and the mergeability property
(sketch-of-union == merge-of-per-partition-sketches) that makes them the
re-scan-free 100 TB path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from feature_store_spark.operators.sketches import (
    approx_quantiles,
    distinct_sketch,
    merge_distinct_sketches,
)


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(5)
    n = 40_000
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "day": rng.integers(0, 10, n),
                "event_type": rng.choice(["a", "b", "c"], n),
                "user_id": rng.integers(0, 3_000, n),
                "value": rng.exponential(10.0, n),
            }
        )
    )


def test_hll_estimate_within_error_bound(spark, events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    sk = distinct_sketch(events, ["event_type", "day"], "user_id")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(sk, ["event_type"]).collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:  # lgk=12 → ~1.6% RSE; 5% is a ~3σ bound
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])


def test_hll_merge_equals_direct_sketch(spark, events):
    """Union is associative: merging per-day sketches estimates exactly
    what one direct sketch over all days estimates."""
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(
            distinct_sketch(events, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(
            distinct_sketch(events, ["event_type", "day"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert direct == merged


def test_approx_quantiles_vs_exact(spark, events):
    """GK with rank error 1/accuracy: the approx q-quantile's RANK must
    be within n/accuracy of the exact rank — checked via the exact
    sorted values, per key."""
    got = approx_quantiles(
        events, ["event_type"], "value", quantiles=(0.5, 0.9),
        accuracy=1_000,
    ).collect()
    pdf = events.toPandas()
    for r in got:
        vals = np.sort(pdf[pdf.event_type == r["event_type"]]["value"].to_numpy())
        n = len(vals)
        assert r["n"] == n
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            rank = np.searchsorted(vals, r[col], side="right")
            assert abs(rank - q * n) <= n / 1_000 + 1, (r["event_type"], col)
