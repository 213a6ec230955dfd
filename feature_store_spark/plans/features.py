"""Declarative feature-definition registry — the engine's replacement for
the reference's Feathr DSL surface.

Reference parity map (SURVEY.md §1.1, §2):
- ``Feature`` ≈ Feathr anchored feature with a SparkSQL transform expr
  (``featurestore/transform/feature_transform.py:56-97``)
- ``WindowAggFeature`` ≈ ``WindowAggTransformation(agg_expr, agg_func,
  window)`` (``feature_transform.py:179-204``) — LATEST/SUM/COUNT/AVG/MAX/MIN
  over a trailing time window, evaluated point-in-time at retrieval
- ``DerivedFeature`` ≈ ``DerivedFeature`` combining other features
  (``feature_transform.py:246-302``)
- ``FeatureAnchor`` ≈ ``FeatureAnchor(source, features)``
  (``registry/feature_registry.py:109-208``); a source without an event
  timestamp column is a static dimension (joined plainly, not as-of)
- ``get_offline_features`` ≈ the Feathr PIT retrieval
  (``pipeline/training_pipeline.py:119-142``), rebuilt on the engine's
  from-scratch as-of join
- ``materialize_latest`` ≈ online materialization of latest values per key
  (``pipeline/materialize_pipeline.py:139-162``)

Everything is plain Python + Column expressions — no expression-string
compiler beyond ``F.expr`` (Catalyst parses SparkSQL strings natively,
which is exactly what Feathr's JVM runtime did with these exprs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.operators.asof import asof_join


@dataclass
class Feature:
    """Anchored feature: a SparkSQL expression over the source's columns."""

    name: str
    expr: str
    dtype: str | None = None

    def column(self):
        col = F.expr(self.expr)
        if self.dtype:
            col = col.cast(self.dtype)
        return col.alias(self.name)


@dataclass
class WindowAggFeature:
    """Trailing-window aggregate evaluated point-in-time at retrieval.

    ``agg`` ∈ {latest, sum, count, avg, max, min}; ``window`` like "7d".
    """

    name: str
    expr: str
    agg: str = "latest"
    window: str = "7d"
    dtype: str | None = None


@dataclass
class FeatureAnchor:
    """(source, key, features).  ``event_time`` None ⇒ static dimension."""

    name: str
    key: str
    features: list[Feature] = field(default_factory=list)
    window_features: list[WindowAggFeature] = field(default_factory=list)
    event_time: str | None = None
    tiebreak: list[str] | None = None


@dataclass
class DerivedFeature:
    """SparkSQL expression over already-retrieved feature columns."""

    name: str
    expr: str
    dtype: str | None = None


class FeatureRegistry:
    """Holds anchors + derived features; sources bound at retrieval time."""

    def __init__(self) -> None:
        self.anchors: dict[str, FeatureAnchor] = {}
        self.derived: list[DerivedFeature] = []

    def register_anchor(self, anchor: FeatureAnchor) -> None:
        if anchor.name in self.anchors:
            raise ValueError(f"anchor {anchor.name!r} already registered")
        self.anchors[anchor.name] = anchor

    def register_derived(self, feature: DerivedFeature) -> None:
        self.derived.append(feature)

    def feature_names(self) -> list[str]:
        out = []
        for a in self.anchors.values():
            out += [f.name for f in a.features]
            out += [w.name for w in a.window_features]
        out += [d.name for d in self.derived]
        return out


def _anchor_feature_frame(source: DataFrame, anchor: FeatureAnchor) -> DataFrame:
    """Evaluate the anchor's plain features over its source."""
    cols = [F.col(anchor.key)]
    if anchor.event_time:
        cols.append(F.col(anchor.event_time))
    for tb in anchor.tiebreak or []:
        cols.append(F.col(tb))
    cols += [f.column() for f in anchor.features]
    # window features need their raw expr evaluated per event row; the
    # trailing aggregation happens at retrieval (PIT-correct).
    cols += [F.expr(w.expr).alias(f"__raw_{w.name}") for w in anchor.window_features]
    return source.select(*cols)


def get_offline_features(
    observation: DataFrame,
    sources: dict[str, DataFrame],
    registry: FeatureRegistry,
    obs_key_map: dict[str, str] | None = None,
    obs_time: str = "obs_time",
    asof_strategy: str = "union",
) -> DataFrame:
    """PIT-correct retrieval: for each anchor, attach its features to the
    observation spine — as-of join for event sources, broadcast left join
    for static dimensions; then evaluate derived features.

    ``sources`` maps anchor name → DataFrame.  ``obs_key_map`` maps anchor
    key column → observation column when names differ.
    """
    obs_key_map = obs_key_map or {}
    out = observation
    for name, anchor in registry.anchors.items():
        src = sources[name]
        feat = _anchor_feature_frame(src, anchor)
        obs_key = obs_key_map.get(anchor.key, anchor.key)
        if anchor.event_time is None:
            # static dimension: latest-free plain left join (broadcast-able)
            if obs_key != anchor.key:
                feat = feat.withColumnRenamed(anchor.key, obs_key)
            out = out.join(F.broadcast(feat), on=obs_key, how="left")
            continue
        # event source: window features first (per-event trailing aggs are
        # expressed at retrieval via as-of + lookback for LATEST, or
        # pre-aggregated rolling columns for sum/count/avg/max/min)
        from feature_store_spark.operators.windows import with_rolling

        roll_aggs = {}
        for w in anchor.window_features:
            raw = f"__raw_{w.name}"
            if w.agg == "latest":
                continue  # handled by the as-of lookback itself
            fn = {"sum": F.sum, "count": F.count, "avg": F.avg,
                  "max": F.max, "min": F.min}[w.agg]
            roll_aggs[w.name] = fn(raw)
        windows_used = {w.window for w in anchor.window_features if w.agg != "latest"}
        for wdur in windows_used:
            aggs = {n: a for n, a in roll_aggs.items()
                    if next(w for w in anchor.window_features if w.name == n).window == wdur}
            feat = with_rolling(feat, anchor.key, anchor.event_time, aggs,
                                window=wdur, tiebreak=anchor.tiebreak)
        latest_feats = [w for w in anchor.window_features if w.agg == "latest"]
        for w in latest_feats:
            feat = feat.withColumnRenamed(f"__raw_{w.name}", w.name)
        feat = feat.drop(*[c for c in feat.columns if c.startswith("__raw_")])

        feature_cols = [f.name for f in anchor.features] + [
            w.name for w in anchor.window_features
        ]
        if obs_key != anchor.key:
            feat = feat.withColumnRenamed(anchor.key, obs_key)
        from feature_store_spark.operators.asof import duration_to_us

        lookback = (
            min((w.window for w in latest_feats), key=duration_to_us)
            if latest_feats else None
        )
        joined = asof_join(
            out,
            feat,
            on=obs_key,
            obs_time=obs_time,
            feature_time=anchor.event_time,
            feature_cols=feature_cols,
            tiebreak_cols=anchor.tiebreak,
            lookback=lookback,
            strategy=asof_strategy,
            feature_ts_col=f"__{name}_ts",
        )
        out = joined.drop(f"__{name}_ts")
    for d in registry.derived:
        col = F.expr(d.expr)
        if d.dtype:
            col = col.cast(d.dtype)
        out = out.withColumn(d.name, col)
    return out


def materialize_latest(
    source: DataFrame,
    anchor: FeatureAnchor,
) -> DataFrame:
    """Latest feature values per key — what the reference pushes to its
    online store daily (``materialize_pipeline.py:139-162``)."""
    from feature_store_spark.operators.windows import dedup_latest

    feat = _anchor_feature_frame(source, anchor)
    for w in anchor.window_features:
        feat = feat.withColumnRenamed(f"__raw_{w.name}", w.name)
    if anchor.event_time is None:
        return feat
    return dedup_latest(
        feat, keys=[anchor.key],
        order_desc=[anchor.event_time, *(anchor.tiebreak or [])],
    )
