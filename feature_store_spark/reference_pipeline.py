"""Clean-room reimplementation of the reference feature store's per-entity
feature families, so a user of ``giangnmt98/feature_store`` can run their
exact pipeline semantics on this engine.

Each function cites the reference behavior it reproduces (file:line in
/root/reference); implementations are written fresh against those semantics
(SURVEY.md §2) in idiomatic DataFrame ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# reference constants (configs/conf.py:307-308, 340-341, 349-351)
VOD_DIRTY_CLICK_S = 60
MOVIE_DIRTY_CLICK_S = 120
ROLLING_DAYS_POPULARITY = 30
ROLLING_DAYS_PREFER_TYPE = 30
WEIGHTED_LR_DURATION_CAP = 3600.0
POPULARITY_POSITIVE_WEIGHTS = [1.0, 1.0, 1.5, 2.0, 3.0]


# ---------------------------------------------------------------------
# Entity keys (base/feature_preprocessing.py:68-105 create_user_key,
# :107-128 create_item_key)
# ---------------------------------------------------------------------

def create_user_key(df: DataFrame) -> DataFrame:
    """``user_id = str(long(profile_id, -1→0, null→0)) + "#" + lower(username)``;
    null keys dropped."""
    uid = F.when(F.col("profile_id") == -1, F.lit(0.0)) \
        .otherwise(F.col("profile_id").cast("double"))
    uid = F.coalesce(uid, F.lit(0.0))
    uid = F.round(uid).cast("long").cast("string")
    return (
        df.withColumn("username", F.lower(F.col("username")))
        .withColumn("user_id", F.concat(uid, F.lit("#"), F.col("username")))
        .where(F.col("user_id").isNotNull())
    )


def create_item_key(df: DataFrame) -> DataFrame:
    """``item_id = content_type + "#" + content_id``; null keys dropped."""
    return df.withColumn(
        "item_id", F.concat(F.col("content_type"), F.lit("#"), F.col("content_id"))
    ).where(F.col("item_id").isNotNull())


# ---------------------------------------------------------------------
# User-info cleaning (preprocess/feature_preprocessing.py:86-133)
# ---------------------------------------------------------------------

def clean_user_info(df: DataFrame, valid_package_codes: list[str]) -> DataFrame:
    """Null out implausible ages (≤5 or ≥95), derive the 6-bin ``age_group``
    (child/student/play/married/senior/older), whitelist ``package_code``
    (else 'None')."""
    age = F.when((F.col("age") >= 95) | (F.col("age") <= 5), F.lit(None)) \
        .otherwise(F.col("age"))
    df = df.withColumn("age", age)
    df = df.withColumn(
        "age_group",
        F.when(F.col("age") < 15, "child")
        .when((F.col("age") >= 15) & (F.col("age") < 22), "student")
        .when((F.col("age") >= 22) & (F.col("age") < 30), "play")
        .when((F.col("age") >= 30) & (F.col("age") < 40), "married")
        .when((F.col("age") >= 40) & (F.col("age") < 65), "senior")
        .when(F.col("age") >= 65, "older"),
    )
    return df.withColumn(
        "package_code",
        F.when(F.col("package_code").isin(valid_package_codes),
               F.col("package_code")).otherwise(F.lit("None")),
    )


# ---------------------------------------------------------------------
# MD5 bucket hashing with collision override
# (hashing_function.py:142-186; v1 substr(1,15), v2 substr(18,15))
# ---------------------------------------------------------------------

def hash_bucket(
    df: DataFrame,
    col: str,
    out: str,
    bucket_size: int,
    version: int = 1,
    collision_ids: list[str] | None = None,
) -> DataFrame:
    """``conv(substr(md5(col), off, 15), 16, 10) % bucket_size`` with the
    reference's collision-list override: listed ids map to the sentinel
    (``bucket_size`` for v1, ``0`` for v2).  Row count is preserved
    (invariant asserted in tests, reference A10)."""
    off = 1 if version in (0, 1) else 18
    bucket = (
        F.conv(F.substring(F.md5(F.col(col)), off, 15), 16, 10).cast("long")
        % bucket_size
    )
    df = df.withColumn(out, bucket)
    if collision_ids and version != 0:
        fill = bucket_size if version == 1 else 0
        df = df.withColumn(
            out,
            F.when(F.col(col).isin(collision_ids), F.lit(fill)).otherwise(
                F.col(out)
            ),
        )
    return df


# ---------------------------------------------------------------------
# Interaction rollup + 3-state labeling
# (interaction_feature_preprocessing.py:103-118, :215-235)
# ---------------------------------------------------------------------

def rollup_interactions(df: DataFrame) -> DataFrame:
    """Collapse multi-part views: per (user, item, profile, content, type,
    date): sum(duration), max(is_vod_content)."""
    return df.groupBy(
        "user_id", "item_id", "profile_id", "content_id", "content_type",
        "filename_date",
    ).agg(
        F.sum("duration").alias("duration"),
        F.max("is_vod_content").alias("is_vod_content"),
    )


def label_interactions(df: DataFrame) -> DataFrame:
    """``is_interacted``: 2 = real watch, 0 = dirty click (< 60s vod /
    < 120s movie), 1 = sampled negative (duration == 0)."""
    lab = F.lit(2)
    lab = F.when(
        ((F.col("duration") < VOD_DIRTY_CLICK_S) & F.col("is_vod_content"))
        | ((F.col("duration") < MOVIE_DIRTY_CLICK_S) & ~F.col("is_vod_content")),
        F.lit(0),
    ).otherwise(lab)
    lab = F.when(F.col("duration") == 0, F.lit(1)).otherwise(lab)
    return df.withColumn("is_interacted", lab)


def weighted_lr(df: DataFrame, user_weight_col: str = "user_weight",
                item_weight_col: str = "item_weight") -> DataFrame:
    """``weighted_lr = gate * item_weight * user_weight`` where gate = 1 for
    negatives/dirty clicks and ``least(duration, 3600)/3600`` otherwise
    (feature_transform.py:292-302)."""
    gate = F.when(F.col("is_interacted").isin(0, 1), F.lit(1.0)).otherwise(
        F.least(F.col("duration").cast("float"), F.lit(WEIGHTED_LR_DURATION_CAP))
        / F.lit(WEIGHTED_LR_DURATION_CAP)
    )
    return df.withColumn(
        "weighted_lr",
        gate * F.col(item_weight_col) * F.col(user_weight_col),
    )


# ---------------------------------------------------------------------
# Rolling 30-day popularity groups
# (online_feature_preprocessing.py:60-112)
# ---------------------------------------------------------------------

def popularity_item_group(
    events: DataFrame,
    end_dates: list[int],
    window_days: int = ROLLING_DAYS_POPULARITY,
    min_days: int = 15,
) -> DataFrame:
    """Per end_date: count events per item over the trailing window
    ``(end-30d, end]``, rank by count desc, bucket (≤100→1, ≤300→2,
    ≤1000→3, ≤2000→4, else 5); fewer than ``min_days`` distinct days of
    data → group 0 (the data-completeness guard, A4)."""
    spark = events.sparkSession
    ranges = spark.createDataFrame(
        [(d, _date_before(d, window_days)) for d in end_dates],
        ["end_date", "start_date"],
    )
    windowed = events.join(
        F.broadcast(ranges),
        (events.filename_date <= F.col("end_date"))
        & (events.filename_date > F.col("start_date")),
        "inner",
    )
    counts = windowed.groupBy("item_id", "end_date").count()
    w = Window.partitionBy("end_date").orderBy(
        F.col("count").desc(), F.col("item_id").desc()
    )
    grouped = counts.withColumn("row", F.row_number().over(w)).withColumn(
        "popularity_item_group",
        F.when(F.col("row") <= 100, 1)
        .when(F.col("row") <= 300, 2)
        .when(F.col("row") <= 1000, 3)
        .when(F.col("row") <= 2000, 4)
        .otherwise(5),
    ).drop("row")
    day_counts = windowed.groupBy("end_date").agg(
        F.countDistinct("filename_date").alias("day_count")
    )
    return (
        grouped.join(day_counts, "end_date", "left")
        .withColumn(
            "popularity_item_group",
            F.when(F.col("day_count") < min_days, 0).otherwise(
                F.col("popularity_item_group")
            ),
        )
        .drop("day_count")
    )


def user_prefer_type(
    events: DataFrame,
    movie_content_types: list[str],
    end_dates: list[int],
    window_days: int = ROLLING_DAYS_PREFER_TYPE,
) -> DataFrame:
    """Per (user, end_date): pivot of movie-vs-vod event counts over the
    trailing window → ``prefer_movie_type`` / ``prefer_vod_type``
    (online_feature_preprocessing.py:200-240)."""
    spark = events.sparkSession
    typed = events.withColumn(
        "movie_or_vod",
        F.when(F.col("content_type").isin(movie_content_types), "movie")
        .otherwise("vod"),
    )
    ranges = spark.createDataFrame(
        [(d, _date_before(d, window_days)) for d in end_dates],
        ["end_date", "begin_date"],
    )
    return (
        typed.join(
            F.broadcast(ranges),
            (typed.filename_date <= F.col("end_date"))
            & (typed.filename_date > F.col("begin_date")),
        )
        .groupBy("user_id", "movie_or_vod", "end_date")
        .agg(F.count(F.lit(1)).alias("prefer_count"))
        .groupBy("user_id", "end_date")
        .pivot("movie_or_vod", ["movie", "vod"])
        .agg(F.first("prefer_count"))
        .na.fill(0)
        .withColumnRenamed("movie", "prefer_movie_type")
        .withColumnRenamed("vod", "prefer_vod_type")
    )


def negative_sample(
    interactions: DataFrame,
    items_per_date: DataFrame,
    num_negative_samples: int,
) -> DataFrame:
    """Stratified negative sampling: cross users×items per date, assign a
    pseudo-random group, pick ``max_by(item_id, selection)`` per
    (user, date, group) — the reference's scheme
    (interaction_feature_preprocessing.py:160-213, F9/A6) with one
    deliberate improvement: the reference uses ``F.rand(seed)``, whose
    draws depend on partition layout (same seed, different partitioning →
    different samples); here the uniforms are md5-derived from row content,
    so results are identical at ANY parallelism (FIXTURES.md invariant #3).
    """
    users = interactions.select("user_id", "filename_date").distinct()
    pool = users.join(F.broadcast(items_per_date), on="filename_date", how="inner")

    def hrand(salt: str):
        return (
            F.conv(F.substring(F.md5(F.concat_ws(
                "|", F.lit(salt), "user_id", "item_id",
                F.col("filename_date").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 1_000_000
        ) / 1_000_000.0

    pool = pool.withColumn(
        "random_group", F.floor(hrand("g") * num_negative_samples)
    ).withColumn("random_selection", hrand("s"))
    neg = pool.groupBy("user_id", "filename_date", "random_group").agg(
        F.expr("max_by(item_id, random_selection)").alias("item_id")
    ).drop("random_group")
    return neg.withColumn("duration", F.lit(0))


def _date_before(yyyymmdd: int, days: int) -> int:
    import datetime as dt

    d = dt.datetime.strptime(str(yyyymmdd), "%Y%m%d") - dt.timedelta(days=days)
    return int(d.strftime("%Y%m%d"))


def classify_by_rules(
    df: DataFrame,
    col: str,
    out: str,
    rules: list[tuple[str, str]],
    default: str = "unknown",
) -> DataFrame:
    """Ordered rlike-chain classifier — the reference's 12-way content
    category mapper (base/utils/utils.py:333-443) generalized: first
    matching regex wins, else ``default``.  Pure JVM regex evaluation."""
    expr = F.lit(default)
    for pattern, label in reversed(rules):
        expr = F.when(F.lower(F.col(col)).rlike(pattern), F.lit(label)).otherwise(expr)
    return df.withColumn(out, expr)
