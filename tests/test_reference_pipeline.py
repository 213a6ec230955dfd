"""Reference-semantics parity tests over FIXTURES.md §B-shaped data:
entity keys, age binning, hashing v1/v2 + collision override, interaction
rollup/labeling, weighted_lr, popularity groups, prefer-type pivot,
seeded negative sampling (determinism at two parallelism levels)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from feature_store_spark import reference_pipeline as rp


def test_create_user_key(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "profile_id": [7, -1, None, 12.0],
                "username": ["Alice", "BOB", "carol", "Dave"],
            }
        )
    )
    got = rp.create_user_key(df).toPandas().set_index("username")
    assert got.loc["alice", "user_id"] == "7#alice"
    assert got.loc["bob", "user_id"] == "0#bob"        # -1 → 0
    assert got.loc["carol", "user_id"] == "0#carol"    # null → 0
    assert got.loc["dave", "user_id"] == "12#dave"     # float → long


def test_create_item_key(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"content_type": ["3", None], "content_id": ["99", "1"]})
    )
    got = rp.create_item_key(df).toPandas()
    assert got["item_id"].tolist() == ["3#99"]  # null key dropped


def test_clean_user_info_age_bins(spark):
    ages = [3.0, 10.0, 18.0, 25.0, 35.0, 50.0, 70.0, 96.0, None]
    df = spark.createDataFrame(
        pd.DataFrame({"age": ages, "package_code": ["P1"] * 9})
    )
    got = rp.clean_user_info(df, ["P1"]).toPandas()
    assert got["age_group"].tolist() == [
        None, "child", "student", "play", "married", "senior", "older",
        None, None,
    ]
    bad = rp.clean_user_info(
        spark.createDataFrame(pd.DataFrame({"age": [30.0], "package_code": ["XX"]})),
        ["P1"],
    ).toPandas()
    assert bad["package_code"].iloc[0] == "None"


@pytest.mark.parametrize("version,off,fill", [(1, 0, 100), (2, 17, 0)])
def test_hash_bucket_bit_exact_and_collisions(spark, version, off, fill):
    ids = [f"u{i}" for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame({"user_id": ids}))
    got = rp.hash_bucket(
        df, "user_id", "b", 100, version=version, collision_ids=["u3", "u7"]
    ).toPandas().set_index("user_id")
    assert len(got) == 50  # row preservation (reference A10)
    for i in [0, 1, 5]:
        expect = int(hashlib.md5(f"u{i}".encode()).hexdigest()[off:off + 15], 16) % 100
        assert got.loc[f"u{i}", "b"] == expect
    assert got.loc["u3", "b"] == fill and got.loc["u7", "b"] == fill


def test_rollup_label_weighted_lr(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": ["u"] * 4,
                "item_id": ["i1", "i1", "i2", "i3"],
                "profile_id": [1] * 4,
                "content_id": ["1", "1", "2", "3"],
                "content_type": ["t"] * 4,
                "filename_date": [20240101] * 4,
                "duration": [100, 500, 30, 0],
                "is_vod_content": [False, False, True, True],
            }
        )
    )
    rolled = rp.rollup_interactions(df)
    labeled = rp.label_interactions(rolled)
    scored = rp.weighted_lr(
        labeled.withColumn("user_weight", __import__("pyspark").sql.functions.lit(2.0))
        .withColumn("item_weight", __import__("pyspark").sql.functions.lit(1.5))
    ).toPandas().set_index("item_id")
    # i1: parts summed 100+500=600 ≥ 120s movie → real watch (2)
    assert scored.loc["i1", "duration"] == 600
    assert scored.loc["i1", "is_interacted"] == 2
    assert scored.loc["i1", "weighted_lr"] == pytest.approx(600 / 3600 * 1.5 * 2.0)
    # i2: 30s vod < 60s → dirty click (0) → gate 1
    assert scored.loc["i2", "is_interacted"] == 0
    assert scored.loc["i2", "weighted_lr"] == pytest.approx(3.0)
    # i3: duration 0 → negative (1)
    assert scored.loc["i3", "is_interacted"] == 1


def test_popularity_groups_and_completeness_guard(spark):
    rows = []
    # 20 days of data ending 20240131; item popularity: i0 > i1 > ...
    for day in range(20240112, 20240132):
        for i in range(5):
            for _ in range(5 - i):
                rows.append({"item_id": f"i{i}", "filename_date": day})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = rp.popularity_item_group(df, [20240131], min_days=15).toPandas()
    got = got.set_index("item_id")
    assert (got["popularity_item_group"] == 1).all()  # all in top-100
    # completeness guard: only 5 distinct days < 15 → group 0
    short = rp.popularity_item_group(
        df.where("filename_date >= 20240127"), [20240131], min_days=15
    ).toPandas()
    assert (short["popularity_item_group"] == 0).all()


def test_user_prefer_type_pivot(spark):
    rows = []
    for d, ct, n in [(20240110, "m1", 3), (20240110, "v9", 1)]:
        rows += [{"user_id": "u1", "content_type": ct, "filename_date": d}] * n
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = rp.user_prefer_type(df, ["m1"], [20240115]).toPandas()
    assert got.iloc[0]["prefer_movie_type"] == 3
    assert got.iloc[0]["prefer_vod_type"] == 1


def test_negative_sampling_deterministic(spark):
    inter = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [f"u{i % 7}" for i in range(40)],
             "filename_date": [20240101 + i % 3 for i in range(40)]}
        )
    )
    items = spark.createDataFrame(
        pd.DataFrame(
            {"item_id": [f"i{j}" for j in range(30)] * 3,
             "filename_date": [20240101 + j // 30 for j in range(90)]}
        )
    )
    a = rp.negative_sample(inter, items, 4).orderBy(
        "user_id", "filename_date", "item_id").toPandas()
    b = rp.negative_sample(inter.repartition(13), items.repartition(3), 4
                           ).orderBy("user_id", "filename_date", "item_id").toPandas()
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)  # seeded → parallelism-invariant
    assert (a["duration"] == 0).all()


def test_classify_by_rules_first_match_wins(spark):
    rules = [("phim.*hanh dong|action", "action_movie"),
             ("phim", "movie"),
             ("the thao|sport", "sport")]
    df = spark.createDataFrame(
        pd.DataFrame({"cat": ["Phim Hanh Dong", "Phim Bo", "The Thao 24h", "Tin Tuc"]})
    )
    got = rp.classify_by_rules(df, "cat", "label", rules).toPandas()
    assert got["label"].tolist() == ["action_movie", "movie", "sport", "unknown"]
