"""TableIO: filter-spec interpreter (reference P2/S4) + snapshot manifest."""

from __future__ import annotations

import pandas as pd
import pytest

from feature_store_spark.io.tables import PartitionedTable, apply_filter_spec


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "grp": ["a", "a", "b", "b", "c"],
                "v": [10.0, 20.0, 30.0, 40.0, 50.0],
            }
        )
    )


def test_filter_ops(spark, df):
    assert apply_filter_spec(df, [("k", "in", [1, 3])]).count() == 2
    assert apply_filter_spec(df, [("k", "not in", [1, 3])]).count() == 3
    assert apply_filter_spec(df, [("grp", "=", "b"), ("v", ">", 30.0)]).count() == 1
    assert apply_filter_spec(df, [("v", "<=", 20.0)]).count() == 2
    assert apply_filter_spec(df, [("grp", "!=", "a")]).count() == 3


def test_filter_semi_anti_join(spark, df):
    keys = spark.createDataFrame(pd.DataFrame({"k": [2, 4]}))
    assert apply_filter_spec(df, [("k", "in", keys)]).count() == 2      # J4
    assert apply_filter_spec(df, [("k", "not in", keys)]).count() == 3  # J5
    with pytest.raises(ValueError):
        apply_filter_spec(df, [("k", "~", 1)])


def test_snapshot_manifest(spark, df, tmp_path):
    t = PartitionedTable(str(tmp_path), "t", "grp")
    s1 = t.write(df, mode="overwrite")
    assert s1.partitions == {"a": 2, "b": 2, "c": 1}
    assert t.partitions() == ["a", "b", "c"]
    # identical rewrite → same content digest, new sequence number
    s2 = t.write(df, mode="overwrite")
    assert s1.snapshot_id.split("-")[2] == s2.snapshot_id.split("-")[2]
    assert s1.snapshot_id != s2.snapshot_id
    # incremental diff (reference X1 semantics, manifest-based)
    assert t.new_partitions_vs(["a"]) == ["b", "c"]
    # partition-pruned read
    assert t.read(spark, partitions=["a"]).count() == 2


def test_time_travel_and_append(spark, df, tmp_path):
    t = PartitionedTable(str(tmp_path), "tt", "grp")
    s1 = t.write(df, mode="overwrite")
    # overwrite partition "a" with different rows
    import pandas as pd
    patch = spark.createDataFrame(
        pd.DataFrame({"k": [99], "grp": ["a"], "v": [999.0]})
    )
    s2 = t.write(patch, mode="overwrite_partitions")
    # current: partition a has the patched single row; b/c untouched
    cur = t.read(spark).toPandas()
    assert len(cur) == 4 and cur[cur.grp == "a"]["v"].tolist() == [999.0]
    # time travel: the first snapshot still reads the original data
    old = t.read(spark, snapshot_id=s1.snapshot_id).toPandas()
    assert len(old) == 5 and sorted(old[old.grp == "a"]["v"]) == [10.0, 20.0]
    # append adds to a partition without touching its history
    s3 = t.write(patch, mode="append")
    assert t.read(spark, partitions=["a"]).count() == 2
    assert t.read(spark, partitions=["a"], snapshot_id=s2.snapshot_id).count() == 1
    assert s3.partitions["a"] == 2
