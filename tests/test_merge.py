"""upsert (MERGE) semantics tests."""

from __future__ import annotations

import pytest

from quick_and_easy_vectordb_spark.operators.merge import upsert


def test_upsert_update_keep_insert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)],
        "id long, name string, val double",
    )
    out = {r.id: (r.name, r.val) for r in upsert(target, updates, "id").collect()}
    assert out == {
        1: ("a", 10.0),   # untouched
        2: ("b2", 21.0),  # updated
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_upsert_changeset_derived_from_target(spark):
    # the common "fix these rows" pattern must not trip ambiguous-self-join
    target = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, val double"
    )
    fixes = target.filter("id % 2 = 0").selectExpr("id", "val * 100 AS val")
    out = {r.id: r.val for r in upsert(target, fixes, "id").collect()}
    assert out[2] == 200.0 and out[3] == 3.0 and len(out) == 10


def test_upsert_missing_columns_rejected(spark):
    target = spark.createDataFrame([(1, "x")], "id long, name string")
    updates = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing target columns"):
        upsert(target, updates, "id")


def test_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "us", 5.0), (1, "eu", 6.0)], "id long, region string, val double"
    )
    updates = spark.createDataFrame(
        [(1, "eu", 60.0)], "id long, region string, val double"
    )
    out = {(r.id, r.region): r.val
           for r in upsert(target, updates, ["id", "region"]).collect()}
    assert out == {(1, "us"): 5.0, (1, "eu"): 60.0}


def test_table_diff_classifies_changes(spark):
    from quick_and_easy_vectordb_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "id long, name string, val double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),      # unchanged -> dropped
         (2, "b2", 2.0),     # changed
         (4, "d", 4.0),      # null -> value is a change
         (5, "e", 5.0)],     # added
        "id long, name string, val double",
    )
    out = {r.id: (r.change, r.name) for r in table_diff(old, new, "id").collect()}
    assert out == {
        2: ("changed", "b2"),
        3: ("removed", "c"),
        4: ("changed", "d"),
        5: ("added", "e"),
    }
