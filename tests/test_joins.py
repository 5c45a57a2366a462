"""AS-OF and range join semantics (functions/joins.py) vs hand-checked
frames — direction, ties, null propagation, suffixing, left-how."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gobblin_spark.functions import joins as JN


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [("A", _ts(0), 10.0), ("A", _ts(5), 11.0), ("B", _ts(3), 20.0)],
        "sym string, ts timestamp_ntz, px double")


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [("A", _ts(1), 1), ("A", _ts(5), 2), ("A", _ts(9), 3),
         ("B", _ts(2), 4), ("B", _ts(4), 5)],
        "sym string, ts timestamp_ntz, qty int")


def test_asof_backward(spark, trades, quotes):
    out = {r.qty: r.px for r in
           JN.asof_join(trades, quotes, on="ts", by=["sym"]).collect()}
    # qty=2 trades at exactly 0:05 → sees the 0:05 quote (inclusive)
    # qty=4 trades at 0:02 before any B quote → null
    assert out == {1: 10.0, 2: 11.0, 3: 11.0, 4: None, 5: 20.0}


def test_asof_forward(spark, trades, quotes):
    out = {r.qty: r.px for r in
           JN.asof_join(trades, quotes, on="ts", by=["sym"],
                        direction="forward").collect()}
    # forward: smallest quote ts >= trade ts; qty=3 after the last
    # A quote → null
    assert out == {1: 11.0, 2: 11.0, 3: None, 4: 20.0, 5: None}


def test_asof_suffixes_colliding_payload(spark):
    left = spark.createDataFrame([(1, 10, "l")], "k int, ts int, v string")
    right = spark.createDataFrame([(1, 5, "r")], "k int, ts int, v string")
    out = JN.asof_join(left, right, on="ts", by=["k"]).collect()[0]
    assert out.v == "l" and out.v_right == "r"


def test_asof_single_shuffle_plan(spark, trades, quotes):
    plan = JN.asof_join(trades, quotes, on="ts", by=["sym"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_inner_and_left(spark):
    left = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 9999)], "id int, t bigint")
    right = spark.createDataFrame(
        [(10, 50, 150), (11, 140, 260)], "win int, lo bigint, hi bigint")
    inner = JN.range_join(left, right, "t", "lo", "hi", bucket=100)
    got = sorted((r.id, r.win) for r in inner.collect())
    assert got == [(1, 10), (2, 11)]
    lft = JN.range_join(left, right, "t", "lo", "hi", bucket=100, how="left")
    got_l = [(r.id, r.win) for r in lft.collect()]
    assert (3, None) in got_l and len(got_l) == len(got) + 1


def test_range_join_left_null_column_no_duplicate(spark):
    """Audit-r7: a MATCHED left row carrying a null column must not
    come back a second time null-filled — the old anti-join rebuild
    compared all left columns with null-unsafe equality, so null-
    bearing rows failed the anti filter and duplicated. A left row
    matching two intervals still emits exactly two rows."""
    left = spark.createDataFrame(
        [(1, 100, None), (2, 250, "x"), (3, 9999, None)],
        "id int, t bigint, tag string")
    right = spark.createDataFrame(
        [(10, 50, 150), (11, 140, 260), (12, 90, 260)],
        "win int, lo bigint, hi bigint")
    lft = JN.range_join(left, right, "t", "lo", "hi", bucket=100,
                        how="left")
    got = sorted((r.id, r.win) for r in lft.collect())
    # id=1 (null tag) matches 10 and 12 — exactly twice, no null-
    # filled extra; id=2 matches 11 and 12; id=3 unmatched once
    assert got == [(1, 10), (1, 12), (2, 11), (2, 12), (3, None)]


def test_range_join_no_cartesian(spark):
    left = spark.createDataFrame([(1, 100)], "id int, t bigint")
    right = spark.createDataFrame([(10, 50, 150)], "win int, lo bigint, hi bigint")
    plan = JN.range_join(left, right, "t", "lo", "hi", bucket=50) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, 50), (2, 150), (3, 49), (4, 151)],
                                 "id int, t bigint")
    right = spark.createDataFrame([(10, 50, 150)],
                                  "win int, lo bigint, hi bigint")
    got = sorted(r.id for r in JN.range_join(
        left, right, "t", "lo", "hi", bucket=60).collect())
    assert got == [1, 2]


def test_fuzzy_self_pairs_blocking_and_distance(spark):
    from gobblin_spark.functions.joins import fuzzy_self_pairs

    rows = [
        (1, "kitten", "b1"), (2, "sitting", "b1"),   # dist 3, same block
        (3, "kitten", "b2"),                          # same text, other block
        (4, "kittenx", "b1"),                         # dist 1 from kitten
        (5, "zzzzzzzzzz", "b1"),                      # far from all
    ]
    df = spark.createDataFrame(rows, "id long, t string, blk string")
    got = {(r.id_a, r.id_b): r.distance for r in fuzzy_self_pairs(
        df, "id", "t", ["blk"], max_distance=3).collect()}
    assert got == {(1, 2): 3, (1, 4): 1, (2, 4): 3}
    # cross-block identical strings never pair: blocking bounds recall
    assert (1, 3) not in got
