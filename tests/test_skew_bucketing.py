"""Skew tooling (salted aggregation, heavy hitters) and bucketed tables
(shuffle-free co-located joins)."""

import pytest
from pyspark.sql import functions as F

from gobblin_spark.functions import skew
from gobblin_spark.sinks import writers as W


@pytest.fixture()
def skewed(spark):
    """90% of rows share one key."""
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.s)
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    salted = {
        (r.k): (r.n, r.sum_v)
        for r in skew.salted_count_sum(skewed, ["k"], "v", salts=8).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark, skewed):
    """Phase-1 output has multiple partial rows for the hot key."""
    phase1 = (
        skewed.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .groupBy("k", "_salt").agg(F.count(F.lit(1)).alias("c"))
    )
    hot_partials = phase1.filter(F.col("k") == "hot").count()
    assert hot_partials > 1  # the hot key no longer funnels into one reducer


def test_heavy_hitters(spark, skewed):
    hits = skew.heavy_hitters(skewed, ["k"], min_share=0.5, sample_fraction=0.5)
    assert [r.k for r in hits.collect()] == ["hot"]


def test_salt_join_key_correct(spark, skewed):
    dims = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1")], "k STRING, label STRING"
    )
    big_s, small_s, keys = skew.salt_join_key(skewed, dims, "k", salts=4)
    joined = big_s.join(small_s, keys)
    expect = skewed.join(dims, "k")
    assert joined.count() == expect.count()
    got = joined.groupBy("label").count().collect()
    want = expect.groupBy("label").count().collect()
    assert {(r.label, r["count"]) for r in got} == {(r.label, r["count"]) for r in want}


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key: the sort-merge join runs
    without any Exchange (co-located)."""
    from gobblin_spark.sources import files

    orders = files.load_table(spark, sf_dir, "orders")
    lineitem = files.load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    W.write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8,
                     path=str(tmp_path / "bo"))
    W.write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"), "b_lineitem",
        ["l_orderkey"], num_buckets=8, path=str(tmp_path / "bl"),
    )
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_write_skips_files_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered files are rectangles in (orderkey, partkey) space: a
    tight predicate on EITHER column must touch a minority of files —
    the property a single-column sort cannot give for the second key."""
    from gobblin_spark.sources import files

    li = files.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    out = str(tmp_path / "z")
    W.write_zordered(li, out, ["l_orderkey", "l_partkey"], n_files=16)
    back = spark.read.parquet(out)
    assert back.count() == li.count()

    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    plo, phi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    total = back.select("_metadata.file_path").distinct().count()

    def files_touched(pred):
        return (back.filter(pred)
                .select("_metadata.file_path").distinct().count())

    span = (hi - lo) // 10
    pspan = (phi - plo) // 10
    touched_o = files_touched(F.col("l_orderkey").between(lo, lo + span))
    touched_p = files_touched(F.col("l_partkey").between(plo, plo + pspan))
    assert total >= 8
    assert touched_o <= total // 2, (touched_o, total)
    assert touched_p <= total // 2, (touched_p, total)


def test_zorder_value_interleaves_locality(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int")
    zdf, bounds = W.zorder_value(df, ["x", "y"], bits=3)
    rows = {(r.x, r.y): r._zval for r in zdf.collect()}
    # Morton basics: origin is 0, neighbors differ in low bits only
    assert rows[(0, 0)] == 0
    assert rows[(7, 7)] == 63
    # z-curve locality: the max z-distance of 1-step neighbors is far
    # below the 64-cell range midpoint
    dx = max(abs(rows[(x + 1, y)] - rows[(x, y)])
             for x in range(7) for y in range(8))
    assert dx <= 32
