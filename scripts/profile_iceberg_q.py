"""Phase-level timing for the fixture-building headline queries.

Runs each phase of the expensive iceberg/sink/sql queries with wall
timers so optimization targets the real cost, not a guess (guide §1).
Usage: python scripts/profile_iceberg_q.py [changelog dsread dswrite
wap sink sqlrt timetravel posdel]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gobblin_spark.session import get_spark  # noqa: E402
from gobblin_spark.sources.files import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.rows = []

    def mark(self, label):
        t = time.perf_counter()
        self.rows.append((label, t - self.t0))
        self.t0 = t

    def report(self, name):
        total = sum(s for _, s in self.rows)
        print(f"== {name}: total {total:.3f}s")
        for label, s in self.rows:
            print(f"   {s:7.3f}  {label}")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def p_changelog(spark):
    from gobblin_spark.sinks.iceberg import IcebergTable

    t_ = T()
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    loc = tempfile.mkdtemp(prefix="prof_icecld_") + "/t"
    t = IcebergTable.create(spark, loc, orders.schema)
    t_.mark("create")
    snaps = []
    for m in range(2):
        t.append_dataframe(orders.filter(F.col("o_orderkey") % 2 == m)
                           .coalesce(1))
        snaps.append(t.metadata()["current-snapshot-id"])
        t_.mark(f"append {m}")
    pos = (t.read(apply_deletes=False)
           .select(F.col("_metadata.file_path").alias("file_path"),
                   F.col("_metadata.row_index").alias("pos"),
                   "o_orderpriority")
           .filter(F.col("o_orderpriority") == "1-URGENT")
           .drop("o_orderpriority"))
    t.delete_positions(pos)
    t_.mark("delete_positions")
    t.rewrite_data_files(target_partitions=1)
    t_.mark("rewrite_data_files")
    t.delete_equality(
        orders.filter(F.col("o_orderpriority") == "5-LOW")
        .select("o_orderkey"))
    t_.mark("delete_equality")
    n = t.read().filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).count()
    assert n == 0
    t_.mark("verify read().count")
    cl = t.changelog(None)
    t_.mark("changelog() plan build")
    noop(cl.select("o_orderkey"))
    t_.mark("changelog noop execute")
    t_.report("iceberg_changelog_delete_read")


def p_dsread(spark):
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.sources import datasource as DS

    DS.register(spark)
    t_ = T()
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    loc = tempfile.mkdtemp(prefix="prof_icedsv2_") + "/t"
    t = IcebergTable.create(
        spark, loc, cust.schema,
        partition_spec=[("c_custkey", "bucket[8]"),
                        ("c_mktsegment", "truncate[2]")])
    t_.mark("create")
    t.append_dataframe(cust.coalesce(1))
    t_.mark("append (bucket udf + partitioned write)")
    n_all = len(DS._IcebergReader({"path": loc}, cust.schema)._plan())
    t_.mark(f"_plan() all ({n_all} files)")
    pruned = DS._IcebergReader({"path": loc}, cust.schema)
    pruned.prune = [("c_mktsegment", "=", "BUILDING")]
    np_ = len(pruned._plan())
    t_.mark(f"_plan() pruned ({np_} files)")
    out = (spark.read.format("gobblin_iceberg").option("path", loc)
           .load().filter(F.col("c_mktsegment") == "BUILDING"))
    t_.mark("read plan build")
    noop(out)
    t_.mark("DSv2 read noop execute")
    t_.report("iceberg_datasource_read")


def p_dswrite(spark):
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.sources import datasource as DS

    DS.register(spark)
    t_ = T()
    sub = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"))
    loc = tempfile.mkdtemp(prefix="prof_icedsw_") + "/t"
    t = IcebergTable.create(spark, loc, sub.schema)
    t_.mark("create")
    loop_loc = "loop://host" + loc
    (sub.repartition(4).write.format("gobblin_iceberg")
        .option("path", loop_loc).mode("append").save())
    t_.mark("DSv2 write (4 tasks + commit)")
    assert len(IcebergTable(None, loop_loc).snapshots()) == 1
    t_.mark("snapshots() check")
    out = (spark.read.format("gobblin_iceberg")
           .option("path", loop_loc).load())
    n = out.count()
    t_.mark(f"count() ({n})")
    noop(out)
    t_.mark("read noop execute")
    t_.report("iceberg_datasource_write_roundtrip")


def p_wap(spark):
    from gobblin_spark import streaming
    from gobblin_spark.sinks.iceberg import IcebergTable

    t_ = T()
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_id") % 3 == 0).select(
        "event_id", "ts", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="prof_icewapstr_")
    indir = f"{tmp}/in"
    ev.repartition(4).write.parquet(indir)
    t_.mark("input parquet write")
    t = IcebergTable.create(spark, f"{tmp}/table", ev.schema)
    t.create_branch("staging")
    stream = streaming.file_stream(spark, indir, schema=ev.schema,
                                   max_files_per_trigger=2)

    def sink(batch_df, epoch_id):
        t.append_dataframe_idempotent(batch_df.coalesce(1),
                                      f"epoch-{epoch_id}",
                                      branch="staging")

    q_ = (stream.writeStream.foreachBatch(sink)
          .trigger(availableNow=True)
          .option("checkpointLocation", f"{tmp}/ckpt").start())
    q_.awaitTermination()
    t_.mark("stream (epochs)")
    assert t.read().count() == 0
    t_.mark("main empty check")
    n_snaps = len(t.snapshots())
    t.append_dataframe_idempotent(ev.limit(10), "epoch-0",
                                  branch="staging")
    assert len(t.snapshots()) == n_snaps
    t_.mark("replay idempotence check")
    n_all = ev.count()
    assert t.read(ref="staging").count() == n_all
    t_.mark("audit staged count")
    t.fast_forward("main", "staging")
    t_.mark("fast_forward")
    noop(t.read().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value")))
    t_.mark("final agg noop")
    t_.report("streaming_wap_publish")


def p_sink(spark):
    from gobblin_spark.operators import quality
    from gobblin_spark.sinks import publish as P, writers as W

    t_ = T()
    orders = load_table(spark, SF_DIR, "orders")
    final = tempfile.mkdtemp(prefix="prof_sink_rt_") + "/orders"
    part_df, cols = W.with_time_partitions(orders, "o_orderdate", "month")
    staged = P.stage(part_df, final, partition_by=cols, cluster=True)
    t_.mark("stage write")
    P.audit(staged, spark, [
        lambda df: quality.row_count_policy(staged.write.rows, df.count())])
    t_.mark("audit")
    report = P.commit([staged], spark)
    assert report.committed
    t_.mark("commit/publish")
    back = spark.read.parquet(final)
    noop(back.groupBy(F.col("year").cast("int").alias("year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price")))
    t_.mark("final agg noop")
    t_.report("sink_roundtrip_partitioned")


def p_sqlrt(spark):
    from gobblin_spark.sources import datasource as DS

    DS.register(spark)
    t_ = T()
    db = tempfile.mkdtemp(prefix="prof_sqlrt_") + "/rt.duckdb"
    sup = load_table(spark, SF_DIR, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    even = sup.filter(F.col("s_suppkey") % 2 == 0)
    odd = sup.filter(F.col("s_suppkey") % 2 == 1)
    (even.write.format("gobblin_sql").option("database", db)
     .option("table", "supplier_rt").mode("overwrite").save())
    t_.mark("write overwrite")
    (odd.write.format("gobblin_sql").option("database", db)
     .option("table", "supplier_rt").mode("append").save())
    t_.mark("write append")
    hi = sup.agg(F.max("s_suppkey")).first()[0]
    t_.mark("max scalar")
    back = (
        spark.read.format("gobblin_sql")
        .option("database", db).option("table", "supplier_rt")
        .option("partition_column", "s_suppkey")
        .option("lower_bound", "0").option("upper_bound", str(hi))
        .option("num_partitions", "4").load()
    )
    noop(back.select(
        "s_suppkey", "s_name", "s_nationkey",
        F.round("s_acctbal", 4).alias("s_acctbal")))
    t_.mark("read noop")
    t_.report("sql_write_read_roundtrip")


def p_timetravel(spark):
    from gobblin_spark.sinks.iceberg import IcebergTable

    t_ = T()
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    loc = tempfile.mkdtemp(prefix="prof_icett_") + "/t"
    t = IcebergTable.create(spark, loc, orders.schema)
    t.append_dataframe(orders.filter(F.col("o_orderkey") % 3 == 0)
                       .coalesce(1))
    t_.mark("append 1")
    ts_between = t.metadata()["snapshot-log"][-1]["timestamp-ms"]
    t.append_dataframe(orders.filter(F.col("o_orderkey") % 3 != 0)
                       .coalesce(1))
    t_.mark("append 2")
    assert t.read().count() == orders.count()
    t_.mark("verify counts")
    noop(t.read_as_of(ts_between))
    t_.mark("read_as_of noop")
    t_.report("iceberg_time_travel_read")


def p_posdel(spark):
    from gobblin_spark.queries import QUERIES

    t_ = T()
    noop(QUERIES["iceberg_position_delete_read"](spark, SF_DIR))
    t_.mark("whole query")
    t_.report("iceberg_position_delete_read")


PROFILES = {
    "changelog": p_changelog,
    "dsread": p_dsread,
    "dswrite": p_dswrite,
    "wap": p_wap,
    "sink": p_sink,
    "sqlrt": p_sqlrt,
    "timetravel": p_timetravel,
    "posdel": p_posdel,
}


def main() -> int:
    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark("gobblin-profile")
    # warm codegen/JVM like bench.py does
    for n in names:
        try:
            PROFILES[n](spark)
        except Exception as ex:
            print(f"warm {n} failed: {type(ex).__name__}: {ex}")
    print("---- timed (warm) ----")
    for n in names:
        PROFILES[n](spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
