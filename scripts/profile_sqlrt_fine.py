"""Fine-grained timing of sql_write_read_roundtrip's internals.

Separates: plain parquet write of the same rows (Spark job floor),
the gobblin_sql DSv2 write (staging job + driver commit), the DuckDB
load alone, and the DSv2 partitioned read vs a direct duckdb pull.
Usage: python scripts/profile_sqlrt_fine.py
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


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"   {time.perf_counter() - t0:7.3f}  {label}")
    return out


def main():
    spark = get_spark("profile-sqlrt", shuffle_partitions=32)
    from gobblin_spark.sources import datasource as DS

    DS.register(spark)
    sup = load_table(spark, SF_DIR, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    even = sup.filter(F.col("s_suppkey") % 2 == 0)
    odd = sup.filter(F.col("s_suppkey") % 2 == 1)
    # warm codegen/scan
    even.write.mode("overwrite").format("noop").save()

    for rnd in range(2):
        print(f"== round {rnd}")
        db = tempfile.mkdtemp(prefix="gobblin_sqlprof_") + "/rt.duckdb"
        pq_dir = tempfile.mkdtemp(prefix="gobblin_sqlprof_pq_")
        t("plain parquet write (same rows)",
          lambda: even.write.mode("overwrite").parquet(pq_dir))
        t("gobblin_sql write overwrite",
          lambda: even.write.format("gobblin_sql").option("database", db)
          .option("table", "supplier_rt").mode("overwrite").save())
        t("gobblin_sql write append",
          lambda: odd.write.format("gobblin_sql").option("database", db)
          .option("table", "supplier_rt").mode("append").save())
        t("duckdb load of staged parquet (driver only)", lambda: _load(
            db, pq_dir))
        hi = t("max scalar", lambda: sup.agg(F.max("s_suppkey")).first()[0])

        def _read():
            back = (spark.read.format("gobblin_sql")
                    .option("database", db).option("table", "supplier_rt")
                    .option("partition_column", "s_suppkey")
                    .option("lower_bound", "0").option("upper_bound", str(hi))
                    .option("num_partitions", "4").load())
            back.write.mode("overwrite").format("noop").save()

        t("DSv2 partitioned read noop", _read)

        def _read1():
            back = (spark.read.format("gobblin_sql")
                    .option("database", db).option("table", "supplier_rt")
                    .option("partition_column", "s_suppkey")
                    .option("lower_bound", "0").option("upper_bound", str(hi))
                    .option("num_partitions", "1").load())
            back.write.mode("overwrite").format("noop").save()

        t("DSv2 read noop (1 partition)", _read1)
    spark.stop()


def _load(db, pq_dir):
    import glob

    import duckdb

    con = duckdb.connect(db)
    try:
        files = ", ".join(f"'{f}'" for f in glob.glob(pq_dir + "/*.parquet"))
        con.execute("BEGIN")
        con.execute(
            f"CREATE OR REPLACE TABLE probe AS "
            f"SELECT * FROM read_parquet([{files}])")
        con.execute("COMMIT")
    finally:
        con.close()


if __name__ == "__main__":
    main()
