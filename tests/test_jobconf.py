"""Job-config layer: .pull parsing, interpolation, compilation to a
Pipeline, and end-to-end execution (wikipedia.pull /
example-parquet.pull key vocabulary)."""

import os

import pytest

from gobblin_spark.plans import jobconf as J


def test_parse_properties_basics():
    props = J.parse_properties(
        """
# comment
! also comment
job.name=MyJob
job.group: GroupA
fs.uri=file:///
state.store.fs.uri=${fs.uri}
multi=a,\\
b,c
"""
    )
    assert props["job.name"] == "MyJob"
    assert props["job.group"] == "GroupA"
    assert props["state.store.fs.uri"] == "file:///"
    assert props["multi"] == "a,b,c"


def test_interpolation_chain_and_cycle():
    props = J.parse_properties("a=${b}\nb=${c}\nc=x\nloop=${loop}")
    assert props["a"] == "x"
    assert props["loop"] == "${loop}"  # self-reference left verbatim


def test_unknown_class_fails_fast():
    spec = J.JobSpec(name="j", props={"source.class": "com.example.NoSuchSource"})
    with pytest.raises(KeyError, match="NoSuchSource"):
        J.to_pipeline(spec)


PULL = """
job.name=LineitemIngest
job.group=test
source.class=table
source.data.directory={sf}
source.table.name=lineitem
converter.classes=AvroFieldsPickConverter,filter_regex
converter.fields.to.pick=l_orderkey,l_quantity,l_returnflag,l_shipdate
converter.filter.field=l_returnflag
converter.filter.pattern=^[AR]$
qualitychecker.row.policies=range
qualitychecker.range.column=l_quantity
qualitychecker.range.min=0
qualitychecker.range.max=25
job.commit.policy=full
writer.output.format=parquet
data.publisher.final.dir={out}
"""


def test_compile_and_run_pull_job(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "final")
    text = PULL.format(sf=sf, out=out)

    frame = J.compile_frame(spark, text)
    assert set(frame.columns) == {"l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"}

    res = J.run_job(spark, text)
    assert res.report is not None and res.report.committed
    back = spark.read.parquet(out)
    n = back.count()
    assert n == frame.count() == back.filter(
        "l_returnflag IN ('A','R') AND l_quantity BETWEEN 0 AND 25"
    ).count()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_pull_file_from_disk_with_partitioning(spark, tmp_path):
    pull = tmp_path / "job.pull"
    out = str(tmp_path / "bydate")
    pull.write_text(
        PULL.format(sf="/root/testdata/sf0.001", out=out)
        + "writer.partition.columns=l_returnflag\n"
    )
    res = J.run_job(spark, str(pull))
    assert res.report is not None and res.report.committed
    dirs = {d for d in os.listdir(out) if d.startswith("l_returnflag=")}
    assert dirs == {"l_returnflag=A", "l_returnflag=R"}


def test_csv_pull_job_end_to_end(spark, tmp_path):
    """Audit-r7: the CSV source factory passed `delimiter=` to a
    reader whose kwarg is `sep` — every CSV .pull job raised
    TypeError. Pin the whole CSV path: custom delimiter, header,
    explicit schema, run to publish."""
    src = tmp_path / "csv_in"
    src.mkdir()
    (src / "a.csv").write_text("k|name\n1|alpha\n2|beta\n3|gamma\n")
    out = str(tmp_path / "csv_out")
    res = J.run_job(spark, f"""
job.name=CsvJob
source.class=csv
source.filebased.data.directory={src}
converter.csv.delimiter=|
source.csv.has.header=true
source.schema=k INT, name STRING
writer.output.format=parquet
data.publisher.final.dir={out}
""")
    assert res.report is not None and res.report.committed
    back = spark.read.parquet(out)
    assert sorted((r.k, r.name) for r in back.collect()) == [
        (1, "alpha"), (2, "beta"), (3, "gamma")]


def test_files_to_pull_comma_list(spark, tmp_path):
    """Audit-r7: source.filebased.files.to.pull is a comma LIST in the
    reference (FileBasedSource) — an unsplit 'a,b' string is one
    nonexistent path to Spark."""
    d = tmp_path / "multi"
    d.mkdir()
    spark.range(3).write.parquet(str(d / "p1"))
    spark.range(3, 5).write.parquet(str(d / "p2"))
    out = str(tmp_path / "multi_out")
    res = J.run_job(spark, f"""
job.name=MultiPull
source.class=parquet
source.filebased.files.to.pull={d / "p1"}, {d / "p2"}
data.publisher.final.dir={out}
""")
    assert res.report is not None and res.report.committed
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
        0, 1, 2, 3, 4]


def test_unknown_commit_policy_fails_fast():
    spec = J.JobSpec(name="j", props={
        "source.class": "table",
        "source.data.directory": "/root/testdata/sf0.001",
        "source.table.name": "nation",
        "job.commit.policy": "bogus",
    })
    with pytest.raises(KeyError, match="bogus"):
        J.to_pipeline(spec)


def test_commit_policy_successful_aborts_failed_audit(spark, tmp_path):
    """job.commit.policy=successful maps to COMMIT_SUCCESSFUL_TASKS
    (JobCommitPolicy.forName): a dataset whose write-audit FAILS must be
    aborted, not published — mapping it to PARTIAL would publish it."""
    out = str(tmp_path / "audited")
    text = PULL.format(sf="/root/testdata/sf0.001", out=out) + (
        "qualitychecker.task.policies=row_count_range\n"
        "qualitychecker.rowcount.min=999999999\n"  # cannot be satisfied
        "job.commit.policy=successful\n"
    )
    spec = J.load_job_spec(text)
    assert J.to_pipeline(spec).commit_policy.name == "COMMIT_SUCCESSFUL_TASKS"
    res = J.run_job(spark, text)
    assert res.report is not None and not res.report.committed
    assert res.report.aborted and not res.report.published
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_commit_policy_successful_publishes_green_audit(spark, tmp_path):
    out = str(tmp_path / "audited_ok")
    text = PULL.format(sf="/root/testdata/sf0.001", out=out) + (
        "qualitychecker.task.policies=row_count_range\n"
        "qualitychecker.rowcount.min=1\n"
        "job.commit.policy=successful\n"
    )
    res = J.run_job(spark, text)
    assert res.report is not None and res.report.committed
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_reference_pull_vocabulary_short_and_fqcn():
    spec = J.load_job_spec(
        "job.name=x\nsource.class=table\nsource.data.directory=/d\n"
        "source.table.name=orders\n"
        "converter.classes=org.apache.gobblin.converter.filter.AvroProjectionConverter\n"
        "converter.fields.to.drop=o_comment\n"
    )
    pl = J.to_pipeline(spec)
    assert len(pl.transforms) == 1 and pl.commit_policy.name == "COMMIT_ON_FULL_SUCCESS"


def test_cli_run_and_list(spark, tmp_path, capsys):
    """python -m gobblin_spark: run a .pull end-to-end, list catalog."""
    import json as _json

    from gobblin_spark.__main__ import main as cli_main

    out = str(tmp_path / "cli_out")
    pull = tmp_path / "job.pull"
    pull.write_text(PULL.format(sf="/root/testdata/sf0.001", out=out))
    rc = cli_main(["run", str(pull)], _spark=spark)
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    rep = _json.loads(captured)
    assert rep["published"] == ["output"] and rep["quarantined"] == 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    rc = cli_main(["list"], _spark=spark)
    names = capsys.readouterr().out.split()
    assert rc == 0 and "q1_pricing_summary" in names
    rc = cli_main(["query", "no_such_query"], _spark=spark)
    assert rc == 2


def test_cli_maintain_iceberg(spark, tmp_path, capsys):
    """python -m gobblin_spark maintain: the DEPLOYMENT.md cadence
    (sorted rewrite -> expire -> orphans) as one operator command."""
    import json as _json

    from gobblin_spark.__main__ import main as cli_main
    from gobblin_spark.sinks.iceberg import IcebergTable

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(60)], "k long, v double")
    loc = str(tmp_path / "cli_ice")
    t = IcebergTable.create(spark, loc, df.schema)
    for i in range(3):
        t.append_dataframe(df.filter(df.k % 3 == i).coalesce(1))
    rc = cli_main(
        ["maintain", loc, "--rewrite", "--target-partitions", "1",
         "--sort-by", "k", "--expire-days", "0", "--orphans",
         "--orphans-older-than-days", "0"],
        _spark=spark)
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert rep["data_files"] == 1
    assert rep["snapshots_expired"] >= 3  # the three appends
    assert rep["orphans_removed"] >= 3  # superseded pre-compaction files
    t2 = IcebergTable(spark, loc)
    assert sorted(r.k for r in t2.read().collect()) == list(range(60))


def test_rest_pages_source_via_pull(spark, tmp_path):
    """source.class=rest_pages runs the native DataSource through the
    full .pull pipeline: pages -> filter -> audited publish."""
    from gobblin_spark.sources import datasource as DS

    pages = str(tmp_path / "pages")
    DS.write_pages([{"event_id": i, "value": float(i)} for i in range(40)],
                   pages, page_size=10)
    out = str(tmp_path / "final")
    text = f"""
job.name=RestIngest
source.class=rest_pages
source.data.directory={pages}
source.schema=event_id long, value double, page int
converter.classes=filter_equals
converter.filter.field=page
converter.filter.value=2
writer.output.format=parquet
data.publisher.final.dir={out}
"""
    spec = J.load_job_spec(text)
    res = J.run_job(spark, text)
    assert res.report is not None and res.report.committed
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert {r.page for r in back.collect()} == {2}


def test_sql_table_source_via_pull(spark, tmp_path):
    """source.class=sql_table: query-based parallel pull from an
    embedded database through the full .pull pipeline."""
    import duckdb

    db = str(tmp_path / "q.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE users AS SELECT * FROM "
                "'/root/testdata/sf0.001/customer.parquet'")
    n = con.execute("SELECT count(*), max(c_custkey) FROM users").fetchone()
    con.close()
    out = str(tmp_path / "final")
    text = f"""
job.name=SqlPull
source.class=sql_table
source.conn.database={db}
source.entity=users
source.querybased.partition.column=c_custkey
source.querybased.start.value=0
source.querybased.end.value={n[1]}
source.max.number.of.partitions=3
writer.output.format=parquet
data.publisher.final.dir={out}
"""
    res = J.run_job(spark, text)
    assert res.report is not None and res.report.committed
    assert spark.read.parquet(out).count() == n[0]
