"""Converter family tests (SURVEY §2.5-2.6; reference analogs:
gobblin-core/src/test/java/.../converter/avro/JsonIntermediateToAvroConverterTest.java,
FlattenNestedKeyConverterTest.java, CsvToJsonConverterV2Test.java)."""

from pyspark.sql import Row, functions as F

from gobblin_spark.operators import converters as C


def _people(spark):
    return spark.createDataFrame(
        [
            Row(name="ann", age=34, addr=Row(city="oslo", zip="0150"), tags="a,b"),
            Row(name="bob", age=40, addr=Row(city="lima", zip="150"), tags="c"),
            Row(name="cat", age=7, addr=Row(city="oslo", zip="0151"), tags=""),
        ]
    )


def test_identity(spark):
    df = _people(spark)
    assert C.identity(df) is df


def test_project_drop_top_and_nested(spark):
    df = _people(spark)
    out = C.project_drop(df, ["age", "addr.zip"])
    assert "age" not in out.columns
    assert [f.name for f in out.schema["addr"].dataType.fields] == ["city"]


def test_pick_fields_nested_leaf_name(spark):
    out = C.pick_fields(_people(spark), ["name", "addr.city"])
    assert out.columns == ["name", "city"]
    assert out.filter(F.col("city") == "oslo").count() == 2


def test_retrieve_field(spark):
    out = C.retrieve_field(_people(spark), "addr.city", alias="c")
    assert out.columns == ["c"]


def test_filter_eq_and_regex(spark):
    df = _people(spark)
    assert C.filter_field_equals(df, "name", "ann").count() == 1
    assert C.filter_regex(df, "name", "^[ab]").count() == 2


def test_sample_deterministic_stable(spark):
    df = spark.range(1000)
    a = C.sample_deterministic(df, "id", ["0", "1"]).count()
    b = C.sample_deterministic(df, "id", ["0", "1"]).count()
    assert a == b and 0 < a < 1000


def test_flatten_nested_and_all(spark):
    df = _people(spark)
    out = C.flatten_nested(df, {"addr.city": "addr_city"})
    assert "addr_city" in out.columns
    flat = C.flatten_all(df)
    assert set(flat.columns) == {"name", "age", "addr_city", "addr_zip", "tags"}


def test_split_explode_drops_empty(spark):
    df = _people(spark)
    out = C.split_explode(df, "tags", ",")
    toks = [r.token for r in out.orderBy("token").collect()]
    assert toks == ["a", "b", "c"]  # empty token from 'cat' dropped


def test_json_csv_parse(spark):
    df = spark.createDataFrame([Row(j='{"a": 5, "b": "x"}', c="1,foo")])
    parsed = C.parse_json_column(df, "j", "a INT, b STRING")
    row = parsed.select("parsed.a", "parsed.b").first()
    assert (row[0], row[1]) == (5, "x")
    csv = C.parse_csv_column(df, "c", "n INT, s STRING")
    row = csv.select("parsed.n", "parsed.s").first()
    assert (row[0], row[1]) == (1, "foo")


def test_grok_null_on_no_match(spark):
    df = spark.createDataFrame([Row(line="code=7 msg=hi"), Row(line="garbage")])
    out = C.grok_parse(df, "line", {"code": r"code=(\d+)"})
    vals = [r.code for r in out.orderBy(F.col("code").asc_nulls_last()).collect()]
    assert vals == ["7", None]


def test_cast_and_chain(spark):
    df = _people(spark)
    out = C.chain(
        df,
        lambda d: C.cast_columns(d, {"age": "string"}),
        lambda d: C.pick_fields(d, ["name", "age"]),
    )
    assert dict(out.dtypes)["age"] == "string"
    assert out.columns == ["name", "age"]


def test_async_map_1to1_order_and_schema(spark):
    """AsyncConverter1to1 analog: bounded-concurrency I/O enrichment,
    strictly 1:1 and order-preserving within each Arrow batch."""
    df = spark.range(50).selectExpr("id", "CAST(id % 5 AS INT) AS grp")

    def enrich(row):
        return f"{row['grp']}#{row['id']}"

    out = C.async_map_1to1(df, enrich, "tag", "string", max_concurrency=4)
    assert [f.name for f in out.schema.fields] == ["id", "grp", "tag"]
    got = {r.id: r.tag for r in out.collect()}
    assert len(got) == 50
    assert got[13] == "3#13"


def test_async_map_1to1_input_cols_subset(spark):
    df = spark.range(10).selectExpr("id", "id * 10 AS big")
    out = C.async_map_1to1(
        df, lambda r: r["id"] + 1, "nxt", "long", input_cols=["id"])
    assert {r.id: r.nxt for r in out.collect()}[4] == 5
