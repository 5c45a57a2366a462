"""Job-configuration layer: parse the reference's ``.pull`` /
``.properties`` job files and compile them into executable
:class:`~gobblin_spark.plans.pipeline.Pipeline` specs — the
"run a Gobblin job from a config file" UX.

Reference mapping (all relative to /root/reference/):
- .pull format + key vocabulary: gobblin-example/src/main/resources/
  wikipedia.pull, example-parquet.pull (job.name, source.class,
  converter.classes, writer.output.format, data.publisher.type,
  state.store.*, ${var} interpolation).
- Key constants: gobblin-api/src/main/java/org/apache/gobblin/
  configuration/ConfigurationKeys.java (SOURCE_CLASS_KEY,
  CONVERTER_CLASSES_KEY, JOB_COMMIT_POLICY_KEY, ...).
- Launch path: gobblin-runtime/.../cli job → JobLauncher
  (AbstractJobLauncher.java) — here :func:`run_job`.

Spark-first design: the config compiles to ONE lazy Pipeline spec;
nothing here executes per-record logic. Class names from the
reference resolve through a registry so existing .pull files work
verbatim where the semantics carry over (file sources, projection /
filter / sampling converters, row policies, partitioned writers,
commit policies); unknown classes fail fast with the key that needs
a registered analog. At 100 TB the config layer is pure driver-side
metadata — the compiled plan is what scales, and it is the same
Catalyst plan a hand-written Pipeline produces.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession, functions as F

from gobblin_spark.operators import converters as C, quality as Q
from gobblin_spark.plans import pipeline as PL
from gobblin_spark.sinks import publish as P
from gobblin_spark.sources import files as FS

# --------------------------------------------------------------------------
# .properties / .pull parsing
# --------------------------------------------------------------------------

_INTERP = re.compile(r"\$\{([^}]+)\}")


def parse_properties(text: str) -> dict[str, str]:
    """Java-properties subset used by .pull files: ``k=v`` / ``k: v``,
    ``#``/``!`` comments, backslash line-continuations, and ``${key}``
    interpolation against other keys (example-parquet.pull:21
    ``state.store.fs.uri=${fs.uri}``)."""
    props: dict[str, str] = {}
    logical: list[str] = []
    pending = ""
    for raw in text.splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line.lstrip().startswith(("#", "!")):
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            pending = line[:-1]
            continue
        logical.append(line)
    if pending:
        logical.append(pending)
    for line in logical:
        m = re.match(r"\s*([^=:\s]+)\s*[=:]\s*(.*)$", line)
        if m:
            props[m.group(1)] = m.group(2).strip()

    def resolve(value: str, seen: frozenset[str]) -> str:
        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key in seen or key not in props:
                return m.group(0)
            return resolve(props[key], seen | {key})

        return _INTERP.sub(sub, value)

    return {k: resolve(v, frozenset({k})) for k, v in props.items()}


@dataclass
class JobSpec:
    """Parsed job config (JobSpec in gobblin-api/.../runtime/api/
    JobSpec.java — name + config bag)."""

    name: str
    group: str = ""
    description: str = ""
    props: dict[str, str] = dc_field(default_factory=dict)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.props.get(key, default)

    def get_list(self, key: str) -> list[str]:
        raw = self.props.get(key, "")
        return [p.strip() for p in raw.split(",") if p.strip()]


def load_job_spec(text_or_path: str) -> JobSpec:
    """Parse a .pull/.properties document (inline text or a path)."""
    if "\n" not in text_or_path and text_or_path.endswith(
        (".pull", ".properties", ".job", ".conf")
    ):
        with open(text_or_path, encoding="utf-8") as f:
            text = f.read()
    else:
        text = text_or_path
    props = parse_properties(text)
    return JobSpec(
        name=props.get("job.name", "job"),
        group=props.get("job.group", ""),
        description=props.get("job.description", ""),
        props=props,
    )


# --------------------------------------------------------------------------
# Registries: reference class names / short names → Spark analogs
# --------------------------------------------------------------------------

SourceFactory = Callable[[JobSpec], Callable[[SparkSession], DataFrame]]
ConverterFactory = Callable[[JobSpec], Callable[[DataFrame], DataFrame]]
PolicyFactory = Callable[[JobSpec], Q.RowPolicy]

TaskPolicyFactory = Callable[[JobSpec], Callable[[DataFrame], Q.TaskPolicyResult]]

_SOURCES: dict[str, SourceFactory] = {}
_CONVERTERS: dict[str, ConverterFactory] = {}
_POLICIES: dict[str, PolicyFactory] = {}
_TASK_POLICIES: dict[str, TaskPolicyFactory] = {}


def register_source(name: str, factory: SourceFactory) -> None:
    _SOURCES[name] = factory


def register_converter(name: str, factory: ConverterFactory) -> None:
    _CONVERTERS[name] = factory


def register_row_policy(name: str, factory: PolicyFactory) -> None:
    _POLICIES[name] = factory


def register_task_policy(name: str, factory: TaskPolicyFactory) -> None:
    _TASK_POLICIES[name] = factory


def _short(cls: str) -> str:
    """'org.apache.gobblin.x.FooConverter' → 'FooConverter'."""
    return cls.rsplit(".", 1)[-1]


def _resolve(registry: Mapping[str, Callable], cls: str, kind: str):
    f = registry.get(cls) or registry.get(_short(cls))
    if f is None:
        raise KeyError(
            f"no registered {kind} analog for {cls!r}; "
            f"register one via register_{kind}()"
        )
    return f


# -- built-in sources ------------------------------------------------------


def _file_source(fmt: str) -> SourceFactory:
    def factory(spec: JobSpec):
        raw = spec.get("source.filebased.data.directory") or spec.get(
            "source.filebased.files.to.pull"
        )
        if not raw:
            raise KeyError("source.filebased.data.directory is required")
        # files.to.pull is a comma list in the reference
        # (FileBasedSource.java SOURCE_FILEBASED_FILES_TO_PULL); a
        # single string containing commas is ONE unsplit path to Spark
        paths = [p.strip() for p in raw.split(",") if p.strip()]
        path = paths[0] if len(paths) == 1 else paths

        def load(spark: SparkSession) -> DataFrame:
            if fmt == "parquet":
                if isinstance(path, list):
                    from functools import reduce

                    frames = [FS.read_parquet(spark, p) for p in path]
                    return reduce(lambda a, b: a.unionByName(b), frames)
                return FS.read_parquet(spark, path)
            if fmt == "csv":
                # audit-r7 fix: read_csv's kwarg is `sep`, not
                # `delimiter` — every CSV .pull job raised TypeError
                return FS.read_csv(
                    spark, path,
                    sep=spec.get("converter.csv.delimiter", ","),
                    header=spec.get("source.csv.has.header", "true") == "true",
                    schema=spec.get("source.schema"),
                )
            if fmt == "json":
                return FS.read_json(spark, path, schema=spec.get("source.schema"))
            return FS.read_text(spark, path)

        return load

    return factory


def _table_source(spec: JobSpec):
    """gobblin_spark extension: read a named testdata/warehouse table —
    `source.table.name` + `source.data.directory`."""
    sf_dir = spec.get("source.data.directory")
    table = spec.get("source.table.name") or spec.get("extract.table.name")
    if not (sf_dir and table):
        raise KeyError("source.data.directory and source.table.name are required")
    return lambda spark: FS.load_table(spark, sf_dir, table.lower())


for _name, _fmt in [
    ("ParquetFileSource", "parquet"),
    ("parquet", "parquet"),
    ("CsvFileSource", "csv"),
    ("csv", "csv"),
    ("SimpleJsonSource", "json"),  # gobblin-example/.../simplejson/SimpleJsonSource.java
    ("json", "json"),
    ("TextFileBasedSource", "text"),
    ("text", "text"),
]:
    register_source(_name, _file_source(_fmt))
register_source("table", _table_source)
register_source("TableSource", _table_source)


def _rest_pages_source(spec: JobSpec):
    """Paged-REST via the native Python DataSource (`gobblin_rest`):
    `source.data.directory` = page dir, `source.schema` = read DDL
    (must be explicit — pages are not self-describing). Optional
    `source.bad.records` = fail|drop. The reference analog is
    RestApiSource/RestApiExtractor wired through a .pull file."""
    path = spec.get("source.data.directory")
    ddl = spec.get("source.schema")
    if not (path and ddl):
        raise KeyError("source.data.directory and source.schema are required")
    bad = spec.get("source.bad.records", "fail")

    def load(spark: SparkSession) -> DataFrame:
        from gobblin_spark.sources import datasource as DS

        DS.register(spark)
        return (
            spark.read.format("gobblin_rest").schema(ddl)
            .option("path", path).option("bad_records", bad).load()
        )

    return load


register_source("rest_pages", _rest_pages_source)
register_source("RestApiSource", _rest_pages_source)


def _sql_table_source(spec: JobSpec):
    """Query-based SQL pull via the native `gobblin_sql` DataSource,
    keyed with the reference's own vocabulary
    (QueryBasedSource.java / JdbcExtractor.java key names):
    `source.conn.database` (embedded db file standing in for
    host/port), `source.entity` (table),
    `source.querybased.partition.column` + `.start.value`/`.end.value`
    and `source.max.number.of.partitions` for the parallel pull."""
    db = spec.get("source.conn.database")
    table = spec.get("source.entity") or spec.get("source.table.name")
    pc = spec.get("source.querybased.partition.column")
    lo = spec.get("source.querybased.start.value")
    hi = spec.get("source.querybased.end.value")
    if not all([db, table, pc, lo, hi]):
        raise KeyError(
            "source.conn.database, source.entity, "
            "source.querybased.partition.column and "
            "source.querybased.{start,end}.value are required")
    n = spec.get("source.max.number.of.partitions", "4")

    def load(spark: SparkSession) -> DataFrame:
        from gobblin_spark.sources import datasource as DS

        DS.register(spark)
        return (
            spark.read.format("gobblin_sql")
            .option("database", db).option("table", table)
            .option("partition_column", pc)
            .option("lower_bound", lo).option("upper_bound", hi)
            .option("num_partitions", n).load()
        )

    return load


register_source("sql_table", _sql_table_source)
register_source("QueryBasedSource", _sql_table_source)


# -- built-in converters ---------------------------------------------------


def _conv_pick(spec: JobSpec):
    fields = spec.get_list("converter.fields.to.pick")
    return lambda df: C.pick_fields(df, fields)


def _conv_drop(spec: JobSpec):
    fields = spec.get_list("converter.fields.to.drop")
    return lambda df: C.project_drop(df, fields)


def _conv_filter(spec: JobSpec):
    field = spec.get("converter.filter.field")
    value = spec.get("converter.filter.value")
    return lambda df: C.filter_field_equals(df, field, value)


def _conv_regex_filter(spec: JobSpec):
    field = spec.get("converter.filter.field")
    pattern = spec.get("converter.filter.pattern")
    return lambda df: C.filter_regex(df, field, pattern)


def _conv_sample(spec: JobSpec):
    ratio = float(spec.get("converter.sample.ratio", "0.1"))
    seed = int(spec.get("converter.sample.seed", "42"))
    return lambda df: C.sample_bernoulli(df, ratio, seed)


def _conv_flatten(spec: JobSpec):
    return lambda df: C.flatten_all(df)


def _conv_cast(spec: JobSpec):
    casts = dict(
        pair.split(":", 1) for pair in spec.get_list("converter.cast.columns")
    )
    return lambda df: C.cast_columns(df, casts)


for _name, _f in [
    ("AvroFieldsPickConverter", _conv_pick),  # gobblin-core/.../AvroFieldsPickConverter.java
    ("pick_fields", _conv_pick),
    ("AvroProjectionConverter", _conv_drop),
    ("drop_fields", _conv_drop),
    ("AvroFilterConverter", _conv_filter),  # gobblin-core/.../AvroFilterConverter.java
    ("filter_equals", _conv_filter),
    ("StringFilterConverter", _conv_regex_filter),
    ("filter_regex", _conv_regex_filter),
    ("SamplingConverter", _conv_sample),
    ("sample", _conv_sample),
    ("FlattenNestedKeyConverter", _conv_flatten),
    ("flatten", _conv_flatten),
    ("CastConverter", _conv_cast),
    ("cast", _conv_cast),
]:
    register_converter(_name, _f)


# -- built-in row policies -------------------------------------------------


def _policy_not_null(spec: JobSpec):
    return Q.not_null_policy(spec.get_list("qualitychecker.notnull.columns"))


def _policy_range(spec: JobSpec):
    col = spec.get("qualitychecker.range.column")
    return Q.range_policy(
        col,
        float(spec.get("qualitychecker.range.min", "-1e308")),
        float(spec.get("qualitychecker.range.max", "1e308")),
    )


def _policy_ts_bound(spec: JobSpec):
    return Q.timestamp_lower_bound_policy(
        spec.get("qualitychecker.timestamp.column"),
        spec.get("qualitychecker.timestamp.min"),
    )


for _name, _f in [
    ("NotNullPolicy", _policy_not_null),
    ("not_null", _policy_not_null),
    ("RangePolicy", _policy_range),
    ("range", _policy_range),
    ("RecordTimestampLowerBoundPolicy", _policy_ts_bound),  # gobblin-core/.../RecordTimestampLowerBoundPolicy.java
    ("timestamp_lower_bound", _policy_ts_bound),
]:
    register_row_policy(_name, _f)


# -- built-in task-level (write-audit) policies ----------------------------


def _task_policy_row_count_range(spec: JobSpec):
    """RowCountRangePolicy.java analog against the STAGED output:
    ``qualitychecker.rowcount.min`` / ``.max`` bound the published row
    count — the audit that gates the publish under 'full'/'successful'
    commit policies."""
    lo = int(spec.get("qualitychecker.rowcount.min", "0"))
    hi_raw = spec.get("qualitychecker.rowcount.max")
    hi = int(hi_raw) if hi_raw is not None else None

    def audit(staged_df: DataFrame) -> Q.TaskPolicyResult:
        n = staged_df.count()
        ok = n >= lo and (hi is None or n <= hi)
        return Q.TaskPolicyResult("row_count_range", ok,
                                  f"rows={n} min={lo} max={hi}")

    return audit


for _name in ("RowCountRangePolicy", "row_count_range"):
    register_task_policy(_name, _task_policy_row_count_range)


# --------------------------------------------------------------------------
# Compile + run
# --------------------------------------------------------------------------

_COMMIT_POLICIES = {
    # ConfigurationKeys.JOB_COMMIT_POLICY_KEY values (JobCommitPolicy.forName,
    # JobCommitPolicy.java:35): 'successful' commits only datasets whose
    # audits passed — mapping it to PARTIAL would publish datasets whose
    # write-audit policies FAILED
    "full": P.JobCommitPolicy.COMMIT_ON_FULL_SUCCESS,
    "successful": P.JobCommitPolicy.COMMIT_SUCCESSFUL_TASKS,
    "partial": P.JobCommitPolicy.COMMIT_ON_PARTIAL_SUCCESS,
}


def to_pipeline(spec: JobSpec) -> PL.Pipeline:
    """Compile a JobSpec into a Pipeline: source.class →
    converter.classes chain → qualitychecker row policies →
    writer/publisher branch, in Constructs order."""
    source = _resolve(_SOURCES, spec.get("source.class", ""), "source")(spec)
    transforms = [
        _resolve(_CONVERTERS, cls, "converter")(spec)
        for cls in spec.get_list("converter.classes")
    ]
    policies = [
        _resolve(_POLICIES, cls, "row_policy")(spec)
        for cls in spec.get_list("qualitychecker.row.policies")
    ]
    # task-level policies audit the STAGED output (write-audit-publish);
    # names resolve via the task-policy registry, falling back to the
    # row-policy registry for configs that historically listed row
    # policies under the task key
    task_policies = []
    for cls in spec.get_list("qualitychecker.task.policies"):
        if cls in _TASK_POLICIES or _short(cls) in _TASK_POLICIES:
            task_policies.append(_resolve(_TASK_POLICIES, cls, "task_policy")(spec))
        else:
            policies.append(_resolve(_POLICIES, cls, "row_policy")(spec))

    branches: list[PL.Branch] = []
    final_dir = spec.get("data.publisher.final.dir")
    if final_dir:
        fmt = (spec.get("writer.output.format") or "parquet").lower()
        # fmt == "avro" runs through write_data's container-writer
        # fallback when the spark-avro jar is absent — real .avro files
        branches.append(
            PL.Branch(
                name=spec.get("extract.table.name", "output"),
                final_dir=final_dir,
                fmt=fmt,
                partition_by=spec.get_list("writer.partition.columns") or None,
                task_policies=task_policies,
            )
        )

    commit_name = spec.get("job.commit.policy", "full").lower()
    if commit_name not in _COMMIT_POLICIES:
        raise KeyError(
            f"job.commit.policy={commit_name!r} is not one of "
            f"{sorted(_COMMIT_POLICIES)} (JobCommitPolicy.forName)")
    return PL.Pipeline(
        source=source,
        transforms=transforms,
        row_policies=policies,
        branches=branches,
        quarantine_dir=spec.get("qualitychecker.row.err.file"),
        commit_policy=_COMMIT_POLICIES[commit_name],
        job_id=spec.name,
    )


def compile_frame(spark: SparkSession, text_or_path: str) -> DataFrame:
    """Compile the job and return the main (pre-sink) DataFrame — the
    dry-run surface for .explain / further composition."""
    pl = to_pipeline(load_job_spec(text_or_path))
    passed, _ = PL.compose(pl, spark)
    return passed


def run_job(spark: SparkSession, text_or_path: str) -> PL.PipelineResult:
    """Parse → compile → execute (the `gobblin.sh run job --conf x.pull`
    path: AbstractJobLauncher.launchJob)."""
    return PL.run(to_pipeline(load_job_spec(text_or_path)), spark)
