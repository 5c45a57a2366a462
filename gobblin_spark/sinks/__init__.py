"""Sinks: format writers (writers.py) and the atomic staging->final
publish protocol with commit policies (publish.py)."""

from gobblin_spark.sinks.publish import (  # noqa: F401
    JobCommitPolicy,
    PublishReport,
    StagedDataset,
    abort_staged,
    audit,
    commit,
    is_published,
    publish_staged,
    stage,
    write_audit_publish,
)
from gobblin_spark.sinks.writers import (  # noqa: F401
    WriteResult,
    with_schema_partition,
    with_time_partitions,
    write_console,
    write_data,
    write_time_partitioned,
)
