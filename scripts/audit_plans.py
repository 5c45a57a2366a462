"""Physical-plan audit: shuffle/broadcast/pushdown census per query.

Regenerates the numbers in PLANS.md. For each catalog query this prints
the count of hash-partitioned exchanges (shuffles), broadcast joins,
the pruned scan schemas, and the filters that reached the parquet
reader — the four properties that decide whether a plan survives a
100x scale-up.

Usage: python scripts/audit_plans.py [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from gobblin_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# queries that execute side effects (writes, streaming) rather than
# returning one lazy plan — their interesting plan is internal
SKIP = {
    "sink_roundtrip_partitioned", "incremental_pull_union",
    "streaming_ingest_parity", "pipeline_fork_publish",
    "hive_register_query", "format_convert_roundtrip",
    "stateful_dedup_users", "jdbc_pull_partitioned", "rest_source_pages",
    "async_enrich", "object_delete_manifest",
}


def audit(spark, name, fn) -> dict:
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    return {
        "name": name,
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin", plan)),
        "scans": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        "pushed": [p for p in re.findall(r"DataFilters: \[([^\]]*)\]", plan) if p],
    }


def main() -> int:
    from gobblin_spark.queries import QUERIES

    names = sys.argv[1:] or [n for n in QUERIES if n not in SKIP]
    spark = get_spark("gobblin-plan-audit", master="local[8]",
                      shuffle_partitions=8)
    for name in names:
        try:
            a = audit(spark, name, QUERIES[name])
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: audit failed: {type(ex).__name__}: {ex}")
            continue
        print(f"{a['name']}: shuffles={a['shuffles']} "
              f"broadcast_joins={a['broadcasts']}")
        for s in a["scans"][:4]:
            print(f"    scan: {s[:110]}")
        for p in a["pushed"][:4]:
            print(f"    pushed: {p[:110]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
