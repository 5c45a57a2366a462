"""CLI entry point — the ``gobblin.sh`` replacement surface
(reference: bin/gobblin, CliApplication run modes).

    python -m gobblin_spark run job.pull            # launch a .pull job
    python -m gobblin_spark explain job.pull        # compile, print plan
    python -m gobblin_spark query <name> [--sf-dir] # run a catalog query
    python -m gobblin_spark list                    # list catalog queries

``run`` mirrors `gobblin.sh run job --conf x.pull`
(AbstractJobLauncher.launchJob): parse properties -> compile ->
execute -> print the publish report + quarantine count + task-policy
verdicts. ``explain`` is the dry-run compile (`compile_frame`) with
the executed-plan dump — the operator's pre-flight for shuffle and
pushdown review.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(master: str | None, shuffle_partitions: int | None):
    from gobblin_spark.session import get_spark

    kwargs = {}
    if master:
        kwargs["master"] = master
    if shuffle_partitions:
        kwargs["shuffle_partitions"] = shuffle_partitions
    return get_spark(**kwargs)


def main(argv: list[str] | None = None, _spark=None) -> int:
    """``_spark``: inject an existing session (tests) — the CLI then
    does not stop it on exit."""
    p = argparse.ArgumentParser(prog="gobblin_spark")
    p.add_argument("--master", default=None,
                   help="Spark master (default: local[*])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="execute a .pull/.properties job")
    runp.add_argument("conf", help="job config path")

    exp = sub.add_parser("explain", help="compile a job, print the plan")
    exp.add_argument("conf", help="job config path")

    qp = sub.add_parser("query", help="run a catalog query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list catalog queries")

    mt = sub.add_parser(
        "maintain",
        help="iceberg table maintenance (the DEPLOYMENT.md cadence: "
             "rewrite -> expire -> orphans, each opt-in)")
    mt.add_argument("location", help="iceberg table location")
    mt.add_argument("--rewrite", action="store_true",
                    help="compact data files (replace snapshot)")
    mt.add_argument("--target-partitions", type=int, default=1)
    mt.add_argument("--sort-by", default=None,
                    help="comma-separated sort columns for the rewrite "
                         "(keeps per-file bounds disjoint = sharp "
                         "manifest/file skipping)")
    mt.add_argument("--expire-days", type=float, default=None,
                    help="expire snapshots older than N days")
    mt.add_argument("--orphans", action="store_true",
                    help="remove files no retained snapshot references "
                         "(run AFTER expire)")
    mt.add_argument("--orphans-older-than-days", type=float, default=3.0,
                    help="only sweep unreferenced files at least this "
                         "old (guards in-flight appends); 0 only when "
                         "nothing else writes")

    args = p.parse_args(argv)

    if args.cmd == "list":
        from gobblin_spark.queries import ORACLES, QUERIES

        for name in QUERIES:
            tag = "" if name in ORACLES else "  (rows-only)"
            print(f"{name}{tag}")
        return 0

    spark = _spark if _spark is not None else _session(
        args.master, args.shuffle_partitions)
    try:
        if args.cmd == "run":
            from gobblin_spark.plans.jobconf import run_job

            res = run_job(spark, args.conf)
            out = {
                "quarantined": res.quarantined,
                "branch_files": res.branch_files,
                "published": res.report is not None
                and getattr(res.report, "published", None),
                "events": [getattr(e, "name", str(e)) for e in res.events],
            }
            print(json.dumps(out, default=str))
            return 0
        if args.cmd == "explain":
            from gobblin_spark.plans.jobconf import compile_frame

            compile_frame(spark, args.conf).explain("formatted")
            return 0
        if args.cmd == "query":
            from gobblin_spark.queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            df = QUERIES[args.name](spark, args.sf_dir)
            df.show(args.limit, truncate=False)
            print(f"rows: {df.count()}")
            return 0
        if args.cmd == "maintain":
            import time as _time

            from gobblin_spark.sinks.iceberg import IcebergTable

            t = IcebergTable(spark, args.location)
            report: dict = {"location": args.location}
            if args.rewrite:
                sort_by = (args.sort_by.split(",")
                           if args.sort_by else None)
                report["rewrite_snapshot"] = t.rewrite_data_files(
                    target_partitions=args.target_partitions,
                    sort_by=sort_by)
                report["data_files"] = len(t.data_files())
            if args.expire_days is not None:
                cutoff = int((_time.time()
                              - args.expire_days * 86400) * 1000)
                report["snapshots_expired"] = t.expire_snapshots(cutoff)
            if args.orphans:
                report["orphans_removed"] = len(t.remove_orphan_files(
                    older_than_s=args.orphans_older_than_days * 86400))
            print(json.dumps(report, default=str))
            return 0
    finally:
        if _spark is None:
            spark.stop()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
