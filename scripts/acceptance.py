"""One-page engine health report — the operator's morning check.

Runs the acceptance-report family (approximation quality), the data
contracts, the referential-integrity audit, volume anomalies, and
distribution drift against $SPARK_GRAFT_SF_DIR (default sf0.01) and
prints each result table.

    python scripts/acceptance.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from gobblin_spark import get_spark  # noqa: E402
from gobblin_spark.queries import QUERIES  # noqa: E402

REPORTS = [
    "lsh_recall_report",
    "simhash_completeness_report",
    "ivf_recall_report",
    "expectations_report_orders",
    "ri_audit_orphans",
    "ingest_count_anomalies",
    "corpus_drift_kl",
]


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark()
    rc = 0
    for name in REPORTS:
        print(f"\n== {name} ==")
        try:
            QUERIES[name](spark, sf).show(50, truncate=False)
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"FAILED: {ex}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
