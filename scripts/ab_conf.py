"""A/B a runtime-settable Spark conf over a subset of headline queries.

Alternates A and B runs back-to-back (min over repeats) inside ONE
session so machine drift cancels; prints per-query and total deltas.
Usage: python scripts/ab_conf.py <conf_key> <valA> <valB> [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from gobblin_spark.session import PLAN_HEAVY_CONF, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    key, val_a, val_b = sys.argv[1:4]
    names = sys.argv[4:]
    from gobblin_spark.queries import HEADLINE, QUERIES

    if not names:
        names = list(HEADLINE)
    spark = get_spark("ab-conf", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  **PLAN_HEAVY_CONF})
    # warm codegen at the smallest SF, like bench.py
    for n in names:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite").format("noop").save()
        except Exception:
            pass

    def run(n):
        t0 = time.perf_counter()
        QUERIES[n](spark, SF_DIR).write.mode("overwrite").format(
            "noop").save()
        return time.perf_counter() - t0

    res = {}
    for n in names:
        best = {val_a: None, val_b: None}
        for _ in range(2):
            for v in (val_a, val_b):
                spark.conf.set(key, v)
                sec = run(n)
                if best[v] is None or sec < best[v]:
                    best[v] = sec
        res[n] = (best[val_a], best[val_b])
        print(f"{best[val_a]:7.3f} {best[val_b]:7.3f} "
              f"{best[val_b]/best[val_a]:5.2f}x  {n}", flush=True)
    ta = sum(a for a, _ in res.values())
    tb = sum(b for _, b in res.values())
    print(f"TOTAL A({val_a})={ta:.2f}  B({val_b})={tb:.2f}  "
          f"ratio {tb/ta:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
