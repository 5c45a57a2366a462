"""Round-over-round bench comparison (VERDICT r4 #5).

Diffs the current ``BENCH_DETAILS.json`` (or a given pair of files)
against the most recent prior round's per-query numbers, flagging any
query whose wall clock OR shuffle-write bytes grew beyond the
regression threshold (default 1.3x). Prior rounds come from
``BENCH_r*.json`` (per-query seconds — always present) plus the
details sidecar when available (shuffle bytes).

Usage:
    python scripts/bench_diff.py                    # newest vs previous
    python scripts/bench_diff.py --threshold 1.5
    python scripts/bench_diff.py --write BENCH_DIFF.json

Exit code: 0 always (the diff is a report, not a gate) — the flagged
list is what the round report cites.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_round_timings() -> dict[int, dict[str, float]]:
    """Per-query seconds from every BENCH_r*.json that parsed."""
    rounds: dict[int, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        rnum = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        queries = (doc.get("parsed") or {}).get("queries") or doc.get("queries")
        if not queries:
            # the driver stores the final stdout line under "tail"
            tail = doc.get("tail", "")
            m = re.search(r'\{"metric".*\}', tail)
            if m:
                try:
                    queries = json.loads(m.group(0)).get("queries")
                except Exception:
                    queries = None
        if queries:
            rounds[rnum] = {k: float(v) for k, v in queries.items()}
    return rounds


def load_details(path: str) -> dict[str, dict]:
    try:
        return json.load(open(path)).get("query_details", {})
    except Exception:
        return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag ratios above this (sec and shuffle bytes)")
    ap.add_argument("--current", default=os.path.join(ROOT, "BENCH_DETAILS.json"),
                    help="current details sidecar (sec + shuffle bytes)")
    ap.add_argument("--write", default=os.path.join(ROOT, "BENCH_DIFF.json"),
                    help="where to write the machine-readable diff")
    args = ap.parse_args()

    rounds = load_round_timings()
    cur_details = load_details(args.current)
    cur = {n: d.get("sec_timed_pass") for n, d in cur_details.items()
           if d.get("sec_timed_pass") is not None}
    if not cur and rounds:
        # no local details yet: compare the two newest driver rounds
        newest = max(rounds)
        cur = rounds.pop(newest)
        print(f"(no BENCH_DETAILS.json — diffing round {newest} "
              "against its predecessor)")
    if not cur:
        print("nothing to diff: no current bench numbers found")
        return 0

    prior_round = max(rounds) if rounds else None
    prior = rounds.get(prior_round, {})

    flagged, improved, first_time = [], [], []
    for name, sec in sorted(cur.items()):
        if name not in prior:
            first_time.append(name)
            continue
        base = prior[name]
        ratio = sec / base if base else float("inf")
        row = {"query": name, "sec": sec, f"sec_r{prior_round}": base,
               "ratio": round(ratio, 2)}
        if ratio > args.threshold:
            flagged.append(row)
        elif ratio < 1 / args.threshold:
            improved.append(row)

    out = {
        "prior_round": prior_round,
        "threshold": args.threshold,
        "n_compared": len(cur) - len(first_time),
        "flagged": flagged,
        "improved": improved,
        "first_time": sorted(first_time),
    }
    with open(args.write, "w") as f:
        json.dump(out, f, indent=1)

    print(f"compared {out['n_compared']} queries vs round {prior_round} "
          f"(threshold {args.threshold}x); "
          f"{len(first_time)} first-timers: {', '.join(first_time) or '-'}")
    for row in flagged:
        print(f"  REGRESSED {row['query']}: {row[f'sec_r{prior_round}']}s -> "
              f"{row['sec']}s ({row['ratio']}x)")
    for row in improved:
        print(f"  improved  {row['query']}: {row[f'sec_r{prior_round}']}s -> "
              f"{row['sec']}s ({row['ratio']}x)")
    if not flagged:
        print("  no regressions above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
