"""Plan the next round's driver verification window.

The correctness driver evaluates only the first 50 entries of
``queries()``. This script reads every ``CORRECTNESS_r*.json`` in the
repo root, classifies each catalog entry (green driver row somewhere /
red / never run), and prints a proposed ``DRIVER_FIRST`` for the next
round: never-run entries first, then red rows needing re-proof, padded
with the longest-unseen green entries as canaries.

Usage: python scripts/rotate_window.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys

sys.path.insert(0, ".")


def checked_sibling(name: str) -> str | None:
    """Hash-checked sibling of a rows-only entry, by the catalog's
    naming convention: ``<name>_checked``, falling back to the stem
    with a trailing ``_docs`` stripped (``minhash_lsh_docs`` →
    ``minhash_lsh_checked``). Returns None when no sibling exists."""
    from gobblin_spark.queries import QUERIES

    for cand in (f"{name}_checked",
                 f"{name.removesuffix('_docs')}_checked"):
        if cand in QUERIES and cand != name:
            return cand
    return None


def classify(window: int):
    from gobblin_spark.queries import QUERIES

    rounds = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnum = int(re.search(r"r(\d+)", path).group(1))
        rounds[rnum] = json.load(open(path))

    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for rnum, doc in sorted(rounds.items()):
        for name, row in doc.items():
            ok = (row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match", True) and not row.get("err"))
            # rows-only-by-design entries record err="no_oracle" when
            # they ran clean — that is their certification tier, not a
            # failure; classifying them red would burn a window slot
            # re-proving them every round
            if row.get("err") == "no_oracle":
                ok = True
            (last_green if ok else last_red)[name] = rnum

    names = list(QUERIES)
    never = [n for n in names if n not in last_green and n not in last_red]
    red = [n for n in names
           if n in last_red and last_red[n] >= last_green.get(n, -1)]
    green = sorted(
        (n for n in names if n in last_green and n not in red),
        key=lambda n: last_green[n])  # stalest certification first
    return names, never, red, green


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from gobblin_spark.queries import ORACLES

    names, never, red, green = classify(args.window)

    # verdict-r12 #2: a rows-only (no-oracle) canary re-proves row
    # counts, not values — when one comes up for refresh, PAIR IN its
    # hash-checked sibling immediately before it so the stale-green
    # refresh actually re-proves values. The sibling is pulled forward
    # out of its own place in the staleness order.
    canaries: list[str] = []
    emitted: set[str] = set()
    pulled: set[str] = set()
    for n in green:
        if n in emitted:
            continue
        if n not in ORACLES:
            sib = checked_sibling(n)
            if sib and sib in green and sib not in emitted:
                canaries.append(sib)
                emitted.add(sib)
                pulled.add(sib)
        canaries.append(n)
        emitted.add(n)
    proposal = (never + red + canaries)[:args.window]

    print(f"catalog: {len(names)} queries; window: {args.window}")
    print(f"never driver-run: {len(never)}; red at last run: {len(red)}; "
          f"green somewhere: {len(green)}")
    if len(never) + len(red) > args.window:
        print(f"WARNING: {len(never) + len(red) - args.window} never/red "
              "entries do not fit this round — they roll to the next one")
    print("\nDRIVER_FIRST = [")
    for n in proposal:
        tag = ("never" if n in never else "red" if n in red
               else "canary (sibling, pulled forward)" if n in pulled
               else "canary (rows-only)" if n not in ORACLES
               else "canary")
        print(f'    "{n}",  # {tag}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
