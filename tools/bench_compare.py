"""Bench regression detector: compare two BENCH_r*.json records.

The driver records one bench JSON per round; this tool diffs any two
(defaulting to the newest pair) and flags per-query regressions beyond
a threshold, so a plan regression shows up as a named query, not a
vague total. Remember the r3 note: r1/r2 numbers under-measured
aggregate-heavy queries (count()-pruning bug) — only compare r3+.

Usage:  python tools/bench_compare.py [OLD.json NEW.json] [--threshold 1.3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="old.json new.json (default: newest two BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag queries slower than OLD * threshold (default 1.3)")
    args = ap.parse_args()

    root = Path(__file__).resolve().parent.parent
    if len(args.files) == 2:
        old_p, new_p = Path(args.files[0]), Path(args.files[1])
    else:
        records = sorted(root.glob("BENCH_r*.json"))
        if len(records) < 2:
            print("need two bench records to compare")
            return 0
        old_p, new_p = records[-2], records[-1]

    def load(p: Path) -> dict:
        d = json.loads(p.read_text())
        # driver records wrap the bench line under "parsed"
        return d.get("parsed") or d

    old, new = load(old_p), load(new_p)
    oq, nq = old.get("queries", {}) or {}, new.get("queries", {}) or {}

    print(f"{old_p.name}: {old.get('value')}s total, {len(oq)} queries")
    print(f"{new_p.name}: {new.get('value')}s total, {len(nq)} queries\n")

    regressions, improvements = [], []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold:
            regressions.append((ratio, name, o, n))
        elif ratio < 1 / args.threshold:
            improvements.append((ratio, name, o, n))
    for ratio, name, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION  {name}: {o:.2f}s -> {n:.2f}s  ({ratio:.2f}x)")
    for ratio, name, o, n in sorted(improvements):
        print(f"improved    {name}: {o:.2f}s -> {n:.2f}s  ({ratio:.2f}x)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added: {added}")
    if removed:
        print(f"removed: {removed}")
    print(f"\n{len(regressions)} regression(s) beyond {args.threshold}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
