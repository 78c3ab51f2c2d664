"""Plan audit: a compact physical-plan summary for every bench query.

For each bench-tagged query (or the names given), prints the exchange /
join / aggregate profile and the scan-level pushdown evidence — the
at-a-glance check that the plan still has the shape SCALE.md documents.
Use alongside tests/test_plans.py (which pins the load-bearing shapes).

Usage:  python tools/explain_audit.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

INTERESTING = re.compile(
    r"(Exchange|BroadcastExchange|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
    r"|BroadcastNestedLoopJoin|HashAggregate|ObjectHashAggregate|SortAggregate"
    r"|WindowGroupLimit|Window\b|Expand|Generate|FlatMapGroupsInPandas|MapInPandas)"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY, bench_specs

    spark = get_spark("explain-audit")
    specs = (
        [REGISTRY[n] for n in args.names] if args.names else bench_specs()
    )
    for spec in specs:
        if "eager" in spec.tags and spec.name not in args.names:
            # runs the whole job (sinks included) just to build a plan
            # of the read-back — skip unless explicitly requested
            print(f"== {spec.name}: eager job, skipped (pass its name to force)")
            continue
        try:
            df = spec.fn(spark, args.sf)
        except Exception as e:  # streaming queries execute eagerly; skip cleanly
            print(f"== {spec.name}: unplannable here ({type(e).__name__})")
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        counts: dict[str, int] = {}
        for m in INTERESTING.finditer(plan):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        profile = " ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        print(f"== {spec.name}\n   {profile}")
        for line in plan.splitlines():
            if "PushedFilters: [" in line and "[]" not in line:
                print(f"   {line.strip()[:120]}")
        # (codegen spans are not annotated in AQE's initial formatted
        # plan — use df.explain() post-execution to inspect them)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
