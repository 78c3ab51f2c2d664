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


_MARKER = re.compile(r"[+:]- ")


def checkpoint_broadcast_flags(plan: str, *, strict: bool = False) -> list[str]:
    """ADVISORY detector for the mis-broadcast class (SCALE.md rounds
    5-6): a ``BroadcastExchange`` whose build subtree contains a
    ``Scan ExistingRDD`` leaf (the localCheckpoint node) is being
    broadcast off an estimate Catalyst CANNOT trust — checkpoint
    descendants inherit the plan-time size claim, and explode-generated
    pair plans underestimate by ~5 orders of magnitude, so AQE happily
    broadcasts data-sized edge lists (measured r5; found again in
    triangle counting r6). Flags are for human review, not a hard
    gate: a broadcast of a MODEL-SIZED contraction of checkpointed
    data (64-row DSIR buckets, MG candidate sets) is correct and will
    also flag — the question the flag asks is "is this build side
    bounded by construction, or bounded by an estimate?"."""
    lines = plan.split("\n\n")[0].splitlines()  # tree section only

    def depth(line: str) -> int:
        m = _MARKER.search(line)
        return m.start() if m else -1

    flags = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            nd = depth(nxt)
            if nd >= 0 and nd <= d:
                break  # left the broadcast subtree
            subtree.append(nxt)
        if not any("Scan ExistingRDD" in s for s in subtree):
            continue
        # a shuffle Exchange inside the build subtree means AQE observes
        # the TRUE size of that stage and can demote the broadcast at
        # runtime (the duplicate-spans precedent). CAVEAT (round 6):
        # demotion is cost-gated — AQE keeps a static broadcast when
        # the SMJ re-plan would add an exchange
        # (test_aqe_broadcast_demotion_is_cost_gated) — so an Exchange
        # in the build demotes reliably only when the probe side is
        # already partitioned on the join key. The exception stays
        # because every model-sized contraction (the correct
        # broadcasts) has one, and flagging them all would bury the
        # real hazards; treat Exchange-in-build plans as "verify the
        # probe partitioning", not "safe". ``strict=True`` (the
        # --hazard-sweep path) disables the exception because that
        # mode cancels intent-driven broadcasts by set-difference
        # instead.
        # ``ReusedExchange`` counts as measurable too: a build side whose
        # shuffle planned as a reuse of another stage's Exchange is
        # observed by AQE exactly like the original (r6 ADVICE — the
        # docsets rework leans on ReuseExchange and would otherwise
        # advisory-false-positive).
        if not strict and any(
            re.search(r"[+:]- (?:Reused)?Exchange[ \[]", s) for s in subtree
        ):
            continue
        flags.append(line.strip()[:100])
    return flags


def hazard_sweep(spark, specs, sf: str) -> int:
    """Two-pass triage for the checkpoint-broadcast class. Pass 1 plans
    each query under the session default and strict-flags every
    broadcast with a checkpoint scan anywhere in its build subtree.
    Pass 2 re-plans under ``spark.sql.autoBroadcastJoinThreshold=-1``:
    broadcasts a user asked for by hint/``F.broadcast`` SURVIVE the
    -1 threshold (intent, presumed bounded by construction), while
    Catalyst's own estimate-driven picks flip to SMJ and vanish. The
    report is the set difference — broadcasts that exist only because
    an (inherited, possibly bogus) estimate said "small". Each hit
    still needs a human verdict: a checkpoint of an honestly-estimated
    subtree scales its claim with the input and Catalyst would stop
    broadcasting it at real scale; only bogus-estimate descendants
    (explode/pair-generator lineage) broadcast at ANY size."""
    hits = 0
    unverified = 0
    for spec in specs:
        if "eager" in spec.tags:
            continue

        def flags_under(threshold: str | None) -> list[str] | None:
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            if threshold is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
            # the physical plan is computed lazily at explain() time, so
            # the conf override must stay live through the explain, not
            # just through plan construction
            try:
                df = spec.fn(spark, sf)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            except Exception:
                return None
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            return checkpoint_broadcast_flags(buf.getvalue(), strict=True)

        default_flags = flags_under(None)
        if default_flags is None:
            # r6 ADVICE: an exception during plan/explain is NOT
            # "hazard-free" — conflating the two would let the
            # "zero estimate-driven broadcasts" claim go hollow for
            # queries that never planned. Count and report separately.
            unverified += 1
            print(f"== {spec.name}: SWEEP ERROR — plan/explain threw, UNVERIFIED")
            continue
        if not default_flags:
            continue
        pinned_flags = flags_under("-1")
        if pinned_flags is None:
            continue
        # compare COUNTS, not flag strings: node ids and indentation
        # renumber when unrelated joins re-plan under -1, so a
        # string-diff false-positives every explicitly-hinted broadcast
        extra = len(default_flags) - len(pinned_flags)
        if extra > 0:
            hits += 1
            print(
                f"== {spec.name}: {extra} ESTIMATE-DRIVEN CHECKPOINT "
                f"BROADCAST(S) (default {len(default_flags)}, "
                f"threshold-off {len(pinned_flags)})"
            )
            for f in default_flags:
                print(f"   {f}")
    print(
        f"hazard sweep: {hits} queries with estimate-driven checkpoint "
        f"broadcasts, {unverified} UNVERIFIED (plan error)"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--hazard-sweep",
        action="store_true",
        help="two-pass estimate-driven checkpoint-broadcast triage "
        "(over the given names, or the ENTIRE registry by default)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY, bench_specs

    spark = get_spark("explain-audit")
    if args.hazard_sweep:
        specs = (
            [REGISTRY[n] for n in args.names]
            if args.names
            else list(REGISTRY.values())
        )
        return hazard_sweep(spark, specs, args.sf)
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
        for flag in checkpoint_broadcast_flags(plan):
            print(f"   CHECKPOINT-BROADCAST? {flag}")
        for line in plan.splitlines():
            if "PushedFilters: [" in line and "[]" not in line:
                print(f"   {line.strip()[:120]}")
        # (codegen spans are not annotated in AQE's initial formatted
        # plan — use df.explain() post-execution to inspect them)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
