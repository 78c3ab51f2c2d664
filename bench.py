"""Headline benchmark: run the bench-tagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing counts full execution of each query through a **noop sink**
(`df.write.format("noop")`): every expression the query registers is
computed and discarded, with no driver transfer. The previous harness
timed `df.count()`, which let Catalyst PRUNE unreferenced aggregate
expressions — a `groupBy.agg` query's row count needs only the grouping
keys, so the timed plan silently dropped the aggregates (verified:
`sum(` disappears from the count-plan of q1). Numbers from this harness
are therefore higher than rounds 1-2 for aggregate-heavy queries — they
measure the query actually registered, not a pruned shadow of it.

Protocol (r13): TWO fresh-PROCESS sweeps — each sweep is a child
``python -m``-style invocation of this file that builds its own JVM,
runs per-query best-of-2 with persistent-block drops, a warm-up and a
settle guard, and writes its timings to a temp JSON the parent merges.
r12 restarted the SparkSession between sweeps, but the JVM gateway and
its process-wide state (codegen cache, heap fragmentation) survived a
`spark.stop()`; the builder's own dispersion evidence (SCALE.md: hybrid
64x probe 24.74s same-session vs 10.64s fresh process) says the process
boundary is the remaining drift channel, so sweep 2 now genuinely
starts cold. The recorded per-query number is the MIN across the pair
(a row must be slow in BOTH processes to be recorded slow), and the
JSON carries the cross-sweep self-ratio distribution.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _drop_persistent_blocks(spark) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)


def _warm(spark, sf_dir: str, registry) -> None:
    # warm-up, untimed: JVM classloading + codegen. The dedup queries
    # compile large higher-order-function/hash expression trees, so warm
    # those codegen paths too — on sf0.001 data, so the warm-up does a
    # negligible fraction of the benched work.
    def _run(name: str, d: str) -> None:
        registry[name].fn(spark, d).write.format("noop").mode("overwrite").save()

    _run("s1_scan_project", sf_dir)
    warm_dir = "/root/testdata/sf0.001"
    if Path(warm_dir).is_dir():
        _run("dedup_ngram_jaccard", warm_dir)
        _run("dedup_minhash_lsh", warm_dir)
        _run("dedup_embedding_lsh", warm_dir)
        # corpus_prep + clustering compile their own large expression
        # trees (5-language higher-order filters, label propagation);
        # the e2e job compiles the biggest plan in the repo (4 slice
        # chains + 3 sink shapes) — warm it so the timed run measures
        # the pipeline, not the one-off codegen
        _run("corpus_prep_pipeline", warm_dir)
        _run("dedup_cluster_components", warm_dir)
        _run("pipeline_consume_batch_e2e", warm_dir)
        # r3-late heavy entries: the iterative graph queries compile
        # distinct per-iteration plans, the pair-generation family its
        # higher-order transforms, BM25/CF their multi-join chains
        _run("graph_pagerank_fixed", warm_dir)
        _run("graph_triangle_count", warm_dir)
        _run("recsys_item_cooccurrence_topk", warm_dir)
        _run("retrieval_bm25_topk", warm_dir)
        _run("dedup_jaccard_prefix_filter", warm_dir)
        _run("dedup_minhash_verified", warm_dir)
        _run("corpus_near_dedup_pipeline", warm_dir)
    _drop_persistent_blocks(spark)  # warm-up queries checkpoint too


def _settle(spark, sf_dir: str, registry) -> bool:
    # SETTLE GUARD (r9 verdict ask #8): the recorded bench number on
    # this box depends on machine state — r9's unsettled/settled spread
    # was 238s vs 182s for identical code (a double-run minutes after a
    # 17-minute pytest measured 10-20% high across every heavy row). A
    # canary is timed TWICE; if the two passes disagree by >10% the
    # machine is still paging/compiling/contended, so sleep and retry
    # before recording. The JSON carries the verdict either way
    # ("settled") — refusing to print would break the driver's
    # one-line contract, but an unsettled flag makes the run
    # non-comparable by construction instead of silently high.
    # r10 ADDITION (verdict ask #5): dedup_image_dhash (a mapInPandas
    # decode + quadratic hamming scan) joins the q1+w1 canary so the
    # python-worker/shuffle load family is sensed too.
    def _run(name: str) -> None:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for attempt in range(3):
        passes = []
        for _ in range(2):
            t0 = time.perf_counter()
            _run("q1_pricing_summary")
            _run("w1_latest_per_group")
            _run("dedup_image_dhash")
            passes.append(time.perf_counter() - t0)
            _drop_persistent_blocks(spark)
        ratio = max(passes) / max(min(passes), 1e-9)
        if ratio <= 1.10:
            return True
        print(
            f"# settle guard: canary self-disagreement {ratio:.2f}x "
            f"(attempt {attempt + 1}/3); sleeping 30s",
            file=sys.stderr,
        )
        time.sleep(30)
    return False


def _sweep(spark, sf_dir: str, tag: str, specs) -> dict[str, float]:
    # BEST-OF-2 per query (r10 verdict ask #5): one pass leaves every
    # row exposed to transient load the settle guard ran too early to
    # see; the min of two back-to-back runs discards one-off GC/page
    # spikes while still charging real plan cost (a genuinely slow
    # plan is slow twice). The two passes run back-to-back PER QUERY —
    # an A-sweep-then-B-sweep would let cache state drift between a
    # query's two timings. The inter-pass _drop_persistent_blocks is
    # the untimed cleanup: localCheckpoint blocks are only released
    # when their RDDs are GC'd and the async ContextCleaner lags
    # Python refcounts — without it, late entries run against
    # executors carrying every earlier query's blocks (2-3x).
    out: dict[str, float] = {}
    for spec in specs:
        per_pass = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per_pass.append(time.perf_counter() - t0)
            _drop_persistent_blocks(spark)
        out[spec.name] = round(min(per_pass), 3)
        print(
            f"# [{tag}] {spec.name}: {out[spec.name]:.3f}s "
            f"(passes: {', '.join(f'{p:.3f}' for p in per_pass)})",
            file=sys.stderr,
        )
    return out


def run_one_sweep(sf_dir: str, tag: str, out_path: str) -> int:
    """Child mode: one warm+settle+best-of-2 sweep in THIS process's
    own JVM; results land in ``out_path`` for the parent to merge."""
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import (
        REGISTRY,
        bench_specs,
    )

    spark = get_spark("bench")
    _warm(spark, sf_dir, REGISTRY)
    settled = _settle(spark, sf_dir, REGISTRY)
    _drop_persistent_blocks(spark)
    timings = _sweep(spark, sf_dir, tag, bench_specs())
    spark.stop()
    Path(out_path).write_text(json.dumps({"settled": settled, "timings": timings}))
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep-tag", default=None)
    parser.add_argument("--sweep-out", default=None)
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if Path(sf_dir).name.startswith("sf") else 0.1

    if args.sweep_tag:  # child invocation
        return run_one_sweep(sf_dir, args.sweep_tag, args.sweep_out)

    # TWO full best-of-2 sweeps, each a FRESH CHILD PROCESS (r12
    # verdict ask #5): best-of-2 inside one sweep discards one-off
    # spikes but not sustained drift a long-lived JVM accumulates
    # (python-worker churn, heap/codegen state — the r11 dispersion
    # pair measured two settled runs 212.1s vs 235.8s with single rows
    # 2.3-3.7x apart, and r12's session-restart variant still shared
    # one JVM). The recorded number is the per-query MIN across the
    # pair, so a row must be slow in BOTH processes to be recorded
    # slow; the JSON carries the cross-sweep dispersion so a drifted
    # sweep is visible instead of silently averaged in.
    sweeps: list[dict[str, float]] = []
    settled_flags: list[bool] = []
    for tag in ("s1", "s2"):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            out_path = f.name
        try:
            subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--sweep-tag", tag, "--sweep-out", out_path],
                check=True,
                stdout=sys.stderr,  # children must not pollute the one-line stdout contract
            )
            result = json.loads(Path(out_path).read_text())
        finally:
            Path(out_path).unlink(missing_ok=True)
        settled_flags.append(bool(result["settled"]))
        sweeps.append({k: float(v) for k, v in result["timings"].items()})

    timings = {
        name: round(min(s[name] for s in sweeps), 3) for name in sweeps[0]
    }
    ratios = sorted(
        max(s[name] for s in sweeps) / max(min(s[name] for s in sweeps), 1e-9)
        for name in sweeps[0]
    )
    n = len(ratios)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                # renamed from bench_total_wall in r12 (r11 ADVICE):
                # the value is a SUM OF PER-QUERY MINIMUMS of two
                # sweeps x two passes, not the wall time of any actual
                # run — the name says so, so a consumer comparing
                # rounds by metric name alone can't silently mix
                # protocols
                "metric": "bench_total_best_of_2",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "settled": all(settled_flags),
                # per-query min of (two back-to-back passes) x (two
                # fresh-PROCESS sweeps). Directly comparable to r12's
                # fresh_session protocol in shape; the process boundary
                # only removes a drift channel. NOT comparable to the
                # r<=10 single-pass records or r11's single-sweep form.
                "protocol": "min_of_2x_best_of_2_fresh_process",
                # cross-sweep self-ratio distribution — the sustained-
                # drift signal (1.0 = both sessions agreed perfectly)
                "sweep_self_ratio_p50": round(ratios[n // 2], 3),
                "sweep_self_ratio_p90": round(ratios[(9 * n) // 10], 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
