"""Time individual registered queries through the noop sink (guide §1.4).

The optimization-loop companion to bench.py: same timing methodology
(full computation into a noop sink, persistent-block drops between
passes, best-of-N), but for a handful of named queries so a single
optimization can be re-measured in seconds instead of re-running the
full bench. Also dumps `.explain("formatted")` per query with
``--explain-dir`` so before/after plan evidence lands in plans/r13/.

Usage:
    python tools/time_query.py [--sf DIR] [--passes N] \
        [--explain-dir plans/r13 --suffix before] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _drop_persistent_blocks(spark) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY

    spark = get_spark("time_query")
    for name in args.names:
        spec = REGISTRY[name]
        if args.explain_dir:
            df = spec.fn(spark, args.sf)
            out = Path(args.explain_dir) / f"{name}_{args.suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
            _drop_persistent_blocks(spark)
        per_pass = []
        if args.passes <= 0:
            continue
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"time_query: {name}")
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            per_pass.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            _drop_persistent_blocks(spark)
        print(
            f"{name}: best {min(per_pass):.3f}s "
            f"(passes: {', '.join(f'{p:.3f}' for p in per_pass)})",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
