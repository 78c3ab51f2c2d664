"""Throwaway A/B timer for the _pair_overlap_counts verify rework."""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY

NAMES = ["dedup_ngram_jaccard", "dedup_ngram_jaccard_pruned", "dedup_ngram_containment"]
spark = get_spark("ab-overlap")
sf = "/root/testdata/sf0.1"
for name in NAMES:
    best = None
    for _ in range(2):
        t0 = time.time()
        REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: best-of-2 {best:.2f}s")
