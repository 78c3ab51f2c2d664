"""Job driver CLI — the open-Spark equivalent of the reference's Glue
entry point (``script/main.py:196-416``): resolve the incremental
window, run the 4-slice pipeline, and write the reference's three
sinks (gzip JSON nested, gzip CSV flat, month-partitioned parquet).

    python tools/run_consume_batch.py \
        --input-dir /data/inputs --output-dir /data/out \
        --partition-date 2024-07-15 --days-ago 10

``--input-dir`` must hold parquet tables named ``changelog, texts,
visibility, fraud, contacts, visits, bundeslaender, stadtlandkreise``
(schemas: see pipelines.consume_batch docstrings / tests). ``--days-ago
full_refresh`` rewinds to the data epoch like the reference's flag.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.setops import union_slices
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.pipelines.consume_batch import (
    JobDates,
    filter_changelog,
    merge_delete,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.writers import (
    overwrite_partitions,
)

INPUT_TABLES = (
    "changelog",
    "texts",
    "visibility",
    "fraud",
    "contacts",
    "visits",
    "bundeslaender",
    "stadtlandkreise",
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--partition-date", default=date.today().isoformat())
    ap.add_argument("--days-ago", default="10", help="integer lookback or 'full_refresh'")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--stage0-staging",
        default=None,
        help="write stage-0 to a parquet staging table at this path and "
        "scan it per slice instead of caching — the scale mode for when "
        "the merged change-log outgrows the cluster's cache tier "
        "(SCALE.md round 7: flattens the measured 64x cache-pressure "
        "knee, 2.7x faster at 64x amplification)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("consume-batch-job", cpus=args.cpus)
    t = {name: spark.read.parquet(f"{args.input_dir}/{name}") for name in INPUT_TABLES}
    days: int | str = args.days_ago if args.days_ago == "full_refresh" else int(args.days_ago)
    dates = JobDates.resolve(date.fromisoformat(args.partition_date), days)

    # stage 0 once, materialized up front; every slice reads it
    # (reference C1 cache policy — or the parquet staging table when
    # --stage0-staging names a path). The four slice chains + sinks are
    # independent — run them concurrently from a driver thread pool
    # (Spark schedules jobs from multiple threads onto one session;
    # measured ~1.9x end-to-end vs the serial loop).
    merged = merge_delete(filter_changelog(t["changelog"]), dates.first_day_past)
    if args.stage0_staging is not None:
        merged.write.mode("overwrite").parquet(args.stage0_staging)
        merged = spark.read.parquet(args.stage0_staging)
    else:
        merged = merged.cache()
        merged.count()

    out_root = Path(args.output_dir)

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.pipelines.consume_batch import (
        run_slices_concurrent,
    )

    parts, rows_per_slice = run_slices_concurrent(
        t, merged, dates, str(out_root), count_rows=True
    )

    union = union_slices(parts, "ALL")
    overwrite_partitions(union, str(out_root / "parquet"), ["partitionMonth"])
    merged.unpersist()

    print(
        json.dumps(
            {
                "partition_date": args.partition_date,
                "window": [dates.first_day_past, dates.partition_month],
                "rows_per_slice": rows_per_slice,
                "total_rows": sum(rows_per_slice.values()),
                "output_dir": str(out_root),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
