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
        "--stage0-mode",
        choices=("staged", "cached"),
        default="staged",
        help="where the shared stage-0 merge lives. 'staged' (default "
        "since r9): written once to a parquet staging table and scanned "
        "per slice — wins at every measured scale >= sf0.1 and flattens "
        "the 64x cache-pressure knee (SCALE.md: 86.5s vs 230.8s at 64x, "
        "6.9s vs 11.8s at sf0.1). 'cached': block-manager cache — the "
        "small-input variant, faster only when the merged change-log is "
        "tiny enough that the parquet round-trip dominates",
    )
    ap.add_argument(
        "--stage0-staging",
        default=None,
        help="explicit staging path for staged mode (default: "
        "<output-dir>/_stage0_staging)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("consume-batch-job", cpus=args.cpus)
    t = {name: spark.read.parquet(f"{args.input_dir}/{name}") for name in INPUT_TABLES}
    days: int | str = args.days_ago if args.days_ago == "full_refresh" else int(args.days_ago)
    dates = JobDates.resolve(date.fromisoformat(args.partition_date), days)

    # stage 0 once, materialized up front; every slice reads it
    # (reference C1 policy; staged mode — the default since r9 — writes
    # the merge to a parquet staging table instead of the cache). The
    # four slice chains + sinks are independent — run them concurrently
    # from a driver thread pool (Spark schedules jobs from multiple
    # threads onto one session; measured ~1.9x vs the serial loop).
    out_root = Path(args.output_dir)
    merged = merge_delete(filter_changelog(t["changelog"]), dates.first_day_past)
    if args.stage0_mode == "staged":
        staging = args.stage0_staging or str(out_root / "_stage0_staging")
        merged.write.mode("overwrite").parquet(staging)
        merged = spark.read.parquet(staging)
    else:
        merged = merged.cache()
        merged.count()

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
