"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Parquet row-group/file min-max stats prune scans only along the sort
order: a table sorted by date answers date filters cheaply but scans
everything for a customer filter. Interleaving the bits of BOTH
columns into one Morton code and range-partitioning + sorting on it
clusters rows that are close in EITHER dimension into the same files —
so min/max footers stay narrow on every interleaved column and a
filter on ANY of them skips most files. This is the same layout trick
table formats expose as ``OPTIMIZE ... ZORDER BY``; here it's plain
DataFrame ops + a parquet write, no table format required.

Cost model at 100 TB: one extra column of integer bit-math (codegen'd),
one range repartition (a shuffle you were paying anyway to control
file sizes), and a per-partition sort. Skipping pays that back on the
first filtered scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; 2 dims x 16 bits -> 32-bit code


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to [0, 2^bits) using precomputed min/max."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    scaled = F.floor(frac * F.lit((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1))).cast("long")


def morton_interleave(cells: Sequence[Column], bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of each quantized cell into one long
    (dimension 0 gets the even bit positions). Pure shift/or chain —
    whole-stage codegen keeps it JVM-side."""
    n = len(cells)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, cell in enumerate(cells):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + d))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    *,
    n_files: int = 32,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton code of
    ``zorder_cols`` (numeric/timestamp). One stats pass computes the
    per-column min/max for quantization; the write is
    ``repartitionByRange + sortWithinPartitions`` on the code, so every
    output file covers a compact hyper-rectangle of the key space."""
    if not 1 <= len(zorder_cols) <= 4:
        raise ValueError("zorder_cols must name 1-4 columns")
    if bits * len(zorder_cols) > 63:
        # bit 63 is the sign bit of long: letting the interleave reach
        # it makes high-range rows NEGATIVE codes that sort before
        # everything, silently breaking the Morton order
        raise ValueError(
            f"bits * len(zorder_cols) = {bits * len(zorder_cols)} exceeds 63 "
            f"(the sign bit); use bits <= {63 // len(zorder_cols)} for "
            f"{len(zorder_cols)} columns"
        )

    def to_num(c: str) -> Column:
        t = str(df.schema[c].dataType)
        if t.startswith("Timestamp"):
            return F.unix_micros(F.col(c).cast("timestamp"))
        if t.startswith("Date"):
            return F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
        return F.col(c).cast("double")

    nums = {c: to_num(c) for c in zorder_cols}
    stats = df.agg(
        *[F.min(e).alias(f"lo_{c}") for c, e in nums.items()],
        *[F.max(e).alias(f"hi_{c}") for c, e in nums.items()],
    ).collect()[0]
    for c in zorder_cols:
        if stats[f"lo_{c}"] is None:
            raise ValueError(
                f"zorder column {c!r} has no non-NULL values — cannot quantize"
            )
    cells = [
        _quantize(
            e.cast("double"),
            F.lit(float(stats[f"lo_{c}"])),
            F.lit(float(stats[f"hi_{c}"])),
            bits,
        )
        for c, e in nums.items()
    ]
    with_z = df.withColumn("__z", morton_interleave(cells, bits))
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_records_per_file: int | None = None,
) -> int:
    """The small-files fix: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files. Streaming sinks and per-slice
    appends leave thousands of KB-sized files; every future scan then
    pays one task + one footer per file. Returns the new file count.

    Rewrites in place via a temp dir + atomic-ish swap; at production
    scale run per partition (compact only partitions whose file count
    exceeds a threshold) so cost tracks fragmentation, not table size.
    """
    import math
    import shutil
    import uuid
    from pathlib import Path

    src = Path(path)
    total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(str(src))
    # A hive-partitioned root (date=.../ subdirs) must compact INTO the
    # same layout — a flat rewrite would silently fold the partition
    # columns into the data files and break partition pruning and every
    # directory-addressed maintenance op. Partition columns are read
    # off the first data file's directory chain (the same inference the
    # reader used).
    part_cols: list[str] = []
    sample = next(src.rglob("*.parquet"), None)
    if sample is not None:
        for d in sample.relative_to(src).parts[:-1]:
            if "=" in d:
                part_cols.append(d.split("=", 1)[0])
    tmp = src.parent / f".compact_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(n_files).write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(str(tmp))
    shutil.rmtree(src)
    tmp.rename(src)
    return len(list(src.rglob("*.parquet")))
