"""Count-Min sketch: fixed-memory frequency estimation at stream scale.

The 100-TB problem: per-key exact counts need state proportional to the
key cardinality (unbounded for URLs, n-grams, IPs). A Count-Min sketch
holds a ``depth x width`` grid of counters — a few KB, REGARDLESS of
cardinality — where every observation increments one counter per row
(bucket chosen by a per-row hash) and a key's estimate is the MIN of
its ``depth`` counters: always >= the true count (collisions only add),
within ``2N/width`` of it with probability ``1 - 2^-depth``.

Spark shape: the grid is just a ``(row, bucket) -> count`` DataFrame.
Building it is one ``explode(depth) -> groupBy(row, bucket).count()``
— map-side partial aggregation contracts each mapper's output to at
most ``depth*width`` cells before the shuffle, so the shuffle volume is
O(sketch size), not O(data). Sketches MERGE by unioning cell frames and
re-summing (used by the incremental-ingest path), exactly like any
partial aggregate. Estimation joins a model-sized probe set against the
cells (probes broadcast).

Hashing rides :func:`..functions.columns.md5_prefix_int` — the repo's
cross-engine deterministic hash — so a DuckDB oracle can replay the
sketch bit-for-bit (no RNG, no engine-specific sketch internals, unlike
``approx_count_distinct``'s HLL which is pytest-bounded only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import md5_prefix_int


def _bucket(row_col, key_col, width: int):
    """Row ``i``'s hash of ``key``: md5('<i>:<key>') folded into
    [0, width). One md5 per (row, key) — the K independent hash
    functions come from salting, the K-M trick's cheap cousin."""
    return (
        md5_prefix_int(F.concat(row_col.cast("string"), F.lit(":"), key_col))
        .cast("bigint")
        % width
    )


def count_min_cells(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: ``(row, bucket, c)`` cells, at most
    ``depth * width`` rows total. Absent cells are implicitly zero."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    keyed = df.select(F.col(key_col).cast("string").alias("__k")).select("__k", rows)
    return (
        keyed.select("row", _bucket(F.col("row"), F.col("__k"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_cms(*cell_frames: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    (Counters are linear — this is what makes the sketch a partial
    aggregate you can build per day/partition and combine.)"""
    if not cell_frames:
        raise ValueError("need at least one sketch")
    out = cell_frames[0]
    for f in cell_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` (a model-sized
    frame — it broadcasts): ``est = min over rows of cell(row,
    h_row(key))``, with absent cells read as 0 (left join), so keys the
    sketch never saw estimate correctly as 0."""
    kd = keys.select(F.col(key_col).alias("__key")).distinct()
    probe_rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    probes = kd.select("__key", probe_rows).withColumn(
        "bucket", _bucket(F.col("row"), F.col("__key").cast("string"), width)
    )
    return (
        F.broadcast(probes)
        .join(cells, ["row", "bucket"], "left")
        .groupBy("__key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
        .withColumnRenamed("__key", key_col)
    )


# --------------------------------------------------------------------------
# KMV (k minimum values) distinct-count sketch
# --------------------------------------------------------------------------
#
# The cardinality twin of the Count-Min grid: keep only the k SMALLEST
# md5 hash values of the keys seen. If hashes are uniform on [0, 2^32),
# the k-th smallest value t estimates the distinct count as
# (k-1) * 2^32 / t (the classic KMV/bottom-k estimator, Bar-Yossef et
# al. 2002). State is k longs per group — fixed like HLL — but every
# operation is deterministic md5 order statistics, so a SQL oracle can
# replay estimates EXACTLY, which approx_count_distinct's HLL binaries
# never allow. Sketches merge by unioning value sets and re-taking the
# k smallest — the same partial-aggregate contract as the CMS cells.
# When a group has fewer than k distinct keys the sketch is exhaustive
# and the "estimate" is the exact distinct count.

_KMV_SPACE = 1 << 32


def kmv_sketch(
    df: DataFrame, key_col: str, *, k: int = 64, by: Sequence[str] = ()
) -> DataFrame:
    """Per-group bottom-k hash sketch: ``(*by, hashes: array<long>)``
    with at most k ascending values. Plans as distinct + per-group
    TakeOrdered (WindowGroupLimit — never a full sort)."""
    from ..operators.dedup import top_n_per_group

    by = list(by)
    h = (
        md5_prefix_int(F.col(key_col).cast("string"))
        .cast("bigint")
        .alias("__h")
    )
    hashed = df.select(*by, h).where(F.col("__h").isNotNull()).distinct()
    if by:
        low = top_n_per_group(hashed, by, [F.col("__h").asc()], n=k)
        grouped = low.groupBy(*by)
    else:
        low = hashed.orderBy(F.col("__h").asc()).limit(k)  # TakeOrderedAndProject
        grouped = low.groupBy()
    return grouped.agg(F.sort_array(F.collect_list("__h")).alias("hashes"))


def kmv_estimate(sketch: DataFrame, *, k: int) -> DataFrame:
    """Distinct-count estimate per sketch row: exact |hashes| when the
    sketch is exhaustive (fewer than k values), else
    ``(k-1) * 2^32 / t_k`` rounded to 4 decimals (identical arithmetic
    on any engine: exact integer inputs, one double division)."""
    n = F.size("hashes")
    t_k = F.element_at("hashes", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(_KMV_SPACE)) * (k - 1) / t_k.cast("double"), 4)
    )
    return sketch.withColumn("est_distinct", est + F.lit(0.0)).drop("hashes")


def merge_kmv(*sketches: DataFrame, k: int) -> DataFrame:
    """Union sketches (same grouping columns) into one: concatenate,
    dedupe, keep the k smallest — the bottom-k set of a union is
    computable from the bottom-k sets of its parts, which is what makes
    KMV a partial aggregate."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    by = [c for c in out.columns if c != "hashes"]
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("hashes")))), 1, k
    )
    grouped = out.groupBy(*by) if by else out.groupBy()
    return grouped.agg(merged.alias("hashes"))


def heavy_hitters_mg(
    df: DataFrame,
    col: str,
    *,
    capacity: int = 64,
) -> DataFrame:
    """EXACT heavy hitters via a Misra-Gries first pass + exact verify
    second pass: every item whose frequency strictly exceeds
    ``2n/(capacity+1)`` (n = stream length), with its EXACT count.

    The 100-TB problem: a plain ``groupBy(col).count()`` shuffles one
    row per DISTINCT item — unbounded for n-grams/URLs/user agents.
    Misra-Gries (the deterministic counter-based summary family, vs the
    hash-based CMS above) bounds the per-partition state AND the
    shuffle at ``capacity`` counters per input batch, at the price of
    underestimating each count by at most ``n/(capacity+1)``. The
    classic two-pass construction makes the final answer EXACT: pass 1
    produces a provable candidate SUPERSET (model-sized), pass 2
    re-scans and counts ONLY the candidates (broadcast equi-join, tiny
    shuffle), and the threshold filter runs on exact integer counts —
    deterministic regardless of partitioning, batch boundaries, or tie
    order inside the sketch, which is what lets a DuckDB oracle replay
    it as a plain GROUP BY.

    Why the superset is provable (mergeable-summaries argument,
    Agarwal et al. 2012): each Arrow batch's summary is its exact
    value_counts MG-compressed to ``capacity`` counters (subtract the
    (capacity+1)-th largest count, keep positives) — per-batch
    underestimate <= n_batch/(capacity+1), additive across batches, so
    after summing summaries an item's weight w >= c - n/(capacity+1).
    The global merge is then compressed once more with threshold t
    (the (capacity+1)-th largest merged weight, t <= n/(capacity+1)),
    so any item with true count c > 2n/(capacity+1) has
    w - t >= c - 2n/(capacity+1) > 0 and survives into the candidate
    set. Both compressions are pure arithmetic on counts, so ties
    cannot perturb the final exact output.

    Two corpus scans by design (summaries + verify); the only driver
    materialization is ``capacity + 1`` merged weights.
    """
    items = (
        df.select(F.col(col).cast("string").alias("item"))
        .where(F.col("item").isNotNull() & (F.col("item") != ""))
    )
    from ..operators.partitioning import ensure_min_partitions

    items = ensure_min_partitions(items)
    cap = int(capacity)

    def summarize(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            vc = pdf["item"].value_counts()
            n_batch = int(vc.sum())
            if len(vc) > cap:
                t = int(vc.iloc[cap])  # (capacity+1)-th largest
                vc = vc - t
                vc = vc[vc > 0]
            out = vc.rename_axis("item").reset_index(name="w")
            out["item"] = out["item"].astype(str)
            yield pd.concat(
                [out, pd.DataFrame({"item": [None], "w": [n_batch]})],
                ignore_index=True,
            )

    # summaries are sketch-sized (<= capacity+1 rows per Arrow batch);
    # checkpoint so the n-total and merge branches don't re-scan
    summ = items.mapInPandas(summarize, "item string, w long").localCheckpoint(
        eager=True
    )
    n_df = summ.where(F.col("item").isNull()).agg(
        F.sum("w").cast("long").alias("__n")
    )
    merged = (
        summ.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("w").alias("__w"))
    )
    # global compress: only the (capacity+1)-th largest WEIGHT is
    # needed (a value, not an identity — tie-proof); TakeOrdered keeps
    # this a top-k, never a full sort
    top = merged.orderBy(F.desc("__w"), "item").limit(cap + 1).collect()
    t = int(top[cap]["__w"]) if len(top) > cap else 0
    cands = merged.where(F.col("__w") > t).select("item")  # <= capacity rows
    exact = (
        items.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_df))
        .where(F.col("cnt") * (cap + 1) > 2 * F.col("__n"))
        .select("item", "cnt")
    )


# --------------------------------------------------------------------------
# Symbolic HyperLogLog (r7 verdict ask #3): register-based cardinality
# estimation with a deterministic md5 hash, so an external SQL engine
# replays the sketch BIT-FOR-BIT — the hash-verifiable companion to
# Spark's engine-internal hll_sketch_agg/approx_count_distinct (whose
# binary sketches no oracle can recompute). Same algorithm (Flajolet
# et al. 2007, HyperLogLog): bucket = top b hash bits, register =
# max over observations of (leading zeros of the remaining bits + 1),
# estimate = alpha_m * m^2 / sum(2^-M_j) with the standard
# linear-counting small-range correction.
# --------------------------------------------------------------------------


def hll_registers(
    df: DataFrame, key_col: str, group_cols: Sequence[str], *, b: int = 8
) -> DataFrame:
    """Sparse HLL registers per group: ``(group_cols..., bucket,
    rho_max)`` — bucket from the top ``b`` bits of ``md5(key)``,
    ``rho`` from the next 56 bits (leading zeros + 1; zero word ->
    57). Absent buckets mean register 0. One groupBy — map-side
    combine contracts every mapper to <= m cells per group before the
    shuffle, the fixed-memory property that makes HLL the 100-TB
    cardinality answer. Registers MERGE by a further max-groupBy
    (:func:`hll_estimate` demonstrates), exactly like any partial
    aggregate."""
    if b % 4 != 0 or not 4 <= b <= 16:
        # whole hex digits keep the bucket/word split exact in any engine
        raise ValueError(f"b must be a multiple of 4 in [4, 16], got {b}")
    hexd = b // 4
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hexd), 16, 10).cast("int")
    nbits = 4 * (16 - hexd)  # bits in the rho word (56 for b=8)
    whex = F.substring(h, hexd + 1, 16 - hexd)
    rho = (
        F.when(whex == F.lit("0" * (16 - hexd)), F.lit(nbits + 1))
        .otherwise(nbits + 1 - F.length(F.conv(whex, 16, 2)))
        .cast("int")
    )
    rows = df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho_max"))


def hll_estimate(
    regs: DataFrame, group_cols: Sequence[str], *, b: int = 8, round_to: int = 2
) -> DataFrame:
    """HLL estimate per group from sparse registers: ``(group_cols...,
    n_zero, harmonic_scaled, est)``. The harmonic sum is kept as an
    EXACT integer — sum over all m registers of ``2^(nbits+1-M)``
    (each term a power of two <= 2^57, exactly representable; the sum
    as DECIMAL(38,0)) — so the sketch state hashes exactly across
    engines; only the final estimate touches floats, and it rounds
    through DECIMAL. Small-range (linear counting) correction applies
    when ``E_raw <= 2.5 m`` and zero registers exist; the large-range
    correction (E > 2^32/30) never triggers at these cardinalities and
    is deliberately omitted.

    Cross-engine parity note on ``est`` (r8 ADVICE — the analogue of
    the IVF mean-parity caveat): the final rounding runs through Spark
    decimal HALF_UP (double -> decimal(24,6) -> round ``round_to``),
    while a DuckDB oracle casts/rounds with DuckDB decimal semantics —
    an estimate quotient landing EXACTLY on a rounding tie could in
    principle round differently across engines. ``n_zero`` and
    ``harmonic_scaled`` are exact integers and carry the full sketch
    state, so oracles should anchor on those and treat ``est`` as
    derived; the registered queries' fixed datasets are verified
    tie-free at sf0.001/0.01/0.1 (the driver hash covers est there)."""
    m = 1 << b
    nbits = 64 - b
    spark = regs.sparkSession
    groups = regs.select(*group_cols).distinct()
    buckets = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    dense = groups.crossJoin(F.broadcast(buckets)).join(
        regs, [*group_cols, "bucket"], "left"
    )
    rho = F.coalesce(F.col("rho_max"), F.lit(0))
    term = F.pow(F.lit(2.0), F.lit(nbits + 1) - rho).cast("decimal(38,0)")
    aggd = dense.groupBy(*group_cols).agg(
        F.sum(term).cast("decimal(38,0)").alias("harmonic_scaled"),
        F.sum((rho == 0).cast("int")).cast("int").alias("n_zero"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = alpha * m * m * float(2 ** (nbits + 1))  # one exact literal
    e_raw = F.lit(scale) / F.col("harmonic_scaled").cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero").cast("double"))
    est = F.when((e_raw <= 2.5 * m) & (F.col("n_zero") > 0), linear).otherwise(e_raw)
    return aggd.select(
        *group_cols,
        "n_zero",
        # STRING, not decimal(38,0): pandas fetch paths coerce wide
        # decimals to float64 ("36893488147419103232" -> 3.689e19),
        # which silently loses the exactness the scaled sum exists for
        # (the same driver-hash hazard as DuckDB HUGEINT sums)
        F.col("harmonic_scaled").cast("string").alias("harmonic_scaled"),
        F.round(est.cast("decimal(24,6)"), round_to).cast("double").alias("est"),
    )
