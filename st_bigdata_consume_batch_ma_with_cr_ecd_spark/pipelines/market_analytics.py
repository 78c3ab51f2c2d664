"""Pipeline assembly: the reference's per-slice market-analytics loop
re-expressed over the synthetic star schema (SURVEY.md §7 phase 5).

The reference iterates a 4-row config matrix (country x distribution),
binds distribution-specific column names into its SQL (RENT vs BUY price
columns, ``script/helper.py:189-201``), runs the 3-stage query chain per
slice, and accumulates slices with UNION ALL (``script/main.py:305-368``).

This module is the same shape, generalized:

- ``SliceConfig`` binds a slice tag, a status filter, and the
  slice-specific *measure expression* (the RENT/BUY column-swap analog).
- ``market_analytics_pipeline`` runs dedup -> enrich -> existence filter
  -> pre-aggregated counters -> stale-id elimination per slice, tags
  and unions the slices, and stamps frozen changelog metadata.

Every stage is an operator from this package, so the composite also
serves as the integration test of the library:

  top_n_per_group (W1) . left join (J2) . inner-join filter (J3)
  . join_preaggregated (J4/A3) . J5 stale detection . not_in_anti_join
  (J6) . union_slices (U1) . changelog_columns (X8/X9)

Scale shape (100 TB): one shuffle per stage boundary on the natural
keys (custkey, orderkey); the slice loop multiplies *plan* size, not
shuffle count, because slices are disjoint status partitions of the
same scan — AQE reuses the exchange where possible, and the per-slice
filters push down to the shared scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.columns import changelog_columns
from ..operators.aggregates import rounded_sum
from ..operators.dedup import top_n_per_group
from ..operators.joins import join_preaggregated, not_in_anti_join
from ..operators.setops import union_slices


@dataclass(frozen=True)
class SliceConfig:
    """One row of the reference's country/distribution matrix: a tag,
    the status predicate value, and the slice's measure expression
    (the RENT price-column vs BUY price-column swap)."""

    tag: str
    order_status: str

    def measure(self) -> Column:
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        if self.tag == "open":
            return disc  # "rent": discounted price
        return disc * (1 + F.col("l_tax"))  # "finished"/"buy": full charge


DEFAULT_SLICES = (SliceConfig("open", "O"), SliceConfig("finished", "F"))


def build_slice(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    cfg: SliceConfig,
    all_max: DataFrame | None = None,
) -> DataFrame:
    """One slice of the pipeline, stages mirroring the reference chain.

    ``all_max`` (the slice-independent per-customer latest-order date)
    can be passed in pre-computed so the slice loop shares one
    aggregation instead of re-deriving it per slice.
    """
    # stage 1 (W1): latest order per customer within the slice universe
    latest = top_n_per_group(
        orders.where(F.col("o_orderstatus") == cfg.order_status),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    # stage 2a (J2): 1:1 enrichment with the customer "texts"
    cust = customer.select(
        F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment")
    )
    enriched = latest.join(cust, latest.o_custkey == cust.c_custkey, "left").drop("c_custkey")

    # stage 2b (J3): multiplicity-preserving existence filter — the
    # visibility-period inner join (here: solvent customers)
    active_ids = customer.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("__active_ck")
    )
    active = enriched.join(active_ids, F.col("o_custkey") == F.col("__active_ck")).drop(
        "__active_ck"
    )

    # stage 2c (J4/A3): left-join pre-aggregated per-order counters
    counters = join_preaggregated(
        active,
        lineitem.select(F.col("l_orderkey").alias("o_orderkey"), cfg.measure().alias("__m")),
        keys=["o_orderkey"],
        aggs={"n_items": F.count(F.lit(1)), "slice_value": rounded_sum("__m", 2)},
        fill={"n_items": 0, "slice_value": 0.0},
    )

    # stage 3 (J5+J6): stale-id elimination — drop customers whose
    # slice-latest order is older than their overall latest order
    slice_max = orders.where(F.col("o_orderstatus") == cfg.order_status).groupBy(
        "o_custkey"
    ).agg(F.max("o_orderdate").alias("__slice_max"))
    if all_max is None:
        all_max = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("__all_max"))
    stale_ids = (
        slice_max.join(all_max, "o_custkey", "left")
        .where(F.col("__slice_max") < F.col("__all_max"))
        .select(F.col("o_custkey").alias("stale_ck"))
    )
    fresh = not_in_anti_join(counters, stale_ids, "o_custkey", "stale_ck")

    return fresh.withColumn("slice", F.lit(cfg.tag))


def market_analytics_pipeline(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    *,
    slices: tuple[SliceConfig, ...] = DEFAULT_SLICES,
    run_id: str = "run-1",
    frozen_clock: str | None = None,
) -> DataFrame:
    """The full multi-slice pipeline: per-slice chains unioned (U1) and
    stamped with changelog metadata (X8/X9, injectable clock). The
    slice-independent all-orders max is computed once and cached —
    every slice's stale-id stage reuses the materialized aggregate
    instead of re-scanning orders (reference C1 caching policy)."""
    all_max = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("__all_max")).cache()
    parts = [build_slice(orders, customer, lineitem, cfg, all_max) for cfg in slices]
    return changelog_columns(union_slices(parts, "ALL"), run_id, at=frozen_clock)
