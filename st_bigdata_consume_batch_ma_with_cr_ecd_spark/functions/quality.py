"""Data-quality gating: declarative row rules -> violation labels ->
quarantine split (beyond reference; the reference pipeline silently
trusts its inputs, which a 100-TB nightly job cannot).

Rules are plain Column predicates (JVM-side, pushdown-friendly); a row's
violations are the names of the rules it fails. The split is two
filters over one cached/shared scan — no UDFs, no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "__violations"


def with_violations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Append an array column naming every rule the row FAILS (empty
    array = clean). NULL rule results count as failures — an
    unevaluable rule must quarantine, not pass."""
    if not rules:
        raise ValueError("rules must be non-empty")
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) for name, cond in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL, F.array_compact(F.array(*flags))
    )


def quarantine_split(df: DataFrame, rules: Mapping[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): quarantined rows keep the violation labels
    for triage; valid rows come back clean (no helper column)."""
    labeled = with_violations(df, rules)
    ok = F.size(F.col(VIOLATIONS_COL)) == 0
    return labeled.where(ok).drop(VIOLATIONS_COL), labeled.where(~ok)


def with_observed_metrics(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """Attach streaming/batch-safe in-flight metrics (``df.observe``):
    aggregates computed DURING the action that consumes ``df``, for free
    — no second scan, unlike a separate ``.agg().collect()`` audit pass.
    Read them back from ``QueryExecutionListener`` /
    ``StreamingQueryListener`` or (batch) ``Observation``.
    """
    return df.observe(name, *[c.alias(n) for n, c in metrics.items()])
