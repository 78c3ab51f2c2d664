"""As-of (backfill) join (SURVEY.md §2.5, J1).

The reference's merge-delete query backfills every Delete event's
attributes from the latest *earlier* non-delete row of the same key
(reference ``script/static_files/queries/0-merge_delete_query.sql:24-40``):
equi-join on the key, range residual ``left.ts >= right.ts``, then
``row_number() OVER (PARTITION BY left key+ts ORDER BY right.ts DESC) = 1``.

Spark has no native as-of join, so we keep that composition — it is
a single sort-merge join plus one window:

- The equi-join shuffles both sides once on the key; the range
  predicate stays a cheap post-join residual.
- The window re-uses the join's hash partitioning on the key (the
  window partition key is a superset: key + left ts), so no second
  shuffle of the big side in the common plan.
- Skew: a hot key (one listing with millions of updates) inflates the
  join; at 100 TB enable AQE skew-join (on in our session factory) or
  pre-bucket both sides by the key.

Alternative for extreme cardinality: ``applyInPandas`` +
``pd.merge_asof`` per key-group — kept out of the default path because
built-in join+window stays fully JVM-side/codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import top_n_per_group


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    strict: bool = False,
    tiebreak: str | None = None,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``), at-or-after (``forward``), or in either direction
    (``nearest`` — equidistant candidates prefer the earlier right row).

    Right columns that collide with left column names are suffixed
    ``_right``. ``tiebreak`` (a right column) makes the pick total when
    right timestamps tie. ``left_id`` (a unique left column) keeps left
    rows with duplicate (key, ts) distinct in the candidate ranking —
    pass it whenever the left grain is finer than (on, left_ts).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")

    l = left.alias("l")
    r = right.alias("r")
    cond: Column = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    if direction == "backward":
        cond = cond & (lts > rts if strict else lts >= rts)
        order = [F.col(f"r.{right_ts}").desc()]
    elif direction == "forward":
        cond = cond & (lts < rts if strict else lts <= rts)
        order = [F.col(f"r.{right_ts}").asc()]
    else:
        # nearest: closest right row in EITHER direction (sensor/series
        # alignment). Distance compares in exact integers (unix micros
        # for timestamps, day numbers for dates; integral columns stay
        # integral) — a double delta could tie-break wrong in the last
        # ulp. Equidistant candidates prefer the EARLIER right row (the
        # backward one), then ``tiebreak``. Null timestamps are
        # excluded EXPLICITLY: backward/forward filter them through
        # their comparisons, but nearest's key-only condition would
        # otherwise match them, and a NULL delta sorts FIRST under
        # asc() — a null-ts right row would beat every real candidate.
        cond = cond & lts.isNotNull() & rts.isNotNull()
        if strict:
            cond = cond & (lts != rts)

        def unit_of(df: DataFrame, name: str) -> str:
            dt = dict(df.dtypes)[name]
            if dt.startswith("timestamp"):
                return "micros"
            if dt == "date":
                return "days"
            return "numeric"

        lu, ru = unit_of(left, left_ts), unit_of(right, right_ts)
        # A timestamp on one side and a date on the other would compare
        # unix MICROS against unix DAYS — silently wrong nearest picks
        # (r3 advisor finding). Normalize date->timestamp when mixed
        # with a timestamp; refuse temporal-vs-numeric outright.
        if {lu, ru} == {"micros", "days"}:
            lu = ru = "micros"
        elif lu != ru:
            raise ValueError(
                f"nearest needs comparable timestamp units: {left_ts} is {lu}, "
                f"{right_ts} is {ru} — cast one side first"
            )

        def as_num(c: Column, df: DataFrame, name: str, unit: str) -> Column:
            dt = dict(df.dtypes)[name]
            if unit == "micros":
                return F.unix_micros(c if dt.startswith("timestamp") else c.cast("timestamp"))
            if unit == "days":
                return F.unix_date(c)
            return c  # numeric: compare in the column's own exact type

        delta = F.abs(
            as_num(lts, left, left_ts, lu) - as_num(rts, right, right_ts, ru)
        )
        order = [delta.asc(), F.col(f"r.{right_ts}").asc()]
    if tiebreak:
        order.append(F.col(f"r.{tiebreak}").desc())

    joined = l.join(r, cond, how)
    left_cols = set(left.columns)
    proj = [F.col(f"l.{c}") for c in left.columns]
    for c in right.columns:
        if c in on:
            continue
        out_name = f"{c}_right" if c in left_cols else c
        proj.append(F.col(f"r.{c}").alias(out_name))

    part = [F.col(f"l.{k}") for k in on] + [F.col(f"l.{left_ts}")]
    if left_id is not None:
        part.append(F.col(f"l.{left_id}"))
    return top_n_per_group(joined, part, order, n=1).select(*proj)


def asof_backfill(
    broken: DataFrame,
    donors: DataFrame,
    on: Sequence[str],
    ts: str,
    fill_cols: Sequence[str],
    *,
    donor_tiebreak: str | None = None,
    broken_id: str | None = None,
) -> DataFrame:
    """J1 as used by the merge-delete stage: overwrite ``fill_cols`` of
    each ``broken`` row (Delete events with NULL payload) with the values
    from the latest donor at-or-before the same timestamp and key.

    Returns ``broken``'s schema. Rows with no donor keep their NULLs
    (left as-of join).
    """
    donor_proj = donors.select(*on, ts, *fill_cols)
    joined = asof_join(
        broken.drop(*[c for c in fill_cols if c in broken.columns]),
        donor_proj,
        on=on,
        left_ts=ts,
        right_ts=ts,
        tiebreak=donor_tiebreak,
        how="left",
        left_id=broken_id,
    )
    # asof_join suffixes the donor ts as `<ts>_right`; drop it, keep fills.
    return joined.drop(f"{ts}_right")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    schema: str,
) -> DataFrame:
    """The Arrow/pandas physical strategy for the backward as-of join:
    ``groupBy(key).cogroup`` + ``pd.merge_asof`` per key group.

    Same semantics as ``asof_join(direction='backward', how='left')``
    when ``(right_key, right_ts)`` is unique on the right — pre-dedup
    the right side (top_n_per_group) to guarantee that, otherwise the
    winner among equal timestamps is undefined in both strategies.

    When to prefer this over the join+window composition: extreme
    per-key fan-out (millions of right rows joined then discarded by
    the rank filter). Here each side shuffles ONCE on the key and the
    per-group merge is a linear two-pointer scan inside Arrow batches —
    no join blow-up, no window sort of the joined product. The
    trade-off is leaving whole-stage codegen for the Python workers,
    so the JVM path (`asof_join`) stays the default.

    Output columns: every ``left`` column, then ``payload`` columns
    from the right (null where no right row is at-or-before). ``schema``
    must declare exactly those columns in that order.
    """
    import pandas as pd

    left_cols = list(left.columns)
    out_cols = left_cols + list(payload)
    int_payload = {
        f.name
        for f in right.schema.fields
        if f.name in payload and f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
    }

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # right-only key groups arrive with an empty left frame: emit
        # nothing (left-join semantics). Keep dtypes from the input
        # frames so Arrow sees stable types on every partition.
        if ldf.empty:
            out = ldf.copy()
            for c in payload:
                out[c] = pd.Series(dtype="float64")
            return out[out_cols]
        # pd.merge_asof REJECTS null merge keys; the JVM asof_join keeps
        # a null-ts left row with null payload (left-join semantics) and
        # ignores null-ts right rows — replicate both before merging
        null_left = ldf[ldf[left_ts].isna()].copy()
        ldf = ldf[ldf[left_ts].notna()]
        rdf = rdf[rdf[right_ts].notna()]
        if ldf.empty:
            out = null_left
            for c in payload:
                out[c] = pd.Series([None] * len(out), index=out.index, dtype="float64")
            return out[out_cols]
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf[[right_ts, *payload]].sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(
            ldf, rdf, left_on=left_ts, right_on=right_ts,
            direction="backward", allow_exact_matches=True,
        )
        if len(null_left):
            for c in payload:
                null_left[c] = None
            out = pd.concat([out, null_left.reindex(columns=out.columns)], ignore_index=True)
        for c in int_payload:
            out[c] = out[c].astype("Int64")
        return out[out_cols]

    return (
        left.groupBy(left_key)
        .cogroup(right.groupBy(right_key))
        .applyInPandas(merge, schema)
    )
