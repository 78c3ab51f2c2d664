"""Column machinery (SURVEY.md §2.3, P3-P6).

The reference discovers schemas dynamically and manipulates the column
namespace with driver-side Python (prefix selection ``script/main.py:96-110``,
bulk renames ``script/main.py:175-178`` / ``script/helper.py:151-155``,
config drop lists ``script/helper.py:157-163``). Generalized here.

Scale note: every ``withColumnRenamed`` adds a Project node; for wide
schemas we emit ONE ``select`` with aliases instead of N renames —
same plan after optimization, but analysis time on 1000-column schemas
is linear instead of quadratic.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prefix_select(df: DataFrame, prefixes: Sequence[str], *, extra: Sequence[str] = ()) -> list[str]:
    """P6: column names starting with any of ``prefixes`` (the
    reference's config-driven ``validPrefixes``), plus ``extra``
    passthrough names, in schema order."""
    picked = [c for c in df.columns if any(c.startswith(p) for p in prefixes)]
    return list(extra) + picked


def bulk_rename(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """P4: rename many columns in one projection."""
    cols: list[Column] = []
    for c in df.columns:
        cols.append(F.col(f"`{c}`").alias(renames.get(c, c)))
    return df.select(*cols)


def strip_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """P4 variant: the reference's ``cleaned_*`` -> ``*`` loop
    (``script/main.py:175-178``) as a single select."""
    return bulk_rename(df, {c: c[len(prefix):] for c in df.columns if c.startswith(prefix)})


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P3: config-driven drop list; silently ignores absent names
    (matching Glue ``drop_fields`` semantics)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def changelog_columns(
    df: DataFrame, run_id: str, *, at: str | None = None, prefix: str = "changelog_"
) -> DataFrame:
    """X8/X9: the reference's changelog metadata block
    (``script/helper.py:166-172``) with an injectable clock.

    ``at`` (ISO timestamp string) pins ``<prefix>timestamp`` for
    reproducible output; ``at=None`` uses ``current_timestamp()`` —
    the production behaviour, deliberately non-deterministic.
    """
    ts = F.current_timestamp() if at is None else F.lit(at).cast("timestamp")
    return df.withColumn(f"{prefix}timestamp", ts).withColumn(f"{prefix}run_id", F.lit(run_id))


def add_literal_columns(df: DataFrame, values: Mapping[str, object], types: Mapping[str, str] | None = None) -> DataFrame:
    """P5: add constant columns; ``values[name] is None`` + a ``types``
    entry gives a typed NULL (the reference's null placeholder columns,
    ``script/main.py:183-184``)."""
    types = types or {}
    out = df
    for name, val in values.items():
        col = F.lit(val)
        if name in types:
            col = col.cast(types[name])
        out = out.withColumn(name, col)
    return out


def md5_prefix_int(col: Column | str, n_hex: int = 8) -> Column:
    """First ``n_hex`` md5 hex digits of ``col`` (cast to string) as an
    integer-valued column (via ``conv`` — returns a numeric STRING;
    callers cast to the width they need: ``decimal(10,0)`` for exact
    32-bit, ``bigint`` for fingerprints, ``double`` for fractions).

    THE deterministic uniform hash every sampler/splitter in this repo
    builds on; keep every call site on this helper — its cross-engine
    parity (DuckDB twin: ``CAST(concat('0x', substr(md5(CAST(x AS
    VARCHAR)), 1, n)) AS UBIGINT)``) is one of the registry's
    load-bearing invariants (see the verify skill's gotchas).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, n_hex), 16, 10)
