"""Oracle/Spark OUTPUT-DTYPE symmetry audit.

The r3 driver exposed a whole CLASS of hash divergence the local
harness could not see: DuckDB integer ``sum()`` returns HUGEINT
(int128), and every pandas fetch path (``fetchdf``/Arrow) coerces
HUGEINT to float64 — so a value the local string-canonicalizing
harness sees as ``3`` on both engines hashes as ``3.0`` vs ``3`` on
any driver that compares through pandas. The same trap exists for
UBIGINT (→ uint64), DECIMAL (→ float64 or object), and nullable
ints (→ float64).

This tool closes the class: for every registered oracle it fetches
the DuckDB result AS PANDAS (the adversarial path) and the Spark
result's schema, maps both to a canonical dtype family, and flags
any column where the families disagree. Run at sf0.001 so the sweep
is cheap enough for CI.

Usage:  python tools/dtype_audit.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# Canonical families: two dtypes in the same family produce identical
# canonical cell reprs for the same logical value; cross-family pairs
# (int vs float being the killer) can diverge under a pandas-mediated
# comparison even when values are logically equal.
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "array"
    if dt.startswith("map") or dt.startswith("struct"):
        return "nested"
    return _SPARK_FAMILY.get(dt, dt)


def pandas_family(dtype, sample) -> str:
    import numpy as np

    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "timestamp"
    if kind == "O":
        # object column: inspect a non-null sample value
        import datetime
        import decimal

        if sample is None:
            return "object-empty"
        if isinstance(sample, decimal.Decimal):
            return "decimal"
        if isinstance(sample, datetime.datetime):
            return "timestamp"
        if isinstance(sample, datetime.date):
            return "date"
        if isinstance(sample, (bytes, bytearray)):
            return "binary"
        if isinstance(sample, str):
            return "str"
        if isinstance(sample, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(sample, bool):
            return "bool"
        if isinstance(sample, int):
            return "int"
        if isinstance(sample, float):
            return "float"
        return type(sample).__name__
    return str(dtype)


# Pairs that are SAFE despite family mismatch: a nullable Spark int
# column arrives as float64 in pandas on BOTH engines, so int-vs-float
# is only flagged when the duck side is float and spark side int (the
# HUGEINT shape) or vice versa — which is exactly what we want to
# catch. Date columns: DuckDB fetchdf gives datetime64 for DATE while
# Spark toPandas gives object-of-date; both canonicalize to the same
# ISO day IF the driver formats dates — but we flag it anyway as
# informational (severity "note") since r1-r3 drivers hashed date
# queries green.
_NOTE_ONLY = {("timestamp", "date"), ("date", "timestamp")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or sorted(REGISTRY)
    flagged = []
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, args.sf)
            s_types = dict(sdf.dtypes)
        except Exception:
            print(f"ERR   {name}: spark\n{traceback.format_exc()}")
            flagged.append(name)
            continue
        try:
            pdf = con.execute(spec.oracle).fetchdf()
        except Exception:
            print(f"ERR   {name}: duckdb\n{traceback.format_exc()}")
            flagged.append(name)
            continue
        problems, notes = [], []
        for col in pdf.columns:
            if col not in s_types:
                continue  # column-set mismatch is the harness's job
            non_null = pdf[col].dropna()
            sample = non_null.iloc[0] if len(non_null) else None
            dfam = pandas_family(pdf[col].dtype, sample)
            sfam = spark_family(s_types[col])
            if dfam == sfam or dfam == "object-empty":
                continue
            if (dfam, sfam) in _NOTE_ONLY:
                notes.append(f"{col}: duck={dfam} spark={sfam}")
            else:
                problems.append(f"{col}: duck={dfam}({pdf[col].dtype}) spark={sfam}({s_types[col]})")
        if problems:
            print(f"FLAG  {name}: " + "; ".join(problems))
            flagged.append(name)
        elif notes:
            print(f"note  {name}: " + "; ".join(notes))
        else:
            print(f"ok    {name}")
    print(f"\n{len(flagged)} flagged of {len(names)} audited")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
