"""Local Spark-vs-DuckDB correctness harness.

Emulates the driver's t2 gate: for every registered query, run the
Spark callable and its DuckDB oracle at the same scale factor, then
compare row count, column-name set, and an order-insensitive value
hash (columns sorted by name, rows sorted by canonical repr, floats
canonicalized via repr). Strictly bit-exact on purpose — if this
passes, any reasonable driver comparison passes.

Usage:  python tools/check_correctness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
import traceback
from datetime import date, datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_digest(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
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

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or sorted(REGISTRY)
    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows, {time.time() - t0:.1f}s) [no oracle]")
            if len(s_rows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = table_digest(s_rows, s_cols), table_digest(d_rows, d_cols)
            if hs != hd:
                problems.append(f"hash spark={hs} duck={hd}")
                # show a few differing rows for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(canon_cell(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(canon_cell(r[i]) for i in order_d) for r in d_rows}
                only_s = sorted(set_s - set_d)[:3]
                only_d = sorted(set_d - set_s)[:3]
                cols_sorted = sorted(s_cols)
                problems.append(f"cols={cols_sorted}")
                problems.append(f"only-spark={only_s}")
                problems.append(f"only-duck={only_d}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(s_rows)} rows, {time.time() - t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)}/{len(names)} FAILED: {failures}")
        return 1
    print(f"all {len(names)} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
