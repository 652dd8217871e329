"""Local mirror of the driver's correctness gate: run each __spark_entry__
query at an SF dir, run its DuckDB oracle on the same parquet views, compare
row count + sorted-by-name column values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def table_sig(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as entry
    from log_analysis_ai_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(cols)} duckdb={sorted(ocols)}")
            n_fail += 1
            continue
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(rows)} duckdb={len(orows)}")
            n_fail += 1
            continue
        s, o = table_sig(rows, [c.lower() for c in cols]), table_sig(orows, [c.lower() for c in ocols])
        if s != o:
            bad = next(i for i, (a, b) in enumerate(zip(s, o)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:\n  spark={s[bad]}\n  duck ={o[bad]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(rows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
