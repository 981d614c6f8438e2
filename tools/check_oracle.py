"""Local replica of the driver's correctness gate.

Runs every `queries()` entry at sf0.01 on Spark and the matching
`oracle_sql()` on DuckDB (tables pre-registered as views), then compares
row count + sorted-by-name schema + order-insensitive exact values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def normalize(v):
    """Canonicalize a cell for comparison, KEEPING the numeric type class.

    The driver's hasher distinguishes Arrow int64 / float64 / decimal128
    (r5 lesson: DuckDB HUGEINT surfaces as decimal128 and hash-mismatches a
    Spark int64 even when values are equal, while the old Decimal->float
    coercion here hid it). So numerics are tagged with their class: an
    int-vs-decimal or int-vs-float pairing is a FAILURE the oracle SQL must
    fix with an explicit CAST, not something to paper over locally.
    Decimal scale is normalized (1.50 == 1.5) since both engines emit the
    same scale only when the SQL casts explicitly — which green queries do.
    """
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return ("d", "NaN")
        return ("d", format(v.normalize(), "f"))
    return v


def typeclass_violations(sdf, con, sql):
    """DuckDB columns that will surface as decimal128 through Arrow
    (HUGEINT or DECIMAL) while the Spark result column is NOT DecimalType —
    exactly the r5 driver hash-mismatch class. Returns ["col:TYPE", ...]."""
    from pyspark.sql.types import DecimalType

    spark_dec = {f.name.lower(): isinstance(f.dataType, DecimalType) for f in sdf.schema.fields}
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:  # noqa: BLE001 - DESCRIBE unsupported for this shape
        return []
    out = []
    for row in desc:
        cname, ctype = str(row[0]).lower(), str(row[1]).upper()
        if ("HUGEINT" in ctype or ctype.startswith("DECIMAL")) and not spark_dec.get(cname, False):
            out.append(f"{cname}:{ctype}")
    return out


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    results: dict[str, dict] = {}
    spark = build_session(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "spark_error", "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(s_rows), "secs": round(time.time() - t0, 2)}
            print(f"SKIP  {name}: no oracle ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "duckdb_error", "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        status = []
        viols = typeclass_violations(sdf, con, oracles[name])
        if viols:
            status.append(f"typeclass: oracle emits decimal128 for non-decimal spark cols {viols}")
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            status.append(f"count: spark={len(s_rows)} duckdb={len(d_rows)}")
        if not status:
            a = canon_rows(s_cols, s_rows)
            b = canon_rows(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"values: first diffs {diff}")
        if status:
            failures.append(name)
            results[name] = {"status": "mismatch", "detail": "; ".join(status)}
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            results[name] = {"status": "ok", "rows": len(s_rows), "secs": round(time.time() - t0, 2)}
            print(f"OK    {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json as _json

        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(results),
            "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "failures": failures,
            "queries": results,
        }
        with open(json_path, "w") as f:
            f.write(_json.dumps(summary, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
