"""Targeted oracle check: run the named queries() entries at sf0.01 against
their DuckDB twins, comparing columns, row sets (Python equality) AND the
DuckDB result column TYPES (the driver's value-hash is width-sensitive —
a HUGEINT oracle column vs a Spark BIGINT hashes differently even when the
values are equal, the exact failure mode of round 5's pack1 red row).

Usage: python tools/check_queries.py pack1_token_budget ta5_repetition ...
       (no args = every query that has an oracle)
"""
import math
import os
import sys
import time

# same portable bootstrap as tools/explain_audit.py: repo root from the
# file's own location, fixture dir from the env contract
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# DuckDB logical type -> the Spark type the driver would see for the same
# data; anything outside this map (HUGEINT!) is flagged as a width hazard.
_DUCK_OK = {
    "BIGINT": {"bigint", "long"},
    "INTEGER": {"int", "integer"},
    "SMALLINT": {"smallint", "short"},
    "TINYINT": {"tinyint", "byte"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "BLOB": {"binary"},
}


def norm(v):
    import decimal

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main() -> int:
    import duckdb

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]").appName("check-queries").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
            if name not in oracles:
                print(f"{name}: ROWS_ONLY({len(srows)}) [{time.perf_counter()-t0:.1f}s]")
                continue
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            dtypes = [str(t) for t in rel.types]
            drows = [tuple(norm(v) for v in r) for r in rel.fetchall()]
            ok = scols == dcols and sorted(srows, key=repr) == sorted(drows, key=repr)
            width_bad = [
                (c, dt, st)
                for c, dt, st in zip(dcols, dtypes, stypes)
                if dt in _DUCK_OK and st not in _DUCK_OK[dt]
                or dt == "HUGEINT"
                or (dt.startswith("DECIMAL") and not st.startswith("decimal"))
            ]
            status = "MATCH" if ok else "MISMATCH"
            if width_bad:
                status += f" TYPE_HAZARD {width_bad}"
            if not ok or width_bad:
                fails.append(name)
                a, b = sorted(srows, key=repr), sorted(drows, key=repr)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                print(
                    f"  cols {scols} vs {dcols}; types {stypes} vs {dtypes}; "
                    f"rows {len(srows)} vs {len(drows)}; first diffs {diff}"
                )
            print(f"{name}: {status} rows={len(srows)} [{time.perf_counter()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {str(e)[:300]}")
    print("FAILS:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
