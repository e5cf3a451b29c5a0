"""Simulate the correctness driver against __spark_entry__.py.

Usage: python tools/driver_sim.py [sf_dir]

Builds a VANILLA SparkSession (no repo configs — exactly what the external
driver does), runs entry() as a smoke check, then cross-checks every
queries() entry against its oracle_sql() in DuckDB on the same parquet.
Run it under `TZ=America/New_York` as well: that surfaces any
host-timezone-dependent timestamp handling (see .claude/skills/verify).
"""
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

# vanilla session, as the driver would build it — none of our tuned configs.
# DRIVER_SIM_MASTER only right-sizes the core count when the sim runs as a
# subprocess of the already-loaded pytest session (resource contention,
# not semantics).
spark = (
    SparkSession.builder.master(os.environ.get("DRIVER_SIM_MASTER", "local[8]"))
    .appName("driver-sim")
    .getOrCreate()
)

# 1. smoke: entry()
df = mod.entry(spark)
rows = df.collect()
print(f"ENTRY OK: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0
print("   sample:", rows[0])

# 2. queries vs oracle at sf0.01
import datetime, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == 0.0: return 0.0
        return v
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date): return v.isoformat()
    return v

qs, os_ = mod.queries(), mod.oracle_sql()
only = os.environ.get("ONLY")
if only:
    keep = set(only.split(","))
    qs = {k: v for k, v in qs.items() if k in keep}
n_pass = n_fail = n_rows_only = 0
for name in sorted(qs):
    sdf = qs[name](spark, SF)
    srows = sorted(repr(tuple(norm(v) for v in r)) for r in sdf.collect())
    if name not in os_:
        n_rows_only += 1
        print(f"ROWS-ONLY {name}: {len(srows)} rows")
        continue
    res = con.execute(os_[name])
    dcols = [d[0] for d in res.description]
    drows = sorted(repr(tuple(norm(v) for v in r)) for r in res.fetchall())
    ok = sdf.columns == dcols and srows == drows
    if ok:
        n_pass += 1
        print(f"PASS {name}: {len(srows)} rows")
    else:
        n_fail += 1
        print(f"FAIL {name}: cols {sdf.columns} vs {dcols}, rows {len(srows)} vs {len(drows)}")
        for a, b in list(zip(srows, drows))[:3]:
            if a != b: print("   spark:", a[:150], "\n   duck :", b[:150])
print(f"\nRESULT: {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(qs)}")
sys.exit(1 if n_fail else 0)
