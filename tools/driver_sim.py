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

# Parse flags before positionals so `driver_sim.py --json out.json`
# doesn't swallow "--json" as the sf_dir.
_argv = sys.argv[1:]
json_out = None
if "--json" in _argv:
    _i = _argv.index("--json")
    if _i + 1 >= len(_argv) or os.path.isdir(_argv[_i + 1]):
        sys.exit("usage: driver_sim.py [sf_dir] [--json OUT.json] "
                 "(--json needs a non-directory output path)")
    json_out = _argv[_i + 1]
    del _argv[_i : _i + 2]
SF = _argv[0] if _argv else "/root/testdata/sf0.01"
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

# Optional: emit the driver's CORRECTNESS JSON schema so a judge can diff
# this full local sweep mechanically against the driver's sampled artifact
# (`--json PATH`). Matching the driver's compare: columns sorted by NAME
# before hashing values, so a column-order difference is not a value
# mismatch but a schema (name-set) difference is.
import hashlib
import json as _json

results = {}
n_pass = n_fail = n_rows_only = 0
for name in sorted(qs):
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = qs[name](spark, SF)
        scols = list(sdf.columns)
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        sraw = sdf.collect()
        srows = sorted(
            repr(tuple(norm(r[i]) for i in sorder)) for r in sraw
        )
        rec["spark_rows"] = len(srows)
    except Exception as exc:  # noqa: BLE001 — the driver records err strings
        rec["err"] = f"spark: {exc}"
        results[name] = rec
        n_fail += 1
        print(f"FAIL {name}: spark error {exc}")
        continue
    if name not in os_:
        n_rows_only += 1
        rec["rows_match"] = len(srows) >= 0
        rec["mode"] = "rows_only"  # artifact_gate relaxes schema/hash
        results[name] = rec
        print(f"ROWS-ONLY {name}: {len(srows)} rows")
        continue
    try:
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        drows = sorted(
            repr(tuple(norm(r[i]) for i in dorder)) for r in res.fetchall()
        )
        rec["oracle_rows"] = len(drows)
    except Exception as exc:  # noqa: BLE001
        rec["err"] = f"oracle: {exc}"
        results[name] = rec
        n_fail += 1
        print(f"FAIL {name}: oracle error {exc}")
        continue
    rec["rows_match"] = len(srows) == len(drows)
    rec["schema_match"] = sorted(scols) == sorted(dcols)
    h = lambda rows: hashlib.sha256("\n".join(rows).encode()).hexdigest()
    rec["hash_match"] = rec["schema_match"] and h(srows) == h(drows)
    results[name] = rec
    if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
        n_pass += 1
        print(f"PASS {name}: {len(srows)} rows")
    else:
        n_fail += 1
        print(f"FAIL {name}: cols {scols} vs {dcols}, rows {len(srows)} vs {len(drows)}")
        for a, b in list(zip(srows, drows))[:3]:
            if a != b: print("   spark:", a[:150], "\n   duck :", b[:150])

if json_out:
    with open(json_out, "w") as f:
        _json.dump(results, f, indent=1)
    print(f"wrote {json_out}")
print(f"\nRESULT: {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(qs)}")
sys.exit(1 if n_fail else 0)
