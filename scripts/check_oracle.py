#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify at a given SF, then replay each oracle_sql.json query in
DuckDB over the same parquet tables and compare values.

Usage: python3 scripts/check_oracle.py [sfdir] [outdir]
(Not part of the shipped library — driver-side tooling only.)
"""
import json
import sys
import glob

import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# surface the oracle engine version in every run: two rounds of red-row
# adjudication hinged on builder/driver DuckDB version skew, so the gap
# must at least be visible at verify time
print(f"[duckdb {duckdb.__version__}] oracle replay over {sfdir}")

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# ---- output-type lint ------------------------------------------------
# Three consecutive rounds of driver-red were engine-materialization skew
# on oracle OUTPUT columns (doubles in r6/7, HUGEINT in r8): values match
# but a newer DuckDB maps the column to pandas differently, flipping a
# formatting-sensitive hash. That class is mechanically detectable before
# shipping: every oracle query's final projection must stay inside a
# closed whitelist of types whose pandas materialization is stable across
# DuckDB versions. HUGEINT (any uncast SUM(BIGINT)) and DECIMAL in the
# output fail the lint EVEN WHEN values match — cast to BIGINT/DOUBLE in
# the SQL instead.
TYPE_WHITELIST = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "DATE", "BOOLEAN", "TIMESTAMP",
                  "TIMESTAMP WITH TIME ZONE"}
lint_fail = 0
for name in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"[LINT] {name}: DESCRIBE failed: {e}")
        lint_fail += 1
        continue
    bad = [(c, t) for c, t, *_ in desc if t.upper() not in TYPE_WHITELIST]
    if bad:
        print(f"[LINT] {name}: non-whitelisted output column types: {bad}")
        lint_fail += 1
if lint_fail:
    print(f"[LINT] {lint_fail} oracle queries with fragile output types")
else:
    print(f"[LINT] all {len(oracle)} oracle output projections type-clean")
# ----------------------------------------------------------------------

STRICT_ORDER = "--strict-order" in sys.argv  # don't re-sort rows: the
# engines' own ORDER BY must agree (mimics an order-sensitive driver hash)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if not STRICT_ORDER:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    else:
        df = df.reset_index(drop=True)
    return df

fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[MISS] {name}: no spark output")
        fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[ERR ] {name}: duckdb failed: {e}")
        fail += 1
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"[COLS] {name}: spark={sc} duck={dc}")
        fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"[ROWS] {name}: spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    # normalize dtypes for compare
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            try:
                b[c] = b[c].astype(a[c].dtype)
            except Exception:
                a[c] = a[c].astype(str)
                b[c] = b[c].astype(str)
    eq = a.equals(b)
    if not eq:
        diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
        ndiff = diff_mask.any(axis=1).sum()
        percol = {c: int(n) for c, n in diff_mask.sum().items() if n}
        print(f"[DIFF] {name}: {ndiff}/{len(a)} rows differ; by column: {percol}")
        bad = diff_mask.any(axis=1)
        print("  spark:", a[bad].head(3).to_dict("records"))
        print("  duck :", b[bad].head(3).to_dict("records"))
        fail += 1
    else:
        print(f"[ OK ] {name}: {len(a)} rows")

nosql = set(f.split("/")[-1] for f in glob.glob(f"{outdir}/*") if "." not in f.split("/")[-1]) - set(oracle)
for name in sorted(nosql):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
    print(f"[rows] {name}: {n} (no oracle)")

print(f"\n{'FAIL' if (fail or lint_fail) else 'PASS'}: {fail} mismatches, "
      f"{lint_fail} type-lint offenders")
sys.exit(1 if (fail or lint_fail) else 0)
