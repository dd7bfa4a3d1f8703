#!/usr/bin/env python3
"""Oracle result-type audit: DESCRIBE every oracleSql entry through DuckDB
and fail on any result column type the driver's hash path serializes
differently than Spark would emit for the same values.

Root cause this guards against (VERDICT r17): DuckDB widens SUM(BIGINT) to
HUGEINT (int128); the driver's hash serialization of int128 differs from
Spark's LongType even at equal values, so rows/schema pass but hash does
not — and the red is invisible to local value-level checks (check.py
normalizes through Python ints). Banned result types:
  - HUGEINT / UHUGEINT (no Spark equivalent; always a widening artifact)
  - DECIMAL with precision > 38 (exceeds Spark's DecimalType ceiling)

Usage: python3 tools/oracle_types.py <sfDir> <oracleJsonFile>
Exit 0 = clean; exit 1 = violations printed one per line.
"""
import sys, json, re
import duckdb

sfdir, oracle_file = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(oracle_file))
bad = 0
for k in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[k]}").fetchall()
    except Exception as e:
        print(f"VIOLATION {k}: DESCRIBE failed: {e}")
        bad += 1
        continue
    for name, typ, *_ in desc:
        t = typ.upper()
        if "HUGEINT" in t:
            print(f"VIOLATION {k}: column {name} is {typ} "
                  f"(cast the aggregate to BIGINT in the oracle SQL)")
            bad += 1
        m = re.match(r"DECIMAL\((\d+)", t)
        if m and int(m.group(1)) > 38:
            print(f"VIOLATION {k}: column {name} is {typ} "
                  f"(precision > Spark's 38 ceiling)")
            bad += 1
print(f"audited {len(oracle)} oracles, {bad} violation(s)")
sys.exit(1 if bad else 0)
