#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: run Verify's parquet dumps against
DuckDB executing oracle_sql.json on the same tables. Columns are sorted by
name (driver semantics), rows compared in order, values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]
"""
import sys, json, math, datetime, decimal
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

fails = 0
for k in sorted(oracle):
    if only and k not in only:
        continue
    try:
        exp = con.execute(oracle[k]).fetchall()
        edesc = [d[0] for d in con.description]
        got_rel = con.execute(f"SELECT * FROM read_parquet('{outdir}/{k}/*.parquet')")
        got = got_rel.fetchall()
        gdesc = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {k}: exec error: {e}")
        fails += 1
        continue
    if sorted(edesc) != sorted(gdesc):
        print(f"FAIL {k}: columns oracle={sorted(edesc)} spark={sorted(gdesc)}")
        fails += 1
        continue
    eidx = [edesc.index(c) for c in sorted(edesc)]
    gidx = [gdesc.index(c) for c in sorted(gdesc)]
    erows = [tuple(norm(r[i]) for i in eidx) for r in exp]
    grows = [tuple(norm(r[i]) for i in gidx) for r in got]
    if len(erows) != len(grows):
        print(f"FAIL {k}: rows oracle={len(erows)} spark={len(grows)}")
        fails += 1
        continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(erows, grows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {k}: {len(bad)}/{len(erows)} rows differ; first at {i}:\n  oracle={a}\n  spark ={b}\n  cols={sorted(edesc)}")
        fails += 1
    else:
        print(f"ok   {k}: {len(erows)} rows")
print("RESULT:", "FAIL" if fails else "PASS", f"({fails} failing)")
sys.exit(1 if fails else 0)
