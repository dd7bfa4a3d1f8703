#!/usr/bin/env python3
"""Same-boot DuckDB calibration for the 2x acceptance bound.

BASELINE.md's numbers were measured at survey time (2026-08-12); this
shared machine's ambient speed drifts 2x between boots (PERF.md), so a
raw BENCH-vs-BASELINE ratio compares two different machines. This script
re-measures the DuckDB side of the headline set IMMEDIATELY around the
Spark bench, on the same boot, same files, same method as BASELINE.md
(in-process duckdb, views over the parquet, median of 3 full-fetch runs)
— making the 2x bound machine-checkable from the bench artifact alone.

Invoked by graft.Bench (which writes the headline keys' oracle SQL to a
temp JSON so the SQL stays single-sourced from SparkEntry.oracleSql) and
prints ONE JSON object that Bench embeds verbatim as "calibration".

Usage: calibrate.py <sfDir> <sqlJson> [sparkHeadlineTotalSec]
"""
import sys, json, time

# BASELINE.md's recorded per-query medians (ms), keyed by the Spark
# bench's headline key names, for the drift ratio (this boot vs the
# boot BASELINE.md was recorded on).
RECORDED_MS = {
    "agg_group_pricing": 71.7,     # q1_pricing_summary
    "topk_orders": 57.7,           # q3_shipping_priority
    "join_multiway_star": 76.8,    # q5_region_join
    "win_latest_dedup": 28.7,      # window_latest_event
    "stream_tumbling_1h": 19.2,    # tumbling_window
    "agg_count_distinct": 10.0,    # distinct_users
    "fn_json_pack": 22.8,          # json_extract
    "agg_rollup": 22.0,            # rollup_orders
    "vec_cosine_topk": 9.6,        # cosine_topk
    "vec_knn_join": 220.1,         # knn_self_join
    "text_wordcount_topk": 47.1,   # wordcount
    "text_lang_stats": 5.3,        # lang_stats
    "text_exact_dedup": 8.2,       # exact_dedup
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, sqljson = sys.argv[1], sys.argv[2]
    spark_headline_s = float(sys.argv[3]) if len(sys.argv) > 3 else None
    try:
        import duckdb
    except ImportError:
        print(json.dumps({"error": "duckdb unavailable"}))
        return
    queries = json.load(open(sqljson))
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is one file per table; Spark-generated scale
        # spikes (target/sf1) write a DIRECTORY of part files — glob it
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    per_ms = {}
    for k in sorted(queries):
        ts = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(queries[k]).fetchall()
                ts.append(time.perf_counter() - t0)
            per_ms[k] = round(sorted(ts)[1] * 1000, 2)
        except Exception as e:
            per_ms[k] = None
            print(f"calibrate: {k} failed: {e}", file=sys.stderr)
    ok = {k: v for k, v in per_ms.items() if v is not None}
    total_s = round(sum(ok.values()) / 1000, 3)
    out = {
        "engine": "duckdb",
        "method": "median of 3 full-fetch runs, same boot, same files",
        "n_queries": len(ok),
        "per_query_ms": per_ms,
        "total_s": total_s,
    }
    # Drift of THIS boot vs the boot BASELINE.md was recorded on,
    # over the keys present in both sets. Only meaningful at sf0.1 —
    # RECORDED_MS was measured there.
    both = [k for k in ok if k in RECORDED_MS] \
        if sfdir.rstrip("/").endswith("sf0.1") else []
    if both:
        rec = sum(RECORDED_MS[k] for k in both) / 1000
        now = sum(ok[k] for k in both) / 1000
        out["recorded_baseline_s"] = round(rec, 3)
        out["boot_drift"] = round(now / rec, 2) if rec else None
    if spark_headline_s is not None and total_s > 0:
        out["spark_headline_s"] = spark_headline_s
        out["headline_vs_calibrated"] = round(spark_headline_s / total_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
