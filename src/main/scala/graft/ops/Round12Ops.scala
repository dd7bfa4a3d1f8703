package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.T.{t, dec, money, oDec, oMoney}
import graft.sources.GraftTable

/** Round-12 additions — the versioned store grows the write-side table
  * operations every long-lived lakehouse table needs (ranked 1–3 in the
  * round-11 review), plus the multi-file base-table scan posture:
  *
  *  - `table_merge_upsert` — MERGE INTO the versioned store: apply a
  *    changelog (updates + inserts) to the current snapshot and commit
  *    the merged state as an atomic new version; BOTH versions read back
  *    through the manifest, so the pre-merge snapshot's integrity after
  *    the merge is oracle-checked, not just spec-asserted.
  *
  *  - `table_compact_version` — OPTIMIZE as a commit: rewrite the
  *    current version's many small files into few, committed as a new
  *    version with identical rows. The oracle proves row identity across
  *    compaction (both versions aggregate to the same recompute from the
  *    raw table); Round12Spec pins the mechanical half (file count
  *    actually drops, pre-compaction version still time-travels).
  *
  *  - `table_cdc_changes` — the change-data query over a version
  *    history: three grow-by-append commits, then each version's delta
  *    (`GraftTable.versionDelta`) aggregated; oracled against the
  *    disjoint date-band recomputes, proving delta(v) = exactly the rows
  *    v added. The streaming subscription over the same history
  *    (`GraftTable.cdcSubscribe`) is golden-tested in Round12Spec
  *    (exactly-once delivery, checkpoint restart without replay).
  *
  *  - `scan_multifile_layout` — every base table in this harness is ONE
  *    parquet file; at 100 TB a table is 10⁴–10⁶ files. This key writes
  *    lineitem as a ~84-directory month-partitioned layout and runs a
  *    partition-pruned, filter-pushed aggregate over it, oracled against
  *    the single-file original — the proof that pruning and pushdown
  *    hold beyond one file per table. Round12Spec audits the plan
  *    (PartitionFilters non-empty, quantity filter in PushedFilters) and
  *    the file-index size.
  */
object Round12Ops {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MERGE INTO — the single most common lakehouse write pattern:
    // current snapshot FULL OUTER changelog on the key, per-column
    // coalesce, committed atomically as version N+1 (cdc_merge_upsert's
    // SCD1 semantics composed with GraftTable.commitNext). The changelog
    // is orders pre-aggregated to one row per key BEFORE the merge join,
    // so the shuffle carries |keys| rows, not |orders|; keys ≡ 0 (mod
    // 10) are shifted past the base key space to exercise the
    // WHEN-NOT-MATCHED INSERT arm, the rest are UPDATE arms, and base
    // customers with no orders are the untouched arm. Reading BOTH
    // versions back through the manifest afterwards makes snapshot
    // isolation part of the oracle contract: a merge that mutated v0 in
    // place would hash-mismatch on the version-0 rows. At 100 TB the
    // merge is one key-partitioned shuffle join of snapshot × (small)
    // changelog — Delta/Iceberg MERGE planned the same way — and the
    // commit cost is O(manifest), not O(data).
    "table_merge_upsert" -> ((s, d) => {
      val dir = s"target/tmp/gmerge_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
      // isolated commits (writer-private data dirs, named in the commit
      // file): the multi-writer-safe path, exercised here under the
      // oracle so the data= indirection is hash-checked end to end
      GraftTable.commitNextIsolated(s, dir, base, "base")
      val chg = t(s, d, "orders").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("delta"))
        .select(when(col("o_custkey") % 10 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("ckey"), col("delta"))
      val merged = GraftTable.read(s, dir)
        .join(chg, col("key") === col("ckey"), "full")
        .select(coalesce(col("key"), col("ckey")).as("key"),
          (coalesce(col("bal"), lit(0).cast(DecimalType(12, 2))) +
            coalesce(col("delta"), lit(0).cast(DecimalType(12, 2)))).as("bal"))
      GraftTable.commitNextIsolated(s, dir, merged, "merged")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("key"), money(col("bal")).as("bal"))
      snap(0).unionByName(snap(1)).orderBy("version", "key")
    }),

    // OPTIMIZE — compaction as a table operation: version 0 commits the
    // classic many-tiny-files layout (64 shards), version 1 commits the
    // SAME rows coalesce(4)'d (no shuffle — coalesce only glues source
    // partitions). Because versions are immutable, compaction is a
    // WRITE, never a mutation: in-flight readers of v0 keep their
    // snapshot, time travel to the fragmented layout still works, and a
    // crash mid-compaction leaves v0 current. Both versions' aggregates
    // oracle-check to the same raw recompute — row identity across the
    // rewrite. At 100 TB this is the maintenance job that keeps the
    // file-listing and task-granularity costs bounded, run as an
    // ordinary committed version with retention eventually GC'ing the
    // fragmented data.
    "table_compact_version" -> ((s, d) => {
      val dir = s"target/tmp/gcompact_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).as("price"))
      GraftTable.commitNext(s, dir, o.repartition(64), "raw 64-shard layout")
      GraftTable.commitNext(s, dir, GraftTable.read(s, dir).coalesce(4),
        "optimize: compacted to 4 files")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("o_orderkey")).as("n_keys"),
            money(sum(col("price"))).as("sum_price"))
          .select(lit(v).as("version"), col("n_rows"), col("n_keys"),
            col("sum_price"))
      snap(0).unionByName(snap(1)).orderBy("version")
    }),

    // Change-data query over the version history: three grow-by-append
    // commits (orders up to 1996, up to 1997, all), then versionDelta
    // per version — delta(v) must be EXACTLY the date band v appended,
    // which is what the oracle recomputes. The delta itself is one
    // hash-partitioned exceptAll of adjacent snapshots (an append-only
    // writer at scale skips even that by reading only v's added files);
    // what this key pins is the CONTRACT every downstream subscriber
    // relies on: per-version deltas partition the final table.
    "table_cdc_changes" -> ((s, d) => {
      val dir = s"target/tmp/gcdc_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).as("price"))
      GraftTable.commitNext(s, dir,
        o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01"))), "pre-1996")
      GraftTable.commitNext(s, dir,
        o.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01"))), "pre-1997")
      GraftTable.commitNext(s, dir, o, "full")
      def delta(v: Int): DataFrame =
        GraftTable.versionDelta(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), money(sum(col("price"))).as("sum_price"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_price"))
      delta(0).unionByName(delta(1)).unionByName(delta(2)).orderBy("version")
    }),

    // Row-level DELETE — the other half of the MERGE story: survivors of
    // the delete predicate rewritten as a new version (copy-on-write,
    // exactly how Delta/Iceberg execute DELETE without positional
    // deletes), through the writer-isolated commit path. Both versions
    // read back and grouped by the deleted dimension, so the oracle
    // hash-checks that v1 dropped EXACTLY the predicate's rows and v0
    // still carries them. At 100 TB copy-on-write DELETE touches only
    // the files containing matches (file-level pruning on the predicate
    // decides the rewrite set); the version mechanics are identical.
    "table_delete_rows" -> ((s, d) => {
      val dir = s"target/tmp/gdelete_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).as("price"))
      GraftTable.commitNext(s, dir, o, "full")
      GraftTable.commitNextIsolated(s, dir,
        GraftTable.read(s, dir).filter(col("o_orderstatus") =!= "F"),
        "delete where o_orderstatus = 'F'")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), money(sum(col("price"))).as("sum_price"))
          .select(lit(v).as("version"), col("o_orderstatus"), col("n"),
            col("sum_price"))
      snap(0).unionByName(snap(1)).orderBy("version", "o_orderstatus")
    }),

    // Incremental materialized-view maintenance driven by the CDC feed:
    // a monthly-GMV aggregate table is maintained by folding EACH
    // source-version delta's partial aggregates into the previous MV
    // state (union + re-aggregate of |months| rows — never the source
    // history), committing the MV itself as a versioned table. The
    // oracle is the one-shot full recompute, so the key proves N
    // delta-driven maintenance runs ≡ recompute — the contract that
    // lets a 100 TB warehouse keep reports fresh by reading only each
    // day's appended rows. (etl_incremental_watermark proved this for
    // watermark cuts; this is the CDC-subscription twin, and the shape
    // cdcSubscribe's onDelta callback would run.) Partials accumulate
    // in exact decimal: fold order cannot change the result.
    "table_cdc_maintain_agg" -> ((s, d) => {
      val src = s"target/tmp/gmaint_src_${new java.io.File(d).getName}"
      val mv = s"target/tmp/gmaint_mv_${new java.io.File(d).getName}"
      val fs = GraftTable.fsOf(s, src)
      fs.delete(new org.apache.hadoop.fs.Path(src), true) // pure-function reset
      fs.delete(new org.apache.hadoop.fs.Path(mv), true)
      val o = t(s, d, "orders").select(col("o_orderdate"),
        dec(col("o_totalprice")).as("price"))
      GraftTable.commitNext(s, src,
        o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01"))), "pre-1996")
      GraftTable.commitNext(s, src,
        o.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01"))), "pre-1997")
      GraftTable.commitNext(s, src, o, "full")
      (0 to 2).foreach { v =>
        val part = GraftTable.versionDelta(s, src, v)
          .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("ym"))
          .agg(count(lit(1)).as("cnt"), sum(col("price")).as("sp"))
          .select(col("ym"), col("cnt"), col("sp").cast(DecimalType(30, 2)).as("sp"))
        val merged = GraftTable.readManifest(fs, mv) match {
          case Some(_) => GraftTable.read(s, mv).unionByName(part)
            .groupBy("ym")
            .agg(sum(col("cnt")).as("cnt"),
              sum(col("sp")).cast(DecimalType(30, 2)).as("sp"))
          case None => part
        }
        GraftTable.commitNextIsolated(s, mv, merged, s"after src v$v")
      }
      GraftTable.read(s, mv)
        .select(col("ym"), col("cnt"), money(col("sp")).as("gmv"))
        .orderBy("ym")
    }),

    // Schema evolution across versions: v1 adds a column; the evolved
    // read serves old versions with NULL backfill (unionByName over the
    // union of schemas — the ADD COLUMN metadata-only semantics every
    // table format guarantees: no rewrite of v0's files, old snapshots
    // keep their own schema, and a cross-version read aligns by NAME,
    // never by position). The oracle pins both the null backfill count
    // and that neither version's data moved.
    "table_schema_evolution" -> ((s, d) => {
      val dir = s"target/tmp/gevolve_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders")
      GraftTable.commitNext(s, dir,
        o.select(col("o_orderkey"), dec(col("o_totalprice")).as("price")),
        "initial 2-column schema")
      // ADD COLUMN is exactly the change the round-14 write gate exists
      // to catch when UNdeclared — this key declares it
      GraftTable.commitNextIsolated(s, dir,
        o.select(col("o_orderkey"), dec(col("o_totalprice")).as("price"),
          col("o_orderpriority")),
        "add column o_orderpriority", allowEvolution = true)
      GraftTable.readVersion(s, dir, 0)
        .select(lit(0).as("version"), col("*"))
        .unionByName(
          GraftTable.readVersion(s, dir, 1).select(lit(1).as("version"), col("*")),
          allowMissingColumns = true)
        .groupBy("version")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderpriority")).as("n_priority"),
          money(sum(col("price"))).as("sum_price"))
        .orderBy("version")
    }),

    // The lakehouse write-side story as ONE key — the composition
    // flagship for the table family, the way etl_llm_corpus_pipeline is
    // for the corpus family: initial load → MERGE a changelog → DELETE
    // by predicate → OPTIMIZE compaction, each stage an atomic committed
    // version of the SAME table, all four versions read back through the
    // manifest afterwards. The oracle recomputes every stage from the
    // raw tables as chained CTEs, so the whole version history — not
    // just the final state — is hash-checked: a stage that mutated its
    // predecessor in place, lost rows in compaction, or deleted the
    // wrong predicate's rows mismatches at that version's rows. Stage
    // costs at 100 TB: load = one grouped scan; merge = one
    // key-partitioned full-outer of snapshot × pre-aggregated changelog;
    // delete = copy-on-write of survivors; optimize = IO-only rewrite;
    // every commit O(manifest).
    "etl_lakehouse_pipeline" -> ((s, d) => {
      val dir = s"target/tmp/glake_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders")
      def band(pred: org.apache.spark.sql.Column) =
        o.filter(pred).groupBy(col("o_custkey").as("key"))
          .agg(sum(dec(col("o_totalprice"))).as("bal"))
      // v0 — load: pre-1996 per-customer balances
      GraftTable.commitNext(s, dir,
        band(col("o_orderdate") < to_timestamp(lit("1996-01-01"))), "load pre-1996")
      // v1 — merge: 1996's changelog upserted (update + insert arms)
      val chg = band(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("key").as("ckey"), col("bal").as("delta"))
      val merged = GraftTable.read(s, dir)
        .join(chg, col("key") === col("ckey"), "full")
        .select(coalesce(col("key"), col("ckey")).as("key"),
          (coalesce(col("bal"), lit(0).cast(DecimalType(12, 2))) +
            coalesce(col("delta"), lit(0).cast(DecimalType(12, 2)))).as("bal"))
      GraftTable.commitNextIsolated(s, dir, merged, "merge 1996 changelog")
      // v2 — delete: drop balances under 50k (copy-on-write survivors)
      GraftTable.commitNextIsolated(s, dir,
        GraftTable.read(s, dir).filter(col("bal") >= 50000), "delete bal < 50000")
      // v3 — optimize: same rows, compacted
      GraftTable.commitNextIsolated(s, dir,
        GraftTable.read(s, dir).coalesce(2), "optimize compact")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), money(sum(col("bal"))).as("total_bal"))
          .select(lit(v).as("version"), col("n_rows"), col("total_bal"))
      snap(0).unionByName(snap(1)).unionByName(snap(2)).unionByName(snap(3))
        .orderBy("version")
    }),

    // Sliding-window DISTINCT cardinality — the DAU-style rolling-uniques
    // report (distinct users per 1h window every 15 min). countDistinct
    // inside a window-keyed groupBy: Catalyst's distinct-agg expansion
    // still runs two-phase (partial dedup per (window, user) before the
    // final count), so the shuffle carries (window, user) pairs, never
    // raw events; at 100 TB the same report swaps in HLL sketches
    // (agg_hll_union) when exactness is negotiable.
    "agg_sliding_distinct_users" -> ((s, d) =>
      graft.T.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("users"), col("n"))
        .orderBy("ws")),

    // NEAREST as-of join — bidirectional: each purchase pairs with the
    // click minimizing |Δt| (ties → the earlier, i.e. backward, click),
    // the sensor-reading-alignment idiom join_asof_latest's backward-only
    // form can't express. Same merged-stream shape as join_asof_latest —
    // one shuffle on user_id + one sort, TWO window passes (running max
    // of preceding clicks, running min of following clicks), then a
    // per-row argmin — O(n log n) per user, never the quadratic
    // purchase×click candidate join (which the ORACLE deliberately is).
    "join_asof_nearest" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = graft.T.events(s, d)
      val merged = e.filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1))
            .as("kind"),
          col("event_id"))
      val order = Seq(col("t"), col("kind"), col("event_id"))
      val wB = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val clickStruct = when(col("kind") === 0,
        struct(col("t").as("c_us"), col("event_id").as("click_id")))
      merged
        // same-t clicks sort BEFORE the purchase (kind 0 < 1), so they
        // are backward candidates with gap 0 — and gap-0 backward always
        // wins the argmin, keeping the two windows' boundary exact
        .withColumn("back", max(clickStruct).over(wB))
        .withColumn("fwd", min(clickStruct).over(wF))
        .filter(col("kind") === 1 &&
          (col("back").isNotNull || col("fwd").isNotNull))
        .withColumn("bg", col("t") - col("back.c_us"))
        .withColumn("fg", col("fwd.c_us") - col("t"))
        .withColumn("best", when(col("back").isNull, col("fwd"))
          .when(col("fwd").isNull, col("back"))
          .when(col("bg") <= col("fg"), col("back")).otherwise(col("fwd")))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("best.click_id").as("click_id"),
          abs(col("t") - col("best.c_us")).as("abs_gap_us"))
        .orderBy("purchase_id")
    }),

    // Range-clustered layout — the ORDER BY table property every
    // warehouse applies to its hot predicate column: repartitionByRange
    // + sortWithinPartitions writes files whose l_shipdate ranges are
    // pairwise disjoint (range partitioning guarantees partition i's
    // keys <= partition i+1's whatever the sampled boundaries), so a
    // date-band read skips whole files on parquet min/max stats before
    // a single row group decompresses — the complement of partition
    // pruning (scan_multifile_layout) and bloom skipping
    // (sink_bloom_rowgroup) in the layout family. Oracle = the band
    // aggregate off the unclustered original (layout must not change
    // results); Round12Spec reads the per-file min/max back and asserts
    // the disjointness that makes skipping effective.
    "sink_range_clustered" -> ((s, d) => {
      val dir = rangeClusteredLayout(s, d)
      s.read.parquet(dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-06-01")) &&
          col("l_shipdate") < to_timestamp(lit("1995-09-01")))
        .agg(count(lit(1)).as("n"), money(sum(col("price"))).as("revenue"))
    }),

    // RESTORE — roll a table back by committing an OLD snapshot as the
    // NEW current version (Delta's RESTORE TABLE ... TO VERSION):
    // history is append-only, so the bad version stays inspectable for
    // forensics while every reader's "current" is the restored state.
    // v0 = pre-1997 orders, v1 = a "bad load" (everything, prices
    // doubled), v2 = RESTORE of v0. The oracle recomputes all three —
    // v2's rows must equal v0's exactly, and v1 must still carry the
    // bad data (restore is a new commit, not a rewrite of history).
    "table_restore_version" -> ((s, d) => {
      val dir = s"target/tmp/grestore_${new java.io.File(d).getName}"
      GraftTable.fsOf(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
      val o = t(s, d, "orders").select(col("o_orderkey"),
        dec(col("o_totalprice")).as("price"), col("o_orderdate"))
      GraftTable.commitNext(s, dir,
        o.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
          .drop("o_orderdate"), "good load")
      GraftTable.commitNextIsolated(s, dir,
        o.select(col("o_orderkey"), (col("price") * 2).as("price")),
        "bad load: doubled prices")
      // a RESTORE is a declared schema rewind: v1's widened price
      // (decimal(14,2) from the ×2) narrows back to v0's (12,2), which
      // the round-14 write gate rightly refuses without the declaration
      GraftTable.commitNextIsolated(s, dir,
        GraftTable.readVersion(s, dir, 0), "restore to version 0",
        allowEvolution = true)
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), money(sum(col("price"))).as("sum_price"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_price"))
      snap(0).unionByName(snap(1)).unionByName(snap(2)).orderBy("version")
    }),

    // Higher-order MAP functions (transform_keys / transform_values /
    // map_filter / map_zip_with) — the map analog of fn_lambda_pack's
    // array coverage, codegen-friendly, no explode shuffle. The map is
    // built from three deterministic scalars so the oracle recomputes
    // every output closed-form; entry serialization sorts by key so the
    // result is hash-stable regardless of map iteration order.
    "fn_map_ho_pack" -> ((s, d) => {
      val e = graft.T.events(s, d)
        .withColumn("kv", get_json_object(col("props"), "$.k").cast(IntegerType))
        .withColumn("m", map(
          lit("k"), col("kv"),
          lit("u"), (col("user_id") % 100).cast(IntegerType),
          lit("e"), length(col("event_type"))))
      e.select(col("event_id"),
          concat_ws(",", array_sort(transform(
            map_entries(expr("transform_values(m, (k, v) -> v * 2)")),
            x => concat(x("key"), lit(":"), x("value"))))).as("doubled"),
          concat_ws(",", array_sort(map_keys(
            expr("transform_keys(m, (k, v) -> concat('p_', k))")))).as("pkeys"),
          size(expr("map_filter(m, (k, v) -> v % 2 = 0)")).as("n_even"),
          expr("aggregate(map_values(map_zip_with(m, " +
            "transform_values(m, (k, v) -> v * 2), (k, v1, v2) -> v1 + v2)), " +
            "0, (a, x) -> a + x)").as("zip_sum"))
        .orderBy("event_id")
    }),

    // t2=N (rows-only): the AUDIO modality — synthetic-but-genuine WAV
    // payloads (RIFF/WAVE header + PCM16LE frames around an
    // integer-deterministic sawtooth) decoded through the REAL JDK
    // javax.sound.sampled codec, then 256-sample frame RMS energy, peak
    // frame and mean loudness per document, all partition-batched. No
    // SQL oracle can run a WAV codec; Round12Spec recomputes every
    // feature closed-form from the waveform definition without touching
    // the codec, so the decode path is pinned end to end. Completes the
    // image (PNG codec) / video (frame sampling) / audio modality
    // coverage of the binary-column family.
    "mm_audio_energy" -> ((s, d) =>
      Multimodal.audioEnergyPipeline(s, d).orderBy("doc_id")),

    // SemDeDup-style semantic deduplication: the embedding-space analog
    // of text_dedup_keep_best. Vectors are assigned to their nearest
    // TRAINED centroid — Round13Ops.semanticAssignTrained runs
    // kmeansTrain's Lloyd loop in oracle-mirrorable exact-integer
    // arithmetic, with the codebook size k = ceil(√n) scaling with the
    // corpus (within-cluster pair cost Σ(n/k)² needs k growing with n;
    // Round13Spec pins the realized max cluster size) — and WITHIN each
    // cluster a vector is a duplicate iff a LOWER-ID neighbor sits at
    // cosine >= 0.35 (Round13Spec pins every within-cluster pair's
    // cosine ≥ 1e-6 away from the threshold, so the float boundary
    // cannot flip a pair between engines); the kept representative
    // pointer is the minimum such neighbor (one-hop, as in SemDeDup —
    // reps are the members with no lower near-neighbor). Pair
    // comparison is cluster-scoped, never corpus-wide: at 100 TB the
    // candidate join fans out only within buckets, the same restriction
    // the IVF/LSH families use. One persist because the self-join reads
    // the assignment twice.
    "vec_semantic_dedup" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      val assign = Round13Ops.semanticAssignTrained(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dups = assign.as("a").join(assign.as("b"),
          col("a.cid") === col("b.cid") &&
            col("b.vec_id") < col("a.vec_id") &&
            expr("graft_cosine(a.embedding, b.embedding)") >= 0.35)
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(min(col("b.vec_id")).as("rep0"))
      assign.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          col("rep0").isNotNull.as("is_dup"),
          coalesce(col("rep0"), col("vec_id")).as("rep"))
        .orderBy("vec_id")
    }),

    // Deequ-style expectation suite — the validation gate a pipeline
    // runs before publishing a table: six rules (key completeness, key
    // uniqueness, value range, value-set membership, column
    // completeness, referential integrity against the customer dim) as
    // ONE aggregation pass over orders plus one broadcast anti-join for
    // the RI rule; the per-rule report rows explode out of the single
    // combined row, so rule count never multiplies scans. At 100 TB
    // this is one pass over the fact table regardless of how many
    // single-column rules the suite carries.
    "dq_expectation_suite" -> ((s, d) => {
      val o = t(s, d, "orders")
      val basic = o.agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("nk"),
        countDistinct(col("o_orderkey")).as("ndk"),
        sum(when(col("o_totalprice") <= 0 || col("o_totalprice") > 1e7, 1L)
          .otherwise(0L)).as("range_viol"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("set_viol"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("date_nulls"))
      val ri = o.join(
          broadcast(t(s, d, "customer").select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("ri_viol"))
      basic.crossJoin(ri).select(explode(array(
          struct(lit("custkey_ri").as("rule"), col("ri_viol").as("violations")),
          struct(lit("date_complete").as("rule"), col("date_nulls").as("violations")),
          struct(lit("key_not_null").as("rule"), (col("n") - col("nk")).as("violations")),
          struct(lit("key_unique").as("rule"), (col("nk") - col("ndk")).as("violations")),
          struct(lit("price_in_range").as("rule"), col("range_viol").as("violations")),
          struct(lit("status_in_set").as("rule"), col("set_viol").as("violations"))
        )).as("r"))
        .select(col("r.rule"), col("r.violations"),
          (col("r.violations") === 0).as("pass"))
        .orderBy("rule")
    }),

    // Multi-file base-table scan: lineitem rewritten as a ship-month
    // partitioned layout (~84 directories; repartition by the partition
    // column first — one file per month, the small-files discipline every
    // partitioned sink in the suite follows), then a year's report over
    // it. The month predicate is a PARTITION filter (pruned at planning
    // from the file index — 12 of ~84 directories ever listed into the
    // scan), the quantity predicate pushes into the parquet reader, and
    // the aggregate is the standard two-phase hash shape. Oracled
    // against the single-file original: layout must not change results.
    // At 100 TB partition pruning is THE difference between reading 12
    // months and reading the lake.
    "scan_multifile_layout" -> ((s, d) => {
      multifileScan(s, multifileLayout(s, d))
    })
  )

  /** Write the range-clustered lineitem layout; returns its path.
    * Factored out so Round12Spec can audit per-file min/max
    * disjointness on the same files the key reads. */
  private[graft] def rangeClusteredLayout(s: SparkSession, d: String): String = {
    val dir = s"target/tmp/rangeclust_${new java.io.File(d).getName}"
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        dec(col("l_extendedprice")).as("price"))
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Write the month-partitioned lineitem fixture; returns its path.
    * Factored out so Round12Spec can audit the served plan and the
    * file-index size without re-stating the layout. */
  private[graft] def multifileLayout(s: SparkSession, d: String): String = {
    val dir = s"target/tmp/multifile_${new java.io.File(d).getName}"
    t(s, d, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .repartition(col("ship_month"))
      .write.partitionBy("ship_month").mode("overwrite").parquet(dir)
    dir
  }

  /** The partition-pruned, filter-pushed report over the layout. */
  private[graft] def multifileScan(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .filter(col("ship_month") >= "1995-01" && col("ship_month") <= "1995-12" &&
        col("l_quantity") < 25)
      .groupBy("ship_month")
      .agg(count(lit(1)).as("n"),
        money(sum(dec(col("l_extendedprice")))).as("revenue"))
      .orderBy("ship_month")

  val oracleSql: Map[String, String] = Map(
    // Both versions recomputed from the raw tables: v0 = the base
    // snapshot untouched, v1 = the SCD1-merged state.
    "table_merge_upsert" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal FROM customer), " +
        "chg AS (SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 10000000 " +
        s"ELSE o_custkey END AS ckey, SUM(${oDec("o_totalprice")}) AS delta " +
        "FROM orders GROUP BY 1) " +
        s"SELECT 0 AS version, key, ${oMoney("bal")} AS bal FROM base " +
        "UNION ALL " +
        "SELECT 1 AS version, COALESCE(key, ckey) AS key, " +
        s"${oMoney("COALESCE(bal, 0) + COALESCE(delta, 0)")} AS bal " +
        "FROM base FULL JOIN chg ON key = ckey " +
        "ORDER BY version, key"),

    // Row identity across compaction: both versions equal the raw
    // recompute.
    "table_compact_version" -> {
      val row = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS sum_price FROM orders"
      s"SELECT 0 AS version, $row UNION ALL SELECT 1 AS version, $row ORDER BY version"
    },

    // Each version's delta = exactly its appended date band.
    "table_cdc_changes" -> {
      def band(v: Int, pred: String) =
        s"SELECT $v AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS sum_price " +
          s"FROM orders WHERE $pred"
      band(0, "o_orderdate < TIMESTAMP '1996-01-01'") + " UNION ALL " +
        band(1, "o_orderdate >= TIMESTAMP '1996-01-01' AND " +
          "o_orderdate < TIMESTAMP '1997-01-01'") + " UNION ALL " +
        band(2, "o_orderdate >= TIMESTAMP '1997-01-01'") + " ORDER BY version"
    },

    // v1 dropped EXACTLY the predicate's rows; v0 still carries them.
    "table_delete_rows" -> {
      def snap(v: Int, pred: String) =
        s"SELECT $v AS version, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
          s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS sum_price " +
          s"FROM orders $pred GROUP BY o_orderstatus"
      snap(0, "") + " UNION ALL " +
        snap(1, "WHERE o_orderstatus <> 'F'") +
        " ORDER BY version, o_orderstatus"
    },

    // N delta-maintenance runs must equal the one-shot recompute.
    "table_cdc_maintain_agg" ->
      ("SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ym, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS gmv " +
        "FROM orders GROUP BY 1 ORDER BY ym"),

    // Old version reads with NULL backfill for the added column; both
    // versions' own data unchanged.
    "table_schema_evolution" -> {
      val sp = oMoney(s"SUM(${oDec("o_totalprice")})")
      "SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(0 AS BIGINT) AS n_priority, $sp AS sum_price FROM orders " +
        "UNION ALL " +
        "SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(COUNT(o_orderpriority) AS BIGINT) AS n_priority, $sp AS sum_price " +
        "FROM orders ORDER BY version"
    },

    // Every stage of the version history recomputed as chained CTEs.
    "etl_lakehouse_pipeline" -> {
      val snap = (v: Int, src: String) =>
        s"SELECT $v AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          s"${oMoney("SUM(bal)")} AS total_bal FROM $src"
      s"WITH b0 AS (SELECT o_custkey AS key, SUM(${oDec("o_totalprice")}) AS bal " +
        "FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1), " +
        s"chg AS (SELECT o_custkey AS ckey, SUM(${oDec("o_totalprice")}) AS delta " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1), " +
        "b1 AS (SELECT COALESCE(key, ckey) AS key, " +
        "COALESCE(bal, 0) + COALESCE(delta, 0) AS bal " +
        "FROM b0 FULL JOIN chg ON key = ckey), " +
        "b2 AS (SELECT * FROM b1 WHERE bal >= 50000) " +
        snap(0, "b0") + " UNION ALL " + snap(1, "b1") + " UNION ALL " +
        snap(2, "b2") + " UNION ALL " + snap(3, "b2") + " ORDER BY version"
    },

    // Each event belongs to 4 sliding windows (stream_sliding_1h_15m's
    // expansion), distinct users per window.
    "agg_sliding_distinct_users" ->
      ("WITH x AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) " +
        "- i * INTERVAL '15 minutes' AS ws, user_id " +
        "FROM events, unnest(generate_series(0, 3)) AS t(i)) " +
        "SELECT ws, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY ws ORDER BY ws"),

    // Deliberately the naive quadratic candidate join — the exactness
    // oracle for the merged-window O(n log n) plan. Tie order: smaller
    // |Δ| first, then the earlier (backward) click, then click_id DESC
    // among backward / ASC among forward — matching the running
    // max/min struct argmins.
    "join_asof_nearest" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us " +
        "FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT event_id AS click_id, user_id AS c_user, epoch_us(ts) AS c_us " +
        "FROM events WHERE event_type = 'click'), " +
        "j AS (SELECT purchase_id, user_id, click_id, ABS(p_us - c_us) AS abs_gap_us, " +
        "ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY ABS(p_us - c_us) ASC, " +
        "c_us ASC, CASE WHEN c_us <= p_us THEN -click_id ELSE click_id END ASC) AS rn " +
        "FROM p JOIN c ON user_id = c_user) " +
        "SELECT purchase_id, user_id, click_id, abs_gap_us FROM j WHERE rn = 1 " +
        "ORDER BY purchase_id"),

    // The clustered layout must serve the same band aggregate as the
    // unclustered original.
    "sink_range_clustered" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01' " +
        "AND l_shipdate < TIMESTAMP '1995-09-01'"),

    // v2 ≡ v0 exactly; v1 still carries the bad (doubled) state.
    "table_restore_version" -> {
      val good = s"SELECT COUNT(*), ${oMoney(s"SUM(${oDec("o_totalprice")})")} " +
        "FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'"
      s"SELECT 0 AS version, CAST(n AS BIGINT) AS n_rows, s AS sum_price FROM ($good) t0(n, s) " +
        "UNION ALL " +
        "SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"${oMoney(s"SUM(2 * ${oDec("o_totalprice")})")} AS sum_price FROM orders " +
        "UNION ALL " +
        s"SELECT 2 AS version, CAST(n AS BIGINT) AS n_rows, s AS sum_price FROM ($good) t2(n, s) " +
        "ORDER BY version"
    },

    // The three map entries recomputed from their source scalars; the
    // sorted-entry serialization orders e < k < u lexicographically.
    "fn_map_ho_pack" ->
      ("WITH src AS (SELECT event_id, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS k, " +
        "CAST(user_id % 100 AS INT) AS u, " +
        "CAST(length(event_type) AS INT) AS e FROM events) " +
        "SELECT event_id, " +
        "'e:' || (2 * e) || ',k:' || (2 * k) || ',u:' || (2 * u) AS doubled, " +
        "'p_e,p_k,p_u' AS pkeys, " +
        "CAST((CASE WHEN e % 2 = 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS INT) AS n_even, " +
        "CAST(3 * (e + k + u) AS INT) AS zip_sum " +
        "FROM src ORDER BY event_id"),

    // Same clustering as vec_neardup_pairs' oracle; the drop rule is the
    // lower-id near-neighbor existence, the rep the min such neighbor.
    // Replays the identical exact-integer Lloyd training
    // (Round13Ops.semanticAssignOracleCtes) before the cluster-scoped
    // pair rule — the hash check covers the trained codebook, the
    // assignment AND the dedup decision.
    "vec_semantic_dedup" ->
      (s"WITH ${Round13Ops.semanticAssignOracleCtes}, " +
        "d AS (SELECT a.vec_id, MIN(b.vec_id) AS rep0 FROM af a JOIN af b " +
        "ON a.cid = b.cid AND b.vec_id < a.vec_id " +
        "AND list_cosine_similarity(a.emb, b.emb) >= 0.35 GROUP BY 1) " +
        "SELECT a.vec_id AS vec_id, a.cid, d.rep0 IS NOT NULL AS is_dup, " +
        "COALESCE(d.rep0, a.vec_id) AS rep " +
        "FROM af a LEFT JOIN d ON a.vec_id = d.vec_id ORDER BY a.vec_id"),

    "dq_expectation_suite" ->
      ("WITH b AS (SELECT COUNT(*) AS n, COUNT(o_orderkey) AS nk, " +
        "COUNT(DISTINCT o_orderkey) AS ndk, " +
        "SUM(CASE WHEN o_totalprice <= 0 OR o_totalprice > 10000000 THEN 1 ELSE 0 END) AS range_viol, " +
        "SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS set_viol, " +
        "SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS date_nulls FROM orders), " +
        "ri AS (SELECT COUNT(*) AS ri_viol FROM orders o LEFT JOIN customer c " +
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL), " +
        "rules AS (" +
        "SELECT 'custkey_ri' AS rule, CAST(ri_viol AS BIGINT) AS violations FROM ri " +
        "UNION ALL SELECT 'date_complete', CAST(date_nulls AS BIGINT) FROM b " +
        "UNION ALL SELECT 'key_not_null', CAST(n - nk AS BIGINT) FROM b " +
        "UNION ALL SELECT 'key_unique', CAST(nk - ndk AS BIGINT) FROM b " +
        "UNION ALL SELECT 'price_in_range', CAST(range_viol AS BIGINT) FROM b " +
        "UNION ALL SELECT 'status_in_set', CAST(set_viol AS BIGINT) FROM b) " +
        "SELECT rule, violations, violations = 0 AS pass FROM rules ORDER BY rule"),

    // The layout must not change results: same report straight off the
    // single-file lineitem.
    "scan_multifile_layout" ->
      ("WITH m AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, " +
        "l_quantity, l_extendedprice FROM lineitem) " +
        "SELECT ship_month, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS revenue " +
        "FROM m WHERE ship_month >= '1995-01' AND ship_month <= '1995-12' " +
        "AND l_quantity < 25 " +
        "GROUP BY ship_month ORDER BY ship_month")
  )
}
