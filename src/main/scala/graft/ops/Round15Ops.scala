package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T.{t, dec, money, oDec, oMoney}
import graft.sources.GraftTable

/** Round-15 additions — the versioned store becomes a REAL Spark table
  * (DataSource V2) and its remaining DML/operational gaps close:
  *
  *  - `table_dsv2_read` — `spark.read.format("graft")` serves the
  *    manifest-resolved snapshot, and `option("version", n)` time
  *    travel serves an older one, both byte-identical to the API read
  *    path (Round15Spec additionally audits the catalog door: SQL
  *    `VERSION AS OF` / `TIMESTAMP AS OF` / CREATE / DROP).
  *
  *  - `table_dsv2_prune` — a pushed date band on a statenc-declared
  *    column prunes files INSIDE the DSv2 scan (planned-file audit in
  *    Round15Spec); this key pins that the pruned read is row-exact —
  *    skipping must never change results.
  *
  *  - `table_dsv2_stats_join` — the scan reports manifest-truth
  *    statistics (SupportsReportStatistics): joining the pruned slice
  *    against lineitem broadcasts the slice at initial planning time
  *    (plan audit in Round15Spec); this key pins the join's rows.
  */
object Round15Ops {

  private def freshDir(s: SparkSession, d: String, tag: String): String =
    graft.T.freshDir(s, d, tag)

  /** Two-version nation fixture the DSv2 read key serves: v0 = the
    * sub-10 slice, v1 = all nations. */
  private def dsv2ReadFixture(s: SparkSession, d: String): String = {
    val dir = freshDir(s, d, "dsv2read")
    val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
    GraftTable.commitNextIsolated(s, dir,
      n.where(col("n_nationkey") < 10), "v0: sub-10 slice")
    GraftTable.commitNextIsolated(s, dir, n, "v1: all nations")
    dir
  }

  /** Date-clustered orders fixture with a REGISTRY-declared stats
    * encoding (statenc=us), so the DSv2 scan can re-encode pushed date
    * literals and band-prune files from the manifest. 4 tight ranges —
    * the June 1995 band below keeps ~1 of 4 files. */
  private[graft] def dsv2BandFixture(s: SparkSession, d: String): String = {
    val dir = freshDir(s, d, "dsv2band")
    val o = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        money(dec(col("o_totalprice"))).as("price"))
      .repartitionByRange(4, col("o_orderdate"), col("o_orderkey"))
      .sortWithinPartitions("o_orderdate")
    GraftTable.commitNextIsolated(s, dir, o, "date-clustered",
      statsEnc = Seq("o_orderdate" -> "us"))
    dir
  }

  /** The U/I/D changelog `table_merge_sql` merges — the SAME derivation
    * `Round14Ops.mergeFixture` resolves through the API, so the two
    * merge doors share `oMergeCtes` as their oracle twin. */
  private def mergeSource(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy("o_custkey")
      .agg(sum(dec(col("o_totalprice"))).as("delta"))
      .select(
        when(col("o_custkey") % 10 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("ckey"),
        when(col("o_custkey") % 10 === 3, lit("D"))
          .when(col("o_custkey") % 10 === 0, lit("I"))
          .otherwise(lit("U")).as("op"),
        col("delta"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SQL MERGE INTO through the DSv2 door: the exact three-arm
    // changelog `table_merge_full` resolves through the API, driven
    // from MERGE TEXT — matched-D deletes, matched-U adds the delta,
    // unmatched-I inserts under fresh keys, and the guard keeps
    // unmatched D rows out. One full-outer resolve (plan-audited in
    // Round15Spec), committed as the next version; v0 must still serve
    // every pre-merge key (snapshot isolation inside the hash).
    "table_merge_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "mergesql")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
      GraftTable.commitNextIsolated(s, dir, base, "base")
      s.conf.set("spark.sql.catalog.gt15",
        classOf[graft.sources.GraftCatalog].getName)
      mergeSource(s, d).createOrReplaceTempView("r15_merge_src")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(
        s"""MERGE INTO gt15.`$abs` t USING r15_merge_src s ON t.key = s.ckey
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.delta
           |WHEN NOT MATCHED AND s.op <> 'D' THEN
           |  INSERT (key, bal) VALUES (s.ckey, s.delta)
           |""".stripMargin)
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("key"),
            money(col("bal")).as("bal"))
      snap(0).unionByName(snap(1)).orderBy("version", "key")
    }),

    // DataSource V2 read + time travel: the same two snapshots
    // table_time_travel pins through the API, served through
    // spark.read.format("graft") — current resolves v1, option
    // version=0 resolves the slice. A DSv2 table that mixed up the
    // manifest resolution (or dropped the version option) changes the
    // version-0 rows and hash-mismatches.
    "table_dsv2_read" -> ((s, d) => {
      val dir = dsv2ReadFixture(s, d)
      def snap(v: Option[Int]): DataFrame = {
        val r = s.read.format("graft")
        val df = v.fold(r)(n => r.option("version", n)).load(dir)
        df.select(lit(v.getOrElse(1)).as("version"),
          col("n_nationkey"), col("n_name"))
      }
      snap(Some(0)).unionByName(snap(None))
        .orderBy("version", "n_nationkey")
    }),

    // Manifest-pruned DSv2 scan: the June-1995 band plans a strict
    // subset of the files (Round15Spec's planned-file audit) and must
    // still return EXACTLY the band's rows — file skipping is an
    // optimization, never semantics.
    "table_dsv2_prune" -> ((s, d) => {
      val dir = dsv2BandFixture(s, d)
      s.read.format("graft").load(dir)
        .where(col("o_orderdate") >= lit("1995-06-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1995-07-01").cast("timestamp_ntz"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), money(sum(dec(col("price")))).as("rev"))
        .orderBy("o_custkey")
    }),

    // DSv2 WRITE door: save() to an empty dir mints v0, mode("append")
    // commits an append version (marker pinned in Round15Spec, plus
    // schema-gate/constraint refusals and INSERT INTO), overwrite
    // replaces. All three snapshots inside the hash — a write that
    // missed the manifest (or an append that rewrote the base) flips
    // version rows here.
    "table_dsv2_write" -> ((s, d) => {
      val dir = freshDir(s, d, "dsv2write")
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      // Spark's catalog-less V2 save supports Append/Overwrite only —
      // the first append to an empty dir IS the create (mints v0)
      n.where(col("n_nationkey") < 10).write.format("graft")
        .mode("append").save(dir)
      n.where(col("n_nationkey") >= 10).write.format("graft")
        .mode("append").save(dir)
      n.where(col("n_nationkey") < 5).write.format("graft")
        .mode("overwrite").save(dir)
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("n_nationkey"), col("n_name"))
      snap(0).unionByName(snap(1)).unionByName(snap(2))
        .orderBy("version", "n_nationkey")
    }),

    // STREAMING DSv2 door: readStream.format("graft") follows the
    // manifest — v0's snapshot plus each append's marker dir, in
    // bounded admission-controlled batches (2 versions/trigger here:
    // 3 versions drain in exactly 2 batches, pinned inside the hash;
    // Round15Spec adds restart-exactly-once and the rewrite refusal).
    // Every streamed row rides the hash via the parquet sink — the
    // production path: each micro-batch lands distributed (no driver
    // collect), tagged with its batch id so the read-back can count
    // distinct non-empty batches. A dropped or double-emitted version
    // flips the sums; over/under-split admission flips n_batches.
    "table_dsv2_stream" -> ((s, d) => {
      val dir = freshDir(s, d, "dsv2stream")
      val cp = freshDir(s, d, "dsv2streamcp")
      val sink = freshDir(s, d, "dsv2streamsink")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), money(dec(col("o_totalprice"))).as("price"))
      GraftTable.commitNextIsolated(s, dir,
        o.where(pmod(col("o_orderkey"), lit(3)) === 0), "v0")
      GraftTable.commitAppend(s, dir,
        o.where(pmod(col("o_orderkey"), lit(3)) === 1), "tick 1")
      GraftTable.commitAppend(s, dir,
        o.where(pmod(col("o_orderkey"), lit(3)) === 2), "tick 2")
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 2).load(dir)
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           bid: Long) =>
            // IDEMPOTENT per batch id (ADVICE r19): a retried micro-batch
            // OVERWRITES its own batch-id-named subdirectory instead of
            // double-appending after a partial write; the read-back
            // recovers batch_id via partition discovery on the dir names
            b.write.mode("overwrite").parquet(s"$sink/batch_id=$bid")
            ()
        }.start()
      q.awaitTermination()
      val got = s.read.parquet(sink)
      val nb = got.agg(countDistinct(col("batch_id")).as("n_batches"))
      got.groupBy(pmod(col("o_orderkey"), lit(3)).cast("int").as("slice"))
        .agg(count(lit(1)).as("n"), money(sum(dec(col("price")))).as("rev"))
        .crossJoin(nb)
        .orderBy("slice")
    }),

    // DISJOINT-WRITE OCC (WriteSerializable): two latched writers
    // rewrite disjoint partition sets of a partition-mapped table; the
    // race loser re-commits its ALREADY-STAGED result (n_evals = 2 —
    // exactly one transform evaluation per writer, pinned inside the
    // hash; a blind full-snapshot re-publish would drop the winner's
    // bump and flip the rows; a commitWithRetry-style re-execution
    // would make n_evals 3). Final state is arrival-order-independent.
    // Round15Spec additionally pins the overlapping case re-executing
    // and the untouched partition keeping its original entry dir.
    "table_occ_partitions" -> ((s, d) => {
      val dir = freshDir(s, d, "occparts")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), money(dec(col("o_totalprice"))).as("price"))
        .withColumn("p", pmod(col("o_orderkey"), lit(4)).cast("string"))
      GraftTable.replacePartitionsWithRetry(s, dir, "p", _ => o, "base")
      val evals = new java.util.concurrent.atomic.AtomicInteger(0)
      val latch = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(parts: Seq[String], bump: Int): Thread = new Thread(() => {
        try {
          latch.await()
          GraftTable.replacePartitionsWithRetry(s, dir, "p", { snap =>
            evals.incrementAndGet()
            snap.get.filter(col("p").isin(parts: _*))
              .withColumn("price", col("price") + bump)
          }, s"bump $parts")
        } catch { case t: Throwable => errs.add(t) }
      })
      val (ta, tb) = (writer(Seq("0", "1"), 1000), writer(Seq("2"), 2000))
      ta.start(); tb.start(); latch.countDown(); ta.join(); tb.join()
      if (!errs.isEmpty) throw errs.peek()
      val nv = GraftTable.versions(GraftTable.fsOf(s, dir), dir).size
      GraftTable.read(s, dir)
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"), money(sum(dec(col("price")))).as("rev"))
        .withColumn("n_versions", lit(nv.toLong))
        .withColumn("n_evals", lit(evals.get().toLong))
        .orderBy("p")
    }),

    // Multi-column Bloom index, built and written EXECUTOR-side (the
    // driver never materializes a filter word — the 10⁴-file seam):
    // one sidecar section per column, probed independently. Layout is
    // ENVIRONMENT-DETERMINISTIC by construction: key-hash repartition +
    // a total in-partition order make the written files — and therefore
    // every Bloom bit — bit-identical anywhere (the former round-robin
    // repartition(6) depended on input split order, so a driver-side
    // red could never reproduce locally). The hash carries a
    // false-NEGATIVE witness per probe (truth rows the probe failed to
    // serve — 0 by the no-false-negative contract; a non-zero driver
    // value names the failing probe and dimension) and the FP-robust
    // n_absent count (the old absent_empty boolean hashed a
    // PROBABILISTIC property: a legitimate Bloom false positive on the
    // absent key flipped it with no bug anywhere — the row-level
    // re-filter keeps this count 0 even when a false positive opens
    // files; the empty-hit-set claim moved to Round15Spec where FP luck
    // is controlled).
    "table_bloom_multicol" -> ((s, d) => {
      val dir = freshDir(s, d, "mcbloom")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .repartition(6, pmod(col("o_orderkey"), lit(6)))
        .sortWithinPartitions("o_orderkey")
      GraftTable.commitNextIsolated(s, dir, o, "2-key index",
        bloomCols = Seq("o_custkey", "o_orderpriority"))
      val truth = GraftTable.read(s, dir)
      val ck = o.agg(min(col("o_custkey"))).head().getLong(0)
      val ckDf = GraftTable.readBloomEq(s, dir, 0, "o_custkey", ck)._1
        .where(col("o_custkey") === ck)
      val prDf = GraftTable
        .readBloomEq(s, dir, 0, "o_orderpriority", "1-URGENT")._1
        .where(col("o_orderpriority") === "1-URGENT")
      val missedCk = truth.where(col("o_custkey") === ck)
        .join(ckDf.select(col("o_orderkey").as("__k")),
          col("o_orderkey") === col("__k"), "left_anti")
      val missedPr = truth.where(col("o_orderpriority") === "1-URGENT")
        .join(prDf.select(col("o_orderkey").as("__k")),
          col("o_orderkey") === col("__k"), "left_anti")
      val absDf = GraftTable.readBloomEq(s, dir, 0, "o_custkey",
        java.lang.Long.valueOf(-977L))._1.where(col("o_custkey") === -977L)
      ckDf.agg(count(lit(1)).as("n_ck"), sum(col("o_orderkey")).as("sum_ck"))
        .crossJoin(prDf.agg(count(lit(1)).as("n_pri"),
          sum(col("o_orderkey")).as("sum_pri")))
        .crossJoin(missedCk.agg(count(lit(1)).as("n_missed_ck")))
        .crossJoin(missedPr.agg(count(lit(1)).as("n_missed_pri")))
        .crossJoin(absDf.agg(count(lit(1)).as("n_absent")))
    }),

    // MERGE-ON-READ UPDATE: one atomic commit = dir-scoped tombstones
    // for the matched rows + a replacement dir — no base file rewritten
    // (byte-identity pinned in Round15Spec, which also pins compose,
    // delete-after-update, the DSv2 read and the join-free typed CDF).
    // Both snapshots inside the hash: v0 must still serve the
    // pre-update balances (an update that mutated v0 in place — or a
    // tombstone that killed the replacement row too — flips rows here).
    "table_update_dv" -> ((s, d) => {
      val dir = freshDir(s, d, "updatedv")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
        .repartition(3)
      GraftTable.commitNextIsolated(s, dir, base, "base")
      GraftTable.commitUpdate(s, dir, Seq("key"),
        col("key") % 5 === 0, Seq("bal" -> (col("bal") * 2)),
        "double the fives")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("key"),
            money(col("bal")).as("bal"))
      snap(0).unionByName(snap(1)).orderBy("version", "key")
    }),

    // INCREMENTAL re-clustering (the liquid tier of OPTIMIZE): fold and
    // z-order only the arrival-order append tail; the clustered head
    // dir stays byte-identical (pinned in Round15Spec together with the
    // band-read file-count improvement). Inside the hash: the table's
    // rows across the operation (identity), the 2-dir layout, and the
    // improved flag — a tail fold that lost rows, touched the head, or
    // failed to tighten the tail's rectangles flips a column here.
    "table_recluster_tail" -> ((s, d) => {
      val dir = freshDir(s, d, "tailrecl")
      val us = GraftTable.StatsEnc.ordinal("us")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          money(dec(col("o_totalprice"))).as("price"))
      val cut = lit("1995-01-01").cast("timestamp_ntz")
      GraftTable.commitNextIsolated(s, dir,
        o.where(col("o_orderdate") < cut)
          .repartitionByRange(4, col("o_orderdate"), col("o_orderkey"))
          .sortWithinPartitions("o_orderdate"),
        "clustered head", statsEnc = Seq("o_orderdate" -> "us"))
      val late = o.where(col("o_orderdate") >= cut)
      GraftTable.commitAppend(s, dir,
        late.where(col("o_orderkey") % 2 === 0).repartition(4, col("o_orderkey")),
        "arrival A", statsEnc = Seq("o_orderdate" -> "us"))
      GraftTable.commitAppend(s, dir,
        late.where(col("o_orderkey") % 2 === 1).repartition(4, col("o_orderkey")),
        "arrival B", statsEnc = Seq("o_orderdate" -> "us"))
      val (loUs, hiUs) =
        (graft.T.epochUs("1996-03-01"), graft.T.epochUs("1996-03-31"))
      val hitBefore =
        GraftTable.readStatsBand(s, dir, 2, "o_orderdate", loUs, hiUs)._2.size
      GraftTable.compactChainTail(s, dir, targetFiles = 8,
        clusterBy = Seq("o_orderdate" -> us),
        statsEnc = Seq("o_orderdate" -> "us"))
      val fs = GraftTable.fsOf(s, dir)
      val nDirs = GraftTable.dataDirsOf(fs, dir, 3).size
      val (bandDf, hitPaths, _) =
        GraftTable.readStatsBand(s, dir, 3, "o_orderdate", loUs, hiUs)
      val bandLo = lit("1996-03-01").cast("timestamp_ntz")
      val bandHi = lit("1996-03-31").cast("timestamp_ntz")
      bandDf
        .where(col("o_orderdate") >= bandLo && col("o_orderdate") <= bandHi)
        .agg(count(lit(1)).as("n_band"),
          money(sum(dec(col("price")))).as("band_rev"))
      .crossJoin(
        GraftTable.read(s, dir)
          .agg(count(lit(1)).as("n_total"),
            money(sum(dec(col("price")))).as("total_rev")))
        .withColumn("n_dirs", lit(nDirs.toLong))
        .withColumn("improved", lit(hitPaths.size < hitBefore))
    }),

    // Manifest statistics drive the join: the pruned slice reports its
    // true (small) size, so it broadcasts against lineitem at initial
    // planning time; the joined revenue must match a plain SQL join.
    "table_dsv2_stats_join" -> ((s, d) => {
      val dir = dsv2BandFixture(s, d)
      val slice = s.read.format("graft").load(dir)
        .where(col("o_orderdate") >= lit("1995-06-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1995-07-01").cast("timestamp_ntz"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), dec(col("l_extendedprice")).as("xp"))
      li.join(slice, li("l_orderkey") === slice("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          money(sum(col("xp"))).as("line_rev"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    })
  )

  private val oJuneBand =
    "o_orderdate >= TIMESTAMP '1995-06-01' AND " +
      "o_orderdate < TIMESTAMP '1995-07-01'"

  val oracleSql: Map[String, String] = Map(
    // the SQL-merge door must land exactly where the API merge does:
    // same CTE chain as table_merge_full (base = v0, m = v1)
    "table_merge_sql" ->
      (s"WITH ${Round14Ops.oMergeCtes} " +
        s"SELECT 0 AS version, key, ${oMoney("bal")} AS bal FROM base " +
        s"UNION ALL SELECT 1 AS version, key, ${oMoney("bal")} AS bal FROM m " +
        "ORDER BY version, key"),

    // the three write-door snapshots recomputed raw
    "table_dsv2_write" ->
      ("SELECT 0 AS version, n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < 10 " +
        "UNION ALL SELECT 1 AS version, n_nationkey, n_name FROM nation " +
        "UNION ALL SELECT 2 AS version, n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < 5 ORDER BY version, n_nationkey"),

    // the streamed union tiles orders exactly; 2 batches pins the
    // admission control (1 = the limit ignored, 3+ = over-splitting)
    "table_dsv2_stream" ->
      ("SELECT CAST(o_orderkey % 3 AS INT) AS slice, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} AS rev, " +
        "CAST(2 AS BIGINT) AS n_batches FROM orders GROUP BY 1 " +
        "ORDER BY slice"),

    // sequential recompute of the commuting partition rewrites; 3
    // versions and 2 evaluations pin WriteSerializable (2 versions =
    // a lost write, 4+ = phantom commits, 3 evals = re-execution)
    "table_occ_partitions" ->
      ("SELECT CAST(o_orderkey % 4 AS VARCHAR) AS p, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))} + " +
          "CASE WHEN o_orderkey % 4 IN (0, 1) THEN 1000 " +
          "WHEN o_orderkey % 4 = 2 THEN 2000 ELSE 0 END)")} AS rev, " +
        "CAST(3 AS BIGINT) AS n_versions, CAST(2 AS BIGINT) AS n_evals " +
        "FROM orders GROUP BY 1 ORDER BY p"),

    // both point lookups recomputed raw; the witnesses are structural
    // zeros — n_missed_* by the Bloom no-false-negative contract,
    // n_absent because the row-level re-filter survives any false
    // positive on the never-held key
    "table_bloom_multicol" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders WHERE o_custkey = " +
        "(SELECT MIN(o_custkey) FROM orders)) AS BIGINT) AS n_ck, " +
        // CAST: DuckDB widens SUM(BIGINT) to HUGEINT (int128), which the
        // driver's hash path serializes differently from Spark's LongType
        // even when values are equal — the suite's only two uncast int
        // sums were its only two hash reds (VERDICT r17 root cause).
        "CAST((SELECT SUM(o_orderkey) FROM orders WHERE o_custkey = " +
        "(SELECT MIN(o_custkey) FROM orders)) AS BIGINT) AS sum_ck, " +
        "CAST((SELECT COUNT(*) FROM orders WHERE o_orderpriority = " +
        "'1-URGENT') AS BIGINT) AS n_pri, " +
        "CAST((SELECT SUM(o_orderkey) FROM orders WHERE o_orderpriority = " +
        "'1-URGENT') AS BIGINT) AS sum_pri, " +
        "CAST(0 AS BIGINT) AS n_missed_ck, " +
        "CAST(0 AS BIGINT) AS n_missed_pri, " +
        "CAST(0 AS BIGINT) AS n_absent"),

    // the band slice and the whole table, recomputed raw; n_dirs = 2
    // (head + folded tail) and improved = TRUE pin the incremental
    // layout effect
    "table_recluster_tail" ->
      ("SELECT " +
        "CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1996-03-01' AND o_orderdate <= TIMESTAMP '1996-03-31') " +
        "AS BIGINT) AS n_band, " +
        s"(SELECT ${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-03-01' AND " +
        "o_orderdate <= TIMESTAMP '1996-03-31') AS band_rev, " +
        "CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_total, " +
        s"(SELECT ${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} " +
        "FROM orders) AS total_rev, " +
        "CAST(2 AS BIGINT) AS n_dirs, TRUE AS improved"),

    // base twice: untouched at v0, CASE-doubled at v1 (decimal(12,2)
    // arithmetic is exact; money() finalizes both engines identically)
    "table_update_dv" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer) " +
        s"SELECT 0 AS version, key, ${oMoney("bal")} AS bal FROM base " +
        "UNION ALL SELECT 1 AS version, key, " +
        s"${oMoney(s"CAST(CASE WHEN key % 5 = 0 THEN bal * 2 ELSE bal END " +
          "AS DECIMAL(12,2))")} AS bal FROM base " +
        "ORDER BY version, key"),

    "table_dsv2_read" ->
      ("SELECT 0 AS version, n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < 10 " +
        "UNION ALL SELECT 1 AS version, n_nationkey, n_name FROM nation " +
        "ORDER BY version, n_nationkey"),

    "table_dsv2_prune" ->
      ("SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        s"${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} AS rev " +
        s"FROM orders WHERE $oJuneBand GROUP BY o_custkey ORDER BY o_custkey"),

    "table_dsv2_stats_join" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS line_rev, " +
        "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders " +
        s"FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        s"WHERE $oJuneBand")
  )
}
