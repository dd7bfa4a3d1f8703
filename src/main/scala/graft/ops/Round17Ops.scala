package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T.{t, dec, money, oDec, oMoney}
import graft.sources.GraftTable

/** Round-17 additions — SQL point DML reaches the layouts that matter
  * at 100 TB (the round-16 refusals become capabilities):
  *
  *  - `table_update_sql_indexed` / `table_delete_sql_indexed` — UPDATE /
  *    DELETE statements over a stats+bloom chain take the COPY-ON-WRITE
  *    arm: the survivors/updated snapshot commits with the skipping
  *    index re-derived from its self-described manifest declarations
  *    (the `table_merge_reindex` recipe), and the keys' hash surfaces
  *    resolve THROUGH the rebuilt index (band read + Bloom point probe)
  *    — an update that dropped the index errors, one that mis-indexed
  *    flips a value. Indexed tables are precisely the big tables where
  *    point DML matters; refusing them was the wrong trade.
  *
  *  - `table_update_sql_nested` — `UPDATE … SET s.f = expr` rebuilds the
  *    struct via `Column.withField` with SQL simultaneous-assignment
  *    semantics (every right-hand side reads the pre-update row); both
  *    snapshots ride the hash, so an update that mutated v0, lost the
  *    untouched sibling field, or double-applied flips rows.
  */
object Round17Ops {

  private def freshDir(s: SparkSession, d: String, tag: String): String =
    graft.T.freshDir(s, d, tag)

  private def withCatalog(s: SparkSession, name: String): Unit =
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)

  /** The indexed customer fixture both CoW DML keys rewrite: (key, bal)
    * under a registry stats line and a Bloom section on the key —
    * key-hash layout + total order, so the fixture is bit-deterministic
    * in any environment (the round-17 Bloom-key rule). */
  private def indexedBase(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
      .repartition(4, pmod(col("key"), lit(4)))
      .sortWithinPartitions("key")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SQL UPDATE over a stats+bloom chain: the copy-on-write arm
    // rewrites the snapshot and RE-INDEXES it (round 16 threw
    // IndexRedeclarationRequired here). The probe for an updated key
    // and the band aggregate both resolve THROUGH the rebuilt index —
    // readBloomEq/readStatsBand refuse outright if the commit dropped
    // it — and n_total pins that the rewrite lost nothing.
    "table_update_sql_indexed" -> ((s, d) => {
      val dir = freshDir(s, d, "updidx")
      val base = indexedBase(s, d)
      GraftTable.commitNextIsolated(s, dir, base, "indexed base",
        statsEnc = Seq("key" -> "id"), bloomCols = Seq("key"))
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"UPDATE gt17.`$abs` SET bal = bal * 2 WHERE key % 5 = 0")
      val pk = base.agg(min(when(col("key") % 5 === 0, col("key"))))
        .head().getLong(0)
      val pDf = GraftTable.readBloomEq(s, dir, 1, "key", pk)._1
        .where(col("key") === pk)
      val (band, _, _) = GraftTable.readStatsBand(s, dir, 1, "key", 1L, 100L)
      pDf.agg(count(lit(1)).as("n_probe"),
          money(sum(col("bal"))).as("probe_bal"))
        .crossJoin(band.where(col("key").between(1, 100))
          .agg(count(lit(1)).as("n_band"),
            money(sum(col("bal"))).as("band_bal")))
        .crossJoin(GraftTable.read(s, dir)
          .agg(count(lit(1)).as("n_total"),
            money(sum(col("bal"))).as("total_bal")))
    }),

    // SQL DELETE over the same chain: survivors rewrite + re-index
    // (round 16's IndexRedeclarationRequired becomes the capability).
    // Probes through the REBUILT index for a surviving key (found, with
    // its balance) and a deleted key (0 rows even if Bloom false
    // positives open a file — the row re-filter holds); the band and
    // n_total pin the survivor set exactly.
    "table_delete_sql_indexed" -> ((s, d) => {
      val dir = freshDir(s, d, "delidx")
      val base = indexedBase(s, d)
      GraftTable.commitNextIsolated(s, dir, base, "indexed base",
        statsEnc = Seq("key" -> "id"), bloomCols = Seq("key"))
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"DELETE FROM gt17.`$abs` WHERE key % 3 = 0")
      val aliveK = base.agg(min(when(col("key") % 3 =!= 0, col("key"))))
        .head().getLong(0)
      val deadK = base.agg(min(when(col("key") % 3 === 0, col("key"))))
        .head().getLong(0)
      val aliveDf = GraftTable.readBloomEq(s, dir, 1, "key", aliveK)._1
        .where(col("key") === aliveK)
      val deadDf = GraftTable.readBloomEq(s, dir, 1, "key", deadK)._1
        .where(col("key") === deadK)
      val (band, _, _) = GraftTable.readStatsBand(s, dir, 1, "key", 1L, 100L)
      aliveDf.agg(count(lit(1)).as("n_alive"),
          money(sum(col("bal"))).as("alive_bal"))
        .crossJoin(deadDf.agg(count(lit(1)).as("n_dead")))
        .crossJoin(band.where(col("key").between(1, 100))
          .agg(count(lit(1)).as("n_band"),
            money(sum(col("bal"))).as("band_bal")))
        .crossJoin(GraftTable.read(s, dir).agg(count(lit(1)).as("n_total")))
    }),

    // DSv2/SQL WRITES TO A partitionBy TABLE (round 16 refused both
    // modes): INSERT INTO through the catalog door appends — the flat
    // staged job re-lays out partitionBy-shaped from the recorded
    // columns and the commit carries the partby header — and the hash
    // reads back THROUGH the DSv2 door across the 2-dir partitioned
    // chain: identity plus one partition's slice (the pruning path).
    // n_versions pins the append (2 = head + one appended version).
    "table_dsv2_write_partby" -> ((s, d) => {
      val dir = freshDir(s, d, "pbwrite")
      // price stays DECIMAL in the store (determinism canon): the
      // read-back sums the FULL 150k-row table, and a stored
      // money-double there accumulates order-dependent error past the
      // 4dp grid at sf0.1 (round-21 sf0.1 Verify caught exactly this —
      // the only such full-table double-sum in the suite)
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          dec(col("o_totalprice")).as("price"),
          col("o_orderpriority").as("prio"))
      GraftTable.commitNextIsolated(s, dir,
        o.where(pmod(col("o_orderkey"), lit(3)) < 2), "partitioned head",
        partitionBy = Seq("prio"))
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      o.where(pmod(col("o_orderkey"), lit(3)) === 2)
        .createOrReplaceTempView("r17_pb_tail")
      s.sql(s"INSERT INTO gt17.`$abs` SELECT * FROM r17_pb_tail")
      val nv = GraftTable.versions(GraftTable.fsOf(s, dir), dir).size
      val tbl = s.read.format("graft").load(abs)
      tbl.agg(count(lit(1)).as("n_total"),
          money(sum(col("price"))).as("total_rev"))
        .crossJoin(tbl.where(col("prio") === "1-URGENT")
          .agg(count(lit(1)).as("n_urgent"),
            money(sum(col("price"))).as("urgent_rev")))
        .withColumn("n_versions", lit(nv.toLong))
    }),

    // MERGE WITH SCHEMA EVOLUTION (round 16 refused the clause): the
    // source carries a column the target lacks; the declared evolution
    // widens the schema via a metadata-only ADD COLUMN commit and the
    // star actions land the new values — matched rows take the source
    // tier, source-less rows backfill NULL, inserts carry theirs. The
    // whole post-merge snapshot is the hash surface.
    "table_merge_evolve" -> ((s, d) => {
      val dir = freshDir(s, d, "mergeevo")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
        .repartition(3, pmod(col("key"), lit(3)))
        .sortWithinPartitions("key")
      GraftTable.commitNextIsolated(s, dir, base, "pre-evolution base")
      withCatalog(s, "gt17")
      base.where(col("key") % 2 === 0)
        .select(col("key"),
          (col("bal") * 2).cast("decimal(12,2)").as("bal"),
          concat(lit("T"), pmod(col("key"), lit(3)).cast("string"))
            .as("tier"))
        .unionByName(base.where(col("key") % 10 === 3)
          .select((col("key") + 10000000L).as("key"), col("bal"),
            concat(lit("T"), pmod(col("key"), lit(3)).cast("string"))
              .as("tier")))
        .createOrReplaceTempView("r17_evo_src")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO gt17.`$abs` t
           |USING r17_evo_src s ON t.key = s.key
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      GraftTable.read(s, dir)
        .select(col("key"), money(col("bal")).as("bal"), col("tier"))
        .orderBy("key")
    }),

    // METADATA-ONLY SQL RENAME COLUMN across a MULTI-dir append chain:
    // the files keep their physical names; a colmap= header serves them
    // under the new one through every door. The hash reads the whole
    // chain under the NEW name via the API read (which must bind the
    // physical request schema, never infer) and rides one aggregate
    // through the SQL/DSv2 door with a pushed filter ON THE RENAMED
    // column — a scan that failed to rewrite the pushdown to the
    // physical name reads zero rows there and flips the constants.
    "table_alter_rename_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "renamecol")
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
      GraftTable.commitNextIsolated(s, dir,
        c.where(col("key") % 2 === 0)
          .repartition(2, pmod(col("key"), lit(2)))
          .sortWithinPartitions("key"), "evens")
      GraftTable.commitAppend(s, dir,
        c.where(col("key") % 2 === 1)
          .repartition(2, pmod(col("key"), lit(2)))
          .sortWithinPartitions("key"), "odds")
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"ALTER TABLE gt17.`$abs` RENAME COLUMN bal TO balance")
      val agg = s.sql(
        s"SELECT CAST(COUNT(*) AS BIGINT) AS n_big, " +
          s"CAST(SUM(key) AS BIGINT) AS key_big FROM gt17.`$abs` " +
          "WHERE balance > 5000")
      GraftTable.read(s, dir)
        .select(col("key"), money(col("balance")).as("balance"))
        .crossJoin(broadcast(agg))
        .orderBy("key")
    }),

    // METADATA-ONLY SQL DROP COLUMN: the schema narrows, no file is
    // touched (the bytes stay; declared-schema-bound readers never
    // request them). The hash is the narrowed table through the SQL
    // door — an inference-based read would resurrect the dropped
    // column and flip the schema.
    "table_alter_drop_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "dropcol")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), money(dec(col("o_totalprice"))).as("price"),
          col("o_orderpriority").as("junk"))
        .repartition(3, pmod(col("o_orderkey"), lit(3)))
        .sortWithinPartitions("o_orderkey")
      GraftTable.commitNextIsolated(s, dir, o, "wide base")
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"ALTER TABLE gt17.`$abs` DROP COLUMN junk")
      s.sql(s"SELECT * FROM gt17.`$abs` ORDER BY o_orderkey")
    }),

    // NATIVE Update-mode streaming write (round 16's door was
    // Append-only): a stateful aggregation streams its CHANGED groups
    // per epoch into the sink, which folds them in MERGE-ON-READ by the
    // declared upsert keys — each epoch is dir-scoped tombstones + the
    // staged replacements, O(batch + dv), no snapshot rewrite. The hash
    // is the batch fixpoint (the sink must equal the one-shot batch
    // aggregate) plus n_versions = one sink version per source epoch —
    // a dropped epoch, a double-applied replay, or a resurrected old
    // image all flip rows here.
    "table_stream_write_update" -> ((s, d) => {
      val src = freshDir(s, d, "uwsrc")
      val sink = freshDir(s, d, "uwsink")
      val ckpt = freshDir(s, d, "uwckpt")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        dec(col("o_totalprice")).as("price"))
      GraftTable.commitNextIsolated(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 0), "chunk 0")
      GraftTable.commitAppend(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 1), "chunk 1")
      GraftTable.commitAppend(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 2), "chunk 2")
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 1)
        .load(new java.io.File(src).getAbsolutePath)
        .groupBy("o_custkey")
        .agg(sum(col("price")).as("total"), count(lit(1)).as("n_orders"))
        .writeStream.format("graft")
        .outputMode("update")
        .option("path", new java.io.File(sink).getAbsolutePath)
        .option("upsertKeys", "o_custkey")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val nv = GraftTable.versions(GraftTable.fsOf(s, sink), sink).size
      GraftTable.read(s, sink)
        .select(col("o_custkey"), money(col("total")).as("total"),
          col("n_orders"), lit(nv.toLong).as("n_versions"))
        .orderBy("o_custkey")
    }),

    // NESTED-FIELD SQL UPDATE: `SET s.bal = s.bal * 2` rebuilds the
    // struct around the assigned field (withField), the sibling field
    // rides untouched, and the right-hand side reads the PRE-update
    // struct. Both snapshots inside the hash — v0 must still serve the
    // original balances, the head the doubled ones with segs intact.
    "table_update_sql_nested" -> ((s, d) => {
      val dir = freshDir(s, d, "updnest")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"),
          struct(dec(col("c_acctbal")).as("bal"),
            col("c_mktsegment").as("seg")).as("s"))
        .repartition(3, pmod(col("key"), lit(3)))
      GraftTable.commitNextIsolated(s, dir, base, "struct base")
      withCatalog(s, "gt17")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"UPDATE gt17.`$abs` SET s.bal = s.bal * 2 WHERE key % 5 = 0")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("key"),
            money(col("s.bal")).as("bal"), col("s.seg").as("seg"))
      snap(0).unionByName(snap(1)).orderBy("version", "key")
    }),

    // METADATA-ONLY aggregates (SupportsPushDownAggregates): a
    // group-by-free COUNT(*)/MIN/MAX/COUNT(col) over a stats-bearing
    // version is answered from the manifest line alone — the plan is a
    // bare one-row BatchScan (Round17Spec pins the shape: no
    // HashAggregate, no Exchange, no file read), which is the 100 TB
    // "how many rows / what's the key range" query for free. The
    // oracle recomputes the same aggregates from the raw rows, so a
    // stats line that ever disagreed with the data it describes flips
    // a value here.
    "table_meta_agg_pushdown" -> ((s, d) => {
      val dir = freshDir(s, d, "metaagg")
      val o = t(s, d, "orders").select(
        col("o_orderkey").as("key"), col("o_orderdate").as("odate"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("ck"))
        .repartition(4, pmod(col("key"), lit(4)))
        .sortWithinPartitions("key")
      GraftTable.commitNextIsolated(s, dir, o, "meta-agg head",
        statsEnc = Seq("key" -> "id", "odate" -> "us", "ck" -> "id"))
      s.read.format("graft").load(dir).agg(
        count(lit(1)).as("n_rows"),
        min("key").as("min_key"), max("key").as("max_key"),
        min("odate").as("min_odate"), max("odate").as("max_odate"),
        count("ck").as("n_ck"))
    }),

    // STORAGE-PARTITIONED JOIN (SupportsReportPartitioning +
    // HasPartitionKey): two graft tables partitioned by the same
    // column join on it with NO shuffle on either side — each key
    // group reads co-located and merges in place (Round17Spec pins
    // zero exchanges in the executed plan; here the oracle pins the
    // VALUES the shuffle-free plan must still produce). The per-prio
    // aggregate afterwards also runs inside the key groups.
    "table_spj_join" -> ((s, d) => {
      val dirA = freshDir(s, d, "spja")
      val dirB = freshDir(s, d, "spjb")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderpriority").as("prio"),
        money(dec(col("o_totalprice"))).as("price"))
      GraftTable.commitNextIsolated(s, dirA, o, "spj facts",
        partitionBy = Seq("prio"))
      GraftTable.commitNextIsolated(s, dirB,
        o.groupBy("prio")
          .agg(countDistinct(col("o_custkey")).as("n_cust")),
        "spj dim", partitionBy = Seq("prio"))
      // left ON deliberately: the DataFrame executes AFTER this lambda
      // returns, so the conf must outlive it. It is read-path-only
      // (key-grouped planning over partby graft scans); every key's
      // VALUES are conf-invariant and the key order is fixed per build
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.read.format("graft").load(dirA)
        .join(s.read.format("graft").load(dirB), "prio")
        .groupBy("prio")
        .agg(count(lit(1)).as("n_orders"),
          money(sum(col("price"))).as("revenue"),
          max(col("n_cust")).as("n_cust"))
        .orderBy("prio")
    }),

    // BUCKET-transform SPJ: both tables carry a declared bucket layout
    // (bucketfn= header, bucketCol = floorMod(key, 8) validated
    // row-for-row at commit), the scans report `bucket(8, key)` through
    // the catalog's FunctionCatalog, and the join on the RAW key —
    // the high-cardinality case identity partitioning can't serve —
    // runs with no exchange under it (Round17Spec pins the plan; the
    // oracle pins the values).
    "table_bucket_spj_join" -> ((s, d) => {
      val dirA = freshDir(s, d, "bkta")
      val dirB = freshDir(s, d, "bktb")
      val n = 8
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          money(dec(col("o_totalprice"))).as("price"))
        .withColumn("cb", pmod(col("o_custkey"), lit(n.toLong)).cast("int"))
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("cb", pmod(col("c_custkey"), lit(n.toLong)).cast("int"))
      GraftTable.commitNextIsolated(s, dirA, o, "orders bucketed",
        partitionBy = Seq("cb"), bucketFn = Some((n, "o_custkey")))
      GraftTable.commitNextIsolated(s, dirB, c, "customer bucketed",
        partitionBy = Seq("cb"), bucketFn = Some((n, "c_custkey")))
      // left ON deliberately — same rationale as table_spj_join
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      withCatalog(s, "gt17")
      val aa = new java.io.File(dirA).getAbsolutePath
      val ab = new java.io.File(dirB).getAbsolutePath
      s.sql(
        s"""SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n,
           |  SUM(o.price) AS revenue
           |FROM gt17.`$aa` o JOIN gt17.`$ab` c
           |  ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_mktsegment ORDER BY seg""".stripMargin)
        .select(col("seg"), col("n"), money(col("revenue")).as("revenue"))
    }),

    // GROUPED metadata-only aggregates: GROUP BY a partition column is
    // answered per-dir from the same manifest stats line — one row per
    // partition value, zero files opened (a file's whole group key IS
    // its dir, so per-group sums of per-file stats are exact). The
    // per-partition row-count/extreme report over 100 TB becomes one
    // driver-side decode.
    "table_meta_agg_groupby" -> ((s, d) => {
      val dir = freshDir(s, d, "metagrp")
      val o = t(s, d, "orders").select(
        col("o_orderkey").as("key"),
        col("o_orderpriority").as("prio"),
        col("o_orderdate").as("odate"))
      GraftTable.commitNextIsolated(s, dir, o, "grouped meta-agg head",
        partitionBy = Seq("prio"),
        statsEnc = Seq("key" -> "id", "odate" -> "us"))
      s.read.format("graft").load(dir).groupBy("prio").agg(
        count(lit(1)).as("n_rows"), min("key").as("min_key"),
        max("key").as("max_key"), max("odate").as("max_odate"))
        .orderBy("prio")
    }))

  val oracleSql: Map[String, String] = Map(

    // the update replayed raw over the base; probe key = the smallest
    // updated key, band over the updated snapshot, identity totals
    "table_update_sql_indexed" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer), " +
        "u AS (SELECT key, CAST(CASE WHEN key % 5 = 0 THEN bal * 2 " +
        "ELSE bal END AS DECIMAL(12,2)) AS bal FROM base), " +
        "pk AS (SELECT MIN(key) AS k FROM base WHERE key % 5 = 0) " +
        "SELECT " +
        "CAST((SELECT COUNT(*) FROM u WHERE key = (SELECT k FROM pk)) " +
        "AS BIGINT) AS n_probe, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM u " +
        "WHERE key = (SELECT k FROM pk)) AS probe_bal, " +
        "CAST((SELECT COUNT(*) FROM u WHERE key BETWEEN 1 AND 100) " +
        "AS BIGINT) AS n_band, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM u " +
        "WHERE key BETWEEN 1 AND 100) AS band_bal, " +
        "CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_total, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM u) AS total_bal"),

    // the delete replayed raw; alive probe = smallest survivor key,
    // dead probe = smallest deleted key (structurally 0 rows)
    "table_delete_sql_indexed" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer), " +
        "surv AS (SELECT key, bal FROM base WHERE key % 3 <> 0), " +
        "ak AS (SELECT MIN(key) AS k FROM base WHERE key % 3 <> 0) " +
        "SELECT " +
        "CAST((SELECT COUNT(*) FROM surv WHERE key = (SELECT k FROM ak)) " +
        "AS BIGINT) AS n_alive, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM surv " +
        "WHERE key = (SELECT k FROM ak)) AS alive_bal, " +
        "CAST(0 AS BIGINT) AS n_dead, " +
        "CAST((SELECT COUNT(*) FROM surv WHERE key BETWEEN 1 AND 100) " +
        "AS BIGINT) AS n_band, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM surv " +
        "WHERE key BETWEEN 1 AND 100) AS band_bal, " +
        "CAST((SELECT COUNT(*) FROM surv) AS BIGINT) AS n_total"),

    // full table + the pruned slice recomputed raw; the chain shape
    // (2 versions) is structural
    "table_dsv2_write_partby" ->
      (s"WITH o AS (SELECT o_orderkey, " +
        s"${oDec("o_totalprice")} AS price, " +
        "o_orderpriority AS prio FROM orders) " +
        "SELECT CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_total, " +
        s"(SELECT ${oMoney("SUM(price)")} FROM o) AS total_rev, " +
        "CAST((SELECT COUNT(*) FROM o WHERE prio = '1-URGENT') AS BIGINT)" +
        " AS n_urgent, " +
        s"(SELECT ${oMoney("SUM(price)")} FROM o WHERE prio = '1-URGENT')" +
        " AS urgent_rev, " +
        "CAST(2 AS BIGINT) AS n_versions"),

    // the evolving merge replayed raw: matched rows take the doubled
    // balance and a tier, unmatched keep theirs with NULL tier, the
    // shifted keys insert with tiers computed on the pre-shift key
    "table_merge_evolve" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer), " +
        "src AS (SELECT key, CAST(bal * 2 AS DECIMAL(12,2)) AS bal, " +
        "'T' || CAST(key % 3 AS VARCHAR) AS tier FROM base " +
        "WHERE key % 2 = 0 " +
        "UNION ALL SELECT key + 10000000, bal, " +
        "'T' || CAST(key % 3 AS VARCHAR) FROM base WHERE key % 10 = 3), " +
        "m AS (SELECT COALESCE(s.key, t.key) AS key, " +
        "CASE WHEN s.key IS NOT NULL THEN s.bal ELSE t.bal END AS bal, " +
        "CASE WHEN s.key IS NOT NULL THEN s.tier END AS tier " +
        "FROM base t FULL OUTER JOIN src s ON t.key = s.key) " +
        s"SELECT key, ${oMoney("bal")} AS bal, tier FROM m ORDER BY key"),

    // the whole chain under the new name, plus the filtered constants
    "table_alter_rename_sql" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer) " +
        s"SELECT key, ${oMoney("bal")} AS balance, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM base WHERE bal > 5000) " +
        "AS n_big, " +
        "(SELECT CAST(SUM(key) AS BIGINT) FROM base WHERE bal > 5000) " +
        "AS key_big " +
        "FROM base ORDER BY key"),

    // the narrowed table — the dropped column must be gone from the
    // schema (the driver's schema hash catches resurrection)
    "table_alter_drop_sql" ->
      (s"SELECT o_orderkey, ${oMoney(oDec("o_totalprice"))} AS price " +
        "FROM orders ORDER BY o_orderkey"),

    // the batch fixpoint: the upsert-folded sink must equal the
    // one-shot aggregate; 3 source versions = 3 sink epochs
    "table_stream_write_update" ->
      (s"SELECT o_custkey, ${oMoney(s"SUM(${oDec("o_totalprice")})")} " +
        "AS total, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "CAST(3 AS BIGINT) AS n_versions " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),

    // both snapshots replayed raw: v0 unchanged, the head with the
    // nested field doubled and the sibling field untouched
    "table_update_sql_nested" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal, " +
        "c_mktsegment AS seg FROM customer) " +
        s"SELECT 0 AS version, key, ${oMoney("bal")} AS bal, seg FROM base " +
        "UNION ALL SELECT 1 AS version, key, " +
        s"${oMoney("CAST(CASE WHEN key % 5 = 0 THEN bal * 2 ELSE bal END " +
          "AS DECIMAL(12,2))")} AS bal, seg FROM base " +
        "ORDER BY version, key"),

    // the metadata-served aggregates recomputed from the raw rows — a
    // manifest stats line disagreeing with its data flips a value
    "table_meta_agg_pushdown" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key, " +
        "MIN(o_orderdate) AS min_odate, MAX(o_orderdate) AS max_odate, " +
        "CAST(COUNT(CASE WHEN o_orderkey % 7 = 0 THEN NULL " +
        "ELSE o_custkey END) AS BIGINT) AS n_ck " +
        "FROM orders"),

    // the shuffle-free co-partitioned join's values recomputed raw
    "table_spj_join" ->
      (s"WITH o AS (SELECT o_custkey, o_orderpriority AS prio, " +
        s"${oMoney(oDec("o_totalprice"))} AS price FROM orders) " +
        "SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        s"${oMoney("SUM(price)")} AS revenue, " +
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust " +
        "FROM o GROUP BY prio ORDER BY prio"),

    // the shuffle-free bucket join's values recomputed raw
    "table_bucket_spj_join" ->
      (s"WITH o AS (SELECT o_custkey, ${oMoney(oDec("o_totalprice"))} " +
        "AS price FROM orders) " +
        "SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney("SUM(o.price)")} AS revenue " +
        "FROM o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "GROUP BY c.c_mktsegment ORDER BY seg"),

    // the per-partition metadata report recomputed from the raw rows
    "table_meta_agg_groupby" ->
      ("SELECT o_orderpriority AS prio, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key, " +
        "MAX(o_orderdate) AS max_odate " +
        "FROM orders GROUP BY o_orderpriority ORDER BY prio"))
}
