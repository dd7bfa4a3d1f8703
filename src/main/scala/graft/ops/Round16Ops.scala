package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T.{t, dec, money, oDec, oMoney}
import graft.sources.GraftTable

/** Round-16 additions — the DML/operational surface of the versioned
  * store reaches plain SQL end to end:
  *
  *  - `table_update_sql` / `table_delete_sql` — `UPDATE` / `DELETE`
  *    statements over a graft catalog target, rewritten at resolution
  *    into the MERGE-ON-READ engines (scoped full-row tombstones +
  *    replacement dir; no base file rewritten — byte-identity pinned in
  *    Round16Spec). Each key hashes BOTH snapshots: v0 must still serve
  *    the pre-DML rows (snapshot isolation), the head the post-DML ones.
  */
object Round16Ops {

  private def freshDir(s: SparkSession, d: String, tag: String): String =
    graft.T.freshDir(s, d, tag)

  private def withCatalog(s: SparkSession, name: String): Unit =
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)

  /** The U/I/D changelog every merge key resolves — the same
    * derivation `Round14Ops.mergeFixture` and `Round15Ops` use, so all
    * merge doors share `Round14Ops.oMergeCtes` as their oracle twin. */
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

    // SQL UPDATE through the catalog door: the exact update
    // table_update_dv resolves through the API, driven from SQL text.
    // The rewrite must take the MoR fast path (no base rewrite — spec
    // claim) and both snapshots sit inside the hash: an update that
    // mutated v0 in place, dropped a duplicate, or double-applied the
    // set flips rows here.
    "table_update_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "updatesql")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
        .repartition(3)
      GraftTable.commitNextIsolated(s, dir, base, "base")
      withCatalog(s, "gt16")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"UPDATE gt16.`$abs` SET bal = bal * 2 WHERE key % 5 = 0")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .select(lit(v).as("version"), col("key"),
            money(col("bal")).as("bal"))
      snap(0).unionByName(snap(1)).orderBy("version", "key")
    }),

    // The STREAMING write door closing the lakehouse loop table to
    // table: a 3-version append history streams OUT of one graft table
    // (maxVersionsPerTrigger=1 → one epoch per source version) and INTO
    // another via writeStream.format("graft") under Trigger.AvailableNow
    // — each epoch an atomic append commit keyed by epoch=<id>. The
    // batch fixpoint (every source row, exactly once) and the version
    // count both sit inside the hash: a dropped/duplicated epoch flips
    // rows, a replay minting a version (or AvailableNow degrading to
    // one mega-batch) flips n_versions.
    "table_stream_write" -> ((s, d) => {
      val src = freshDir(s, d, "swsrc")
      val sink = freshDir(s, d, "swsink")
      val ckpt = freshDir(s, d, "swckpt")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        money(dec(col("o_totalprice"))).as("price"))
      GraftTable.commitNextIsolated(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 0), "chunk 0")
      GraftTable.commitAppend(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 1), "chunk 1")
      GraftTable.commitAppend(s, src,
        o.where(pmod(col("o_orderkey"), lit(3)) === 2), "chunk 2")
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 1)
        .load(new java.io.File(src).getAbsolutePath)
        .writeStream.format("graft")
        .option("path", new java.io.File(sink).getAbsolutePath)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val nv = GraftTable.versions(GraftTable.fsOf(s, sink), sink).size
      GraftTable.read(s, sink)
        .select(col("o_orderkey"), col("o_custkey"), col("price"),
          lit(nv).as("n_versions"))
        .orderBy("o_orderkey")
    }),

    // INDEX-PRESERVING DSv2 append: a statenc+bloom chain extended
    // through df.write.format("graft").mode("append") — the staged dir
    // gets its own stats entries (registry-derived ordinals) and Bloom
    // sidecar, so band and point-lookup skipping stay live across the
    // whole chain. All three probes ride the hash THROUGH the skipping
    // machinery (band read resolves files from the manifest; the Bloom
    // read opens only candidates): a dropped index, a stats line that
    // missed the appended files, or a false negative flips a value.
    "table_dsv2_write_indexed" -> ((s, d) => {
      val dir = freshDir(s, d, "idxwrite")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          money(dec(col("o_totalprice"))).as("price"))
      val cut = lit("1997-01-01").cast("timestamp_ntz")
      // ENVIRONMENT-DETERMINISTIC layout, both halves: the head splits
      // files by YEAR (a pure key hash — range repartition samples and
      // round-robin depends on input split order, neither reproducible
      // across environments) with a total in-partition order, so per-file
      // date ranges stay disjoint for the band while every written byte —
      // and every Bloom bit — is identical anywhere; the appended tail
      // key-hashes on o_orderkey the same way.
      GraftTable.commitNextIsolated(s, dir,
        o.where(col("o_orderdate") < cut)
          .repartition(4, pmod(year(col("o_orderdate")), lit(4)))
          .sortWithinPartitions("o_orderdate", "o_orderkey"),
        "indexed head", statsEnc = Seq("o_orderdate" -> "us"),
        bloomCols = Seq("o_custkey"))
      o.where(col("o_orderdate") >= cut)
        .repartition(3, pmod(col("o_orderkey"), lit(3)))
        .sortWithinPartitions("o_orderkey")
        .write.format("graft").mode("append")
        .save(new java.io.File(dir).getAbsolutePath)
      val truth = GraftTable.read(s, dir)
      val (band, _, _) = GraftTable.readStatsBand(s, dir, 1, "o_orderdate",
        graft.T.epochUs("1996-03-01"), graft.T.epochUs("1996-06-01") - 1L)
      val inBand = (c: Column) =>
        c >= lit("1996-03-01").cast("timestamp_ntz") &&
          c < lit("1996-06-01").cast("timestamp_ntz")
      val bandRows = band.where(inBand(col("o_orderdate")))
      val ck = o.agg(min(col("o_custkey"))).head().getLong(0)
      val ckDf = GraftTable.readBloomEq(s, dir, 1, "o_custkey", ck)._1
        .where(col("o_custkey") === ck)
      // false-negative witnesses INSIDE the hash (VERDICT r16 item 1c):
      // truth rows — a plain full scan, no skipping machinery — that the
      // band / Bloom frames failed to serve. 0 by contract; a non-zero
      // driver value names the probe that dropped rows.
      val missedBand = truth.where(inBand(col("o_orderdate")))
        .join(bandRows.select(col("o_orderkey").as("__k")),
          col("o_orderkey") === col("__k"), "left_anti")
      val missedCk = truth.where(col("o_custkey") === ck)
        .join(ckDf.select(col("o_orderkey").as("__k")),
          col("o_orderkey") === col("__k"), "left_anti")
      bandRows
        .agg(count(lit(1)).as("n_band"), money(sum(dec(col("price")))).as("band_rev"))
        .crossJoin(ckDf.agg(count(lit(1)).as("n_ck"),
          sum(col("o_orderkey")).as("sum_ck")))
        .crossJoin(missedBand.agg(count(lit(1)).as("n_missed_band")))
        .crossJoin(missedCk.agg(count(lit(1)).as("n_missed_ck")))
        .crossJoin(truth.agg(count(lit(1)).as("n_total")))
    }),

    // SQL MERGE onto an indexed target RE-INDEXES the merged snapshot
    // (round 15 refused this): the statenc/bloom declarations are
    // manifest-described, so the commit recomputes both. The post-merge
    // Bloom probe for the merge-minted key and the band aggregate both
    // resolve THROUGH the new index — a merge that dropped the index
    // errors (readBloomEq refuses), one that mis-indexed flips rows.
    "table_merge_reindex" -> ((s, d) => {
      val dir = freshDir(s, d, "idxmergekey")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
        .repartition(4, col("key"))
      GraftTable.commitNextIsolated(s, dir, base, "indexed base",
        statsEnc = Seq("key" -> "id"), bloomCols = Seq("key"))
      withCatalog(s, "gt16")
      mergeSource(s, d).createOrReplaceTempView("r16_reindex_src")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(
        s"""MERGE INTO gt16.`$abs` t USING r16_reindex_src s ON t.key = s.ckey
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.delta
           |WHEN NOT MATCHED AND s.op <> 'D' THEN
           |  INSERT (key, bal) VALUES (s.ckey, s.delta)
           |""".stripMargin)
      // an insert-minted key (custkey%10==0 shifted by 10M) probed
      // through the REBUILT Bloom index
      val probeKey = base.agg(min(when(col("key") % 10 === 0, col("key"))))
        .head().getLong(0) + 10000000L
      val pDf = GraftTable.readBloomEq(s, dir, 1, "key", probeKey)._1
        .where(col("key") === probeKey)
      // and a band over the re-derived stats line
      val (band, _, _) = GraftTable.readStatsBand(s, dir, 1, "key",
        1L, 100L)
      pDf.agg(count(lit(1)).as("n_probe"), money(sum(col("bal"))).as("probe_bal"))
        .crossJoin(band.where(col("key").between(1, 100))
          .agg(count(lit(1)).as("n_band"), money(sum(col("bal"))).as("band_bal")))
        .crossJoin(GraftTable.read(s, dir).agg(count(lit(1)).as("n_total")))
    }),

    // The nightly maintenance pass driven from SQL TEXT: a 4-dir
    // statenc append chain + one orphaned staging dir, folded by
    // `SELECT * FROM graft_maintain(dir, 2, 1)` — compaction re-derives
    // the registry-declared index, the manifest checkpoints, the orphan
    // vacuums. The REPORT row is the hash surface (compacted version,
    // checkpoint coverage, vacuum count — a pass that skipped a step or
    // double-compacted flips a field), crossed with the table's
    // row/revenue identity and the folded n_dirs.
    "table_maintain_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "maintsql")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          money(dec(col("o_totalprice"))).as("price"))
      def slice(i: Int) = o.where(pmod(col("o_orderkey"), lit(4)) === i)
      GraftTable.commitNextIsolated(s, dir,
        slice(0).repartitionByRange(2, col("o_orderdate"), col("o_orderkey")),
        "head", statsEnc = Seq("o_orderdate" -> "us"))
      (1 to 3).foreach(i => GraftTable.commitAppend(s, dir, slice(i),
        s"arrival $i", statsEnc = Seq("o_orderdate" -> "us")))
      // a crashed writer's orphan, old enough for the default grace
      val fs = GraftTable.fsOf(s, dir)
      val orphan = new org.apache.hadoop.fs.Path(s"$dir/v1_orphan00")
      fs.mkdirs(orphan)
      fs.create(new org.apache.hadoop.fs.Path(orphan, "part-0.parquet"),
        true).close()
      fs.setTimes(new org.apache.hadoop.fs.Path(orphan, "part-0.parquet"),
        1000L, 1000L)
      fs.setTimes(orphan, 1000L, 1000L)
      // the action TVF defers its mutation to EXECUTION (round 17) —
      // collect the report FIRST, so the table reads below see the
      // maintained state, then re-lift the one report row
      val rep0 = s.sql(s"SELECT * FROM graft_maintain('$dir', 2, 1)")
      val rep = s.createDataFrame(
        java.util.Arrays.asList(rep0.collect(): _*), rep0.schema)
      val nDirs = GraftTable.dataDirsOf(fs, dir, 4).size
      rep.crossJoin(GraftTable.read(s, dir)
          .agg(count(lit(1)).as("n_rows"),
            money(sum(dec(col("price")))).as("rev")))
        .withColumn("n_dirs", lit(nDirs.toLong))
    }),

    // SQL ALTER TABLE ADD COLUMNS (metadata-only; Round16Spec pins the
    // files byte-identical) composed with a SQL UPDATE that fills the
    // new column: v0 = the pre-alter table, v1 = NULL backfill (n_tier
    // must be 0 — a backfill that invented values flips it), v2 = the
    // filled tiers. The whole history hashes; bal_sum constant across
    // versions pins that neither the alter nor the tier fill touched
    // the data column.
    "table_alter_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "altersql")
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal"))
        .repartition(3)
      GraftTable.commitNextIsolated(s, dir, base, "base")
      withCatalog(s, "gt16")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"ALTER TABLE gt16.`$abs` ADD COLUMNS (tier STRING)")
      s.sql(s"UPDATE gt16.`$abs` SET tier = " +
        "CASE WHEN bal < 0 THEN 'neg' ELSE 'pos' END")
      def snap(v: Int): DataFrame = {
        val r = GraftTable.readVersion(s, dir, v)
        val tierCol =
          if (r.columns.contains("tier")) col("tier")
          else lit(null).cast("string")
        r.agg(count(lit(1)).as("n_rows"),
          count(tierCol).as("n_tier"),
          count(when(tierCol === "neg", lit(1))).as("n_neg"),
          money(sum(col("bal"))).as("bal_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("n_tier"),
            col("n_neg"), col("bal_sum"))
      }
      snap(0).unionByName(snap(1)).unionByName(snap(2)).orderBy("version")
    }),

    // Delta's RESTORE TABLE from SQL text: v1 is a bad overwrite
    // (doubled prices), `graft_restore(dir, 0)` mints v2 as a
    // METADATA-ONLY rewind (same data dir as v0 — byte identity and
    // header carry pinned in Round16Spec). The whole history hashes:
    // v1 must stay readable for forensics (restore is a new commit,
    // never a rewrite of history) and v2 must serve exactly v0.
    "table_restore_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "restoresql")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("price"))
      GraftTable.commitNextIsolated(s, dir, o, "good load")
      GraftTable.commitNextIsolated(s, dir,
        o.select(col("o_orderkey"), (col("price") * 2).as("price")),
        "bad load: doubled prices")
      s.sql(s"SELECT * FROM graft_restore('$dir', 0)").collect()
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), money(sum(col("price"))).as("rev"))
          .select(lit(v).as("version"), col("n_rows"), col("rev"))
      snap(0).unionByName(snap(1)).unionByName(snap(2)).orderBy("version")
    }),

    // SQL DELETE, twice-composed: status-F rows die at v1, the
    // high-price band additionally at v2 — each version a MoR commit
    // whose full-row tombstones must kill exactly the matched rows
    // (the table_delete_dv replay, driven from SQL text; the second
    // DELETE runs over the survivors, so a tombstone that leaked or
    // resurrected flips v2's aggregate).
    "table_delete_sql" -> ((s, d) => {
      val dir = freshDir(s, d, "deletesql")
      GraftTable.commitNextIsolated(s, dir,
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).as("price")),
        "base load")
      withCatalog(s, "gt16")
      val abs = new java.io.File(dir).getAbsolutePath
      s.sql(s"DELETE FROM gt16.`$abs` WHERE o_orderstatus = 'F'")
      s.sql(s"DELETE FROM gt16.`$abs` WHERE price > 300000")
      def snap(v: Int): DataFrame =
        GraftTable.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), money(sum(col("price"))).as("rev"))
          .select(lit(v).as("version"), col("n_rows"), col("rev"))
      snap(0).unionByName(snap(1)).unionByName(snap(2)).orderBy("version")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // identical to table_update_dv's oracle — the two doors must agree
    "table_update_sql" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer) " +
        s"SELECT 0 AS version, key, ${oMoney("bal")} AS bal FROM base " +
        "UNION ALL SELECT 1 AS version, key, " +
        s"${oMoney(s"CAST(CASE WHEN key % 5 = 0 THEN bal * 2 ELSE bal END " +
          "AS DECIMAL(12,2))")} AS bal FROM base " +
        "ORDER BY version, key"),

    // every order exactly once, three epochs = three sink versions
    "table_stream_write" ->
      (s"SELECT o_orderkey, o_custkey, " +
        s"${oMoney(oDec("o_totalprice"))} AS price, 3 AS n_versions " +
        "FROM orders ORDER BY o_orderkey"),

    // band + point-lookup + identity recomputed raw — skipping through
    // the extended chain index must not change results; the witnesses
    // are structural zeros (band/Bloom no-false-negative contract)
    "table_dsv2_write_indexed" ->
      ("SELECT " +
        "CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-06-01')" +
        " AS BIGINT) AS n_band, " +
        s"(SELECT ${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-03-01' AND " +
        "o_orderdate < TIMESTAMP '1996-06-01') AS band_rev, " +
        "CAST((SELECT COUNT(*) FROM orders WHERE o_custkey = " +
        "(SELECT MIN(o_custkey) FROM orders)) AS BIGINT) AS n_ck, " +
        // CAST: DuckDB's SUM(BIGINT) widens to HUGEINT, which hash-
        // mismatches Spark's LongType in the driver even at equal values
        // (VERDICT r17 root cause for this key's three-round red).
        "CAST((SELECT SUM(o_orderkey) FROM orders WHERE o_custkey = " +
        "(SELECT MIN(o_custkey) FROM orders)) AS BIGINT) AS sum_ck, " +
        "CAST(0 AS BIGINT) AS n_missed_band, " +
        "CAST(0 AS BIGINT) AS n_missed_ck, " +
        "CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_total"),

    // the merged state replayed through the shared merge CTEs; the
    // probe key is the smallest insert-minted key
    "table_merge_reindex" ->
      (s"WITH ${Round14Ops.oMergeCtes}, " +
        "pk AS (SELECT MIN(key) + 10000000 AS k FROM base " +
        "WHERE key % 10 = 0) " +
        "SELECT " +
        "CAST((SELECT COUNT(*) FROM m WHERE key = (SELECT k FROM pk)) " +
        "AS BIGINT) AS n_probe, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM m " +
        "WHERE key = (SELECT k FROM pk)) AS probe_bal, " +
        "CAST((SELECT COUNT(*) FROM m WHERE key BETWEEN 1 AND 100) " +
        "AS BIGINT) AS n_band, " +
        s"(SELECT ${oMoney("SUM(bal)")} FROM m " +
        "WHERE key BETWEEN 1 AND 100) AS band_bal, " +
        "CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_total"),

    // the report is structurally determined: 4-dir chain > 2 compacts
    // into version 4, the checkpoint covers it, exactly the one planted
    // orphan vacuums, nothing expires
    "table_maintain_sql" ->
      ("SELECT CAST(4 AS INT) AS compacted, " +
        "CAST(4 AS INT) AS checkpointed_to, " +
        "CAST(0 AS BIGINT) AS n_expired, CAST(1 AS BIGINT) AS n_vacuumed, " +
        "CAST(NULL AS VARCHAR) AS compaction_refused, " +
        "CAST(NULL AS VARCHAR) AS checkpoint_failed, " +
        "CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
        s"(SELECT ${oMoney(s"SUM(${oDec(oMoney(oDec("o_totalprice")))})")} " +
        "FROM orders) AS rev, CAST(1 AS BIGINT) AS n_dirs"),

    // the three versions of the alter+fill history recomputed raw
    "table_alter_sql" -> {
      val b = s"SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal " +
        "FROM customer"
      def snap(v: Int, tier: Boolean) =
        s"SELECT $v AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          (if (tier) "CAST(COUNT(*) AS BIGINT)" else "CAST(0 AS BIGINT)") +
          " AS n_tier, " +
          (if (tier) "CAST(COUNT(CASE WHEN bal < 0 THEN 1 END) AS BIGINT)"
           else "CAST(0 AS BIGINT)") + " AS n_neg, " +
          s"${oMoney("SUM(bal)")} AS bal_sum FROM ($b)"
      snap(0, tier = false) + " UNION ALL " + snap(1, tier = false) +
        " UNION ALL " + snap(2, tier = true) + " ORDER BY version"
    },

    // good, doubled, good again — the rewound head ≡ v0 exactly
    "table_restore_sql" -> {
      val o = s"SELECT o_orderkey, ${oDec("o_totalprice")} AS price " +
        "FROM orders"
      s"SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"${oMoney("SUM(price)")} AS rev FROM ($o) " +
        "UNION ALL SELECT 1, CAST(COUNT(*) AS BIGINT), " +
        s"${oMoney("SUM(price * 2)")} FROM ($o) " +
        "UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT), " +
        s"${oMoney("SUM(price)")} FROM ($o) ORDER BY version"
    },

    // table_delete_dv's replay (sans purge), driven from SQL
    "table_delete_sql" -> {
      val o = s"SELECT o_orderkey, o_orderstatus, " +
        s"${oDec("o_totalprice")} AS price FROM orders"
      def snap(v: Int, where: String) =
        s"SELECT $v AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          s"${oMoney("SUM(price)")} AS rev FROM ($o) $where"
      snap(0, "") + " UNION ALL " +
        snap(1, "WHERE o_orderstatus <> 'F'") + " UNION ALL " +
        snap(2, "WHERE o_orderstatus <> 'F' AND NOT price > 300000") +
        " ORDER BY version"
    }
  )
}
