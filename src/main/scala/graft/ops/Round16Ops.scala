package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def freshDir(s: SparkSession, d: String, tag: String): String = {
    val dir = s"target/tmp/g${tag}_${new java.io.File(d).getName}"
    GraftTable.fsOf(s, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
    dir
  }

  private def withCatalog(s: SparkSession, name: String): Unit =
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)

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
