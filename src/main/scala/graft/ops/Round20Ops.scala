package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T.{dec, money, oDec, oMoney, t}
import graft.sources.GraftTable

/** Round-20 additions (VERDICT r19 "Next round" item 4):
  *
  *  - Positional merge-on-read UPDATE (`table_dv_update_positional`):
  *    the Iceberg-v2 MoR update shape — an UPDATE on a pdv head
  *    tombstones the matched rows by (file, row position) and stages
  *    their replacements as a NEW data dir, instead of rewriting the
  *    whole snapshot copy-on-write. At 100 TB this is the difference
  *    between writing 0.1% of the table and writing all of it for a
  *    point UPDATE. The key chains delete → update → read-back of BOTH
  *    versions, so cumulation, the probe tier, replacement staging and
  *    time travel all ride the oracle; Round20Spec pins the plan shape
  *    (no Join node, pre-update files shared not rewritten).
  *
  *  - Avro door (`source_avro`, VERDICT r19 "What's missing" 4): the
  *    jar set lacks spark-avro but ships avro + avro-mapred, so
  *    `sources/AvroBridge` serves standard object container files
  *    through the public Hadoop Avro input/output formats —
  *    splittable, distributed, oracled end-to-end (and type-surface
  *    pinned in Round20Spec).
  */
object Round20Ops {

  private def freshDir(s: SparkSession, d: String, tag: String): String =
    graft.T.freshDir(s, d, tag)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // v2 = positional DELETE survivors; v3 = the same rows after a
    // positional UPDATE bumps every live 'O' row's price by 10 — the
    // matched positions tombstone into a cumulative sidecar and the
    // replacements stage beside the untouched base files. Both versions
    // union-hash, so a resurrection (an already-deleted row re-matching
    // the update), a dropped replacement, or a double-applied bump all
    // flip the oracle.
    "table_dv_update_positional" -> ((s, d) => {
      val dir = freshDir(s, d, "pdvupd")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), dec(col("o_totalprice")).as("price"))
      GraftTable.commitNextIsolated(s, dir,
        o.filter(col("o_orderstatus") === "P").coalesce(1), "P rows")
      GraftTable.commitAppend(s, dir,
        o.filter(col("o_orderstatus") =!= "P").coalesce(1), "the rest")
      GraftTable.commitPositionalDelete(s, dir,
        col("price") > lit(200000), "drop expensive rows")
      GraftTable.commitPositionalUpdate(s, dir,
        col("o_orderstatus") === "O",
        Seq("price" -> (col("price") + lit(10))), "bump live O prices")
      def agg(v: Int): DataFrame = GraftTable.readVersion(s, dir, v)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), money(sum(col("price"))).as("rev"))
        .withColumn("version", lit(v))
      agg(2).unionByName(agg(3)).orderBy("version", "o_orderstatus")
    }),

    // AVRO round trip (VERDICT r19 "What's missing" 4, un-blocked):
    // the jar set lacks spark-avro but SHIPS avro + avro-mapred, so
    // the door is the public Hadoop AvroKey{In,Out}putFormat over
    // standard object container files (splittable blocks, one file
    // per partition, records converted inside the owning task —
    // graft.sources.AvroBridge). Long/string/timestamp/decimal all
    // ride the hash: a lossy type mapping flips rev or the date edge.
    "source_avro" -> ((s, d) => {
      val dir = freshDir(s, d, "avrort")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_orderdate"),
        dec(col("o_totalprice")).as("price"))
      graft.sources.AvroBridge.write(o, dir)
      val back = graft.sources.AvroBridge.read(s, dir, o.schema)
      back.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), money(sum(col("price"))).as("rev"),
          // session TZ is UTC, so the NTZ→TZ cast is value-identical
          max(unix_micros(col("o_orderdate").cast("timestamp"))).as("last_us"))
        .orderBy("o_orderstatus")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // v2 = rows surviving the price delete; v3 = the same rows with
    // +10 on every 'O' price (all live 'O' rows match the update)
    "table_dv_update_positional" -> {
      def agg(v: Int, bump: Boolean) =
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
          oMoney("SUM(" + oDec("o_totalprice") +
            (if (bump) " + (CASE WHEN o_orderstatus = 'O' THEN 10 ELSE 0 END)"
             else "") + ")") +
          s" AS rev, CAST($v AS INT) AS version FROM orders " +
          s"WHERE NOT (${oDec("o_totalprice")} > 200000) GROUP BY 1"
      s"SELECT * FROM (${agg(2, bump = false)} UNION ALL " +
        s"${agg(3, bump = true)}) ORDER BY version, o_orderstatus"
    },

    // the round trip must be lossless: same agg straight off parquet
    "source_avro" ->
      ("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS rev, " +
        "epoch_us(MAX(o_orderdate)) AS last_us " +
        "FROM orders GROUP BY 1 ORDER BY 1")
  )
}
