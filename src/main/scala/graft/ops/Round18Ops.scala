package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T.{t, dec, money, oDec, oMoney}
import graft.sources.GraftTable

/** Round-18 additions — the SQL MERGE door survives a concurrent-writer
  * race (VERDICT r17 "Next round" item 2):
  *
  *  - `table_merge_concurrent` — two threads MERGE DISJOINT changelogs
  *    (even / odd customer keys) into the same table through the SQL
  *    door concurrently. Exactly one wins the version the other's
  *    resolved relation pinned; the loser's ConcurrentModification-
  *    Exception triggers GraftMergeCommand's REBASE retry — the pinned
  *    GraftSparkTable inside its resolved target relation is swapped
  *    for the winner's head (output attributes kept, so the resolved
  *    condition and arms bind unchanged), and the whole merge re-runs:
  *    full-outer join, cardinality pre-check and commit pin all read
  *    the winner's rows. Both changelogs land regardless of arrival
  *    order because the merges commute (disjoint keys; the update arm
  *    is addition), so the final state is deterministic and the oracle
  *    recomputes it sequentially. The exposed n_versions=3 pins that
  *    the loser retried and landed (2 = a lost merge, 4 = a double
  *    apply). At scale this is the lake-standard serializable-OCC
  *    protocol: the price of a lost race is one re-stage of the
  *    writer's merge, never a reader stall — snapshot isolation holds
  *    for readers throughout.
  */
object Round18Ops {

  private def freshDir(s: SparkSession, d: String, tag: String): String =
    graft.T.freshDir(s, d, tag)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "table_merge_concurrent" -> ((s, d) => {
      val dir = freshDir(s, d, "mergeconc")
      GraftTable.commitNextIsolated(s, dir,
        t(s, d, "customer")
          .select(col("c_custkey").as("key"), dec(col("c_acctbal")).as("bal")),
        "base")
      s.conf.set("spark.sql.catalog.gt18",
        classOf[graft.sources.GraftCatalog].getName)
      val abs = new java.io.File(dir).getAbsolutePath
      def changelog(parity: Int): DataFrame =
        t(s, d, "orders").filter(col("o_custkey") % 2 === parity)
          .groupBy(col("o_custkey").as("ckey"))
          .agg(sum(dec(col("o_totalprice"))).as("delta"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val latch = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq(0, 1).map { p =>
        new Thread(() => {
          latch.await()
          try {
            changelog(p).createOrReplaceTempView(s"r18_cm_src$p")
            s.sql(
              s"""MERGE INTO gt18.`$abs` t USING r18_cm_src$p s
                 |ON t.key = s.ckey
                 |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.delta
                 |WHEN NOT MATCHED THEN INSERT (key, bal) VALUES (s.ckey, s.delta)
                 |""".stripMargin)
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); latch.countDown(); threads.foreach(_.join())
      if (!errs.isEmpty) throw errs.peek()
      val fs = GraftTable.fsOf(s, dir)
      val nv = GraftTable.versions(fs, dir).size
      GraftTable.read(s, dir)
        .select(col("key"), money(col("bal")).as("bal"),
          lit(nv).as("n_versions"))
        .orderBy("key")
    }),

    // The LARGE-deletion-vector read tier (VERDICT r17 item 3): a
    // half-the-table delete leaves a tombstone set past the broadcast
    // gate (forced low here), so the DSv2 read rewrites to the
    // DISTRIBUTED anti-join plan — no driver key materialization, no
    // broadcast hint (a hinted build side collects on the driver too).
    // The aggregate recomputes the survivors raw; identical rows from
    // the probe tier are pinned by Round18Spec, and the gate's refusal
    // to approximate is structural: both tiers subtract the same DV
    // parquet.
    "table_dv_scale_gate" -> ((s, d) => {
      val dir = freshDir(s, d, "dvscale")
      GraftTable.commitNextIsolated(s, dir,
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          dec(col("o_totalprice")).as("price")),
        "base")
      GraftTable.commitDeleteVector(s, dir,
        GraftTable.read(s, dir).where(col("o_orderkey") % 2 === 1),
        Seq("o_orderkey"), "delete odd orderkeys (large DV)")
      val prev = s.conf.getOption("spark.graft.dv.broadcastMaxKeys")
      s.conf.set("spark.graft.dv.broadcastMaxKeys", "100")
      try
        s.read.format("graft").load(dir)
          .groupBy((col("o_custkey") % 10).as("ck_band"))
          .agg(count(lit(1)).as("n"), money(sum(col("price"))).as("rev"))
          .orderBy("ck_band")
      finally prev match {
        case Some(v) => s.conf.set("spark.graft.dv.broadcastMaxKeys", v)
        case None => s.conf.unset("spark.graft.dv.broadcastMaxKeys")
      }
    }),

    // SORTED bucket SPJ (VERDICT r17 item 4): both tables commit with
    // sortWithin(key) — the ENGINE reshapes to one sorted file per
    // bucket dir and mints the sortw= header — so the scans report
    // SupportsReportOrdering on the raw key and the storage-partitioned
    // sort-merge join runs with NO exchange AND NO Sort on either side
    // (Round18Spec pins the plan; this key pins the values the
    // sort-free plan must still produce). The write-time price is one
    // repartition+sort per table — the classic write-once/read-many
    // clustering trade.
    "table_sorted_spj_join" -> ((s, d) => {
      val dirA = freshDir(s, d, "ssrta")
      val dirB = freshDir(s, d, "ssrtb")
      val n = 8
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          money(dec(col("o_totalprice"))).as("price"))
        .withColumn("cb", pmod(col("o_custkey"), lit(n.toLong)).cast("int"))
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("cb", pmod(col("c_custkey"), lit(n.toLong)).cast("int"))
      GraftTable.commitNextIsolated(s, dirA, o, "orders bucketed+sorted",
        partitionBy = Seq("cb"), bucketFn = Some((n, "o_custkey")),
        sortWithin = Seq("o_custkey"))
      GraftTable.commitNextIsolated(s, dirB, c, "customer bucketed+sorted",
        partitionBy = Seq("cb"), bucketFn = Some((n, "c_custkey")),
        sortWithin = Seq("c_custkey"))
      // left ON deliberately — the DataFrame executes after this lambda
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.catalog.gt18",
        classOf[graft.sources.GraftCatalog].getName)
      val aa = new java.io.File(dirA).getAbsolutePath
      val ab = new java.io.File(dirB).getAbsolutePath
      s.sql(
        s"""SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n,
           |  SUM(o.price) AS revenue
           |FROM gt18.`$aa` o JOIN gt18.`$ab` c
           |  ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_mktsegment ORDER BY seg""".stripMargin)
        .select(col("seg"), col("n"), money(col("revenue")).as("revenue"))
    }))

  val oracleSql: Map[String, String] = Map(

    // Sequential replay of the two commuting SQL merges (matched adds
    // the delta, unmatched inserts it — exactly the full-join formula);
    // 3 versions pins that the race loser REBASED and landed.
    "table_merge_concurrent" ->
      (s"WITH base AS (SELECT c_custkey AS key, ${oDec("c_acctbal")} AS bal FROM customer), " +
        s"a AS (SELECT o_custkey AS ckey, SUM(${oDec("o_totalprice")}) AS delta " +
        "FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1), " +
        s"b AS (SELECT o_custkey AS ckey, SUM(${oDec("o_totalprice")}) AS delta " +
        "FROM orders WHERE o_custkey % 2 = 1 GROUP BY 1), " +
        "m1 AS (SELECT COALESCE(key, ckey) AS key, " +
        "COALESCE(bal, 0) + COALESCE(delta, 0) AS bal " +
        "FROM base FULL JOIN a ON key = ckey), " +
        "m2 AS (SELECT COALESCE(key, ckey) AS key, " +
        "COALESCE(bal, 0) + COALESCE(delta, 0) AS bal " +
        "FROM m1 FULL JOIN b ON key = ckey) " +
        s"SELECT key, ${oMoney("bal")} AS bal, 3 AS n_versions " +
        "FROM m2 ORDER BY key"),

    // survivors of the odd-orderkey delete, recomputed raw
    "table_dv_scale_gate" ->
      ("SELECT o_custkey % 10 AS ck_band, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS rev " +
        "FROM orders WHERE o_orderkey % 2 = 0 " +
        "GROUP BY 1 ORDER BY ck_band"),

    // the sort-free shuffle-free bucket join's values recomputed raw
    "table_sorted_spj_join" ->
      (s"WITH o AS (SELECT o_custkey, ${oMoney(oDec("o_totalprice"))} " +
        "AS price FROM orders) " +
        "SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney("SUM(o.price)")} AS revenue " +
        "FROM o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "GROUP BY c.c_mktsegment ORDER BY seg"))
}
