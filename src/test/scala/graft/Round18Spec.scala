package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.functions._

import graft.plans.GraftMergeCommand
import graft.sources.GraftTable

/** Round-18: SQL MERGE INTO survives a concurrent-writer race by
  * REBASING its resolved target relation onto the new head (VERDICT r17
  * "Next round" item 2). The race is forced DETERMINISTICALLY: the
  * MERGE is parsed and analyzed (which resolves + pins the target
  * snapshot and rewrites to GraftMergeCommand), a racing commit then
  * advances the head, and only then does the command execute — its
  * first attempt must lose on the expectVersion pin, rebase, and land
  * on top of the racer's rows. */
class Round18Spec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = s"target/tmp/r18spec_$tag"
    GraftTable.fsOf(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    dir
  }

  /** Analyze (but do NOT execute) a SQL statement — the analyzer applies
    * MergeIntoGraftRule, so the result for a MERGE on a graft target is
    * the runnable GraftMergeCommand with its relation pinned to the
    * CURRENT head. */
  private def analyzedMerge(sql: String): GraftMergeCommand = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    spark.sessionState.analyzer
      .executeAndCheck(parsed, new QueryPlanningTracker()) match {
      case c: GraftMergeCommand => c
      case other => fail(s"expected GraftMergeCommand, got $other")
    }
  }

  private def baseTable(tag: String): String = {
    val dir = fresh(tag)
    import spark.implicits._
    GraftTable.commitNextIsolated(spark, dir,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("key", "v"), "base")
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    new java.io.File(dir).getAbsolutePath
  }

  test("a raced MERGE rebases onto the new head and lands") {
    val abs = baseTable("race")
    import spark.implicits._
    Seq((2L, 200L), (4L, 400L)).toDF("ckey", "delta")
      .createOrReplaceTempView("r18t_src")
    // pin the snapshot at v0 …
    val cmd = analyzedMerge(
      s"""MERGE INTO gt18t.`$abs` t USING r18t_src s ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |WHEN NOT MATCHED THEN INSERT (key, v) VALUES (s.ckey, s.delta)
         |""".stripMargin)
    // … then race: a commit advances the head to v1 (touches key 3 and
    // adds key 5 — rows the merge must NOT erase)
    val next = GraftTable.read(spark, abs)
      .withColumn("v", when(col("key") === 3L, lit(33L)).otherwise(col("v")))
      .unionByName(Seq((5L, 50L)).toDF("key", "v"))
    GraftTable.commitNextIsolated(spark, abs, next, "racer",
      expectVersion = Some(0))
    // execute: attempt 1 loses the expectVersion pin, rebases to v1,
    // attempt 2 lands as if run strictly after the racer
    cmd.run(spark)
    val fs = GraftTable.fsOf(spark, abs)
    assert(GraftTable.versions(fs, abs).size == 3,
      "base + racer + exactly ONE merge commit (the lost attempt must " +
        "not have published)")
    val got = GraftTable.read(spark, abs).orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // serial-execution result: racer first, then the merge on its rows
    assert(got == Seq((1L, 10L), (2L, 220L), (3L, 33L), (4L, 400L),
      (5L, 50L)))
  }

  test("a raced MERGE under a SCHEMA-CHANGING racer refuses to rebase " +
      "when the widened head carries real values") {
    val abs = baseTable("schemarace")
    import spark.implicits._
    Seq((2L, 200L)).toDF("ckey", "delta")
      .createOrReplaceTempView("r18t_src2")
    val cmd = analyzedMerge(
      s"""MERGE INTO gt18t.`$abs` t USING r18t_src2 s ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |""".stripMargin)
    // racer reshapes the table AND rewrites data under the wider
    // schema: the new column carries REAL values the merge's resolved
    // attributes cannot express — rebasing would silently drop them
    // (a metadata-only ADD COLUMN racer, by contrast, rebases — see
    // Round19Spec). The data rewrite makes dataDirs differ, which is
    // exactly the guard.
    GraftTable.commitAddColumns(spark, abs, Seq(("tag", "string")),
      "racer adds a column")
    GraftTable.commitNextIsolated(spark, abs,
      GraftTable.read(spark, abs).withColumn("tag", lit("real")),
      "racer writes real values")
    val e = intercept[java.util.ConcurrentModificationException](
      cmd.run(spark))
    assert(e.getMessage.contains("cannot absorb"))
    // nothing half-landed: the table still serves the racer's head
    assert(GraftTable.versions(GraftTable.fsOf(spark, abs), abs).size == 3)
    assert(GraftTable.read(spark, abs).columns.toSeq ==
      Seq("key", "v", "tag"))
    assert(GraftTable.read(spark, abs).where(col("tag") === "real")
      .count() == 3)
  }

  test("a raced MERGE whose SOURCE reads the target refuses to rebase") {
    val abs = baseTable("selfsrc")
    // the source is a projection of the target table itself — pinned
    // to the pre-race snapshot; rebasing only the target would merge
    // stale rows into the racer's head
    val cmd = analyzedMerge(
      s"""MERGE INTO gt18t.`$abs` t
         |USING (SELECT key AS ckey, v * 2 AS delta FROM gt18t.`$abs`) s
         |ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |""".stripMargin)
    import spark.implicits._
    GraftTable.commitNextIsolated(spark, abs,
      GraftTable.read(spark, abs)
        .withColumn("v", col("v") + 1L), "racer", expectVersion = Some(0))
    val e = intercept[java.util.ConcurrentModificationException](
      cmd.run(spark))
    assert(e.getMessage.contains("source reads the same"))
    // nothing half-landed
    assert(GraftTable.versions(GraftTable.fsOf(spark, abs), abs).size == 2)
  }

  test("ordering claim survives pruning the partition column away " +
      "(aggregate without the key still plans)") {
    import spark.implicits._
    val dir = fresh("ordprune")
    sources.GraftTable.commitNextIsolated(spark, dir,
      Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L))
        .toDF("k", "p", "v"),
      "identity partby", partitionBy = Seq("p"))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // the query never references p: the scan prunes it, and the
      // ordering report must claim only columns the output still has —
      // a claim on the pruned column would throw at planning (ordering
      // resolution is strict, unlike partitioning's)
      val agg = spark.read.format("graft").load(dir)
        .agg(org.apache.spark.sql.functions.sum("v"))
      assert(agg.collect().head.getLong(0) == 60L)
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  // ---- large-deletion-vector read tier --------------------------------------

  test("DV tiers serve identical rows; the large tier never collects " +
      "keys on the driver") {
    val dir = fresh("dvtier")
    import spark.implicits._
    val base = (1L to 2000L).map(k => (k, s"row$k")).toDF("k", "s")
    sources.GraftTable.commitNextIsolated(spark, dir, base, "base")
    sources.GraftTable.commitDeleteVector(spark, dir,
      sources.GraftTable.read(spark, dir).where($"k" % 3 === 0),
      Seq("k"), "delete every third key")
    val expect = (1L to 2000L).filter(_ % 3 != 0).map(k => (k, s"row$k"))

    def served(): Seq[(Long, String)] =
      spark.read.format("graft").load(dir).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // tier 1: gate high → the broadcast set probe (collects once)
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "1000000")
    val before = sources.GraftDvInfo.driverCollects.get()
    assert(served() == expect)
    assert(sources.GraftDvInfo.driverCollects.get() > before,
      "the probe tier materializes the DV on the driver by design")

    // tier 2: gate low → the distributed anti-join; driver collect
    // count must NOT move, and the plan must carry the LeftAnti join
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "10")
    try {
      val large = spark.read.format("graft").load(dir)
      val after = sources.GraftDvInfo.driverCollects.get()
      assert(large.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == expect)
      assert(sources.GraftDvInfo.driverCollects.get() == after,
        "the large tier must never materialize DV keys on the driver")
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      import org.apache.spark.sql.catalyst.plans.logical.Join
      assert(large.queryExecution.optimizedPlan.exists {
        case j: Join => j.joinType == LeftAnti
        case _ => false
      }, "large tier must plan the distributed anti-join")
      assert(!large.queryExecution.executedPlan.toString
        .contains("BroadcastExchange") ||
        spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "the anti-join must not be FORCED broadcast (AQE may still " +
          "choose it from runtime sizes)")
    } finally spark.conf.unset("spark.graft.dv.broadcastMaxKeys")
  }

  test("scoped (MoR update) DVs route through the large tier too") {
    val dir = fresh("dvtierscoped")
    import spark.implicits._
    val base = (1L to 500L).map(k => (k, k * 10L)).toDF("k", "v")
    sources.GraftTable.commitNextIsolated(spark, dir, base, "base")
    // MoR UPDATE mints a dir-SCOPED dv (old images die in their dir,
    // the replacement dir carries the new rows)
    sources.GraftTable.commitUpdate(spark, dir, Seq("k"),
      org.apache.spark.sql.functions.col("k") <= 100L,
      Seq("v" -> org.apache.spark.sql.functions.lit(0L)), "zero first 100")
    val expect = (1L to 500L).map(k => (k, if (k <= 100) 0L else k * 10L))
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "10")
    try {
      val got = spark.read.format("graft").load(dir).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expect)
    } finally spark.conf.unset("spark.graft.dv.broadcastMaxKeys")
  }

  // ---- SupportsReportOrdering (sorted SPJ) -----------------------------------

  /** Execute first: under AQE the final operators only exist in the
    * adaptive plan's string after the run. */
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  private def sorts(df: DataFrame): Int = {
    df.collect()
    "\\bSort \\[".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("sorted bucket SPJ: SMJ runs with zero shuffles AND zero sorts; " +
      "values identical to the shuffled plan") {
    import spark.implicits._
    val a = fresh("ssrt_a"); val b = fresh("ssrt_b")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(4L)).cast("int"))
    // deliberately UNSORTED input rows — the engine's sortWithin
    // reshape is what makes the sortw= header true
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((11L, 110L), (2L, 20L), (5L, 50L), (1L, 10L), (6L, 60L))
        .toDF("k", "v"), "k"),
      "facts", partitionBy = Seq("cb"), bucketFn = Some((4, "k")),
      sortWithin = Seq("k"))
    sources.GraftTable.commitNextIsolated(spark, b,
      bucketed(Seq((7L, "d"), (1L, "a"), (6L, "c"), (5L, "b"))
        .toDF("ck", "s"), "ck"),
      "dim", partitionBy = Seq("cb"), bucketFn = Some((4, "ck")),
      sortWithin = Seq("ck"))
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    val (aa, ab) = (new java.io.File(a).getAbsolutePath,
      new java.io.File(b).getAbsolutePath)
    def q() = spark.sql(
      s"SELECT f.k, f.v, d.s FROM gt18t.`$aa` f " +
        s"JOIN gt18t.`$ab` d ON f.k = d.ck")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = q()
      assert(shuffles(off) > 0, "expected the ordinary shuffled plan")
      val offRows = off.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted
      assert(offRows == Seq((1L, 10L, "a"), (5L, 50L, "b"), (6L, 60L, "c")))
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val on = q()
      assert(shuffles(on) == 0, on.queryExecution.executedPlan.toString)
      val plan = on.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(sorts(on) == 0,
        s"the sortw= layout must elide BOTH sides' Sorts:\n$plan")
      assert(on.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted == offRows)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("sortw guards: declaration without partitionBy refuses; appends " +
      "drop the header; restore carries it") {
    import spark.implicits._
    val flat = fresh("ssrt_flat")
    val e = intercept[IllegalArgumentException] {
      sources.GraftTable.commitNextIsolated(spark, flat,
        Seq((1L, 2L)).toDF("k", "v"), "no layout",
        sortWithin = Seq("k"))
    }
    assert(e.getMessage.contains("partitionBy"))

    // an APPEND onto a sorted table mints a version WITHOUT sortw=
    // (the door doesn't carry it), so the claim disappears with the
    // guarantee instead of lying
    val a = fresh("ssrt_app")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(4L)).cast("int"))
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((1L, 10L), (5L, 50L)).toDF("k", "v"), "k"),
      "sorted base", partitionBy = Seq("cb"), bucketFn = Some((4, "k")),
      sortWithin = Seq("k"))
    val fs = sources.GraftTable.fsOf(spark, a)
    assert(sources.GraftTable.headersOf(fs, a, 0).contains("sortw"))
    // restore CARRIES it (data verbatim)
    sources.GraftTable.restoreVersion(spark, a, 0)
    assert(sources.GraftTable.headersOf(fs, a, 1).contains("sortw"))
    // the claim disappears with the guarantee instead of lying, via
    // BOTH doors that could break it: (1) the append door refuses
    // outright on any partitionBy layout (sortw implies one) — no
    // unsorted files can slip beside the sorted ones; (2) a full
    // rewrite that does NOT re-declare the order mints a version
    // WITHOUT sortw=
    val appendRefused = intercept[IllegalArgumentException] {
      sources.GraftTable.commitAppend(spark, a,
        bucketed(Seq((9L, 90L)).toDF("k", "v"), "k"), "unsorted tick")
    }
    assert(appendRefused.getMessage.contains("partitionBy"))
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((1L, 10L), (5L, 50L), (9L, 90L)).toDF("k", "v"), "k"),
      "rewrite, order not re-declared", partitionBy = Seq("cb"),
      bucketFn = Some((4, "k")))
    assert(!sources.GraftTable.headersOf(fs, a, 2).contains("sortw"),
      "an undeclared rewrite minted a version still claiming sortw=")
  }

  test("sortw at scale: byte-range-SPLIT sorted files keep the claim — " +
      "splits merge in offset order, SMJ stays sort-free, values exact") {
    import spark.implicits._
    val a = fresh("ssrt_split_a"); val b = fresh("ssrt_split_b")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(2L)).cast("int"))
    // enough rows that each bucket file is well past the tiny split
    // size forced below
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed((1L to 20000L).map(k => (k, k * 3L)).toDF("k", "v"), "k"),
      "facts", partitionBy = Seq("cb"), bucketFn = Some((2, "k")),
      sortWithin = Seq("k"))
    sources.GraftTable.commitNextIsolated(spark, b,
      bucketed((1L to 2000L).map(k => (k, s"s$k")).toDF("ck", "s"), "ck"),
      "dim", partitionBy = Seq("cb"), bucketFn = Some((2, "ck")),
      sortWithin = Seq("ck"))
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    val (aa, ab) = (new java.io.File(a).getAbsolutePath,
      new java.io.File(b).getAbsolutePath)
    def q() = spark.sql(
      s"SELECT f.k, f.v, d.s FROM gt18t.`$aa` f " +
        s"JOIN gt18t.`$ab` d ON f.k = d.ck")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // force the planner's EFFECTIVE split size far below the file
      // sizes: every bucket's single sorted file plans as MANY
      // byte-range splits — at real scale this is the normal state
      // (sorted bucket files outgrow the split size), and the tier
      // must keep working: spjRegroup collapses each claimed group to
      // ONE partition with the splits in (path, offset) order, so rows
      // still stream in file order and the claim holds
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val on = q()
      val nShuffles = shuffles(on)
      val nSorts = sorts(on)
      val plan = on.queryExecution.executedPlan.toString
      assert(nShuffles == 0, s"SPJ grouping itself still engages:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(nSorts == 0,
        "split sorted files must still sustain the ordering claim " +
          s"(offset-ordered merge):\n$plan")
      // and the values are still exact — the real proof the merged
      // split order is the file order
      assert(on.count() == 2000L)
      assert(on.where(col("k") =!= col("ck")).count() == 0L)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("sortw guard: a MULTI-FILE group withholds the ordering claim — " +
      "concatenating two sorted files is not sorted") {
    import spark.implicits._
    val a = fresh("ssrt_mf_a"); val b = fresh("ssrt_mf_b")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(2L)).cast("int"))
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((1L, 10L), (3L, 30L), (2L, 20L)).toDF("k", "v"), "k"),
      "facts", partitionBy = Seq("cb"), bucketFn = Some((2, "k")),
      sortWithin = Seq("k"))
    sources.GraftTable.commitNextIsolated(spark, b,
      bucketed(Seq((1L, "a"), (3L, "c"), (9L, "z")).toDF("ck", "s"), "ck"),
      "dim", partitionBy = Seq("cb"), bucketFn = Some((2, "ck")),
      sortWithin = Seq("ck"))
    // TAMPER SIMULATION: drop a second (itself sorted, invariant-
    // respecting) file into one of A's bucket dirs — the layout no
    // longer guarantees a per-group total order, and the scan must
    // withhold the claim rather than serve a lying merge
    val fs = sources.GraftTable.fsOf(spark, a)
    val dataDir = fs.listStatus(new org.apache.hadoop.fs.Path(a))
      .map(_.getPath.getName).find(_.startsWith("v0_")).get
    val groupDir = s"$a/$dataDir/cb=1"
    val tmp = fresh("ssrt_mf_tmp")
    Seq((9L, 90L)).toDF("k", "v").coalesce(1).write.parquet(tmp)
    val extra = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(extra,
      new org.apache.hadoop.fs.Path(s"$groupDir/zz_extra.parquet"))
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    val (aa, ab) = (new java.io.File(a).getAbsolutePath,
      new java.io.File(b).getAbsolutePath)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val on = spark.sql(
        s"SELECT f.k, f.v, d.s FROM gt18t.`$aa` f " +
          s"JOIN gt18t.`$ab` d ON f.k = d.ck")
      assert(shuffles(on) == 0)
      assert(sorts(on) > 0,
        "a two-file group must NOT sustain the ordering claim:\n" +
          on.queryExecution.executedPlan.toString)
      assert(on.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted ==
        Seq((1L, 10L, "a"), (3L, 30L, "c"), (9L, 90L, "z")))
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("large-DV tier serves the READ side of a write statement (CTAS " +
      "export) without a driver collect") {
    val dir = fresh("dvctas")
    import spark.implicits._
    sources.GraftTable.commitNextIsolated(spark, dir,
      (1L to 3000L).map(k => (k, k % 7L)).toDF("k", "v"), "base")
    sources.GraftTable.commitDeleteVector(spark, dir,
      sources.GraftTable.read(spark, dir).where($"k" % 2 === 0),
      Seq("k"), "delete evens")
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    val abs = new java.io.File(dir).getAbsolutePath
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "10")
    spark.sql("DROP TABLE IF EXISTS dv_export_r18")
    try {
      val before = sources.GraftDvInfo.driverCollects.get()
      spark.sql(
        s"CREATE TABLE dv_export_r18 USING parquet AS " +
          s"SELECT k, v FROM gt18t.`$abs` WHERE v < 3")
      assert(sources.GraftDvInfo.driverCollects.get() == before,
        "the CTAS read side must use the distributed anti-join tier, " +
          "not the driver-collected set probe")
      val got = spark.table("dv_export_r18").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = (1L to 3000L).filter(_ % 2 == 1).map(k => (k, k % 7L))
        .filter(_._2 < 3)
      assert(got == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dv_export_r18")
      spark.conf.unset("spark.graft.dv.broadcastMaxKeys")
    }
  }

  test("path-read bucket SPJ: the PATH door plans the same shuffle-free " +
      "join as the catalog door") {
    import spark.implicits._
    val a = fresh("pbkt_a"); val b = fresh("pbkt_b")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(4L)).cast("int"))
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((1L, 10L), (2L, 20L), (5L, 50L), (6L, 60L), (11L, 110L))
        .toDF("k", "v"), "k"),
      "facts", partitionBy = Seq("cb"), bucketFn = Some((4, "k")))
    sources.GraftTable.commitNextIsolated(spark, b,
      bucketed(Seq((1L, "a"), (5L, "b"), (6L, "c"), (7L, "d"))
        .toDF("ck", "s"), "ck"),
      "dim", partitionBy = Seq("cb"), bucketFn = Some((4, "ck")))
    def q() = spark.read.format("graft").load(a)
      .join(spark.read.format("graft").load(b),
        col("k") === col("ck"))
      .select(col("k"), col("v"), col("s"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val on = q()
      assert(shuffles(on) == 0,
        "path-read bucket SPJ must not silently shuffle:\n" +
          on.queryExecution.executedPlan.toString)
      assert(on.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted ==
        Seq((1L, 10L, "a"), (5L, 50L, "b"), (6L, 60L, "c")))
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("API read path: the DV anti-join is broadcast-HINTED only under " +
      "the footer-counted gate") {
    val dir = fresh("dvhint")
    import spark.implicits._
    sources.GraftTable.commitNextIsolated(spark, dir,
      (1L to 1000L).map(k => (k, k * 2L)).toDF("k", "v"), "base")
    sources.GraftTable.commitDeleteVector(spark, dir,
      sources.GraftTable.read(spark, dir).where($"k" % 4 === 0),
      Seq("k"), "delete every fourth")
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    def hints(df: DataFrame): Seq[JoinHint] =
      df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    // under the gate: hinted broadcast (the point-delete fast path)
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "1000000")
    assert(hints(sources.GraftTable.read(spark, dir))
      .exists(_ != JoinHint.NONE), "small DV must keep the broadcast hint")
    // past the gate: NO hint — the build side must never be forced
    // through the driver; AQE may still choose broadcast from runtime
    // sizes, which is fine (that path is size-bounded)
    spark.conf.set("spark.graft.dv.broadcastMaxKeys", "10")
    try {
      val large = sources.GraftTable.read(spark, dir)
      assert(hints(large).forall(_ == JoinHint.NONE),
        "a large DV must not be broadcast-hinted")
      assert(large.count() == 750L)
    } finally spark.conf.unset("spark.graft.dv.broadcastMaxKeys")
  }

  test("compaction preserves the sortw layout: header carried, join " +
      "still sort-free after OPTIMIZE") {
    import spark.implicits._
    val a = fresh("ssrt_cmp_a"); val b = fresh("ssrt_cmp_b")
    def bucketed(df: DataFrame, key: String) =
      df.withColumn("cb",
        org.apache.spark.sql.functions.pmod(col(key), lit(4L)).cast("int"))
    sources.GraftTable.commitNextIsolated(spark, a,
      bucketed(Seq((11L, 110L), (2L, 20L), (5L, 50L), (1L, 10L), (6L, 60L))
        .toDF("k", "v"), "k"),
      "facts", partitionBy = Seq("cb"), bucketFn = Some((4, "k")),
      sortWithin = Seq("k"))
    sources.GraftTable.commitNextIsolated(spark, b,
      bucketed(Seq((7L, "d"), (1L, "a"), (6L, "c"), (5L, "b"))
        .toDF("ck", "s"), "ck"),
      "dim", partitionBy = Seq("cb"), bucketFn = Some((4, "ck")),
      sortWithin = Seq("ck"))
    sources.GraftTable.compactChain(spark, a, metadata = "optimize")
    sources.GraftTable.compactChain(spark, b, metadata = "optimize")
    val fs = sources.GraftTable.fsOf(spark, a)
    assert(sources.GraftTable.headersOf(fs, a, 1).get("sortw")
      .contains("k"), "OPTIMIZE must re-earn the sortw declaration")
    spark.conf.set("spark.sql.catalog.gt18t",
      classOf[graft.sources.GraftCatalog].getName)
    val (aa, ab) = (new java.io.File(a).getAbsolutePath,
      new java.io.File(b).getAbsolutePath)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val on = spark.sql(
        s"SELECT f.k, f.v, d.s FROM gt18t.`$aa` f " +
          s"JOIN gt18t.`$ab` d ON f.k = d.ck")
      assert(shuffles(on) == 0)
      assert(sorts(on) == 0,
        "the compacted sortw layout must still elide the SMJ Sorts:\n" +
          on.queryExecution.executedPlan.toString)
      assert(on.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted ==
        Seq((1L, 10L, "a"), (5L, 50L, "b"), (6L, 60L, "c")))
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("table_merge_concurrent: both racing SQL merges land (3 versions)") {
    val df = SparkEntry.queries("table_merge_concurrent")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("n_versions") == 3),
      "base + two merge commits — 2 means a merge was lost, 4 a double apply")
  }
}
