package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable

/** Round-15 surface: the DSv2 table (`spark.read.format("graft")`),
  * manifest-pruned scans, DV-filtered reads, manifest statistics. */
class Round15Spec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val dir = s"target/tmp/r15_${tag}"
    val fs = GraftTable.fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    dir
  }

  test("dsv2: current snapshot and time travel match the API read path") {
    val dir = freshDir("dsv2read")
    val n = T.t(spark, sf, "nation").select(col("n_nationkey"), col("n_name"))
    GraftTable.commitNextIsolated(spark, dir, n.where(col("n_nationkey") < 10),
      "v0")
    GraftTable.commitNextIsolated(spark, dir, n, "v1")

    val cur = spark.read.format("graft").load(dir)
    assert(cur.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
    assert(cur.count() == n.count())
    assert(cur.exceptAll(GraftTable.read(spark, dir)).isEmpty &&
      GraftTable.read(spark, dir).exceptAll(cur).isEmpty)

    val v0 = spark.read.format("graft").option("version", 0).load(dir)
    assert(v0.count() == 10)
    assert(v0.exceptAll(GraftTable.readVersion(spark, dir, 0)).isEmpty)

    // timestampAsOf resolves through the ts= headers like readAsOf
    val fs = GraftTable.fsOf(spark, dir)
    val t0 = GraftTable.commitTimeMs(fs, dir, 0)
    val asOf = spark.read.format("graft")
      .option("timestampAsOf", t0.toString).load(dir)
    assert(asOf.count() == 10)
  }

  /** Files the physical scan actually plans, from the BatchScanExec's
    * partitions — the read-set truth every pruning assertion audits. */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case b: BatchScanExec => b }
    assert(scans.size == 1, s"expected one BatchScanExec, got $plan")
    scans.head.inputPartitions.flatMap {
      case fp: FilePartition => fp.files.map(_.toPath.toUri.getPath).toSeq
      case _ => Seq.empty
    }
  }

  test("dsv2: pushed band filter prunes files through statenc stats") {
    val dir = freshDir("dsv2band")
    val o = T.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), T.dec(col("o_totalprice")).as("o_totalprice"))
      .repartitionByRange(4, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
    GraftTable.commitNextIsolated(spark, dir, o, "banded",
      statsEnc = Seq("o_orderdate" -> "us"))

    val t = spark.read.format("graft").load(dir)
    val all = plannedFiles(t.select(col("o_orderkey")))
    assert(all.size == 4, s"expected 4 files, planned $all")

    val lo = java.sql.Date.valueOf("1995-06-01")
    val hi = java.sql.Date.valueOf("1995-06-30")
    val sliced = t.where(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
    val planned = plannedFiles(sliced)
    assert(planned.nonEmpty && planned.size < all.size,
      s"band should prune: planned ${planned.size} of ${all.size}")
    // the pruned read is still row-exact vs the API path
    val apiRows = GraftTable.read(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") <= hi).count()
    assert(sliced.count() == apiRows && apiRows > 0)
    // per-file ground truth: planned files == files that actually hold
    // matching rows (tight ranges by construction of the sorted layout)
    val truth = GraftTable.read(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
      .select(input_file_name()).distinct()
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    assert(truth.subsetOf(planned.toSet),
      s"pruning must never drop a matching file: $truth vs $planned")
  }

  test("dsv2: bloom equality probe prunes to the sidecar's candidates") {
    val dir = freshDir("dsv2bloom")
    val o = T.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).repartition(6)
    GraftTable.commitNextIsolated(spark, dir, o, "bloomed",
      bloomCol = Some("o_custkey"))
    val t = spark.read.format("graft").load(dir)
    val all = plannedFiles(t.select(col("o_orderkey")))
    assert(all.size == 6)

    // an absent key plans NOTHING (the 10^5-file point of the index)
    val absent = t.where(col("o_custkey") === lit(-12345L))
    assert(plannedFiles(absent).isEmpty && absent.count() == 0)

    // a present key plans exactly the sidecar's candidate set and stays
    // row-exact
    val key = o.select("o_custkey").where(col("o_custkey").isNotNull)
      .head().getLong(0)
    val hitDf = t.where(col("o_custkey") === lit(key))
    val (apiDf, apiHit, total) =
      GraftTable.readBloomEq(spark, dir, 0, "o_custkey", key)
    assert(total == 6)
    val plannedHit = plannedFiles(hitDf).toSet
    val apiHitCanon = apiHit
      .map(p => GraftTable.fsOf(spark, dir)
        .makeQualified(new org.apache.hadoop.fs.Path(p))
        .toUri.normalize().getPath).toSet
    assert(plannedHit == apiHitCanon,
      s"DSv2 and API bloom read-sets must agree: $plannedHit vs $apiHitCanon")
    assert(hitDf.count() ==
      GraftTable.read(spark, dir).where(col("o_custkey") === key).count())
  }

  test("dsv2: deletion vector applies inside the scan, key col prunable") {
    val dir = freshDir("dsv2dv")
    val c = T.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    GraftTable.commitNextIsolated(spark, dir, c, "base")
    val dead = c.where(col("c_custkey") % 7 === 0).select("c_custkey")
    GraftTable.commitDeleteVector(spark, dir, dead, Seq("c_custkey"))

    val t = spark.read.format("graft").load(dir)
    val api = GraftTable.read(spark, dir)
    assert(t.count() == api.count())
    assert(t.exceptAll(api).isEmpty && api.exceptAll(t).isEmpty)
    // a projection that DROPS the key column still filters by it (the
    // scan force-reads the key internally and projects it back out)
    val names = t.select(col("c_name"))
    assert(names.schema.fieldNames.toSeq == Seq("c_name"))
    assert(names.count() == api.count())
    // time travel BEFORE the delete sees everything
    assert(spark.read.format("graft").option("version", 0).load(dir)
      .count() == c.count())
  }

  test("dsv2: manifest statistics flip the join to broadcast exactly when small") {
    val dir = freshDir("dsv2stats")
    val o = T.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
    GraftTable.commitNextIsolated(spark, dir, o, "statted",
      statsEnc = Seq("o_orderdate" -> "us"))
    // the probe side is lineitem — far over any threshold we pick, so
    // the ONLY broadcast candidate is the graft scan itself
    val li = T.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))

    def joinPlan(pruned: Boolean): String = {
      val t = spark.read.format("graft").load(dir)
      val right =
        if (pruned) t.where(col("o_orderdate") >=
          java.sql.Date.valueOf("1995-06-01") &&
          col("o_orderdate") < java.sql.Date.valueOf("1995-07-01"))
        else t
      val j = li.join(right, li("l_orderkey") === right("o_orderkey"))
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      plan.toString
    }
    // threshold between the pruned slice's size and the 8-file full
    // size: the SAME join flips on manifest pruning alone, at initial
    // planning time (inputPlan — before any AQE runtime re-plan)
    val fs = GraftTable.fsOf(spark, dir)
    val dataDir = GraftTable.dataDirsOf(fs, dir, 0).head
    val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$dataDir"))
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen)
    val threshold = sizes.min * 3 // ≥ the ~1-2 pruned files, < all 8
    assert(threshold < sizes.sum)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
      val full = joinPlan(pruned = false)
      val sliced = joinPlan(pruned = true)
      assert(!full.contains("BroadcastHashJoin"),
        s"full scan (${sizes.sum}B) must exceed the $threshold threshold:\n$full")
      assert(sliced.contains("BroadcastHashJoin"),
        s"pruned scan must broadcast under the $threshold threshold:\n$sliced")
    }
  }

  test("catalog: SQL addressing, time travel, create/drop") {
    spark.conf.set("spark.sql.catalog.gt",
      classOf[graft.sources.GraftCatalog].getName)
    val dir = freshDir("cat")
    val n = T.t(spark, sf, "nation").select(col("n_nationkey"), col("n_name"))
    GraftTable.commitNextIsolated(spark, dir, n.where(col("n_nationkey") < 5),
      "v0")
    GraftTable.commitNextIsolated(spark, dir, n, "v1")
    val abs = new java.io.File(dir).getAbsolutePath

    assert(spark.sql(s"SELECT * FROM gt.`$abs`").count() == n.count())
    assert(spark.sql(s"SELECT * FROM gt.`$abs` VERSION AS OF 0")
      .count() == 5)
    val t0 = GraftTable.commitTimeMs(GraftTable.fsOf(spark, dir), dir, 0)
    assert(spark.sql(
      s"SELECT * FROM gt.`$abs` TIMESTAMP AS OF " +
        s"timestamp_millis(${t0}L)").count() == 5)

    // warehouse-resolved names + CREATE/DROP round trip
    spark.conf.set("spark.sql.catalog.wh",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wh.warehouse", "target/tmp/r15_wh")
    val fsw = GraftTable.fsOf(spark, "target/tmp/r15_wh")
    fsw.delete(new org.apache.hadoop.fs.Path("target/tmp/r15_wh"), true)
    spark.sql("CREATE TABLE wh.t15 (k BIGINT, s STRING) USING graft")
    assert(spark.sql("SELECT * FROM wh.t15").count() == 0)
    // the minted v0 carries the schema header: the gate now binds
    GraftTable.commitNextIsolated(spark, "target/tmp/r15_wh/t15",
      spark.range(3).selectExpr("id AS k", "CAST(id AS STRING) AS s"))
    assert(spark.sql("SELECT * FROM wh.t15").count() == 3)
    assert(spark.sql("SHOW TABLES IN wh").collect()
      .map(_.getString(1)).contains("t15"))
    spark.sql("DROP TABLE wh.t15")
    assert(!new java.io.File("target/tmp/r15_wh/t15").exists())
  }

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
