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

  test("a raced MERGE under a SCHEMA-CHANGING racer refuses to rebase") {
    val abs = baseTable("schemarace")
    import spark.implicits._
    Seq((2L, 200L)).toDF("ckey", "delta")
      .createOrReplaceTempView("r18t_src2")
    val cmd = analyzedMerge(
      s"""MERGE INTO gt18t.`$abs` t USING r18t_src2 s ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |""".stripMargin)
    // racer reshapes the table: the resolved attributes no longer
    // describe it, so binding them to the new head would be a guess
    GraftTable.commitAddColumns(spark, abs, Seq(("tag", "string")),
      "racer adds a column")
    val e = intercept[java.util.ConcurrentModificationException](
      cmd.run(spark))
    assert(e.getMessage.contains("cannot be rebased"))
    // nothing half-landed: the table still serves the racer's head
    assert(GraftTable.versions(GraftTable.fsOf(spark, abs), abs).size == 2)
    assert(GraftTable.read(spark, abs).columns.toSeq ==
      Seq("key", "v", "tag"))
  }

  test("table_merge_concurrent: both racing SQL merges land (3 versions)") {
    val df = SparkEntry.queries("table_merge_concurrent")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("n_versions") == 3),
      "base + two merge commits — 2 means a merge was lost, 4 a double apply")
  }
}
