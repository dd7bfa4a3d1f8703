package graft

import org.apache.spark.sql.functions._

/** Round-11 hardening specs. */
class Round11Spec extends SparkSpec {

  test("etl_incremental_watermark: crash between stage and commit cannot double-count") {
    val dir = "target/tmp/wmetl_crash"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val cut1 = 1705276800000000L // Jan 15 00:00 UTC

    // run 1 commits normally
    ops.Round10Ops.incrementalDailyLoad(spark, sf, dir, cut1)
    def table() = ops.Round10Ops.currentDaily(spark, dir)
      .select(col("day"), col("cnt"), T.money(col("sv")).as("sum_val"))
      .orderBy("day").collect().toSeq
    val afterRun1 = table()

    // run 2 "crashes": the next version is fully staged on disk but the
    // manifest commit never happens — the exact window the old
    // swap-then-write-watermark sequence double-counted in
    ops.Round10Ops.stageDailyVersion(spark, sf, dir, Long.MaxValue)

    // a reader AFTER the crash still resolves run 1's table and
    // watermark — the orphaned staging dir is invisible
    assert(ops.Round10Ops.currentWatermark(spark, dir) === cut1)
    assert(table() === afterRun1,
      "reader observed an uncommitted staged version")

    // the RETRY of run 2 must converge to the one-shot recompute — the
    // staged-but-uncommitted batch must not be applied twice
    ops.Round10Ops.incrementalDailyLoad(spark, sf, dir, Long.MaxValue)
    val oneShot = T.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        T.money(sum(T.dec(col("value")))).as("sum_val"))
      .orderBy("day").collect().toSeq
    assert(table() === oneShot,
      "retry after stage-crash double-counted the last batch")
    assert(ops.Round10Ops.currentWatermark(spark, dir) === Long.MaxValue)
  }

  test("upsertBatch: no committed row is lost across swaps; old dir cleaned up") {
    import spark.implicits._
    val dir = "target/tmp/upsert_r11"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".old"), true)
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".next"), true)
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T00:00:00Z"))
    val b1 = Seq((1L, t0, 10L, "view", 1.0), (2L, t0, 11L, "click", 2.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val b2 = Seq((1L, t1, 12L, "purchase", 3.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    ops.StreamingOps.upsertBatch(spark, b1, dir)
    ops.StreamingOps.upsertBatch(spark, b2, dir)
    val rows = spark.read.parquet(dir)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // user 1 upserted to its latest event, user 2 untouched
    assert(rows === Seq((1L, 12L), (2L, 11L)))
    // the rename-aside scratch dirs do not accumulate
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".next")))
  }
}
