package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** INSERT OVERWRITE semantics on the partitioned lake layout: dynamic
  * partition overwrite replaces ONLY the partitions present in the
  * incoming batch (the reference's per-dt backfill idiom) — static mode
  * would clobber the whole table. */
class SinkSpec extends SparkSpec {

  test("compactParquet: fewer files, identical content") {
    val raw = "/root/repo/target/tmp/compact_raw"
    val out = "/root/repo/target/tmp/compact_out"
    val ev = T.events(spark, sf).select("event_id", "user_id", "value")
    ev.repartition(16).write.mode(SaveMode.Overwrite).parquet(raw)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(raw) == 16)
    Graft.compactParquet(spark, raw, out, 2)
    assert(files(out) == 2)
    val a = spark.read.parquet(raw).orderBy("event_id").collect()
    val b = spark.read.parquet(out).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("dynamic partition overwrite touches only the written dt") {
    val path = "/root/repo/target/tmp/sink_dynamic_overwrite_test"
    val ev = T.events(spark, sf).withColumn("dt", col("ts").cast("date"))
      .select("event_id", "user_id", "value", "dt")
    ev.write.partitionBy("dt").mode(SaveMode.Overwrite).parquet(path)
    val before = spark.read.parquet(path).groupBy("dt").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap

    val day = before.keys.min
    // backfill one day with a halved slice, dynamic overwrite
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      ev.filter(col("dt") === lit(day).cast("date"))
        .filter(col("event_id") % 2 === 0)
        .write.partitionBy("dt").mode(SaveMode.Overwrite).parquet(path)
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    }
    val after = spark.read.parquet(path).groupBy("dt").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap

    assert(after.keySet == before.keySet, "other partitions survived")
    assert(after(day) < before(day), "target partition was replaced")
    (before.keySet - day).foreach { d =>
      assert(after(d) == before(d), s"partition $d must be untouched")
    }
  }
}
