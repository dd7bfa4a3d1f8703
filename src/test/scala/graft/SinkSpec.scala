package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** INSERT OVERWRITE semantics on the partitioned lake layout: dynamic
  * partition overwrite replaces ONLY the partitions present in the
  * incoming batch (the reference's per-dt backfill idiom) — static mode
  * would clobber the whole table. */
class SinkSpec extends SparkSpec {

  test("csv source: PERMISSIVE captures corrupt records, DROPMALFORMED drops") {
    import spark.implicits._
    val path = "/root/repo/target/tmp/csv_malformed"
    Seq("1,alpha,2.5", "oops,beta", "3,gamma,7.0").toDF("line")
      .coalesce(1).write.mode(SaveMode.Overwrite).text(path)
    val schema = "id INT, name STRING, v DOUBLE, _corrupt_record STRING"
    // Spark disallows querying ONLY the corrupt column off the raw scan —
    // materialize the rows first (the documented cache/collect workaround)
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path).collect()
    assert(permissive.length == 3)
    assert(permissive.count(r => !r.isNullAt(3)) == 1)
    assert(permissive.find(r => !r.isNullAt(0) && r.getInt(0) == 1)
      .exists(_.getString(1) == "alpha"))
    // collect() (not count()) — CSV column pruning would otherwise parse
    // zero fields and never detect the malformed row
    val dropped = spark.read.schema("id INT, name STRING, v DOUBLE")
      .option("mode", "DROPMALFORMED").csv(path).collect()
    assert(dropped.length == 2)
    assert(dropped.map(_.getDouble(2)).sum == 9.5)
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    // The 100 TB co-location story (SURVEY §4.2): two fact tables
    // bucketed on the join key join WITHOUT an Exchange — at scale this
    // is the difference between a local merge and reshuffling 100 TB.
    val orders = T.t(spark, sf, "orders")
    val lineitem = T.t(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a failed prior run can leave the managed location without the table
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"/root/repo/target/spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode(SaveMode.Overwrite).saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode(SaveMode.Overwrite).saveAsTable("b_lineitem")
    // disable broadcast so the join exercises the co-located merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == lineitem.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("zstd parquet round trip (the 100 TB codec choice)") {
    val path = "/root/repo/target/tmp/zstd_roundtrip"
    val ev = T.events(spark, sf).select("event_id", "event_type", "value")
    ev.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains("zstd")))
    assert(spark.read.parquet(path).orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)
  }

  test("DISTRIBUTE BY + SORT BY: partition-local sort without global shuffle-sort") {
    // The Hive cluster-by idiom: co-partition by key, sort within each
    // partition — what a partitioned+sorted lake write uses at scale.
    val df = T.t(spark, sf, "orders")
      .repartition(4, col("o_custkey"))
      .sortWithinPartitions("o_custkey", "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && plan.contains("false, 0"), plan) // global=false
    // every partition is locally sorted
    import spark.implicits._
    val violations = df.select("o_custkey", "o_orderkey")
      .mapPartitions { it =>
        var prev: (Long, Long) = null
        var bad = 0
        it.foreach { r =>
          val cur = (r.getLong(0), r.getLong(1))
          if (prev != null && Ordering[(Long, Long)].gt(prev, cur)) bad += 1
          prev = cur
        }
        Iterator.single(bad)
      }.collect().sum
    assert(violations == 0)
  }

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
