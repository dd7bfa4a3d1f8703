package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.StreamingOps

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
case class DocEv(doc_id: Long, text: String, ts: Timestamp)

/** Streaming golden tier (SURVEY §5.2): MemoryStream micro-batches prove
  * the incremental path — watermark late-drop, stateful accumulation, and
  * batch/stream parity on the shared tumbling plan. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream_tumbling_1h: streaming result equals batch result on same input") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:55:00"), "click", 2.0, 2L),
      Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 1L),
      Ev(ts("2024-01-01 11:59:59"), "click", 8.0, 3L))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode(OutputMode.Complete).start()
    mem.addData(data: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumb").orderBy("ws", "event_type").collect()
    val batch = StreamingOps.tumblingAgg(data.toDF())
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream_watermark_late: events later than watermark are dropped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.tumblingStream(mem.toDF())
      .writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append).start()
    // Batch 1: events up to 12:00 → watermark advances to 11:50.
    mem.addData(Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 12:00:00"), "view", 2.0, 2L))
    q.processAllAvailable()
    // Batch 2: a late event at 10:30 — its 10:00 window is < watermark,
    // so it must NOT resurrect the finalized window.
    mem.addData(Ev(ts("2024-01-01 10:30:00"), "click", 64.0, 1L))
    q.processAllAvailable()
    // Batch 3: advance watermark far so all live windows finalize.
    mem.addData(Ev(ts("2024-01-01 15:00:00"), "view", 4.0, 2L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wm").collect()
    val w10 = rows.filter(_.getAs[Timestamp]("ws") == ts("2024-01-01 10:00:00"))
    assert(w10.length == 1, s"10:00 window emitted once, got ${w10.toSeq}")
    // Late 64.0 dropped: the 10:00 click window holds only the 1.0 event.
    assert(w10.head.getAs[Long]("cnt") == 1L)
    assert(w10.head.getAs[Double]("sum_val") == 1.0)
  }

  test("stream_stateful_count: per-user state accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.statefulRunningCount(spark, mem.toDF())
      .writeStream.format("memory").queryName("stc")
      .outputMode(OutputMode.Update).start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.5, 7L))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 10:01:00"), "click", 2.5, 7L),
      Ev(ts("2024-01-01 10:02:00"), "view", 10.0, 8L))
    q.processAllAvailable(); q.stop()
    val last = spark.table("stc").groupBy("user_id")
      .agg(max("cnt").as("cnt"), max("sum_val").as("sum_val"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(7L) == (2L, 4.0))
    assert(last(8L) == (1L, 10.0))
  }

  test("transformWithState: per-user ValueState accumulates across micro-batches") {
    // Spark 4's arbitrary-state surface requires the RocksDB state store.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = StreamingOps.statefulRunningCountTws(spark, mem.toDF())
        .writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update).start()
      mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.5, 7L))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 10:01:00"), "click", 2.5, 7L),
        Ev(ts("2024-01-01 10:02:00"), "view", 10.0, 8L))
      q.processAllAvailable(); q.stop()
      val last = spark.table("tws").groupBy("user_id")
        .agg(max("cnt").as("cnt"), max("sum_val").as("sum_val"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // identical cross-batch state to the mapGroupsWithState twin
      assert(last(7L) == (2L, 4.0))
      assert(last(8L) == (1L, 10.0))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream interval join: clicks within 5 min before purchase") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("ts").as("c_ts"), col("user_id").as("c_user"),
        col("value").as("click_v"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("ts").as("p_ts"), col("user_id").as("p_user"),
        col("value").as("purchase_v"))
    val joined = p.join(c,
      expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 5 MINUTES AND p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    clicks.addData(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:07:00"), "click", 2.0, 1L),
      Ev(ts("2024-01-01 10:09:00"), "click", 3.0, 2L))
    purchases.addData(Ev(ts("2024-01-01 10:10:00"), "purchase", 99.0, 1L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj").select("click_v").collect().map(_.getDouble(0)).sorted
    // only user 1's click at 10:07 is within [10:05, 10:10]
    assert(rows.toSeq == Seq(2.0), rows.toSeq.toString)
  }

  test("file sink: streaming parquet writes with checkpoint, readable batch-side") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val out = "/root/repo/target/tmp/stream_file_sink"
    val ckpt = "/root/repo/target/tmp/stream_file_sink_ckpt"
    for (d <- Seq(out, ckpt)) {
      val f = new java.io.File(d)
      if (f.exists()) { // clean between runs: checkpoint pins old batches
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
        }
        rm(f)
      }
    }
    val mem = MemoryStream[Ev]
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:01:00"), "view", 2.0, 2L))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 10:02:00"), "click", 3.0, 1L))
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.agg(sum("value")).collect()(0).getDouble(0) == 6.0)
  }

  test("file source: files appearing in a directory arrive as micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = "/root/repo/target/tmp/stream_file_source"
    val f = new java.io.File(dir)
    if (f.exists()) {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); ()
      }
      rm(f)
    }
    f.mkdirs()
    // batch 1 on disk BEFORE the stream starts
    Seq((1L, 10.0)).toDF("id", "v").write.parquet(s"$dir/p1")
    val sdf = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v DOUBLE"))
      .option("recursiveFileLookup", "true")
      .parquet(dir)
    val q = sdf.writeStream.format("memory").queryName("fsrc")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    assert(spark.table("fsrc").count() == 1)
    // batch 2 lands while the stream is running
    Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v").write.parquet(s"$dir/p2")
    q.processAllAvailable(); q.stop()
    assert(spark.table("fsrc").count() == 3)
    assert(spark.table("fsrc").agg(sum("v")).head.getDouble(0) == 60.0)
  }

  test("foreachBatch: micro-batches merge into a batch table") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.groupBy("user_id").agg(sum("value").as("s")).collect()
          .foreach(r => acc.add((r.getLong(0), r.getDouble(1))))
      }.start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.5, 7L))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 10:01:00"), "view", 2.5, 7L))
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val byUser = acc.asScala.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byUser(7L) == 4.0)
  }

  test("session windows merge out-of-order events into one session") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.sessionStream(mem.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    // Batch 1: two events 40 min apart — two provisional sessions.
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:40:00"), "click", 2.0, 1L))
    q.processAllAvailable()
    // Batch 2: out-of-order 10:20 (>= watermark 10:10) bridges the gap —
    // the two sessions must merge into one [10:00, 11:10).
    mem.addData(Ev(ts("2024-01-01 10:20:00"), "click", 4.0, 1L))
    q.processAllAvailable()
    // Batch 3: advance the watermark past 11:10 so the session finalizes.
    mem.addData(Ev(ts("2024-01-01 13:00:00"), "view", 8.0, 2L))
    q.processAllAvailable(); q.stop()
    val u1 = spark.table("sess").filter(col("user_id") === 1L).collect()
    assert(u1.length == 1, s"expected one merged session, got ${u1.toSeq}")
    assert(u1.head.getAs[Timestamp]("ws") == ts("2024-01-01 10:00:00"))
    assert(u1.head.getAs[Timestamp]("we") == ts("2024-01-01 11:10:00"))
    assert(u1.head.getAs[Long]("cnt") == 3L)
    assert(u1.head.getAs[Double]("sum_val") == 7.0)
  }

  test("stream-static join: stream enriched against a broadcast dim table") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5)).toDF("event_type", "weight")
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .join(broadcast(dim), Seq("event_type"))
      .select(col("user_id"), (col("value") * col("weight")).as("wv"))
      .writeStream.format("memory").queryName("ssdim")
      .outputMode(OutputMode.Append).start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 4.0, 1L),
      Ev(ts("2024-01-01 10:01:00"), "view", 4.0, 1L),
      Ev(ts("2024-01-01 10:02:00"), "purchase", 9.0, 2L)) // no dim row → dropped
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssdim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._2)
    assert(rows.toSeq == Seq((1L, 2.0), (1L, 4.0)), rows.toSeq.toString)
  }

  test("flatMapGroupsWithState sessionizer emits on event-time timeout") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.sessionizeState(spark, mem.toDF())
      .writeStream.format("memory").queryName("fmgs")
      .outputMode(OutputMode.Append).start()
    // one session for user 1: 10:00 and 10:10 (inside the 30-min gap)
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:10:00"), "click", 2.0, 1L))
    q.processAllAvailable()
    // advance the watermark well past 10:10 + 30 min so the session
    // times out (watermark for a batch comes from the previous one —
    // two advancing batches make the timeout deterministic)
    mem.addData(Ev(ts("2024-01-01 12:00:00"), "view", 1.0, 2L))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 12:30:00"), "view", 1.0, 2L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("fmgs").filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 2, 600L)), rows.toSeq.toString)
  }

  test("transformWithState event-time timer closes the session like the GroupState twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = StreamingOps.sessionizeTws(spark, mem.toDF())
        .writeStream.format("memory").queryName("twstimer")
        .outputMode(OutputMode.Append).start()
      // same batches as the flatMapGroupsWithState golden test
      mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:10:00"), "click", 2.0, 1L))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 12:00:00"), "view", 1.0, 2L))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 12:30:00"), "view", 1.0, 2L))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("twstimer").filter(col("user_id") === 1L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 2, 600L)), rows.toSeq.toString)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream_dedup within watermark drops duplicate (user_id,event_id)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    case class E2(ts: Timestamp, user_id: Long, event_id: Long)
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val q = mem.toDF().toDF("ts", "user_id", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_id")
      .writeStream.format("memory").queryName("ddup")
      .outputMode(OutputMode.Append).start()
    mem.addData((ts("2024-01-01 10:00:00"), 1L, 100L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:01:00"), 1L, 100L),  // dup, within watermark
      (ts("2024-01-01 10:02:00"), 1L, 101L))
    q.processAllAvailable(); q.stop()
    assert(spark.table("ddup").count() == 2)
  }

  test("Trigger.AvailableNow drains pending input and terminates itself") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val mem = MemoryStream[Ev]
    // data queued BEFORE start: AvailableNow must process exactly the
    // backlog (possibly in several micro-batches) then stop unprompted —
    // the batch-job-over-streaming-source operating mode.
    mem.addData(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:05:00"), "view", 2.0, 2L),
      Ev(ts("2024-01-01 10:10:00"), "click", 4.0, 1L))
    val q = StreamingOps.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("avnow")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "query did not self-terminate")
    val rows = spark.table("avnow").collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == 3L)
    assert(rows.map(_.getAs[Double]("sum_val")).sum == 7.0)
  }

  test("stream-stream interval join: purchases within 1h of a click, per user") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.clickPurchaseJoin(mem.toDF())
      .writeStream.format("memory").queryName("ssj_self")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 2L))
    q.processAllAvailable()
    // Arrives in a LATER micro-batch than the clicks it joins — proves
    // the click side is buffered in join state, not batch-local.
    mem.addData(
      Ev(ts("2024-01-01 10:30:00"), "purchase", 9.0, 1L),   // in window
      Ev(ts("2024-01-01 10:10:00"), "purchase", 5.0, 2L),   // in window
      Ev(ts("2024-01-01 11:30:00"), "purchase", 7.0, 1L))   // 90 min: out
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj_self")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sorted
    assert(rows.toSeq == Seq((1L, 9.0), (2L, 5.0)), rows.toSeq.toString)
  }

  test("stream_dedup_incremental: history Bloom + within-stream dedup across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // historical corpus: two already-ingested documents
    val corpus = Seq((100L, "the quick brown fox"), (101L, "hello world"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[DocEv]
    val q = StreamingOps.incrementalDedupStream(spark, corpus, mem.toDF())
      .writeStream.format("memory").queryName("sdi")
      .outputMode(OutputMode.Append).start()
    // Batch 1: one historical dup (must drop — Bloom has no false
    // negatives), one genuinely new doc (must pass)
    mem.addData(
      DocEv(1L, "hello world", ts("2024-01-01 10:00:00")),
      DocEv(2L, "a brand new document", ts("2024-01-01 10:00:30")))
    q.processAllAvailable()
    // Batch 2: a LATER-batch duplicate of the batch-1 doc (must drop via
    // dropDuplicatesWithinWatermark state), plus another new doc
    mem.addData(
      DocEv(3L, "a brand new document", ts("2024-01-01 10:01:00")),
      DocEv(4L, "another new document", ts("2024-01-01 10:02:00")))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("sdi").collect().map(_.getAs[Long]("doc_id")).sorted
    assert(ids.toSeq == Seq(2L, 4L),
      s"expected only the first copies of the two new docs, got ${ids.toSeq}")
  }
}
