package graft

import org.apache.spark.sql.functions._

/** Round-3 operators: semantics the oracle hash can't pin down alone —
  * the bucketed range join must equal the naive theta join it replaces,
  * SCD2 intervals must tile, and the deterministic mode must resolve
  * ties by value, not arrival order. */
class Round3Spec extends SparkSpec {

  test("join_range_bucketed equals the naive range join (no lost/dup pairs)") {
    import ops.Round3Ops
    val bucketed = Round3Ops.queries("join_range_bucketed")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ev = T.events(spark, sf).filter(col("value") <= 10)
      .select(col("event_id"), col("event_type"), col("value"))
    val a = ev.toDF("a_id", "event_type", "a_val")
    val naive = a.join(ev.toDF("b_id", "t2", "b_val"),
        col("event_type") === col("t2") &&
          abs(col("a_val") - col("b_val")) <= 0.25 &&
          col("a_id") < col("b_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        T.money(sum(abs(col("a_val") - col("b_val"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))).as("sum_gap"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(bucketed.toSeq == naive.toSeq)
  }

  test("cdc_scd2: runs compressed, intervals tile, exactly one current row per user") {
    val out = ops.Round3Ops.queries("cdc_scd2")(spark, sf).collect()
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getInt(4)) // version
      // consecutive versions never repeat the same event_type (compressed)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getString(1) != y.getString(1), s"user $u uncompressed run")
          // valid_to of version k == valid_from of version k+1 (tiling)
          assert(x.getLong(3) == y.getLong(2), s"user $u interval gap")
        case _ => ()
      }
      // exactly one open (current) interval, and it is the last version
      val current = sorted.filter(_.getBoolean(5))
      assert(current.length == 1 && (current.head eq sorted.last), s"user $u current")
    }
    assert(byUser.nonEmpty)
  }

  test("agg_mode resolves count ties to the smallest value") {
    import spark.implicits._
    val df = Seq(("A", 3.0), ("A", 3.0), ("A", 1.0), ("A", 1.0), ("A", 2.0))
      .toDF("l_returnflag", "l_quantity")
    val counts = df.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
    val m = counts.groupBy("l_returnflag")
      .agg(min_by(struct(col("l_quantity"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("l_quantity"))).as("m"))
      .select(col("m.l_quantity")).as[Double].head()
    assert(m == 1.0) // 1.0 and 3.0 both count 2 → smallest value wins
  }

  test("text_tfidf_topterms: ≤3 ranked terms per doc, ranks contiguous from 1") {
    val out = ops.Round3Ops.queries("text_tfidf_topterms")(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val rks = rows.map(_.getInt(2)).sorted
      assert(rks.toSeq == (1 to rks.length), s"doc $doc ranks $rks")
      assert(rks.length <= 3, s"doc $doc has ${rks.length} terms")
    }
  }

  test("sink_compact_small_files: 64 fragments collapse to <=4 files, content kept") {
    val out = ops.Round3Ops.queries("sink_compact_small_files")(spark, sf)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == T.t(spark, sf, "orders").count())
    def parquets(dir: String) = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets("target/tmp/compact_frag") == 64)
    assert(parquets("target/tmp/compact_out") <= 4)
  }

  test("identical aggregate subtrees reuse one exchange (computed once)") {
    val o = T.t(spark, sf, "orders")
    val agg = o.groupBy("o_custkey")
      .agg(sum("o_totalprice").as("s"), count(lit(1)).as("n"))
    // merge hint: a broadcast build side would plan a BroadcastExchange
    // instead of the second (identical) shuffle exchange — nothing to reuse
    val j = agg.as("a").hint("merge").join(agg.as("b"),
      col("a.o_custkey") === col("b.o_custkey") && col("a.n") === col("b.n"))
    j.collect() // AQE finalizes stage reuse at execution of THIS plan
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      p.contains("TableCacheQueryStage"), p.take(3000))
  }

  test("count_min_sketch: estimates bounded by eps over exact counts") {
    val ev = T.events(spark, sf)
    val bytes = ev.agg(
      expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)")).head
      .getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"$k: CMS never undercounts, got $est < $c")
      assert(est <= c + math.max(1, (0.001 * total).toLong * 2),
        s"$k: est $est too far above exact $c")
    }
  }

  test("report_sessionize_batch: session durations bounded by gap rule") {
    val out = ops.Round3Ops.queries("report_sessionize_batch")(spark, sf)
      .collect()
    // n_events == 1 sessions have zero duration; multi-event sessions
    // have every internal gap ≤ 30 min, so dur ≤ (n-1) * 30 min.
    out.foreach { r =>
      val n = r.getLong(2); val dur = r.getLong(5)
      if (n == 1) assert(dur == 0L)
      else assert(dur <= (n - 1) * 1800000000L, s"session too long: $r")
    }
    assert(out.nonEmpty)
  }
}
