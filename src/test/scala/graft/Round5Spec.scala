package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Round-5 operators: Morton key, iterative connected components,
  * calendar gap-fill, CSV round-trip, stream-static enrichment parity,
  * market-share / Pareto report invariants. */
class Round5Spec extends SparkSpec {
  import ops.Round5Ops

  private def q(name: String) = Round5Ops.queries(name)(spark, sf)

  test("morton16 interleaves bits (known values, range, monotone blocks)") {
    import spark.implicits._
    // morton(3,5): x bits {0,1} -> z bits {0,2}; y bits {0,2} -> z bits {1,5}
    val rows = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Round5Ops.morton16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) == (1L | 4L | 2L | 32L)) // = 39
    assert(rows(1) == 0L)
    assert(rows(2) == 0x55555555L) // even bit positions
    assert(rows(3) == 0xaaaaaaaaL) // odd bit positions
    assert(rows(4) == 0xffffffffL)
  }

  test("graph_components equals per-customer min order key (multi-hop chains)") {
    val got = q("graph_components")
    val expected = T.t(spark, sf, "orders")
      .select(col("o_orderkey"),
        min(col("o_orderkey")).over(Window.partitionBy("o_custkey")).as("component"))
      .orderBy("o_orderkey")
    assert(got.collect().toSeq == expected.collect().toSeq)
    // the fixture genuinely exercises multi-hop propagation
    val maxChain = T.t(spark, sf, "orders")
      .groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxChain >= 5, s"fixture chains too short for a CC test: $maxChain")
  }

  test("ts_gapfill_ffill: dense grid, zero-filled counts, carried-forward gmv") {
    val out = q("ts_gapfill_ffill").collect()
    val e = T.events(spark, sf).filter(col("user_id") < 300)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val nUsers = e.select("user_id").distinct().count()
    val days = e.agg(datediff(max("day"), min("day"))).head().getInt(0) + 1
    assert(out.length == nUsers * days)
    assert(out.map(_.getLong(2)).sum == e.count()) // n_ev sums to event count
    // forward fill: once a user has a non-null gmv, it never goes null again
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val gmvs = rows.sortBy(_.getDate(1).toLocalDate.toEpochDay).map(r => r.isNullAt(3))
      val firstVal = gmvs.indexOf(false)
      if (firstVal >= 0) assert(!gmvs.drop(firstVal).contains(true))
    }
  }

  test("source_csv_roundtrip preserves embedded newline, quotes and commas") {
    val got = q("source_csv_roundtrip").collect()
    val want = T.t(spark, sf, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        concat(col("text"), lit("\n\"quoted, field\"")).as("payload"))
      .orderBy("doc_id").collect()
    assert(got.length == 200)
    assert(got.head.getString(1).contains("\n\"quoted, field\""))
    assert(got.toSeq == want.toSeq)
  }

  test("stream_static_enrich: streaming result equals batch result") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val data = Seq(
      Ev(ts("2024-01-01 10:05:00"), "click", 2.0, 1L),
      Ev(ts("2024-01-01 10:15:00"), "purchase", 3.0, 2L),
      Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 1L),
      Ev(ts("2024-01-01 11:06:00"), "error", 9.0, 3L))
    val mem = MemoryStream[Ev]
    val query = Round5Ops.staticEnrich(mem.toDF())
      .writeStream.format("memory").queryName("enrich5")
      .outputMode(OutputMode.Complete).start()
    mem.addData(data: _*)
    query.processAllAvailable(); query.stop()
    val streamed = spark.table("enrich5").orderBy("ws", "event_type").collect()
    val batch = Round5Ops.staticEnrich(data.toDF())
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
    // weight is applied: purchase 3.0 * 10.00 = 30.0
    assert(streamed.find(_.getString(1) == "purchase").get.getDouble(3) == 30.0)
  }

  test("join_asof_tolerance: stale or missing clicks yield NULL, gaps bounded") {
    val rows = q("join_asof_tolerance").collect()
    val purchases = T.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(rows.length == purchases) // left semantics: every purchase kept
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 600000000L)
    }
    assert(rows.exists(_.isNullAt(2)), "expected at least one un-matched purchase")
    // agrees with join_asof_latest wherever that one is within tolerance
    val latest = ops.Relational.queries("join_asof_latest")(spark, sf)
      .filter(col("gap_us") <= 600000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(latest.get(r.getLong(0)).contains(r.getLong(2)))
    }
  }

  test("sample_split_train_test: 80/10/10 per stratum, deterministic") {
    val rows = q("sample_split_train_test").collect()
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val n = rs.length
      val train = rs.count(_.getString(2) == "train")
      val valN = rs.count(_.getString(2) == "val")
      assert(train == math.floor(0.8 * n).toInt, s"$lang train=$train n=$n")
      assert(train + valN == math.floor(0.9 * n).toInt, s"$lang val=$valN n=$n")
    }
    assert(rows.toSeq == q("sample_split_train_test").collect().toSeq) // stable
  }

  test("vec_quantize_int8: codes bounded, error below half a quantization step") {
    val rows = q("vec_quantize_int8").collect()
    rows.foreach { r =>
      val amax = r.getDouble(1); val codeSum = r.getLong(2); val err = r.getDouble(3)
      assert(math.abs(codeSum) <= 127L * 64)
      // |x - round(x/s)*s| <= s/2 (+ rounding of the stored 6dp)
      assert(err <= amax / 127.0 / 2 + 1e-6, s"err=$err amax=$amax")
    }
  }

  test("report_market_share: shares sum to 1 per year") {
    val rows = q("report_market_share").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (y, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"year $y shares sum to $total")
    }
  }

  test("report_abc_pareto: cumulative share is monotone and ends at 1") {
    val rows = q("report_abc_pareto").collect()
    val shares = rows.map(_.getDouble(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-5)
    val classes = rows.map(_.getString(3)).distinct.toSet
    assert(classes == Set("A", "B", "C"))
  }
}
