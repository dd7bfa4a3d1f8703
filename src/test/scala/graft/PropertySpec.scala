package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ops.Multimodal

/** Property tier (SURVEY §5.2): ScalaCheck generators drive the laws
  * (sampled explicitly — the scalatest/scalacheck bridge artifact is not
  * in the offline cache, so no ScalaCheckPropertyChecks mixin). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOfN(8, word).map(_.mkString(" "))

  test("latestPerUser merge laws: chunk-order invariance and replay idempotence (property)") {
    // The foreachBatch upsert is exactly-once-at-the-table-level ONLY
    // because the reduction is an associative/commutative/idempotent
    // fold over the (ts, event_id) total order. Pin the laws on random
    // event sets: any chunking, any order, any replay → one fixpoint.
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    val ev = for {
      user <- Gen.chooseNum(1L, 6L)
      tSec <- Gen.chooseNum(0L, 5000L)
      id <- Gen.chooseNum(1L, 10000L)
      typ <- Gen.oneOf("click", "view", "purchase")
      v <- Gen.chooseNum(0, 10000)
    } yield (user, new Timestamp(1704067200000L + tSec * 1000), id, typ, v / 100.0)
    val all0 = samples(ev, 300)
    // event_id must be unique for the order to be total (the real
    // events contract, pinned by SchemaCanarySpec).
    val all = all0.groupBy(_._3).map(_._2.head).toSeq
    def df(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    def canon(d: org.apache.spark.sql.DataFrame) =
      ops.StreamingOps.latestPerUser(d)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val oneShot = canon(df(all))
    // chunk-order invariance: fold chunks in both orders through the merge
    val (c1, c2) = all.partition(_._3 % 2 == 0)
    val fwd = canon(df(canonRows(df(c1)) ++ c2))
    val rev = canon(df(canonRows(df(c2)) ++ c1))
    assert(fwd === oneShot)
    assert(rev === oneShot)
    // replay idempotence: re-merging an already-applied chunk is a no-op
    val replay = canon(df(canonRows(df(all)) ++ c1))
    assert(replay === oneShot)
  }

  /** latestPerUser output back to plain rows, for re-merging. */
  private def canonRows(d: org.apache.spark.sql.DataFrame) =
    ops.StreamingOps.latestPerUser(d).collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))).toSeq

  test("norm UDF: idempotent and whitespace-collapsing (property)") {
    def norm(x: String) = x.trim.toLowerCase.replaceAll("\\s+", " ")
    samples(Gen.zip(text, Gen.chooseNum(0, 5))).foreach { case (t, pad) =>
      val messy = (" " * pad) + t.toUpperCase + ("\t" * pad)
      assert(norm(messy) == norm(norm(messy)))
      assert(norm(messy) == t)
    }
  }

  test("scanSum == global-window prefix sum on random data (property)") {
    import org.apache.spark.sql.expressions.Window
    val sp = spark
    import sp.implicits._
    // duplicate values on purpose (chooseNum collides at n=400) — the
    // unique key k breaks ties, as scanSum's contract requires
    val vals = samples(Gen.chooseNum(-100L, 100L), 400).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("k", "v").repartition(7)
    val order = Seq(col("v").desc, col("k"))
    val got = Graft.scanSum(df, col("v"), order, "cum")
      .orderBy(order: _*).select("k", "cum").as[(Long, Long)].collect().toSeq
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy(order: _*).select("k", "cum").as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("RangeJoinBucketing rewrite == brute force on random data (property)") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      import s2.implicits._
      val valGen = Gen.chooseNum(-50.0, 50.0)
      // three random datasets × widths, including a tiny and a large W
      Seq(0.1, 1.7, 25.0).zipWithIndex.foreach { case (w, i) =>
        val as = samples(valGen, 80).zipWithIndex.map { case (v, ix) =>
          (ix.toLong + i * 1000, math.rint(v * 100) / 100)
        }
        val bs = samples(valGen, 80).zipWithIndex.map { case (v, ix) =>
          (ix.toLong + 5000 + i * 1000, math.rint(v * 100) / 100)
        }
        val j = as.toDF("a_id", "a_v")
          .join(bs.toDF("b_id", "b_v"), abs(col("a_v") - col("b_v")) <= w)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
          s"W=$w not rewritten:\n${p.take(1500)}")
        val got = j.collect().map(r => (r.getLong(0), r.getLong(2))).sorted
        val want = (for {
          (ai, x) <- as; (bi, y) <- bs if math.abs(x - y) <= w
        } yield (ai, bi)).sorted
        assert(got.toSeq == want, s"W=$w: ${got.length} vs ${want.length} pairs")
      }
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }

  test("date_add/datediff inverse law (property, via Spark)") {
    import spark.implicits._
    val deltas = samples(Gen.chooseNum(-3000, 3000))
    val df = deltas.toDF("d")
      .withColumn("base", lit("1997-06-15").cast("date"))
      .withColumn("shifted", expr("date_add(base, d)"))
      .withColumn("back", datediff(col("shifted"), col("base")))
    assert(df.filter(col("back") =!= col("d")).count() == 0)
  }

  test("cast round-trip: long -> string -> long is identity (property, via Spark)") {
    import spark.implicits._
    val xs = samples(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    val df = xs.toDF("x")
      .withColumn("rt", col("x").cast("string").cast("long"))
    assert(df.filter(col("rt") =!= col("x")).count() == 0)
  }

  test("row_number is a bijection 1..n within each partition") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
    val df = T.events(spark, sf)
      .withColumn("rn", row_number().over(w))
    val bad = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"),
        countDistinct("rn").as("du"))
      .filter(col("n") =!= col("mx") || col("n") =!= col("du"))
    assert(bad.count() == 0)
  }

  test("PNG payload round-trips through the real ImageIO codec (property)") {
    samples(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0, 10000)), 20)
      .foreach { case (id, len) =>
        val png = Multimodal.pngPayload(id, len)
        // PNG magic: real bytes, not a stand-in
        assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
        val (w, h, c) = Multimodal.decodeImage(png)
        assert(w == 16 + (id % 48).toInt, s"id=$id")
        assert(h == 16 + math.floorMod(len, 48), s"len=$len")
        assert(c == 3)
        // deterministic: same inputs, same bytes
        assert(java.util.Arrays.equals(png, Multimodal.pngPayload(id, len)))
      }
  }

  test("mm_decode_pipeline: schema, row preservation, real decoded dims") {
    val out = Multimodal.decodePipeline(spark, sf)
    assert(out.schema == Multimodal.outSchema)
    assert(out.count() == T.t(spark, sf, "documents").count())
    assert(out.filter(col("thumb_len") > 16).count() == 0)
    // decoded dimensions equal the known synthesis formula for EVERY row —
    // the codec really ran
    val badDims = out
      .filter(col("width") =!= lit(16) + pmod(col("doc_id"), lit(48)) ||
        col("height") < 16 || col("height") >= 64 || col("channels") =!= 3)
    assert(badDims.count() == 0)
  }

  test("mm_frame_sample: resize box, sampling rate, determinism") {
    val out = Multimodal.frameSamplePipeline(spark, sf)
    assert(out.schema == Multimodal.frameSchema)
    val rows = out.collect()
    assert(rows.length == T.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, sampled, rw, rh) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(sampled == (n + 7) / 8, s"every-8th sampling: n=$n got=$sampled")
      assert(math.max(rw, rh) == 256 && math.min(rw, rh) >= 1,
        s"aspect-fit into 256 box, got ${rw}x$rh")
    }
    // deterministic across runs (stub decode + checksum are pure)
    val again = Multimodal.frameSamplePipeline(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(out.orderBy("doc_id").collect().toSeq == again)
  }

  test("GeoMean Aggregator: merge order independence") {
    import graft.functions.GeoMean
    val xs = List(1.0, 2.0, 4.0, 8.0)
    val b1 = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
    val (l, r) = xs.splitAt(2)
    val b2 = GeoMean.merge(l.foldLeft(GeoMean.zero)(GeoMean.reduce),
      r.foldLeft(GeoMean.zero)(GeoMean.reduce))
    assert(math.abs(GeoMean.finish(b1) - GeoMean.finish(b2)) < 1e-12)
    assert(math.abs(GeoMean.finish(b1) - math.pow(64.0, 0.25)) < 1e-9)
  }
}
