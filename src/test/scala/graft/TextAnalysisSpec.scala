package graft

import org.apache.spark.sql.functions._

/** Structural assertions for the text-analysis battery (t2=N SimHash, and
  * sanity on the oracle-verified ops). */
class TextAnalysisSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // Note on recall-vs-Jaccard: on this corpus a token-SET Jaccard ≥ 0.8
  // holds for most doc pairs (31-word vocabulary ⇒ near-identical sets,
  // ~32k "pairs" among 500 docs), while count-weighted SimHash at
  // Hamming ≤ 3 is a far stricter notion (~27 pairs) — so a recall bound
  // against text_jaccard_pairs is vacuous here. The binding contracts are
  // below: exact dups always found, and candidates == brute-force truth.
  test("simhash_neardup: finds every exact-duplicate pair, no Hamming>3 pair") {
    val docs = T.t(spark, sf, "documents")
    val found = q("text_simhash_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(found.forall(_._3 <= 3))
    val foundPairs = found.map(t => (t._1, t._2)).toSet
    // exact duplicates have identical simhash (Hamming 0) — every pair
    // inside a duplicate group must be reported (vacuous if the slice has
    // no dups; the brute-force truth check below still binds)
    val dupGroups = docs.groupBy("text")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1).collect()
      .map(_.getAs[Seq[Long]]("ids").sorted)
    dupGroups.foreach { ids =>
      for (a <- ids; b <- ids if a < b)
        assert(foundPairs.contains((a, b)), s"missing exact-dup pair ($a,$b)")
    }
    // banding is a complete candidate generator at radius 3 (pigeonhole:
    // ≤3 flipped bits leave one of the 4 chunks intact): recompute ground
    // truth by brute force on the collected simhashes and compare
    val sh = q("text_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (a, ha) <- sh; (b, hb) <- sh
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(foundPairs == truth,
      s"candidates=${foundPairs.size} truth=${truth.size}")
  }

  test("simhash: exact-duplicate texts get identical simhash") {
    val sh = q("text_simhash")
    val docs = T.t(spark, sf, "documents")
    val joined = docs.select("doc_id", "text").join(sh, "doc_id")
    val split = joined.groupBy("text")
      .agg(countDistinct("simhash").as("n"))
      .filter(col("n") > 1)
    assert(split.count() == 0)
  }

  test("simhash: hamming distance to a near-identical doc is small") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base + " extra"
    val far = "completely different words everywhere nothing shared at all zero overlap"
    Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .createOrReplaceTempView("sim_docs")
    val tok = spark.table("sim_docs").select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j"))
    val folded = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val m = folded.select(col("doc_id"), simhash.as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(2L)) < hamming(m(1L), m(3L)),
      s"near=${hamming(m(1L), m(2L))} far=${hamming(m(1L), m(3L))}")
  }

  test("langid: prediction column is a valid lang and scores positive") {
    val out = q("text_langid_ngram")
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(out.filter(!col("pred_lang").isin(langs.toSeq: _*)).count() == 0)
    assert(out.filter(col("score") <= 0).count() == 0)
    assert(out.count() == T.t(spark, sf, "documents").count())
  }

  test("fingerprint: dup_group_size matches exact text duplicate groups") {
    val out = q("text_fingerprint")
    // sf0.001 may contain zero duplicate groups — coalesce the empty sum.
    val dupDocs = T.t(spark, sf, "documents").groupBy("text")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
    assert(out.filter(col("dup_group_size") > 1).count() == dupDocs)
  }

  test("ivf: top-k is a subset of the probe's 2 buckets and ordered") {
    val rows = q("vec_ivf_topk").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("cid")).distinct.length <= 2)
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }
}
