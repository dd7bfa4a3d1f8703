package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 operators (the hash-match vs
  * DuckDB is the driver's gate; these pin the properties a hash can't
  * see — flags, bounds, self-consistency, plan shape). */
class Round4Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text_contamination_check: exact duplicates of benchmark docs are flagged") {
    val docs = T.t(spark, sf, "documents")
    // corpus docs sharing their full text with a benchmark doc must be hit
    val benchTexts = docs.filter(col("doc_id") % 97 === 0).select("text")
    val dupOfBench = docs.filter(col("doc_id") % 97 =!= 0)
      .join(benchTexts, "text").select("doc_id")
    val flagged = q("text_contamination_check")
      .filter(col("contaminated")).select("doc_id")
    assert(dupOfBench.except(flagged).count() == 0)
  }

  test("text_dedup_incremental: survivors' hashes are absent from the corpus") {
    val docs = T.t(spark, sf, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 7).select("h").distinct()
    val out = q("text_dedup_incremental")
    val survivors = out.join(docs, "doc_id").select("h")
    assert(survivors.join(corpus, "h").count() == 0)
    // n_in_batch sums to the batch size net of corpus-matching docs
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val expected = batch.join(corpus, Seq("h"), "left_anti").count()
    assert(out.agg(sum("n_in_batch")).head.getLong(0) == expected)
  }

  test("text_repetition_filter: fractions in [0,1], keep consistent with thresholds") {
    val out = q("text_repetition_filter")
    assert(out.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1 ||
      col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1).count() == 0)
    // rounded columns are within half-ulp of the keep thresholds' inputs;
    // verify the flag against the ROUNDED values with a tolerance strip
    val bad = out.filter(
      (col("keep") && (col("dup_word_frac") > 0.6501 || col("top_bigram_frac") > 0.1501)) ||
      (!col("keep") && col("dup_word_frac") <= 0.6499 && col("top_bigram_frac") <= 0.1499))
    assert(bad.count() == 0)
  }

  test("text_pack_sequences: token totals and doc counts are conserved, ids contiguous") {
    val out = q("text_pack_sequences")
    val docs = T.t(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val want = docs.agg(sum("n_tok"), count(lit(1))).head
    val got = out.agg(sum("tokens"), sum("n_docs")).head
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
    // within a source, seq ids start at 0 and are dense
    val perSrc = out.groupBy("source")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
    assert(perSrc.filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1).count() == 0)
  }

  test("sample_mix_epochs: per-lang multiplicity matches the mixing rate") {
    val out = q("sample_mix_epochs")
    val perLang = out.groupBy("lang").agg(count(lit(1)).as("reps"))
    val n = T.t(spark, sf, "documents").groupBy("lang").count()
    val rates = Map("en" -> 2.0, "de" -> 1.5, "fr" -> 1.0, "es" -> 0.5, "zh" -> 0.25)
    perLang.join(n, "lang").collect().foreach { r =>
      val (lang, reps, total) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = rates(lang)
      val wantExtra = math.floor((rate - math.floor(rate)) * total).toLong
      // total materialized rows = floor(rate)*n + hash-ranked extras
      val base = math.floor(rate).toLong * total
      assert(reps == base + (if (rate == math.floor(rate)) 0L else wantExtra),
        s"$lang: $reps vs base $base + extra $wantExtra")
    }
  }

  test("vec_pq_codes: centroid vectors code to themselves at distance 0") {
    val own = q("vec_pq_codes").filter(col("vec_id") < 8)
      .filter(col("code") =!= col("vec_id") || col("dist") =!= 0.0)
    assert(own.count() == 0)
    // every vector gets exactly 4 subspace codes in 0..7
    val shape = q("vec_pq_codes").groupBy("vec_id").count()
      .filter(col("count") =!= 4)
    assert(shape.count() == 0)
    assert(q("vec_pq_codes").filter(col("code") < 0 || col("code") > 7).count() == 0)
  }

  test("report_large_orders: every order's lineitem quantity exceeds the threshold") {
    val out = q("report_large_orders")
    val sums = T.t(spark, sf, "lineitem").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("s"))
    assert(out.join(sums, col("o_orderkey") === col("l_orderkey"))
      .filter(col("s") <= 250).count() == 0)
  }

  test("sub_correlated_agg decorrelates: no per-row subquery re-execution in plan") {
    val plan = SparkEntry.queries("sub_correlated_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    // Catalyst must rewrite the correlated scalar agg into an agg+join
    assert(!plan.contains("Subquery"), plan.take(1500))
  }

  test("fn_geo_pack: distances within Earth bounds, bearings in (-180,180]") {
    val out = q("fn_geo_pack")
    assert(out.filter(col("dist_km") < 0 ||
      col("dist_km") > 6371.0 * math.Pi + 1).count() == 0)
    assert(out.filter(col("bearing_deg") < -180 || col("bearing_deg") > 180)
      .count() == 0)
  }

  test("report_daily_topn: at most 3 per day, ranks dense from 1, gmv non-increasing") {
    val out = q("report_daily_topn")
    val perDay = out.groupBy("dt").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(perDay.filter(col("n") > 3 || col("lo") =!= 1 ||
      col("hi") =!= col("n")).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("dt").orderBy("rank")
    assert(out.withColumn("prev", lag("gmv", 1).over(w))
      .filter(col("prev").isNotNull && col("gmv") > col("prev")).count() == 0)
  }

  test("contamination + disjunctive joins broadcast their small side") {
    val p1 = SparkEntry.queries("text_contamination_check")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"), p1.take(1200))
    val p2 = SparkEntry.queries("join_disjunctive_pred")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), p2.take(1200))
  }
}
