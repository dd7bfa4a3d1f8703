package graft

import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, MinHashDedup}

/** Approx-vs-exact tier (SURVEY §5.2). */
class ApproxSpec extends SparkSpec {

  test("agg_approx_distinct within 5% of exact per event_type") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05,
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("hll sketch-union estimate within 5% of exact distinct users") {
    val est = SparkEntry.queries("agg_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex <= 0.05,
        s"$k: est=${est(k)} exact=$ex")
    }
  }

  test("percentile_approx within 1% of exact percentile") {
    val approx = SparkEntry.queries("agg_percentile_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = T.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) / ex <= 0.01,
        s"$k approx=${approx(k)} exact=$ex")
    }
  }

  test("text_minhash_dedup: minhash-LSH recall >= 0.9 against exact Jaccard >= 0.8 pairs") {
    val exact = SparkEntry.queries("text_jaccard_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = MinHashDedup.candidatePairs(T.t(spark, sf, "documents"), 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} cand=${cand.size}")
  }

  test("minhash dedupAssign: 5-hop duplicate chain converges to one representative") {
    // doc i = 40-word window shifted by 3: consecutive docs have Jaccard
    // ~0.80 (banded together), far-apart docs do not — the cluster only
    // resolves through ≥5 bucket-hops, which a fixed-3-round propagation
    // would split. The convergence loop must return a single rep (0).
    import spark.implicits._
    val words = (0 until 80).map(i => f"tokword$i%02d")
    val chain = (0 until 6).map { i =>
      (i.toLong, words.slice(3 * i, 3 * i + 40).mkString(" "))
    }.toDF("doc_id", "text")
    val assign = MinHashDedup.dedupAssign(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.size == 6)
    assert(assign.values.toSet == Set(0L), s"chain split: $assign")
  }

  test("minhash dedupAssign: exact duplicates share a representative") {
    val docs = T.t(spark, sf, "documents")
    val assign = MinHashDedup.dedupAssign(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dups = docs.groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1).collect()
    dups.foreach { r =>
      val ids = r.getAs[Seq[Long]]("ids")
      assert(ids.map(assign).distinct.size == 1,
        s"dup group $ids split across reps ${ids.map(assign)}")
    }
    // representative is always <= member and itself a member of the corpus
    assert(assign.forall { case (id, rep) => rep <= id })
  }

  test("custom MinHash-LSH recall is not worse than MLlib MinHashLSH") {
    // SURVEY §4.3 said try MLlib first; this parity check justifies the
    // custom implementation (no Vector conversion, arrays stay codegen-
    // friendly, banding tunable) by showing equal-or-better recall on
    // the exact >=0.8-Jaccard ground truth.
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    import org.apache.spark.ml.linalg.SparseVector
    val docs = T.t(spark, sf, "documents")
      .withColumn("toks", array_distinct(split(col("text"), " ")))
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("vec")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs).select("doc_id", "vec")
    val mh = new MinHashLSH().setInputCol("vec").setOutputCol("sig")
      .setNumHashTables(8).setSeed(42).fit(vecs)
    val mllibPairs = mh.approxSimilarityJoin(vecs, vecs, 0.2, "dist") // 1-jaccard
      .selectExpr("datasetA.doc_id AS a", "datasetB.doc_id AS b")
      .filter(col("a") < col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("text_jaccard_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val custom = graft.ops.MinHashDedup
      .candidatePairs(T.t(spark, sf, "documents"), 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rM = exact.count(mllibPairs.contains).toDouble / exact.size
    val rC = exact.count(custom.contains).toDouble / exact.size
    info(f"recall mllib=$rM%.4f custom=$rC%.4f")
    assert(rC >= rM - 0.02, f"custom $rC%.4f vs mllib $rM%.4f")
  }

  test("minhash signature estimate correlates with exact jaccard") {
    val docs = T.t(spark, sf, "documents").limit(100)
    val est = MinHashDedup.candidatePairs(docs, 0.9)
    // high-estimate candidates must include every exact-duplicate pair
    val dups = docs.groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1).collect()
    val estSet = est.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    dups.foreach { r =>
      val ids = r.getAs[Seq[Long]]("ids").sorted
      ids.combinations(2).foreach { case Seq(a, b) =>
        assert(estSet.contains((a, b)), s"exact dup pair ($a,$b) missed")
      }
    }
  }
}
