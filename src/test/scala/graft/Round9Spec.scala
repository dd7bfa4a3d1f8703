package graft

import org.apache.spark.sql.functions._

/** Round-9 specs: trained-codebook k-means (fixpoint, monotone inertia,
  * determinism) and the composed IVF×PQ ANN funnel (plan shape +
  * recall sanity; exact values are the DuckDB oracle's job). */
class Round9Spec extends SparkSpec {
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("vec_kmeans_train: converges before the cap with monotone non-increasing inertia") {
    val e = T.t(spark, sf, "embeddings")
    val (cents, inertias, iters) = ops.Round9Ops.kmeansTrain(e)
    assert(iters < 25, s"hit the iteration cap: $iters")
    assert(inertias.nonEmpty)
    inertias.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b <= a + 1e-9 * math.max(1.0, a), s"inertia increased: $a -> $b")
      case _ => ()
    }
    // training must actually improve on the seed codebook
    assert(inertias.last < inertias.head,
      s"no improvement: ${inertias.head} -> ${inertias.last}")
    assert(cents.size == 8 && cents.forall(_._2.size == 64))
    val dense = e.filter(col("embedding").isNotNull &&
      size(col("embedding")) === 64).count()
    assert(cents.map(_._3).sum == dense, "member counts must partition the input")
  }

  test("vec_kmeans_train: deterministic — two runs bit-identical") {
    val e = T.t(spark, sf, "embeddings")
    val (c1, i1, t1) = ops.Round9Ops.kmeansTrain(e)
    val (c2, i2, t2) = ops.Round9Ops.kmeansTrain(e)
    assert(t1 == t2, "iteration counts differ")
    assert(i1 == i2, "inertia trajectories differ")
    assert(c1 == c2, "centroids differ")
  }

  test("vec_kmeans_train query: 8x64 codebook rows, converged") {
    val rows = q("vec_kmeans_train").collect()
    assert(rows.length == 8 * 64)
    val iters = rows.map(_.getAs[Int]("n_iters")).distinct
    assert(iters.length == 1 && iters.head < 25)
  }

  test("vec_ivf_pq_topk: funnel plan — broadcasts, no window, bounded top-k") {
    val df = q("vec_ivf_pq_topk")
    val p = df.queryExecution.executedPlan.toString
    // centroid set, nprobe bucket list and ADC distance table are all
    // broadcast — the corpus side is never shuffled for them
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // coarse assignment and code assignment are min_by aggregates, the
    // two top-k legs are TakeOrderedAndProject — no window, no global sort
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val rows = df.collect()
    assert(rows.length == 10)
    // the exact re-rank leg must come out sorted by exact distance
    val l2s = rows.map(_.getAs[Double]("l2_dist"))
    assert(l2s.sameElements(l2s.sorted), l2s.mkString(","))
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L), "probe must be excluded")
  }

  test("trained codebook composes with the IVF funnel: nprobe=2 recall@10 vs brute force") {
    val vecs = T.t(spark, sf, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter(_._2.length == 64)
    val (cents, _, _) = ops.Round9Ops.kmeansTrain(T.t(spark, sf, "embeddings"))
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val probe = vecs.find(_._1 == 0L).get._2
    val exact10 = vecs.filter(_._1 != 0L)
      .sortBy { case (id, v) => (l2(v, probe), id) }.take(10).map(_._1).toSet
    val cb = cents.map { case (cid, v, _) => (cid, v.toArray) }
    def bucket(v: Array[Double]): Int =
      cb.minBy { case (cid, c) => (l2(v, c), cid) }._1
    val nprobe = cb.sortBy { case (cid, c) => (l2(probe, c), cid) }
      .take(2).map(_._1).toSet
    val ivf10 = vecs.filter { case (id, v) => id != 0L && nprobe(bucket(v)) }
      .sortBy { case (id, v) => (l2(v, probe), id) }.take(10).map(_._1).toSet
    val recall = exact10.intersect(ivf10).size / 10.0
    assert(recall >= 0.7, s"recall@10 = $recall with trained codebook")
  }

  test("graph_pagerank: rank conserved, deterministic, covers every node") {
    val df = q("graph_pagerank")
    val rows = df.collect()
    val li = T.t(spark, sf, "lineitem")
    val nParts = li.select("l_partkey").distinct().count()
    val nSupps = li.select("l_suppkey").distinct().count()
    assert(rows.length == nParts + nSupps, "one rank row per node")
    val total = rows.map(_.getAs[Double]("rank_ppm")).sum / 1e6
    assert(math.abs(total - 1.0) <= 1e-6,
      s"total rank drifted from 1: $total")
    assert(rows.forall(_.getAs[Double]("rank_ppm") > 0), "ranks positive")
    // bit-identical across runs (decimal-exact loop, no RNG)
    val again = q("graph_pagerank").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("ts_interpolate_linear: interior gaps filled linearly, ends stay null") {
    val rows = q("ts_interpolate_linear").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val known = rs.zipWithIndex.filter(!_._1.isNullAt(2)).map(_._2)
      if (known.nonEmpty) {
        rs.zipWithIndex.foreach { case (r, i) =>
          val interp = Option(r.getAs[java.lang.Double]("gmv_interp"))
          if (i < known.min || i > known.max)
            assert(interp.isEmpty, s"extrapolated at edge: $r")
          else assert(interp.isDefined, s"interior day not filled: $r")
        }
        // a filled interior value lies between its bracketing knowns
        rs.zipWithIndex.filter { case (r, i) =>
          r.isNullAt(2) && i > known.min && i < known.max
        }.foreach { case (r, i) =>
          val lo = known.filter(_ < i).max
          val hi = known.filter(_ > i).min
          val a = rs(lo).getAs[Double]("gmv_interp")
          val b = rs(hi).getAs[Double]("gmv_interp")
          val v = r.getAs[Double]("gmv_interp")
          assert(v >= math.min(a, b) - 1e-6 && v <= math.max(a, b) + 1e-6,
            s"interpolant $v outside [$a,$b] at row $r")
        }
      }
    }
  }

  test("dq_rule_checks: structural rules clean, expectation rules fire") {
    val rows = q("dq_rule_checks").collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"))).toMap
    assert(rows.size == 7)
    // fixture is referentially clean: structural rules must report 0
    Seq("orders.null_custkey", "orders.nonpos_price", "orders.dup_orderkey",
      "lineitem.orphan_orderkey").foreach { k =>
      assert(rows(k)._2 == 0L, s"$k: ${rows(k)}")
    }
    // range expectations are chosen inside the fixture's value range
    Seq("orders.price_over_400k", "lineitem.qty_out_of_1_45",
      "lineitem.discount_over_5pct").foreach { k =>
      assert(rows(k)._2 > 0L && rows(k)._2 < rows(k)._1, s"$k: ${rows(k)}")
    }
  }

  test("sample_importance_weighted: per-stratum kept count is floor(n*rate)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val docs = T.t(spark, sf, "documents")
    val nByLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val numOf = Map("en" -> 18L, "zh" -> 12L, "fr" -> 10L, "de" -> 8L)
    val kept = q("sample_importance_weighted").collect()
      .groupBy(_.getAs[String]("lang")).map { case (l, rs) => l -> rs.length.toLong }
    nByLang.foreach { case (lang, n) =>
      val expect = n * numOf.getOrElse(lang, 5L) / 20L
      assert(kept.getOrElse(lang, 0L) == expect,
        s"$lang: kept ${kept.getOrElse(lang, 0L)} of $n, expected $expect")
    }
  }
}
