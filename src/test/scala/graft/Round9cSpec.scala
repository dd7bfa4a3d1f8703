package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9c specs: pointer-jumping list rank vs an independent window
  * formulation, EWMA bounds and identities, perplexity-decile
  * invariants, ordered listagg, and the trained PQ codebook (members
  * conserved, inertia monotone, deterministic). */
class Round9cSpec extends SparkSpec {
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph_list_rank: pointer-jumped depths equal the window closed form") {
    val got = q("graph_list_rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val want = T.t(spark, sf, "orders")
      .select(col("o_orderkey"),
        (row_number().over(w) - 1).cast("long").as("depth"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == want.size)
    want.foreach { case (k, d) =>
      assert(got(k) == d, s"order $k: pointer-jump ${got(k)} != closed $d")
    }
  }

  test("ts_ewma_daily: head equals the raw value; ewma inside trailing-window bounds") {
    val rows = q("ts_ewma_daily").collect()
    assert(rows.nonEmpty)
    var prevPrio = ""
    val hist = scala.collection.mutable.Queue.empty[Double]
    rows.foreach { r =>
      val (prio, rev, ewma) = (r.getString(0), r.getDouble(2), r.getDouble(3))
      if (prio != prevPrio) { hist.clear(); prevPrio = prio }
      hist.enqueue(rev)
      while (hist.size > 8) hist.dequeue()
      // a convex combination of the trailing window can't escape its range
      assert(ewma >= hist.min - 1e-6 && ewma <= hist.max + 1e-6,
        s"$prio ${r.get(1)}: ewma $ewma outside [${hist.min}, ${hist.max}]")
      if (hist.size == 1)
        assert(math.abs(ewma - rev) < 1e-6, "first observation: ewma == rev")
    }
  }

  test("text_perplexity_bucket: deciles partition the corpus with ordered ranges") {
    val rows = q("text_perplexity_bucket").collect()
    assert(rows.length == 10)
    val nDocs = T.t(spark, sf, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "deciles must cover every doc")
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(4) + 1e-6 &&
        r.getDouble(4) <= r.getDouble(3) + 1e-6, "min <= mean <= max")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(2),
        "bucket min surprisal must be non-decreasing across deciles")
    }
  }

  test("agg_listagg_ordered: 5 regions, 25 nations, lists sorted") {
    val rows = q("agg_listagg_ordered").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sum == 25)
    rows.foreach { r =>
      val parts = r.getString(2).split(",").toSeq
      assert(parts.length == r.getLong(1))
      assert(parts == parts.sorted, s"${r.getString(0)}: list not sorted")
    }
  }

  test("vec_pq_train: 4x8 codebook, members conserved per subspace, deterministic") {
    val a = q("vec_pq_train").collect()
    assert(a.length == 32)
    val nVecs = T.t(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .count()
    (0 until 4).foreach { m =>
      val sub = a.filter(_.getInt(0) == m)
      assert(sub.length == 8, s"subspace $m must have k=8 centroids")
      assert(sub.map(_.getLong(2)).sum == nVecs,
        s"subspace $m: member counts must sum to the corpus")
    }
    val b = q("vec_pq_train").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "trainer must be bit-deterministic across runs")
  }

  test("sql_recursive_chain: recursion depth covers full chains; balance compounds") {
    val rows = q("sql_recursive_chain").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // every kept customer's chain is complete: rn is 1..len contiguous
    rows.groupBy(_._1).foreach { case (ck, rs) =>
      val rns = rs.map(_._2).sorted.toSeq
      assert(rns == (1L to rns.length).toSeq, s"cust $ck: chain has holes")
    }
    // positive prices + compounding: balance strictly increases along
    // each chain
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.drop(1).foreach { case (r, i) =>
        assert(r._3 > sorted(i - 1)._3,
          "balance must be strictly increasing along a chain of positive prices")
      }
    }
  }

  test("fn_xml_pack: every XML extraction reconstructs its source column") {
    val rows = q("fn_xml_pack").collect()
    assert(rows.length == 25)
    val base = T.t(spark, sf, "nation").collect()
      .map(r => r.getAs[Number](0).longValue() ->
        (r.getString(1), r.getAs[Number](2).longValue())).toMap
    rows.foreach { r =>
      val (name, rk) = base(r.getAs[Number](0).longValue())
      assert(r.getString(1) == name && r.getString(3) == name &&
        r.getString(4) == name, "xpath/from_xml/to_xml round trips")
      assert(r.getInt(2) == rk.toInt, "xpath_int reconstructs the region key")
    }
  }

  test("vec_pq_train: per-subspace inertia is monotone non-increasing") {
    val sub = T.t(spark, sf, "embeddings").select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val (_, inertias, _) = ops.Round9Ops.kmeansTrain(sub, maxIters = 12, dim = 16)
    assert(inertias.size >= 2)
    inertias.sliding(2).foreach { case Seq(x, y) =>
      assert(y <= x + 1e-9, s"inertia rose: $x -> $y")
    }
  }

  test("mm_resize_thumbnail: checksums match the closed-form pixel formula, codec-free") {
    val rows = q("mm_resize_thumbnail").collect()
    assert(rows.nonEmpty)
    val docs = T.t(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      // the synthetic gradient (Multimodal.pngPayload): pixel (x, y) has
      // packed value v = (x*31 + y*7 + base) & 0xFFFFFF stored as sRGB
      val w = 16 + (id % 48).toInt
      val h = 16 + math.floorMod(docs(id), 48)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $id dims")
      val base = (id % 255).toInt
      var cs = 0L
      var lum = 0L
      var ty = 0
      while (ty < 8) {
        var tx = 0
        while (tx < 8) {
          val v = ((tx * w / 8) * 31 + (ty * h / 8) * 7 + base) & 0xFFFFFF
          val rr = (v >> 16) & 0xFF
          val gg = (v >> 8) & 0xFF
          val bb = v & 0xFF
          cs = cs * 1000003L + ((rr << 16) | (gg << 8) | bb)
          lum += (299 * rr + 587 * gg + 114 * bb) / 1000
          tx += 1
        }
        ty += 1
      }
      assert(r.getLong(3) == cs,
        s"doc $id: decoded+resampled checksum != closed form")
      assert(r.getLong(4) == lum * 100L / 64L, s"doc $id: mean luminance")
    }
  }

  test("agg_theta_setops: estimates bound the exact set sizes; inclusion-exclusion holds") {
    val rows = q("agg_theta_setops").collect()
    assert(rows.nonEmpty)
    val ev = T.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(date_format(col("ts"), "yyyy-MM").as("month"),
        col("event_type"), col("user_id"))
    val exact = ev.collect()
      .groupBy(_.getString(0))
      .map { case (mth, rs) =>
        val c = rs.filter(_.getString(1) == "click").map(_.getLong(2)).toSet
        val p = rs.filter(_.getString(1) == "purchase").map(_.getLong(2)).toSet
        mth -> (c, p)
      }
    rows.foreach { r =>
      val (c, p) = exact(r.getString(0))
      def ok(est: Long, ex: Int, what: String): Unit =
        assert(math.abs(est - ex) <= math.max(2.0, 0.05 * ex),
          s"${r.getString(0)} $what: est $est vs exact $ex")
      ok(r.getLong(1), c.size, "click")
      ok(r.getLong(2), p.size, "purchase")
      ok(r.getLong(3), c.union(p).size, "either")
      ok(r.getLong(4), c.intersect(p).size, "both")
      ok(r.getLong(5), (c -- p).size, "click_only")
      // inclusion-exclusion on the estimates themselves (loose: each
      // estimate carries its own error)
      assert(math.abs(r.getLong(4) + r.getLong(5) - r.getLong(1)) <=
        math.max(3.0, 0.1 * r.getLong(1)), "both + click_only ≈ click")
    }
  }

  test("text_perplexity_bucket_approx: covers the corpus; tracks the exact deciles") {
    val approx = q("text_perplexity_bucket_approx").collect()
    val exact = q("text_perplexity_bucket").collect()
    val nDocs = exact.map(_.getLong(1)).sum
    assert(approx.map(_.getLong(1)).sum == nDocs,
      "approx buckets must cover every doc exactly once")
    assert(approx.length >= 8 && approx.length <= 10,
      "about 10 buckets (boundary ties may merge a couple)")
    // each approx bucket's population stays near the exact decile size
    approx.foreach { r =>
      assert(r.getLong(1) <= math.ceil(0.35 * nDocs),
        s"bucket ${r.getLong(0)} holds ${r.getLong(1)} of $nDocs — " +
          "approx boundaries should keep buckets near n/10")
    }
    // bucket ranges must be ordered and non-overlapping
    approx.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-6,
        "bucket ranges must not overlap")
    }
  }

  test("pqTrain fused loop equals independent per-subspace kmeansTrain") {
    val e = T.t(spark, sf, "embeddings")
    val fused = ops.Round9Ops.pqTrain(e, m = 4, subDim = 16, maxIters = 12)
    (0 until 4).foreach { m =>
      val sub = e.select(col("vec_id"),
        slice(col("embedding"), m * 16 + 1, 16).as("embedding"))
      val (cents, inertias, iters) =
        ops.Round9Ops.kmeansTrain(sub, maxIters = 12, dim = 16)
      val (fc, fi, fit) = fused(m)
      assert(fit == iters, s"subspace $m: fused ran $fit active iters vs $iters")
      assert(fi == inertias, s"subspace $m: inertia history differs")
      assert(fc == cents, s"subspace $m: fused centroids/members differ")
    }
  }
}
