package graft

import org.apache.spark.sql.functions._

/** Round-6 operator tests beyond the DuckDB oracle gate: the
  * file-provenance scan (no SQL-expressible oracle — the driver's views
  * abstract paths away) and a Spark-side brute-force parity check for
  * the grid-bucketed spatial join (the oracle proves the result; this
  * proves the BUCKETING loses no pair against the unbucketed plan). */
class Round6Spec extends SparkSpec {

  test("scan_metadata_files reports the real source file name, size and row count") {
    val rows = SparkEntry.queries("scan_metadata_files")(spark, sf).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert(r.getAs[String]("src_file") == "lineitem.parquet", r)
    val onDisk = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/lineitem.parquet"))
    assert(r.getAs[Long]("src_bytes") == onDisk, s"$r vs $onDisk")
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.getAs[Long]("n_rows") == n, s"$r vs $n")
  }

  test("source_binaryfile length and content size match the file on disk") {
    val rows = SparkEntry.queries("source_binaryfile")(spark, sf).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert(r.getAs[String]("file_name") == "region.parquet", r)
    val onDisk = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/region.parquet"))
    assert(r.getAs[Long]("length") == onDisk, s"$r vs $onDisk")
    assert(r.getAs[Long]("content_len") == onDisk, s"$r vs $onDisk")
  }

  test("topKPerKey equals the window formulation on nulls, ties and small groups") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic fixture: null keys, heavy value ties, one group
    // smaller than k — every edge the heap merge must agree on
    val rows = (0 until 400).map { i =>
      val key: Integer = if (i % 11 == 0) null else Integer.valueOf(i % 7)
      (key, (i * 13) % 5, i.toLong) // value has many ties; id breaks them
    } :+ ((Integer.valueOf(99), 1, 9999L)) // singleton group, k > size
    val df = rows.toDF("k", "v", "id")
    val got = graft.Graft.topKPerKey(df, Seq(col("k")),
        Seq(col("v").desc, col("id")), 3)
      .orderBy(col("k").asc_nulls_first, col("v").desc, col("id"))
      .collect().toSeq
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("k").asc_nulls_first, col("v").desc, col("id"))
      .collect().toSeq
    assert(got == want, s"${got.take(5)} vs ${want.take(5)}")
  }

  test("topKPerKey near-unique keys under a tiny key budget: epoch flush + sorter fallback stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // ~6700 distinct keys across 20k rows with the tracked-key bound
    // forced to 37: the partial level epoch-flushes hundreds of times and
    // every final-level partition overflows into the external-sorter
    // path — memory stays O(bound × k) instead of O(distinct keys × k).
    val df = (0 until 20000).map { i =>
      val key: Integer = if (i % 501 == 0) null else Integer.valueOf(i % 6673)
      (key, (i * 13) % 5, i.toLong)
    }.toDF("k", "v", "id")
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "37")
    try {
      val got = graft.Graft.topKPerKey(df, Seq(col("k")),
          Seq(col("v").desc, col("id")), 2)
        .orderBy(col("k").asc_nulls_first, col("v").desc, col("id"))
        .collect().toSeq
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .orderBy(col("k").asc_nulls_first, col("v").desc, col("id"))
        .collect().toSeq
      assert(got.size == want.size, s"${got.size} vs ${want.size}")
      assert(got == want, s"${got.take(5)} vs ${want.take(5)}")
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }

  test("text_bloom_decontaminate: superset of exact contamination hits, bounded false-positive rate") {
    // Bloom guarantee: NO false negatives — every doc the exact shingle
    // equi-join flags must appear among the bloom candidates; false
    // POSITIVES are allowed but must stay rare (fpp=1e-4 per shingle,
    // ~100 shingles/doc → ~1% per clean doc; assert ≤ 5%).
    val exact = SparkEntry.queries("text_contamination_check")(spark, sf)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val bloom = SparkEntry.queries("text_bloom_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(bloom),
      s"false negatives: ${(exact -- bloom).take(5)}")
    val nCorpus = T.t(spark, sf, "documents")
      .filter(col("doc_id") % 97 =!= 0).count()
    val fp = (bloom -- exact).size.toDouble / (nCorpus - exact.size)
    assert(fp <= 0.05, s"doc-level false-positive rate $fp > 5%")
  }

  test("agg_cms_token_counts: CMS estimates are one-sided within eps*N, invariant at 4 vs 1 partitions") {
    val rows = SparkEntry.queries("agg_cms_token_counts")(spark, sf).collect()
    assert(rows.length == 20)
    val totalTokens = T.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t")).count()
    // One-sidedness (est >= exact) is a hard CMS invariant; the eps*N
    // overshoot bound holds only at 99% confidence PER QUERY, so across
    // 20 items a hard per-item assert could flake (~18% worst case).
    // Assert instead that at most 1 of the 20 exceeds eps*N — the
    // binomial tail beyond that is <2% even at the nominal 1% miss rate,
    // and in practice a depth-5 sketch essentially never misses twice.
    val epsN = (0.001 * totalTokens).ceil.toLong
    var over = 0
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val estv = r.getAs[Long]("cms_est")
      assert(estv >= exact, s"CMS must never underestimate: $r")
      if (estv - exact > epsN) over += 1
    }
    assert(over <= 1, s"$over of 20 items overshoot past eps*N=$epsN")
    // commutative counter adds + pinned seed → same estimates whatever
    // the input partitioning (the property freqItems lacks)
    val one = T.t(spark, sf, "documents").coalesce(1)
      .select(explode(split(col("text"), " ")).as("tok"))
    val cms1 = one.stat.countMinSketch(col("tok"), 0.001, 0.99, 42)
    rows.foreach { r =>
      assert(cms1.estimateCount(r.getAs[String]("tok")) == r.getAs[Long]("cms_est"),
        s"partitioning changed the estimate: $r")
    }
  }

  test("centroid argmax via max_by(cos, -cid) matches the window form under NULL and NaN scores") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the IVF assignment rewrite replaced row_number().over(c_cos DESC,
    // cid ASC) with max_by(cid, struct(c_cos, -cid)); that is only valid
    // if NULL scores lose and NaN scores win in BOTH formulations —
    // exactly the edge a zero-norm or null embedding would produce
    val rows = Seq(
      (1L, 0L, Some(0.9)), (1L, 1L, Some(0.9)), (1L, 2L, Some(0.1)), // tie → min cid
      (2L, 0L, Some(0.5)), (2L, 1L, None), (2L, 2L, Some(0.8)),      // null loses
      (3L, 0L, Some(0.7)), (3L, 1L, Some(Double.NaN)), (3L, 2L, Some(0.9)), // NaN wins
      (4L, 0L, None), (4L, 1L, None), (4L, 2L, None)                 // all null → min cid
    ).map { case (v, c, s) => (v, c, s.map(Double.box).orNull) }
      .toDF("vec_id", "cid", "c_cos")
    val viaAgg = rows.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("c_cos"), (-col("cid")).as("nid"))).as("cid"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid").asc)
    val viaWin = rows.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaAgg == viaWin, s"$viaAgg vs $viaWin")
  }

  test("knnJoin with empty residue classes matches brute force (no NPE, no duplicates)") {
    // vec_ids ≡ 0 or 1 (mod 5) only → residues 2,3,4 are EMPTY blocks:
    // every off-diagonal pair involving them is one-sided. The old code
    // either NPE'd (va null) or double-counted block-internal pairs
    // (vb null fallback); the fix emits nothing for one-sided pairs.
    import spark.implicits._
    val vecs = (0 until 20).map { i =>
      val id = (i / 2) * 5L + (i % 2) // 0,1,5,6,10,11,...
      (id, Array.tabulate(8)(j => (1.0f + ((id * 7 + j * 3) % 13))))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val got = ops.LlmOps.knnJoin(emb, 5, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      (0 until 8).foreach { m =>
        val p = a(m).toDouble; val q = b(m).toDouble
        dp += p * q; na += p * p; nb += q * q
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      x <- vecs; y <- vecs if x._1 < y._1
    } yield (x._1, y._1, cos(x._2, y._2)))
      .sortBy(t => (-t._3, t._1, t._2)).take(50)
      .map(t => (t._1, t._2, math.rint(t._3 * 1e6) / 1e6))
    assert(got.length == brute.length, s"${got.length} vs ${brute.length}")
    assert(got.toSeq == brute.toSeq,
      got.toSeq.take(5) + " vs " + brute.toSeq.take(5))
  }

  test("join_grid_spatial equals the unbucketed brute-force distance join") {
    // brute force uses the OPERATOR's own point generators — one
    // geometry definition, so this parity can't silently desynchronize
    val bucketed = SparkEntry.queries("join_grid_spatial")(spark, sf)
    val cust = ops.Round6Ops.custPoints(T.t(spark, sf, "customer"))
    val supp = ops.Round6Ops.suppPoints(T.t(spark, sf, "supplier"))
    val dx = col("x") - col("sx")
    val dy = col("y") - col("sy")
    val brute = cust.crossJoin(supp)
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= ops.Round6Ops.gridRadius2)
      .select(col("c_custkey"), col("s_suppkey"), col("dist2"))
      .orderBy("c_custkey", "s_suppkey")
    assert(bucketed.collect().toSeq == brute.collect().toSeq)
  }
}
