package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Custom Catalyst surface (SURVEY §4.3): the codegen'd CosineSimilarity
  * expression, the NGrams generator, and the salted-join skew utility must
  * be drop-in equivalent to their built-in formulations. */
class ExprSpec extends SparkSpec {

  test("CosineSimilarity == zip_with/aggregate formulation, bit-exact") {
    Graft.registerFunctions(spark)
    def dotHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x)
    def normHof(a: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x))
    val e = T.t(spark, sf, "embeddings")
    val probe = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("p")))
    val both = e.crossJoin(probe).select(
      expr("graft_cosine(embedding, p)").as("native"),
      (dotHof(col("embedding"), col("p")) /
        (normHof(col("embedding")) * normHof(col("p")))).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("DuckRound: matches DuckDB's scaled-double semantics; agrees with Spark round off-boundary") {
    import graft.expr.DuckRound
    // the sf0.1 row that exposed the divergence: Spark ROUND gave .8307
    // (exact-decimal HALF_UP), DuckDB .8306 (scaled-double std::round) —
    // DuckRound must take DuckDB's side
    val v = 1160100.83065
    assert(DuckRound.round(v, 4) === 1160100.8306)
    // ties away from zero on exactly-representable halves
    assert(DuckRound.round(2.5, 0) === 3.0)
    assert(DuckRound.round(-2.5, 0) === -3.0)
    assert(DuckRound.round(0.125, 2) === 0.13) // 0.125*100 = 12.5 exact
    // NaN/Inf pass through; huge values are already integral
    assert(DuckRound.round(Double.NaN, 4).isNaN)
    assert(DuckRound.round(Double.PositiveInfinity, 4).isInfinite)
    assert(DuckRound.round(9.007199254740993e15, 2) === 9.007199254740993e15)
    // off boundaries the two semantics agree: exhaustive-ish sweep
    val rnd = new scala.util.Random(42)
    (0 until 20000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 2e6
      val d = DuckRound.round(x, 6)
      val s = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // disagreements can only occur within one ulp of a .5 boundary
      if (d != s) {
        val scaled = math.abs(x * 1e6)
        val frac = scaled - math.floor(scaled)
        assert(math.abs(frac - 0.5) < 1e-6,
          s"DuckRound and Spark-round disagreed away from a boundary: $x -> $d vs $s")
      }
    }
    // the Column path (interpreted + codegen) computes the same values
    import spark.implicits._
    val df = Seq(1160100.83065, 2.5, -2.5, 0.125).toDF("x")
      .select(T.dround(col("x"), 4).as("r")).collect().map(_.getDouble(0))
    assert(df.toSeq === Seq(1160100.8306, 2.5, -2.5, 0.125)
      .map(DuckRound.round(_, 4)))
  }

  test("WinnowFingerprints == built-in filter/transform formulation, value-exact") {
    Graft.registerFunctions(spark)
    val P = (0 until 16).map(k => BigInt(31).modPow(k, 1000003).toLong)
    val terms = (0 until 16)
      .map(k => s"element_at(cs, i + ${15 - k}) * ${P(k)}L")
      .mkString(" + ")
    val fpExpr = s"filter(transform(sequence(1, size(cs) - 15), " +
      s"i -> ($terms) % 1000003), x -> x % 32 = 0)"
    val both = T.t(spark, sf, "documents")
      .filter(length(col("text")) >= 16)
      .select(col("doc_id"),
        expr("graft_winnow_fps(text)").as("native"),
        expr("transform(split(text, ''), c -> ascii(c))").as("cs"))
      .select(col("doc_id"), col("native"), expr(fpExpr).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // and the kernel actually selects something at this SF
    assert(both.filter(size(col("native")) > 0).count() > 0)
    // short and non-ASCII inputs: empty below one window, code points
    // (not UTF-16 units) above it — "é" is one point, exactly as
    // ascii()/DuckDB count it
    val edge = spark.createDataFrame(Seq(
      Tuple1("short"), Tuple1("exactly16chars!!"),
      Tuple1("héllo wörld, 16+ chars of text"))).toDF("text")
      .select(expr("graft_winnow_fps(text)").as("fps"),
        expr("transform(split(text, ''), c -> ascii(c))").as("cs"))
    val chk = edge.select(
      (col("fps") === when(size(col("cs")) >= 16, expr(fpExpr))
        .otherwise(array().cast("array<bigint>"))).as("ok"))
    assert(chk.filter(!col("ok")).count() == 0)
  }

  test("GraftExtensions registers functions in a session built with withExtensions") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the existing SparkContext; builds a FRESH session so the
      // extensions path (spark.sql.extensions equivalent) actually runs
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val c = s2.sql(
        "SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
          "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
        .head.getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val ng = s2.sql("SELECT g.ngram FROM (SELECT array('a','b','c','d') AS t) " +
        "LATERAL VIEW graft_ngrams(t) g AS pos, ngram").count()
      assert(ng == 2)
      // winnow fingerprints resolve too; 15 chars < one window -> empty
      val wf = s2.sql("SELECT size(graft_winnow_fps('123456789012345')) AS n")
        .head.getInt(0)
      assert(wf == 0)
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }

  test("RangeJoinBucketing rule: naive abs-distance join becomes an equi-join") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      // deterministic fractional values; pairs within 0.25 of each other
      val a = s2.range(200).select(col("id").as("a_id"),
        (col("id") % 40 / lit(8.0)).as("a_v"))
      val b = s2.range(200).select(col("id").as("b_id"),
        (col("id") % 50 / lit(10.0)).as("b_v"))
      val j = a.join(b, abs(col("a_v") - col("b_v")) <= 0.25)
      val p = j.queryExecution.executedPlan.toString
      // the naive predicate would plan a nested-loop cross product; the
      // rule's bucket equality must turn it into a hashable equi-join
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p.take(2000))
      val got = j.collect().map(r => (r.getLong(0), r.getLong(2))).sorted
      // brute-force expectation computed driver-side
      val av = (0 until 200).map(i => (i.toLong, (i % 40) / 8.0))
      val bv = (0 until 200).map(i => (i.toLong, (i % 50) / 10.0))
      val want = (for {
        (ai, x) <- av; (bi, y) <- bv if math.abs(x - y) <= 0.25
      } yield (ai, bi)).sorted
      assert(got.toSeq == want)
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }

  test("RangeJoinBucketing leaves ineligible joins untouched") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val a = s2.range(50).select(col("id").as("a_id"),
        (col("id") % 7).cast("double").as("a_v"))
      val b = s2.range(50).select(col("id").as("b_id"),
        (col("id") % 5).cast("double").as("b_v"))
      // abs over a SUM is not a distance bound — must NOT be rewritten
      // (and must still return the right rows via whatever plan Spark picks)
      val j1 = a.join(b, abs(col("a_v") + col("b_v")) <= 3.0)
      assert(!j1.queryExecution.executedPlan.toString.contains("__graft_rb"))
      assert(j1.count() ==
        (for (x <- 0 until 50; y <- 0 until 50
              if math.abs(x % 7 + y % 5) <= 3.0) yield 1).size)
      // a plain equi-join stays a plain equi-join
      val j2 = a.join(b, col("a_v") === col("b_v"))
      assert(!j2.queryExecution.executedPlan.toString.contains("__graft_rb"))
      assert(j2.count() ==
        (for (x <- 0 until 50; y <- 0 until 50
              if (x % 7).toDouble == (y % 5).toDouble) yield 1).size)
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }

  test("CosineSimilarity: self-similarity is 1.0 within 1e-12") {
    Graft.registerFunctions(spark)
    val bad = T.t(spark, sf, "embeddings")
      .select(expr("graft_cosine(embedding, embedding)").as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(bad.count() == 0)
  }

  test("NGrams generator: trigram count is n_tokens - 2, content matches slice") {
    Graft.registerFunctions(spark)
    T.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .createOrReplaceTempView("docs_exprspec")
    val out = spark.sql("SELECT doc_id, g.pos, g.ngram FROM docs_exprspec " +
      "LATERAL VIEW graft_ngrams(tokens) g AS pos, ngram")
    val counts = out.groupBy("doc_id").count()
    val exp = spark.table("docs_exprspec")
      .select(col("doc_id"), (size(col("tokens")) - 2).cast("long").as("exp"))
    assert(counts.join(exp, "doc_id").filter(col("count") =!= col("exp")).count() == 0)
    // spot-check content: ngram at pos p equals tokens[p-1..p+1] joined
    val probe = out.join(spark.table("docs_exprspec"), "doc_id")
      .withColumn("expect",
        concat_ws(" ", expr("tokens[pos-1]"), expr("tokens[pos]"), expr("tokens[pos+1]")))
      .filter(col("ngram") =!= col("expect"))
    assert(probe.count() == 0)
  }

  test("saltedJoin == plain join (same row multiset)") {
    val orders = T.t(spark, sf, "orders")
    val customer = T.t(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .groupBy("o_custkey").count()
    val salted = Graft.saltedJoin(orders, customer, "o_custkey",
        probeUnique = "o_orderkey", salt = 8)
      .groupBy("o_custkey").count()
    assert(plain.except(salted).count() == 0 && salted.except(plain).count() == 0)
    assert(plain.count() == salted.count())
  }
}
