package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regression tests for the RangeJoinBucketing optimizer rule's
  * eligibility guards: decimal-literal widths, exact integral bucketing
  * at ns-epoch magnitudes, equi-conjunct skip, nondeterminism skip. */
class RangeJoinRuleSpec extends SparkSpec {

  /** Fresh session with GraftExtensions (reuses the shared SparkContext),
    * restoring the suite session afterwards. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      f(SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate())
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("__graft_rb")

  test("decimal width literal: rewrite fires and is exact (no CCE)") {
    withExtSession { s2 =>
      // DECIMAL columns joined with a SQL decimal literal — the width
      // extraction must not assume java.lang.Number (ADVICE item 1)
      val a = s2.range(120).select(col("id").as("a_id"),
        (col("id") % 40 / lit(8.0)).cast("decimal(10,2)").as("a_v"))
      val b = s2.range(120).select(col("id").as("b_id"),
        (col("id") % 50 / lit(10.0)).cast("decimal(10,2)").as("b_v"))
      val j = a.join(b, expr("abs(a_v - b_v) <= 0.25"))
      assert(rewritten(j), "decimal-width bound must still be rewritten")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p.take(2000))
      val got = j.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val av = (0 until 120).map(i => (i.toLong, BigDecimal((i % 40) / 8.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      val bv = (0 until 120).map(i => (i.toLong, BigDecimal((i % 50) / 10.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      val want = (for {
        (ai, x) <- av; (bi, y) <- bv if (x - y).abs <= BigDecimal("0.25")
      } yield (ai, bi)).sorted
      assert(got.toSeq == want)
    }
  }

  test("ns-epoch longs with small width: exact integral buckets, no lost pairs") {
    withExtSession { s2 =>
      // ~1.7e18 longs (double ulp 256 at this magnitude) with W=150:
      // double-based floor(v/W) puts qualifying pairs >1 bucket apart
      // and silently drops them (ADVICE item 2); the integral path must
      // bucket in exact 64-bit arithmetic.
      val base = 1700000000000000000L
      val a = s2.range(80).select(col("id").as("a_id"),
        (lit(base) + col("id") * 100L).as("a_ts"))
      val b = s2.range(80).select(col("id").as("b_id"),
        (lit(base) + lit(37L) + col("id") * 100L).as("b_ts"))
      val j = a.join(b, abs(col("a_ts") - col("b_ts")) <= 150L)
      assert(rewritten(j), "integral bound must still be rewritten")
      val got = j.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = (for {
        ai <- 0L until 80L; bi <- 0L until 80L
        if math.abs((ai * 100L) - (37L + bi * 100L)) <= 150L
      } yield (ai, bi)).sorted
      assert(want.nonEmpty && got.toSeq == want)
    }
  }

  test("negative integral values bucket with floor semantics (not truncate)") {
    withExtSession { s2 =>
      val a = s2.range(60).select(col("id").as("a_id"),
        (col("id") * 7L - 200L).as("a_v"))
      val b = s2.range(60).select(col("id").as("b_id"),
        (col("id") * 11L - 310L).as("b_v"))
      val j = a.join(b, abs(col("a_v") - col("b_v")) <= 9L)
      assert(rewritten(j))
      val got = j.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = (for {
        ai <- 0L until 60L; bi <- 0L until 60L
        if math.abs((ai * 7L - 200L) - (bi * 11L - 310L)) <= 9L
      } yield (ai, bi)).sorted
      assert(want.nonEmpty && got.toSeq == want)
    }
  }

  test("existing cross-side equality: rule stands down (no 3x union)") {
    withExtSession { s2 =>
      val a = s2.range(100).select(col("id").as("a_id"),
        (col("id") % 10).as("a_k"), (col("id") % 13).cast("double").as("a_v"))
      val b = s2.range(100).select(col("id").as("b_id"),
        (col("id") % 10).as("b_k"), (col("id") % 17).cast("double").as("b_v"))
      val j = a.join(b,
        col("a_k") === col("b_k") && abs(col("a_v") - col("b_v")) <= 2.0)
      assert(!rewritten(j),
        "hashable equi-conjunct already present — rewrite must be skipped")
      val want = (for {
        x <- 0 until 100; y <- 0 until 100
        if x % 10 == y % 10 && math.abs((x % 13).toDouble - (y % 17)) <= 2.0
      } yield 1).size
      assert(j.count() == want)
    }
  }

  test("nondeterministic join side: rule stands down") {
    withExtSession { s2 =>
      val a = s2.range(50).select(col("id").as("a_id"),
        (col("id") % 7).cast("double").as("a_v"))
      // rand-derived column: duplicating this subtree into a 3-way union
      // would re-sample per branch — the guard must refuse the rewrite
      val b = s2.range(50).select(col("id").as("b_id"),
        floor(rand(42) * 7).cast("double").as("b_v"))
      val j = a.join(b, abs(col("a_v") - col("b_v")) <= 1.0)
      assert(!rewritten(j), "nondeterministic right side must not be tripled")
      // rows still come back via whatever plan Spark picks natively
      assert(j.count() > 0)
    }
  }
}
