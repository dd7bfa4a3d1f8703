package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch (r21): times candidate restructures of topk_orders under the
  * bench config and asserts each returns EXACTLY the current key's rows
  * (same values, same order) before timing — a variant that changes the
  * result is disqualified on the spot. */
object TopkVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .appName("topk-variants").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import T._
    Seq("customer", "orders", "lineitem").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count())

    val current: (SparkSession, String) => DataFrame =
      SparkEntry.queries("topk_orders")

    // B: revenue term projected BEFORE the join (guide §2.3 "project
    // before the exchange"): the lineitem build side broadcasts one
    // decimal(18,4) instead of two doubles, and the multiply runs in
    // the parallel scan stage instead of per joined row.
    val preProject: (SparkSession, String) => DataFrame = (s, d) => {
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
            .as("rev"))
      broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(money(sum(col("rev"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast(DateType).as("odate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }

    // C: eager aggregation — lineitem pre-aggregated by l_orderkey
    // before the join (o_orderkey is unique in orders, so grouping by
    // (l_orderkey, o_orderdate, o_orderpriority) after the inner join
    // equals grouping lineitem alone by l_orderkey and joining the sums).
    val preAgg: (SparkSession, String) => DataFrame = (s, d) => {
      val la = t(s, d, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - rate(col("l_discount")))).as("revsum"))
      broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .join(la, col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), money(col("revsum")).as("revenue"),
          col("o_orderdate").cast(DateType).as("odate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }

    val variants = Seq("current" -> current, "preProject" -> preProject,
      "preAgg" -> preAgg)
    val expect = current(spark, sfDir).collect().map(_.toString).toSeq
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    variants.foreach { case (name, fn) =>
      val got = fn(spark, sfDir).collect().map(_.toString).toSeq
      val ok = got == expect
      (0 until 3).foreach(_ => { spark.catalog.clearCache(); fn(spark, sfDir).count() })
      val walls = (0 until 7).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%12s rows_ok=$ok median ${med(walls)}%.3f walls ${walls.sorted.map(w => f"$w%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
