package graft

import org.apache.spark.sql.SparkSession

/** Scratch: executes a key under the bench config and prints the FINAL
  * adaptive plan (post-execution) + wall time. Not part of the contract. */
object ExecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = args.headOption.getOrElse("topk_orders")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    T.tables.foreach { name =>
      try {
        if (name == "events") T.events(spark, sfDir).count()
        else spark.read.parquet(s"$sfDir/$name.parquet").count()
      } catch { case _: Throwable => () }
    }
    // warm
    (0 until 3).foreach { _ =>
      spark.catalog.clearCache()
      SparkEntry.queries(key)(spark, sfDir).count()
    }
    val df = SparkEntry.queries(key)(spark, sfDir)
    val t0 = System.nanoTime()
    df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"=== $key wall ${dt}s ===")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
