package graft

import org.apache.spark.sql.SparkSession

/** Dev loop: run a subset of SparkEntry.queries at a given sf dir, show
  * the head, and dump parquet + the matching oracle_sql.json subset to
  * target/quick_out so `tools/check.py <sf> target/quick_out <keys>` can
  * DuckDB-diff just the keys under iteration (Verify runs all 300+). */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("quickcheck").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args.head
    val outDir = "target/quick_out"
    args.tail.foreach { k =>
      val df = SparkEntry.queries(k)(s, d)
      println(s"=== $k ===")
      df.show(10, truncate = false)
      df.write.mode("overwrite").parquet(s"$outDir/$k")
    }
    val sub = SparkEntry.oracleSql.filter { case (k, _) => args.tail.contains(k) }
    // minimal JSON writer (keys and SQL contain no control chars)
    val body = sub.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      body.getBytes("UTF-8"))
    s.stop()
  }
}
