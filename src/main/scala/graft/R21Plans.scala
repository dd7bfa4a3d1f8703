package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-21 optimization evidence: writes
  * `plans/r21/<key>_<suffix>.txt` — the `.explain("formatted")` output
  * of each named query at the BENCHED scale (sf0.1) — so before/after
  * plan claims in OPTIMIZATION_r21.md are checkable without running
  * Spark. Usage: `runMain graft.R21Plans <suffix> <key> [key...]`. */
object R21Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R21Plans <suffix> <key> [key...]")
    val suffix = args.head
    val keys = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .appName("r21-plans").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r21"))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r21/${k}_$suffix.txt"), txt)
      println(s"wrote plans/r21/${k}_$suffix.txt")
    }
    spark.stop()
  }
}
