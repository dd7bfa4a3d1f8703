package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Scratch (r21, not part of the contract): traces every Spark job
  * fired by one commitPositionalUpdate — start time, duration, task
  * count — so the write path's job-floor decomposition is measured,
  * not guessed. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("job-trace").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = T.t(spark, sfDir, "orders").select(col("o_orderkey"),
      col("o_orderstatus"), T.dec(col("o_totalprice")).as("price"))
      .repartition(32)

    def freshTable(tag: String): String = {
      val dir = s"target/tmp/jobtrace_$tag"
      GraftTable.fsOf(spark, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      GraftTable.commitNextIsolated(spark, dir, o, "base")
      GraftTable.commitPositionalDelete(spark, dir,
        col("o_orderkey") === 7L, "enter MoR")
      dir
    }
    val cond = col("o_orderkey") === 4242L
    val sets = Seq("price" -> (col("price") + lit(1)))
    // warm
    GraftTable.commitPositionalUpdate(spark, freshTable("w"), cond, sets, "w")
    GraftTable.commitPositionalUpdate(spark, freshTable("w2"), cond, sets, "w")

    val jobs = collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val ends = collection.mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += ((js.jobId, js.time,
          " stages=" + js.stageInfos.size +
          " tasks=" + js.stageInfos.map(_.numTasks).sum +
          " [" + js.stageInfos.map(si => si.name.take(60)).mkString(" | ") +
          "] site=" + js.stageInfos.lastOption.map(_.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("JobTrace"))
            .getOrElse("").trim.take(90)).getOrElse(""))) }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        ends.synchronized { ends(je.jobId) = je.time }
    }
    spark.sparkContext.addSparkListener(listener)
    val dir = freshTable("t")
    Thread.sleep(300)
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    GraftTable.commitPositionalUpdate(spark, dir, cond, sets, "traced")
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300)
    println(f"=== commitPositionalUpdate wall $wall%.3f s ===")
    var prevEnd = 0L
    jobs.foreach { case (id, start, desc) =>
      val end = ends.getOrElse(id, start)
      val gap = if (prevEnd == 0) 0L else start - prevEnd
      println(f"job $id%3d dur ${(end - start) / 1000.0}%6.3fs gap ${gap / 1000.0}%6.3fs  $desc")
      prevEnd = end
    }
    spark.stop()
  }
}
