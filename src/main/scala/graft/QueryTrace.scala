package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch (r21): per-job decomposition of one suite key under the
  * bench config — job durations, inter-job gaps, task counts — plus a
  * median wall over 5 warm runs, so floor claims are measured. */
object QueryTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = args.headOption.getOrElse("topk_orders")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => ()
      } })
    val spark = builder.appName("query-trace").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    T.tables.foreach { name =>
      try {
        if (name == "events") T.events(spark, sfDir).count()
        else spark.read.parquet(s"$sfDir/$name.parquet").count()
      } catch { case _: Throwable => () }
    }
    def once(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def phases(): String = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(key)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan
      val t3 = System.nanoTime()
      val n = df.count()
      val t4 = System.nanoTime()
      f"build ${(t1 - t0) / 1e9}%.3f optimize ${(t2 - t1) / 1e9}%.3f " +
        f"physical ${(t3 - t2) / 1e9}%.3f count(rows=$n) ${(t4 - t3) / 1e9}%.3f"
    }
    (0 until 3).foreach(_ => once()) // warm codegen/JIT
    val walls = (0 until 5).map(_ => once()).sorted
    (0 until 3).foreach(_ => println("phases: " + phases()))
    // guide §7.3: sample every thread during one run; histogram the hot
    // frames of non-idle threads to see where the driver gap goes
    locally {
      val hot = collection.mutable.Map[String, Int]().withDefaultValue(0)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          Thread.getAllStackTraces.forEach { (t, st) =>
            if (st.nonEmpty && t.getState == Thread.State.RUNNABLE) {
              val frame = st.find(f =>
                f.getClassName.startsWith("org.apache.spark") ||
                f.getClassName.startsWith("graft") ||
                f.getClassName.startsWith("org.codehaus") ||
                f.getClassName.startsWith("scala.collection"))
                .getOrElse(st.head)
              hot(frame.getClassName + "." + frame.getMethodName) += 1
            }
          }
          Thread.sleep(10)
        }
      })
      sampler.setDaemon(true); sampler.start()
      (0 until 5).foreach(_ => once())
      sampling = false; sampler.join(500)
      println("=== hot frames (5 runs, 10ms sampling) ===")
      hot.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
        println(f"$n%5d  $f") }
    }
    val jobs = collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val ends = collection.mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += ((js.jobId, js.time,
          "stages=" + js.stageInfos.size +
          " tasks=" + js.stageInfos.map(_.numTasks).sum +
          " [" + js.stageInfos.map(_.name.take(50)).mkString(" | ") + "]")) }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        ends.synchronized { ends(je.jobId) = je.time }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val tracedWall = { once() }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300)
    println(f"=== $key traced wall $tracedWall%.3f s; 5-run walls ${walls.map(w => f"$w%.3f").mkString(",")} ===")
    var prevEnd = 0L
    var firstStart = 0L
    jobs.foreach { case (id, start, desc) =>
      if (firstStart == 0) firstStart = start
      val end = ends.getOrElse(id, start)
      val gap = if (prevEnd == 0) 0L else start - prevEnd
      println(f"job $id%4d dur ${(end - start) / 1000.0}%6.3fs gap ${gap / 1000.0}%6.3fs  $desc")
      prevEnd = end
    }
    if (prevEnd > 0)
      println(f"jobs span ${(prevEnd - firstStart) / 1000.0}%6.3fs of $tracedWall%.3fs wall")
    spark.stop()
  }
}
