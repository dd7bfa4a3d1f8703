package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Evidence probe for the round-20 positional MoR UPDATE claim: a point
  * UPDATE on a big table should cost ~the touched rows, not the table.
  *
  * Builds one orders-shaped table (sf dir from SPARK_GRAFT_SF_DIR,
  * default sf0.1) as a 32-file snapshot, then times and sizes BOTH
  * arms of the same one-key UPDATE:
  *
  *  - POSITIONAL (`commitPositionalUpdate`): new cumulative sidecar +
  *    staged replacement rows; untouched files shared.
  *  - COPY-ON-WRITE (the pre-r20 routing): read the merged snapshot,
  *    apply the assignment, commit a full rewrite.
  *
  * Prints one JSON line with wall seconds and bytes written per arm
  * (bytes = du of the dirs the commit created). Median of 3 after one
  * warm-up, same JVM, CoW and positional interleaved so ambient drift
  * hits both. */
object PdvUpdateProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def du(fs: org.apache.hadoop.fs.FileSystem, p: String): Long =
    if (!fs.exists(new org.apache.hadoop.fs.Path(p))) 0L
    else fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("pdv-update-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = T.t(spark, sfDir, "orders").select(col("o_orderkey"),
      col("o_orderstatus"), T.dec(col("o_totalprice")).as("price"))
      .repartition(32)

    def freshTable(tag: String): String = {
      val dir = s"target/tmp/pdvprobe_$tag"
      GraftTable.fsOf(spark, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      GraftTable.commitNextIsolated(spark, dir, o, "base")
      // enter the pdv regime the way a MoR table does: one tiny delete
      GraftTable.commitPositionalDelete(spark, dir,
        col("o_orderkey") === 7L, "enter MoR")
      dir
    }

    def dirsOf(dir: String, v: Int): Seq[String] = {
      val fs = GraftTable.fsOf(spark, dir)
      val h = GraftTable.headersOf(fs, dir, v)
      (h.getOrElse("data", "").split(",").toSeq ++ h.get("pdv").toList)
        .filter(_.nonEmpty)
    }

    // the point UPDATE both arms run: bump ONE key's price
    val cond = col("o_orderkey") === 4242L
    val sets = Seq("price" -> (col("price") + lit(1)))

    def runPositional(i: Int): (Double, Long) = {
      val dir = freshTable(s"pos$i")
      val before = dirsOf(dir, 1).toSet
      val (_, s) = time(GraftTable.commitPositionalUpdate(
        spark, dir, cond, sets, "point update"))
      val fs = GraftTable.fsOf(spark, dir)
      val newBytes = dirsOf(dir, 2).filterNot(before)
        .map(d => du(fs, s"$dir/$d")).sum
      (s, newBytes)
    }

    def runCow(i: Int): (Double, Long) = {
      val dir = freshTable(s"cow$i")
      val before = dirsOf(dir, 1).toSet
      val (_, s) = time {
        val snap = GraftTable.readVersion(spark, dir, 1)
        val updated = snap.select(snap.columns.map {
          case "price" => when(cond, (col("price") + lit(1))
            .cast(snap.schema("price").dataType))
            .otherwise(col("price")).as("price")
          case c => col(c)
        }: _*)
        GraftTable.commitNextIsolated(spark, dir, updated,
          "point update CoW", expectVersion = Some(1))
      }
      val fs = GraftTable.fsOf(spark, dir)
      val newBytes = dirsOf(dir, 2).filterNot(before)
        .map(d => du(fs, s"$dir/$d")).sum
      (s, newBytes)
    }

    runPositional(99); runCow(99) // warm-up
    val pos = (1 to 3).map(runPositional)
    val cow = (1 to 3).map(runCow)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val posS = med(pos.map(_._1)); val cowS = med(cow.map(_._1))
    val posB = pos.map(_._2).sorted.apply(1)
    val cowB = cow.map(_._2).sorted.apply(1)
    val bytesRatio = cowB.toDouble / math.max(posB, 1L)
    val wallRatio = cowS / math.max(posS, 1e-9)
    val json =
      s"""{"sf":"$sfDir","rows":${o.count()},""" +
        f""""positional_s":$posS%.3f,"cow_s":$cowS%.3f,""" +
        s""""positional_bytes":$posB,"cow_bytes":$cowB,""" +
        f""""bytes_ratio":$bytesRatio%.1f,"wall_ratio":$wallRatio%.2f}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/pdv_update_probe.json"), json)
    spark.stop()
  }
}
