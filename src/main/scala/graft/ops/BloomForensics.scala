package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Post-run forensics for the Bloom point-probe keys: after
  * `table_bloom_multicol` / `table_dsv2_write_indexed` have executed,
  * their fixture tables are still on disk — dump the decoded sidecar
  * relation (`graft_bloom`) and each probe's hit-file list beside the
  * Verify output (`_forensics/`, underscore-prefixed so no correctness
  * tooling mistakes it for a key), so a driver-side red on either key
  * carries the evidence — which files each probe opened, every
  * section's bit counts — instead of being unreproducible by
  * construction. Best-effort by design: Verify guards the call, and a
  * forensics failure must never fail the dump itself. */
object BloomForensics {

  def dump(s: SparkSession, sfDir: String, outDir: String,
      ranKeys: Set[String]): Unit = {
    import s.implicits._
    val base = new java.io.File(sfDir).getName
    // SIBLING of outDir, not inside it: the driver globs outDir/* as
    // per-query result dirs, so a dump inside would surface as a phantom
    // "_forensics" correctness entry (VERDICT r17, missing item 6).
    val fdir = s"${outDir.stripSuffix("/")}__forensics"
    def write(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$fdir/$name")
    def hitsDf(probes: Seq[(String, (Seq[String], Int))]): DataFrame =
      probes.flatMap { case (p, (hits, total)) =>
        if (hits.isEmpty) Seq((p, "<none>", total))
        else hits.map(h => (p, h, total))
      }.toDF("probe", "hit_file", "total_files")

    // only fixtures whose key ran THIS invocation: a stale table left
    // in target/tmp by an earlier run would otherwise masquerade as
    // evidence for a run it never belonged to
    val mc = s"target/tmp/gmcbloom_$base"
    if (ranKeys.contains("table_bloom_multicol") &&
        GraftTable.currentVersion(GraftTable.fsOf(s, mc), mc).isDefined) {
      val ck = GraftTable.read(s, mc)
        .agg(min(col("o_custkey"))).head().getLong(0)
      def probe(c: String, v: Any): (Seq[String], Int) = {
        val r = GraftTable.readBloomEq(s, mc, 0, c, v); (r._2, r._3)
      }
      write(GraftTable.bloomTable(s, mc, 0), "mcbloom_sidecar")
      write(hitsDf(Seq(
        s"o_custkey=$ck" -> probe("o_custkey", ck),
        "o_orderpriority=1-URGENT" -> probe("o_orderpriority", "1-URGENT"),
        "o_custkey=-977" ->
          probe("o_custkey", java.lang.Long.valueOf(-977L)))),
        "mcbloom_hits")
    }

    val iw = s"target/tmp/gidxwrite_$base"
    if (ranKeys.contains("table_dsv2_write_indexed") &&
        GraftTable.currentVersion(GraftTable.fsOf(s, iw), iw).isDefined) {
      val ck = GraftTable.read(s, iw)
        .agg(min(col("o_custkey"))).head().getLong(0)
      val bl = GraftTable.readBloomEq(s, iw, 1, "o_custkey", ck)
      val (_, bandHits, bandTotal) = GraftTable.readStatsBand(s, iw, 1,
        "o_orderdate", graft.T.epochUs("1996-03-01"),
        graft.T.epochUs("1996-06-01") - 1L)
      write(GraftTable.bloomTable(s, iw, 1), "idxwrite_sidecar")
      write(hitsDf(Seq(
        s"bloom:o_custkey=$ck" -> ((bl._2, bl._3)),
        "band:o_orderdate[1996-03,1996-06)" -> ((bandHits, bandTotal)))),
        "idxwrite_hits")
    }
  }
}
