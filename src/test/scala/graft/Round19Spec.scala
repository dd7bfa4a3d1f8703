package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Round-19: loud quadratic-guard on exact Jaccard, JDBC door, ETL
  * multi-insert fan-out, positional DV sidecars, MERGE rebase across an
  * additive racer schema (VERDICT r18 "Next round" items). */
class Round19Spec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = s"target/tmp/r19spec_$tag"
    GraftTable.fsOf(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    dir
  }

  test("jaccardPairs refuses oversized input loudly instead of " +
      "silently truncating; explicit slices still run") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"tok$i common words here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.LlmOps.jaccardPairs(docs, 0.8, maxDocs = 10L)
    }
    assert(e.getMessage.contains("all-pairs") &&
      e.getMessage.contains("maxDocs=10") &&
      e.getMessage.toLowerCase.contains("minhash"),
      s"refusal must name the bound and the LSH escape hatch: ${e.getMessage}")
    // an explicit slice under the bound runs and finds the planted dup
    val dup = Seq((100L, "alpha beta gamma"), (101L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = graft.ops.LlmOps.jaccardPairs(dup, 0.8, maxDocs = 10L).collect()
    assert(got.length == 1 && got(0).getLong(0) == 100L &&
      got(0).getLong(1) == 101L)
  }
}
