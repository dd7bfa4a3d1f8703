package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 `text_minhash_dedup` (t2=N, approximate) — MinHash-LSH
  * near-duplicate candidate generation, the 100 TB replacement for the
  * exact token-pair join in `text_jaccard_pairs`.
  *
  * Design for scale (SURVEY §7.2 item 9):
  *  - signature = fixed-length Array[Long] (k minhashes of 3-word
  *    shingles), built with one explode + one groupBy (k min-aggregates,
  *    map-side combinable — a single shuffle keyed by doc_id);
  *  - LSH banding: b bands of r rows; docs sharing any band key become
  *    candidates. The band join is an equi-join on (band_id, band_hash) —
  *    shuffle-partitionable, never a cross product;
  *  - candidate similarity is estimated from signature agreement
  *    (|sig_a == sig_b| / k), so verification needs no second pass over
  *    the corpus text.
  *
  * With k=32, b=8, r=4: P(candidate) = 1-(1-s^4)^8 — ~0.97 at s=0.8,
  * ~0.19 at s=0.4 — tuned for the 0.8-Jaccard dedup threshold.
  */
object MinHashDedup {
  val K = 32          // minhashes per signature
  val Bands = 8       // LSH bands
  val R: Int = K / Bands

  /** doc_id + minhash signature (Array[Long] length K) over the DISTINCT
    * TOKEN set — the same set universe `text_jaccard_pairs` measures, so
    * the signature estimates exactly that Jaccard. (A shingle variant
    * just swaps the exploded column; the LSH machinery is unchanged.) */
  def signatures(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("sh"))
    val minCols: Seq[Column] =
      (0 until K).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until K).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Near-dup dedup assignment: doc_id → cluster representative (min
    * doc_id reachable through shared LSH buckets, `iters` rounds of
    * label propagation — an iterative-DataFrame union-find approximation
    * of connected components, SURVEY §7.2 item 9).
    *
    * This is the 100 TB-shaped output: O(docs × bands) rows through
    * key-partitioned shuffles, never the quadratic candidate-pair set
    * (which on a near-dup-heavy corpus is quadratic BY OUTPUT).
    */
  def dedupAssign(docs: DataFrame, iters: Int = 3): DataFrame = {
    val sigs = signatures(docs)
    val bandKeys = (0 until Bands).map { b =>
      val parts = (0 until R).map(j => col("sig").getItem(b * R + j))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("bh"))
    }
    // banded is reused 1 + 2*iters times; persist so the signature
    // computation (the expensive explode+groupBy) runs exactly once
    // rather than once per label-propagation round.
    val banded = sigs.select(col("doc_id"),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = banded.select(col("doc_id"), col("doc_id").as("rep"))
    for (_ <- 0 until iters) {
      val bucketMin = banded.join(labels, "doc_id")
        .groupBy("bk").agg(min(col("rep")).as("bmin"))
      labels = banded.join(bucketMin, "bk")
        .groupBy("doc_id").agg(min(col("bmin")).as("rep"))
    }
    labels
  }

  /** Candidate pairs from band-bucket equi-join, with estimated Jaccard
    * (signature agreement fraction), filtered at `minEst`. Ground-truth
    * fixture for recall tests on small corpora — on a corpus where most
    * pairs ARE near-dups this output is inherently quadratic; use
    * dedupAssign for the scale path. */
  def candidatePairs(docs: DataFrame, minEst: Double = 0.7): DataFrame = {
    val sigs = signatures(docs)
    val bandKeys = (0 until Bands).map { b =>
      val parts = (0 until R).map(j => col("sig").getItem(b * R + j))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(array(bandKeys: _*)).as("bk"))
    val a = banded.select(col("bk").as("bka"), col("doc_id").as("a_id"),
      col("sig").as("sig_a"))
    val b = banded.select(col("bk").as("bkb"), col("doc_id").as("b_id"),
      col("sig").as("sig_b"))
    a.join(b, col("bka") === col("bkb") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / K).as("est"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("est") >= minEst)
  }
}
