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
    * doc_id reachable through shared LSH buckets, label propagation TO
    * CONVERGENCE — an iterative-DataFrame union-find over the band
    * graph, SURVEY §7.2 item 9).
    *
    * Each round moves a label one bucket-hop, so a duplicate chain of
    * any length resolves to one representative; the loop stops as soon
    * as an (order-independent) checksum of the assignment is stable
    * between rounds, capped at `maxIters` as a runaway guard.
    *
    * This is the 100 TB-shaped output: O(docs × bands) rows through
    * key-partitioned shuffles, never the quadratic candidate-pair set
    * (which on a near-dup-heavy corpus is quadratic BY OUTPUT).
    */
  def dedupAssign(docs: DataFrame, maxIters: Int = 10): DataFrame =
    dedupAssignFromSigs(signatures(docs), maxIters)

  /** The assignment half, over an existing signature table — the serving
    * path when signatures live in an incrementally-ingested store
    * (`text_minhash_index_serve`): label propagation runs over STORED
    * signatures with zero signature recomputation. Docs without a
    * signature row (no tokens) have no bands and were never assignable;
    * seeding from `sigs` makes that set explicit (dedupAssign's
    * docs-seeded labels drop them on the first inner join anyway —
    * identical output, proven in Round11Spec). */
  def dedupAssignFromSigs(sigs0: DataFrame, maxIters: Int = 10): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigs = sigs0
    val bandKeys = (0 until Bands).map { b =>
      val parts = (0 until R).map(j => col("sig").getItem(b * R + j))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("bh"))
    }
    // Order-independent assignment checksum; decimal(38,0) accumulator so
    // the sum of n 64-bit hashes cannot overflow (ANSI mode would throw).
    def checksum(df: DataFrame): String =
      String.valueOf(df.agg(sum(xxhash64(col("doc_id"), col("rep"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head.get(0))
    // Loop conf (same pattern as Round5Ops.graphComponents): per-round
    // data volume is known exactly (docs × Bands rows — one band key per
    // doc per band, no count needed), so size the loop's shuffle
    // parallelism from it and pause AQE — its per-stage re-planning
    // dominates these micro-stages. The loop runs on a CLONED session
    // (isolated SQLConf, shared context + cache manager), so the
    // overrides cannot leak into plans compiled concurrently on the
    // caller's session; the returned plan is rebound to the caller.
    val s = sigs.sparkSession
    val nBanded = sigs.count() * Bands
    val loopParts = math.max(1L, math.min(
      s.conf.get("spark.sql.shuffle.partitions").toLong,
      nBanded / 50000 + 1))
    // banded is reused twice per round: persist it hash-partitioned by
    // doc_id at exactly loopParts, and MATERIALIZE it here on the caller's
    // session — the expensive explode+groupBy signature stage runs once at
    // full session parallelism (not under the loop's narrow conf), and the
    // in-loop doc_id join then reuses the persisted layout with no
    // per-round exchange of the banded side.
    val banded = sigs.select(col("doc_id"),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk"))
      .repartition(loopParts.toInt, col("doc_id"))
      .persist(MEMORY_AND_DISK)
    banded.count()
    val labels = graft.Graft.withLoopConf(s,
      "spark.sql.shuffle.partitions" -> loopParts.toString,
      "spark.sql.adaptive.enabled" -> "false") { s2 =>
      val bandedL = graft.Graft.rebind(banded, s2)
      // One row per doc (NOT per band) — an undeduplicated seed would
      // multiply the first round's join by Bands^2.
      var labs = graft.Graft
        .rebind(sigs.select(col("doc_id"), col("doc_id").as("rep")), s2)
        .persist(MEMORY_AND_DISK)
      // seed checksum deliberately not computed: round 1 always runs, and
      // on a dup-free corpus stability is detected one round later anyway
      var prev = ""
      var it = 0
      var stable = false
      val wBk = org.apache.spark.sql.expressions.Window.partitionBy("bk")
      while (it < maxIters && !stable) {
        // banded and labels are both hash-partitioned by doc_id (banded via
        // the signature groupBy, labels via the previous round's groupBy),
        // so the join needs no exchange; the per-bucket min comes from a
        // window over bk instead of a groupBy+join back — two exchanges per
        // round (bk, then doc_id), the minimum the doc→bucket→doc hop needs.
        val next = bandedL.join(labs, "doc_id")
          .withColumn("bmin", min(col("rep")).over(wBk))
          .groupBy("doc_id").agg(min(col("bmin")).as("rep"))
          .persist(MEMORY_AND_DISK)
        val cs = checksum(next) // materializes `next` under its persist
        if (sys.env.contains("GRAFT_DEBUG_ROUNDS")) println(s"[dedup] round ${it + 1} cs=$cs")
        labs.unpersist()
        labs = next
        stable = cs == prev
        prev = cs
        it += 1
      }
      labs
    }
    graft.Graft.rebind(labels, s)
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
