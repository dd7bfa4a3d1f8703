package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 operator additions.
  *
  * ANN serving path completed: `vec_ivf_pq_topk` composes the two halves
  * that rounds 4–8 proved separately — IVF bucket restriction
  * (TextAnalysis.vec_ivf_topk) and PQ asymmetric-distance scoring
  * (Round4Ops.vec_pq_adc_topk) — into the one-pass plan a 100 TB vector
  * store actually executes: nprobe coarse buckets → ADC over codes →
  * exact re-rank of a bounded shortlist.
  *
  * Index build completed: `vec_kmeans_train` runs Lloyd's algorithm to a
  * convergence-checked fixpoint (the loop `vec_centroid_recluster` ran
  * one iteration of), producing the trained codebook the IVF/PQ family
  * consumes — at 100 TB an untrained codebook wrecks bucket balance and
  * quantization error.
  *
  * Determinism canon per SURVEY §7.2: sequential-fold double sums
  * mirrored by DuckDB list_sum, exact DECIMAL accumulators for every
  * order-sensitive sum, explicit tie-breaks on every argmin, total ORDER
  * BY on unique keys.
  */
object Round9Ops {
  import T._

  /** Per-cluster accumulator for kmeansTrain's treeAggregate: member
    * count, inertia and per-dimension sums in exact arbitrary-precision
    * decimal (order-independent), assignment checksum as a wrapping
    * Long sum (exact mod 2^64, order-independent). */
  private final class KmAcc extends Serializable {
    var n: Long = 0L
    var sh: Long = 0L
    var sd: java.math.BigDecimal = java.math.BigDecimal.ZERO
    val dims: Array[java.math.BigDecimal] =
      Array.fill(64)(java.math.BigDecimal.ZERO)
    def add(id: Long, cid: Int, dist: Double, emb: Array[Float]): Unit = {
      n += 1
      // fixed per-assignment mix (any deterministic hash works — this is
      // loop control, not an oracle-visible value)
      sh += (id * 0x9E3779B97F4A7C15L) ^ (cid * 0xC2B2AE3D27D4EB4FL)
      if (java.lang.Double.isFinite(dist))
        sd = sd.add(new java.math.BigDecimal(dist))
      var i = 0
      while (i < 64) {
        dims(i) = dims(i).add(new java.math.BigDecimal(emb(i).toDouble))
        i += 1
      }
    }
    def merge(o: KmAcc): Unit = {
      n += o.n; sh += o.sh; sd = sd.add(o.sd)
      var i = 0
      while (i < 64) { dims(i) = dims(i).add(o.dims(i)); i += 1 }
    }
  }

  /** SQL fold: full 64-dim L2² between array cols a and b — the same
    * sequential `aggregate` fold as Round4Ops.subL2 (whose DuckDB mirror
    * is list_sum over generate_series, bit-exact per the vec_norm_stats
    * precedent), just over all four subspaces at once. Used for the IVF
    * coarse assignment and the exact re-rank leg of vec_ivf_pq_topk, and
    * for the Lloyd assignment step of vec_kmeans_train. */
  private[graft] def fullL2(a: String, b: String): String = {
    val diff = s"(CAST(element_at($a, i) AS DOUBLE) - " +
      s"CAST(element_at($b, i) AS DOUBLE))"
    s"aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) -> acc + $diff * $diff)"
  }

  /** Lloyd's k-means to convergence over (vec_id, embedding) rows.
    * Returns (centroids as (cid, 64 doubles, member count),
    * per-iteration inertia, iterations run).
    *
    * Posture at 100 TB: the ONLY driver-side artifact per round is the
    * centroid table itself — k×64 doubles (512 values at k=8) — exactly
    * what Spark MLlib's KMeans collects and re-broadcasts per iteration.
    * The corpus is read once into a persisted typed projection and never
    * leaves the executors; each iteration is ONE treeAggregate job with
    * the codebook as a broadcast variable. This is deliberately the
    * imperative per-partition tier ((d) in the operator-preference
    * order), NOT a DataFrame plan: a literal-codebook plan re-analyzes
    * and re-compiles codegen every iteration (~1 s/iter of pure
    * compile/planning overhead measured at sf0.1 — 30× the data work),
    * while the broadcast closure re-runs the SAME physical job each
    * round. The declarative, oracle-checked form of one iteration
    * remains vec_centroid_recluster.
    *
    * Determinism / partition invariance: the argmin breaks ties on
    * (dist, cid) with NaN/absent distances losing (pqCodes canon);
    * per-dimension sums, the inertia and the assignment checksum
    * accumulate in EXACT arbitrary-precision decimals (float32 inputs
    * and per-row double distances are exact there; addition is
    * commutative-associative), so results are bit-identical at local[4]
    * vs local[32]. Lloyd guarantees inertia is non-increasing; the loop
    * stops at the assignment fixpoint (assignments stable ⇒ means
    * stable ⇒ fixpoint) or — the MLlib-style practical stop — when an
    * iteration improves inertia by less than `tol` relative, capped at
    * maxIters as a runaway guard. Empty clusters keep their previous
    * centroid (standard Lloyd degeneracy handling). Rows with a null or
    * non-64-dim embedding are excluded up front (they have no defined
    * distance; the DataFrame operators park them on cid 0 with +∞ —
    * fixture embeddings are all dense 64-d, so the difference is
    * unexercised).
    */
  private[graft] def kmeansTrain(e0: DataFrame, maxIters: Int = 25,
      tol: Double = 1e-4, minIters: Int = 0)
      : (Seq[(Int, Seq[Double], Long)], Seq[Double], Int) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val s = e0.sparkSession
    import s.implicits._
    val ds = e0
      .select(col("vec_id").cast(LongType), col("embedding"))
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .as[(Long, Array[Float])]
      .persist(MEMORY_AND_DISK)
    // fixture init: the 8 seed vectors every vec_* operator starts from
    var cents: Seq[(Int, Seq[Double])] = ds.filter(_._1 < 8).collect()
      .map { case (id, v) => (id.toInt, v.map(_.toDouble).toSeq) }
      .sortBy(_._1).toSeq
    var members = Map.empty[Int, Long]
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    var prevCs = ""
    var it = 0
    var stable = false
    while (it < maxIters && !stable) {
      val k = cents.size
      val cidOf = cents.map(_._1).toArray
      val bc = s.sparkContext.broadcast(
        cents.map(_._2.toArray).toArray)
      val agg = ds.rdd.treeAggregate(Array.fill(k)(new KmAcc))(
        seqOp = (acc, row) => {
          val (id, emb) = row
          val cvs = bc.value
          var bestC = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cvs.length) {
            val cv = cvs(c)
            var dst = 0.0
            var i = 0
            while (i < 64) {
              val t = emb(i).toDouble - cv(i); dst += t * t; i += 1
            }
            // strict < : ties keep the smallest cid; NaN never wins
            if (dst < bestD) { bestD = dst; bestC = c }
            c += 1
          }
          acc(bestC).add(id, cidOf(bestC), bestD, emb)
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < k) { a(i).merge(b(i)); i += 1 }; a })
      bc.unpersist(blocking = false)
      val inertia = agg.foldLeft(java.math.BigDecimal.ZERO)((z, a) => z.add(a.sd))
      inertias += inertia.doubleValue
      // wrapping Long sum of per-assignment hashes: exact mod 2^64,
      // commutative — an order-independent assignment checksum
      val cs = agg.foldLeft(0L)((z, a) => z + a.sh).toString
      members = cidOf.zip(agg.map(_.n)).toMap
      cents = cents.zip(agg).map { case ((cid, old), a) =>
        if (a.n == 0L) (cid, old) // empty cluster: keep previous centroid
        else {
          val n = new java.math.BigDecimal(a.n)
          (cid, a.dims.map(_.divide(n, java.math.MathContext.DECIMAL128)
            .doubleValue).toSeq)
        }
      }
      val relImproved = inertias.size < 2 ||
        inertias(inertias.size - 2) - inertia.doubleValue >
          tol * inertias(inertias.size - 2)
      // minIters pins the work shape for scaling probes (ScalingProbe
      // times a fixed-iteration run at 1× and 10×)
      stable = it + 1 >= minIters && (cs == prevCs || !relImproved)
      prevCs = cs
      it += 1
    }
    ds.unpersist()
    (cents.map { case (cid, v) => (cid, v, members.getOrElse(cid, 0L)) },
      inertias.toSeq, it)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Composed IVF×PQ ANN search — the actual 100 TB serving plan, built
    // from the proven halves: (1) coarse IVF assignment (map-side min_by
    // argmin over the 8 broadcast seed centroids, full-vector L2²,
    // pqCodes NULL canon); (2) the probe (vec_id=0) restricts the search
    // to its nprobe=2 nearest coarse buckets — a broadcast semi-
    // restriction, so the corpus outside those buckets is never scored;
    // (3) candidates are ADC-scored through their PQ codes against the
    // broadcast 4×8 probe distance table (the corpus is never re-read as
    // floats — codes are the precomputed artifact, joined by vec_id);
    // (4) the top-50 ADC shortlist is exactly re-ranked with full-vector
    // L2² and the top-10 returned. Both top-k legs are
    // TakeOrderedAndProject (bounded), no window anywhere; the ADC fold
    // runs in fixed m-order (sorted-fold canon) so the double sum is
    // deterministic and DuckDB-mirrorable. The oracle replays the exact
    // same funnel, so the hash check covers bucket choice, code
    // assignment, ADC scores AND the re-rank.
    "vec_ivf_pq_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
      // coarse IVF assignment: one bucket per vector, no window shuffle
      val assign = e.crossJoin(cents)
        .withColumn("cd", expr(fullL2("embedding", "cvec")))
        .groupBy("vec_id")
        .agg(min_by(col("cid"),
            struct(coalesce(col("cd"), lit(Double.PositiveInfinity)).as("nd"),
              col("cid"))).as("cid"),
          first(col("label")).as("label"),
          first(col("embedding")).as("embedding"))
        // probe row + candidate side both read assign
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probe = assign.filter(col("vec_id") === 0)
        .select(col("embedding").as("pvec"))
      val probeBuckets = probe.crossJoin(cents)
        .withColumn("pd", expr(fullL2("pvec", "cvec")))
        .orderBy(col("pd").asc, col("cid").asc).limit(2)
        .select("cid", "pvec")
      // candidates: only vectors living in the nprobe buckets
      val cand = assign.filter(col("vec_id") =!= 0)
        .join(broadcast(probeBuckets), "cid")
      // PQ codes: the precomputed corpus artifact (shared codebook
      // helper — same argmin, same NULL semantics as vec_pq_codes),
      // RESTRICTED to the candidate set before any scoring — at 100 TB
      // the code table is stored bucketed by cid, so this restriction
      // is a partition prune, and ADC work is proportional to the
      // nprobe buckets, not the corpus
      val codes = Round4Ops.pqCodes(e, cents)
        .join(cand.select("vec_id"), "vec_id")
      val dtab = broadcast(probe.crossJoin(cents)
        .select(col("cid").as("code"), col("pvec"), col("cvec"),
          explode(expr("sequence(0, 3)")).as("m"))
        .withColumn("pdist", expr(Round4Ops.subL2("pvec", "cvec")))
        .select("m", "code", "pdist"))
      val adc = codes.join(dtab, Seq("m", "code"))
        .groupBy("vec_id")
        .agg(expr("aggregate(array_sort(collect_list(struct(m, pdist))), " +
          "CAST(0 AS DOUBLE), (acc, x) -> acc + x.pdist)").as("adc"))
      val shortlist = cand
        .join(adc, "vec_id")
        .orderBy(col("adc").asc, col("vec_id").asc).limit(50)
      shortlist
        .withColumn("exact", expr(fullL2("embedding", "pvec")))
        .orderBy(col("exact").asc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), col("label"), col("cid"),
          round(col("adc"), 6).as("adc_dist"),
          round(col("exact"), 6).as("l2_dist"))
    }),

    // t2=N: trained codebook — Lloyd's k-means run to its assignment
    // fixpoint (vec_centroid_recluster is exactly one iteration of this
    // loop). Output = the converged codebook as (cid, dim, value) rows
    // plus member counts and the iteration count; Round9Spec asserts
    // determinism (bit-identical across runs and parallelism — all
    // order-sensitive sums are DECIMAL), monotone non-increasing
    // inertia (Lloyd's invariant), and convergence before the iteration
    // cap. No DuckDB oracle: the fixpoint loop is not expressible as a
    // single SQL statement (same contract as text_minhash_dedup's label
    // propagation).
    "vec_kmeans_train" -> ((s, d) => {
      val (cents, inertias, iters) = kmeansTrain(t(s, d, "embeddings"))
      import s.implicits._
      cents.flatMap { case (cid, v, n) =>
        v.zipWithIndex.map { case (x, dim) => (cid, dim, x, n, iters) }
      }.toDF("cid", "dim", "centroid_v", "n_members", "n_iters")
        .withColumn("final_inertia",
          round(lit(inertias.lastOption.getOrElse(0d)), 6))
        .orderBy("cid", "dim")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Mirrors the full funnel: coarse assignment (ROW_NUMBER argmin ↔
    // min_by), nprobe-2 bucket pick, PQ codes (vec_pq_codes oracle),
    // probe distance table, ADC sum in sorted m-order (vec_pq_adc_topk
    // oracle), top-50 ADC shortlist, exact L2² re-rank top-10.
    "vec_ivf_pq_topk" ->
      ("WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev " +
        "FROM embeddings), " +
        "cents AS (SELECT vec_id AS cid, ev AS cvec FROM e WHERE vec_id < 8), " +
        "ca AS (SELECT e.vec_id, e.label, e.ev, c.cid, " +
        "list_sum(list_transform(generate_series(1, 64), " +
        "i -> (ev[i] - cvec[i]) * (ev[i] - cvec[i]))) AS cd FROM e, cents c), " +
        "assign AS (SELECT vec_id, label, ev, cid FROM (SELECT *, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd, cid) AS rk FROM ca) " +
        "WHERE rk = 1), " +
        "p AS (SELECT ev AS pv FROM e WHERE vec_id = 0), " +
        "pb AS (SELECT c.cid, p.pv FROM cents c, p " +
        "ORDER BY list_sum(list_transform(generate_series(1, 64), " +
        "i -> (pv[i] - cvec[i]) * (pv[i] - cvec[i]))), c.cid LIMIT 2), " +
        "s AS (SELECT vec_id, ev, unnest(generate_series(0, 3)) AS m FROM e), " +
        "dall AS (SELECT vec_id, m, cid, list_sum(list_transform(generate_series(1, 16), " +
        "i -> (ev[m*16 + i] - cvec[m*16 + i]) * (ev[m*16 + i] - cvec[m*16 + i]))) AS dist " +
        "FROM s, cents), " +
        "codes AS (SELECT vec_id, m, cid AS code FROM (SELECT vec_id, m, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rk FROM dall) " +
        "WHERE rk = 1), " +
        "dtab AS (SELECT m, cid AS code, list_sum(list_transform(generate_series(1, 16), " +
        "i -> (pv[m*16 + i] - cvec[m*16 + i]) * (pv[m*16 + i] - cvec[m*16 + i]))) AS pdist " +
        "FROM (SELECT cid, cvec, pv, unnest(generate_series(0, 3)) AS m FROM cents, p)), " +
        "adc AS (SELECT vec_id, list_sum(list_transform(" +
        "list_sort(list({'m': m, 'pdist': pdist})), x -> x.pdist)) AS adc " +
        "FROM codes JOIN dtab USING (m, code) GROUP BY vec_id), " +
        "short AS (SELECT a.vec_id, a.label, a.cid, a.ev, pb.pv, adc.adc " +
        "FROM assign a JOIN pb USING (cid) JOIN adc USING (vec_id) " +
        "WHERE a.vec_id <> 0 ORDER BY adc.adc, a.vec_id LIMIT 50), " +
        "rr AS (SELECT vec_id, label, cid, adc, " +
        "list_sum(list_transform(generate_series(1, 64), " +
        "i -> (ev[i] - pv[i]) * (ev[i] - pv[i]))) AS exact FROM short) " +
        "SELECT vec_id, label, cid, CAST(ROUND(adc, 6) AS DOUBLE) AS adc_dist, " +
        "CAST(ROUND(exact, 6) AS DOUBLE) AS l2_dist " +
        "FROM rr ORDER BY exact, vec_id LIMIT 10")
  )
}
