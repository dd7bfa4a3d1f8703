package graft.ops

import graft.T
import graft.T.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Round-4 operator additions.
  *
  * Training-data pipeline: benchmark decontamination (shingle equi-join),
  * incremental corpus dedup (anti-join on content hash), Gopher-style
  * repetition quality signals, token-budget sequence packing, weighted
  * epoch mixing with fractional repeat factors, product-quantization
  * code assignment (the memory-scale path for ANN).
  *
  * Relational: TPC-H Q17/Q18/Q19 shapes (correlated scalar agg,
  * large-order HAVING join, disjunctive multi-predicate join), a geo
  * scalar pack (haversine/bearing), and a daily top-N leaderboard.
  *
  * Determinism canon per SURVEY §7.2: decimal money, total ORDER BY,
  * explicit tie-breaks on every argmin/row_number, sequential-fold
  * double sums mirrored by DuckDB list_sum (vec_norm_stats precedent).
  */
object Round4Ops {
  import T._

  // ---- shared contamination fixture -----------------------------------
  // ONE definition of the token projection, the 5-gram shingling and the
  // bench/corpus split for BOTH the exact equi-join checker and the
  // Bloom variant: the Bloom spec's zero-false-negative superset
  // assertion only holds while the two queries shingle identically, so
  // the coupling is structural, not copy-paste.
  private def docToks(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), split(col("text"), " ").as("toks"))
  /** word 5-gram shingles of docs with ≥ 5 tokens → (doc_id, g). */
  private[graft] def shingles5(df: DataFrame): DataFrame =
    df.filter(size(col("toks")) >= 5).select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(toks)-4), " +
        "i -> array_join(slice(toks, i, 5), ' '))")).as("g"))
  /** held-out benchmark split predicate (doc_id % 97 == 0). */
  private def isBench = col("doc_id") % 97 === 0

  // ---- shared PQ codebook ---------------------------------------------
  // ONE definition of the subspace L2 and the code assignment for
  // vec_pq_codes (code table) and vec_pq_adc_topk (ADC search): the two
  // must agree on what a vector's code IS, including edge semantics.
  /** SQL fold: L2² between 16-float subspace `m` of array cols a and b.
    * Shared with Round9Ops.vec_ivf_pq_topk — the composed IVF×PQ search
    * must build its distance table from the SAME fold as the codes. */
  private[graft] def subL2(a: String, b: String): String = {
    val diff = s"(CAST(element_at($a, m*16 + i) AS DOUBLE) - " +
      s"CAST(element_at($b, m*16 + i) AS DOUBLE))"
    s"aggregate(sequence(1, 16), CAST(0 AS DOUBLE), (acc, i) -> acc + $diff * $diff)"
  }
  /** Per-(vec_id, m) PQ code: argmin-L2 sub-centroid as a map-side
    * min_by (no window shuffle) under (dist ASC NULLS LAST, cid ASC) —
    * the oracle's ROW_NUMBER ordering. The coalesce-to-+∞ makes a NULL
    * dist (null/short embedding) LOSE the argmin on both engines; NaN
    * sorts above +∞ on both, so it loses too. Returns
    * (vec_id, m, code, dist, label); `dist` is min(dist) = the winning
    * distance (NULL iff every centroid's dist is NULL, as in the
    * oracle). */
  private[graft] def pqCodes(e: DataFrame, cents: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"), col("embedding"),
        explode(expr("sequence(0, 3)")).as("m"))
      .join(cents)
      .withColumn("dist", expr(subL2("embedding", "cvec")))
      .groupBy("vec_id", "m")
      .agg(min_by(col("cid"),
          struct(coalesce(col("dist"), lit(Double.PositiveInfinity)).as("nd"),
            col("cid"))).as("code"),
        min(col("dist")).as("dist"),
        first(col("label")).as("label"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Benchmark decontamination: flag corpus docs sharing any word
    // 5-gram with a held-out benchmark set (docs with doc_id % 97 == 0).
    // The match is a shingle EQUI-join — the benchmark side is tiny and
    // broadcast; the corpus side streams. At 100 TB the join key becomes
    // xxhash64(shingle) (8-byte shuffle rows) and the benchmark set a
    // broadcast bloom/hash set; semantics are identical, so the oracle
    // checks the string-keyed form.
    "text_contamination_check" -> ((s, d) => {
      val toks = docToks(s, d)
      val corpus = toks.filter(!isBench)
      val bench = toks.filter(isBench)
      val benchG = broadcast(shingles5(bench).select("g").distinct())
      val hits = shingles5(corpus).join(benchG, "g")
        .groupBy("doc_id").agg(countDistinct(col("g")).as("n_hits"))
      corpus.select("doc_id").join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    }),

    // t2=N: Bloom-filter decontamination — the probabilistic scale
    // companion to text_contamination_check (same bench/corpus split and
    // 5-gram shingles). The benchmark side is folded into a ~KB Bloom
    // sketch (spark-sketch BloomFilter via df.stat.bloomFilter — a
    // distributed treeAggregate build; insertion-order-independent, so
    // the bit array and therefore the output are deterministic) and
    // broadcast; the 100 TB corpus side then probes locally with NO join
    // and NO shuffle of the benchmark set — the posture when the bench
    // set is large and the corpus enormous. Bloom guarantees zero false
    // NEGATIVES (every truly contaminated doc is flagged); fpp=1e-4 per
    // shingle keeps doc-level false positives rare (~1% at ~100
    // shingles/doc). ScalaTest asserts exact-hit superset + FP bound; no
    // DuckDB oracle (no bloom primitive in the oracle dialect).
    "text_bloom_decontaminate" -> ((s, d) => {
      val toks = docToks(s, d)
      val bench = shingles5(toks.filter(isBench)).select("g").distinct()
      // sketch build is the one driver-side artifact — the standard
      // broadcast-side pattern (like a broadcast hash relation). The
      // capacity comes from a counted sizing pass (documented
      // materialization action, MinHashDedup precedent): a hardcoded
      // capacity would silently saturate past its bound at a larger sf
      // and the fpp contract — and the spec's FP bound — would collapse.
      val nBench = math.max(bench.count(), 1000L)
      val bf = bench.stat.bloomFilter("g", nBench, 1e-4)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((g: String) => g != null && bfB.value.mightContain(g))
      shingles5(toks.filter(!isBench))
        .filter(mightContain(col("g")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidate_hits"))
        .orderBy("doc_id")
    }),

    // t2=N: Count-Min-Sketch heavy hitters — completes the sketch
    // family (HLL distinct, approx percentile, Bloom membership, CMS
    // frequency). The token stream folds into a fixed-seed CMS
    // (df.stat.countMinSketch — distributed build; counter adds are
    // commutative and the hash seed is pinned, so the sketch and the
    // estimates are deterministic AND partition-invariant, which the
    // order-sensitive freqItems sketch is not); the exact global top-20
    // is then annotated with its CMS estimate and overestimate. At
    // 100 TB the sketch is the only thing that leaves the executors
    // (~KBs), the posture for hot-token / hot-key monitoring. ScalaTest
    // asserts the CMS one-sided error bound (est ≥ exact, overshoot ≤
    // eps·N at 99% confidence). No oracle: no CMS in the DuckDB dialect.
    "agg_cms_token_counts" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val cms = toks.stat.countMinSketch(col("tok"),
        eps = 0.001, confidence = 0.99, seed = 42)
      val cmsB = s.sparkContext.broadcast(cms)
      val est = udf((t: String) => cmsB.value.estimateCount(t))
      toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
        .withColumn("cms_est", est(col("tok")))
        .withColumn("overestimate", col("cms_est") - col("exact_cnt"))
    }),

    // Incremental dedup: a "new batch" (doc_id % 10 == 7) lands against
    // an existing corpus; drop batch docs whose sha256 already exists
    // (left ANTI join on the 32-byte hash — the shuffle never carries
    // text), then collapse within-batch duplicates keeping min doc_id.
    "text_dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      val corpusH = docs.filter(col("doc_id") % 10 =!= 7).select("h").distinct()
      docs.filter(col("doc_id") % 10 === 7)
        .join(corpusH, Seq("h"), "left_anti")
        .groupBy("h")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_in_batch"))
        .select(col("doc_id"), col("n_in_batch"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals: duplicate-word fraction and
    // top-bigram fraction per doc, with a keep/drop verdict. Two
    // hash aggregations keyed by doc_id — fully map-side-combinable,
    // no window, no self-join.
    "text_repetition_filter" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
      val words = toks.select(col("doc_id"), explode(col("toks")).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), countDistinct("w").as("n_distinct"))
      val top = toks.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks)-1), " +
            "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1)))"))
          .as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg((max(col("c")).cast(DoubleType) / sum(col("c"))).as("topf"))
      val dupf = lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_tok")
      words.join(top, "doc_id")
        .select(col("doc_id"),
          dround(dupf, 4).as("dup_word_frac"),
          dround(col("topf"), 4).as("top_bigram_frac"),
          (dupf <= 0.65 && col("topf") <= 0.15).as("keep"))
        .orderBy("doc_id")
    }),

    // Token-budget sequence packing (2048-token bins): docs are packed
    // in doc_id order within each source shard — exclusive running sum
    // of token counts div budget = sequence id. One window shuffle keyed
    // by source; at 100 TB the shard key is the natural file/partition,
    // so no global sort ever exists.
    "text_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .withColumn("cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("seq_id", expr("cum div 2048"))
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "seq_id")
    }),

    // Weighted data mixing with fractional repeat factors: each lang has
    // an epoch rate (en 2.0, de 1.5, fr 1.0, es 0.5, zh 0.25); a doc is
    // materialized floor(rate) times plus once more for the
    // hash-ranked first (rate - floor(rate)) share of its stratum —
    // deterministic upsampling/downsampling, no RNG state.
    "sample_mix_epochs" -> ((s, d) => {
      val rate = when(col("lang") === "en", 2.0)
        .when(col("lang") === "de", 1.5)
        .when(col("lang") === "fr", 1.0)
        .when(col("lang") === "es", 0.5).otherwise(0.25)
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      t(s, d, "documents").select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
        .withColumn("n_rep", (floor(rate) +
          when(col("rn") <= (rate - floor(rate)) * col("n"), 1L)
            .otherwise(0L)).cast(LongType))
        .filter(col("n_rep") >= 1)
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(1, CAST(n_rep AS INT))")).as("epoch"))
        .orderBy("doc_id", "epoch")
    }),

    // Product quantization: 64-d vectors split into 4×16-d subspaces;
    // each subvector is coded as the argmin-L2 of 8 shared centroids
    // (vec_id < 8 — deterministic init). 2000×4×8 distance rows via a
    // broadcast cross join; the fold is a sequential double sum, which
    // DuckDB's list_sum mirrors bit-exactly (vec_norm_stats precedent).
    // PQ codes are the memory-scale ANN path: 64 floats → 4 bytes.
    "vec_pq_codes" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
      // shared assignment helper (also feeds vec_pq_adc_topk): min_by
      // argmin replaces the original row_number window — no 8×-row
      // window sort, and NULL-dist semantics now match the oracle's
      // NULLS LAST instead of Spark's window nulls-first default
      pqCodes(e, cents)
        .select(col("vec_id"), col("m").cast(IntegerType).as("m"),
          col("code").cast(IntegerType).as("code"),
          dround(col("dist"), 4).as("dist"))
        .orderBy("vec_id", "m")
    }),

    // PQ-ADC search (asymmetric distance computation): the serving-time
    // companion to vec_pq_codes. The probe (vec_id=0) precomputes its
    // L2² to every sub-centroid — a 4×8 distance TABLE, broadcast — and
    // each database vector's approximate distance is the sum of 4 table
    // lookups through its PQ codes: the corpus is never re-read as
    // floats at query time (64 floats → 4 bytes/vector + one tiny
    // table). Codes use the map-side-combinable min_by argmin (no
    // window shuffle); the ADC sum folds the 4 addends in fixed m-order
    // (sorted-fold canon) so the double sum is deterministic and
    // DuckDB-mirrorable. Top-10 ascending approx distance.
    "vec_pq_adc_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
      // same codebook as vec_pq_codes by construction (shared helper)
      val codes = pqCodes(e, cents)
      val dtab = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("pvec"))
        .crossJoin(cents)
        .select(col("cid").as("code"), col("pvec"), col("cvec"),
          explode(expr("sequence(0, 3)")).as("m"))
        .withColumn("pdist", expr(subL2("pvec", "cvec")))
        .select("m", "code", "pdist"))
      codes.join(dtab, Seq("m", "code"))
        .groupBy("vec_id")
        .agg(expr("aggregate(array_sort(collect_list(struct(m, pdist))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.pdist)").as("adc"),
          first(col("label")).as("label"))
        .filter(col("vec_id") =!= 0)
        .orderBy(col("adc").asc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), col("label"), dround(col("adc"), 6).as("adc_dist"))
    }),

    // TPC-H Q18 shape: orders whose lineitems sum past a quantity
    // threshold, enriched with the customer — HAVING-filtered agg joined
    // back to two dims, top-50 by price. The agg runs BEFORE the joins,
    // so the shuffle carries one row per big order, not per lineitem.
    "report_large_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey").agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 250)
      val o = t(s, d, "orders")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(t(s, d, "customer"), o("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          money(dec(col("o_totalprice"))).as("price"),
          money(col("qty")).as("total_qty"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(50)
    }),

    // TPC-H Q19 shape: join with a DISJUNCTION of brand/quantity/size
    // predicate triples — exercises OR-predicate pushdown through a
    // hashable equi-key (the p_partkey equality still hash-partitions;
    // the disjunction filters post-meet).
    "join_disjunctive_pred" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = broadcast(t(s, d, "part"))
      li.join(p, col("p_partkey") === col("l_partkey") &&
          ((col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
           (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
           (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15))))
        .agg(money(sum(dec(col("l_extendedprice")) *
          (lit(1) - rate(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q17 shape: correlated scalar aggregate — lineitems below
    // half their part's average quantity. Catalyst decorrelates the
    // subquery into an aggregate + equi-join (no per-row re-scan); the
    // oracle runs the IDENTICAL SQL.
    "sub_correlated_agg" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_q17")
      s.sql(q17Sql("lineitem_q17"))
    }),

    // Geo scalar pack (ride/payment-analytics flavor): haversine
    // distance and initial bearing between a customer coordinate and
    // its nation's reference point, both derived deterministically from
    // the keys. Pure per-row projection + one broadcast dim join.
    "fn_geo_pack" -> ((s, d) => {
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val lat1 = radians(((col("c_custkey") * 7) % 140) - 70 + lit(0.25))
      val lon1 = radians(((col("c_custkey") * 13) % 360) - 180 + lit(0.25))
      val lat2 = radians((col("n_nationkey") * 5) - 60)
      val lon2 = radians((col("n_nationkey") * 14) - 175)
      val dLat = lat2 - lat1
      val dLon = lon2 - lon1
      val a = pow(sin(dLat / 2), 2) + cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
      val distKm = lit(2 * 6371.0) * asin(sqrt(a))
      val bearing = degrees(atan2(
        sin(dLon) * cos(lat2),
        cos(lat1) * sin(lat2) - sin(lat1) * cos(lat2) * cos(dLon)))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"),
          dround(distKm, 2).as("dist_km"),
          dround(bearing, 2).as("bearing_deg"))
        .orderBy("c_custkey")
    }),

    // Daily top-N leaderboard: per-day purchase GMV per user, top 3 per
    // day through the custom TopKPerKey operator (bounded per-key heaps,
    // ≤ k rows per (day, partition) cross the exchange — the window
    // formulation sorts every day fully and shuffles every user-day
    // row). Rank assignment is a window over the ALREADY-REDUCED ≤3
    // rows/day, which the operator leaves hash-partitioned on dt, so
    // the window adds no exchange. Decimal GMV sums make the rank
    // deterministic; user_id breaks exact ties.
    "report_daily_topn" -> ((s, d) => {
      val daily = T.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("ts").cast(DateType).as("dt"), col("user_id"))
        .agg(sum(dec(col("value"))).as("gmv"))
      val w = Window.partitionBy("dt").orderBy(col("gmv").desc, col("user_id"))
      graft.Graft.topKPerKey(daily, Seq(col("dt")),
          Seq(col("gmv").desc, col("user_id")), 3)
        .withColumn("rank", row_number().over(w))
        .select(col("dt"), col("rank").cast(IntegerType).as("rank"),
          col("user_id"), money(col("gmv")).as("gmv"))
        .orderBy("dt", "rank")
    })
  )

  private def q17Sql(table: String): String =
    "SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly, " +
      "CAST(COUNT(*) AS BIGINT) AS n " +
      s"FROM $table l1 WHERE l_quantity < " +
      s"(SELECT 0.5 * AVG(l_quantity) FROM $table l2 WHERE l2.l_partkey = l1.l_partkey)"

  val oracleSql: Map[String, String] = Map(

    "text_contamination_check" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
        "c AS (SELECT * FROM toks WHERE doc_id % 97 <> 0), " +
        "b AS (SELECT * FROM toks WHERE doc_id % 97 = 0), " +
        "cg0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i FROM c WHERE len(t) >= 5), " +
        "cg AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g FROM cg0), " +
        "bg0 AS (SELECT t, unnest(generate_series(1, len(t)-4)) AS i FROM b WHERE len(t) >= 5), " +
        "bg AS (SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS g FROM bg0), " +
        "h AS (SELECT doc_id, COUNT(DISTINCT cg.g) AS nh FROM cg JOIN bg USING (g) GROUP BY doc_id) " +
        "SELECT c.doc_id, CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hits, " +
        "COALESCE(h.nh, 0) > 0 AS contaminated " +
        "FROM c LEFT JOIN h USING (doc_id) ORDER BY doc_id"),

    "text_dedup_incremental" ->
      ("WITH dh AS (SELECT doc_id, sha256(text) AS h FROM documents), " +
        "corpus AS (SELECT DISTINCT h FROM dh WHERE doc_id % 10 <> 7), " +
        "batch AS (SELECT * FROM dh WHERE doc_id % 10 = 7) " +
        "SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_in_batch " +
        "FROM batch WHERE h NOT IN (SELECT h FROM corpus) " +
        "GROUP BY h ORDER BY doc_id"),

    "text_repetition_filter" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 2), " +
        "ws AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok, " +
        "COUNT(DISTINCT w) AS n_distinct FROM " +
        "(SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id), " +
        "bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b FROM " +
        "(SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks)), " +
        "bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b), " +
        "bs AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS topf FROM bc GROUP BY doc_id) " +
        "SELECT ws.doc_id, " +
        "CAST(ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tok, 4) AS DOUBLE) AS dup_word_frac, " +
        "CAST(ROUND(topf, 4) AS DOUBLE) AS top_bigram_frac, " +
        "(1.0 - CAST(n_distinct AS DOUBLE) / n_tok) <= 0.65 AND topf <= 0.15 AS keep " +
        "FROM ws JOIN bs USING (doc_id) ORDER BY doc_id"),

    "text_pack_sequences" ->
      ("WITH d AS (SELECT doc_id, source, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
        "c AS (SELECT *, COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM d) " +
        "SELECT source, CAST(cum // 2048 AS BIGINT) AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_tok) AS BIGINT) AS tokens, MIN(doc_id) AS first_doc, " +
        "MAX(doc_id) AS last_doc " +
        "FROM c GROUP BY source, seq_id ORDER BY source, seq_id"),

    "sample_mix_epochs" ->
      ("WITH r AS (SELECT doc_id, lang, " +
        "CASE lang WHEN 'en' THEN 2.0 WHEN 'de' THEN 1.5 WHEN 'fr' THEN 1.0 " +
        "WHEN 'es' THEN 0.5 ELSE 0.25 END AS rate, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY lang) AS n FROM documents), " +
        "x AS (SELECT doc_id, lang, CAST(FLOOR(rate) + " +
        "CASE WHEN rn <= (rate - FLOOR(rate)) * n THEN 1 ELSE 0 END AS BIGINT) AS n_rep FROM r), " +
        "u AS (SELECT doc_id, lang, unnest(generate_series(1, n_rep)) AS e " +
        "FROM x WHERE n_rep >= 1) " +
        "SELECT doc_id, lang, CAST(e AS INT) AS epoch FROM u ORDER BY doc_id, epoch"),

    "vec_pq_codes" ->
      ("WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec " +
        "FROM embeddings WHERE vec_id < 8), " +
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings), " +
        "s AS (SELECT vec_id, ev, unnest(generate_series(0, 3)) AS m FROM e), " +
        "d AS (SELECT vec_id, m, cid, list_sum(list_transform(generate_series(1, 16), " +
        "i -> (ev[m*16 + i] - cvec[m*16 + i]) * (ev[m*16 + i] - cvec[m*16 + i]))) AS dist " +
        "FROM s, cents), " +
        "r AS (SELECT vec_id, m, cid, dist, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id, m ORDER BY dist, cid) AS rk FROM d) " +
        "SELECT vec_id, CAST(m AS INT) AS m, CAST(cid AS INT) AS code, " +
        "CAST(ROUND(dist, 4) AS DOUBLE) AS dist FROM r WHERE rk = 1 ORDER BY vec_id, m"),

    "vec_pq_adc_topk" ->
      ("WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec " +
        "FROM embeddings WHERE vec_id < 8), " +
        "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings), " +
        "s AS (SELECT vec_id, label, ev, unnest(generate_series(0, 3)) AS m FROM e), " +
        "d AS (SELECT vec_id, label, m, cid, list_sum(list_transform(generate_series(1, 16), " +
        "i -> (ev[m*16 + i] - cvec[m*16 + i]) * (ev[m*16 + i] - cvec[m*16 + i]))) AS dist " +
        "FROM s, cents), " +
        "codes AS (SELECT vec_id, m, cid AS code, label FROM (SELECT vec_id, label, m, cid, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rk FROM d) WHERE rk = 1), " +
        "p AS (SELECT ev AS pv FROM e WHERE vec_id = 0), " +
        "dtab AS (SELECT m, cid AS code, list_sum(list_transform(generate_series(1, 16), " +
        "i -> (pv[m*16 + i] - cvec[m*16 + i]) * (pv[m*16 + i] - cvec[m*16 + i]))) AS pdist " +
        "FROM (SELECT cid, cvec, pv, unnest(generate_series(0, 3)) AS m FROM cents, p)), " +
        "adc AS (SELECT vec_id, list_sum(list_transform(" +
        "list_sort(list({'m': m, 'pdist': pdist})), x -> x.pdist)) AS adc, " +
        "any_value(label) AS label " +
        "FROM codes JOIN dtab USING (m, code) GROUP BY vec_id) " +
        "SELECT vec_id, label, CAST(ROUND(adc, 6) AS DOUBLE) AS adc_dist " +
        "FROM adc WHERE vec_id <> 0 ORDER BY adc ASC, vec_id ASC LIMIT 10"),

    "report_large_orders" ->
      (s"WITH big AS (SELECT l_orderkey, SUM(${oDec("l_quantity")}) AS qty " +
        "FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) " +
        s"SELECT c_custkey, c_name, o_orderkey, ${oMoney(oDec("o_totalprice"))} AS price, " +
        s"${oMoney("qty")} AS total_qty " +
        "FROM orders JOIN big ON o_orderkey = l_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY price DESC, o_orderkey LIMIT 50"),

    "join_disjunctive_pred" ->
      (s"SELECT ${oMoney(s"SUM(${oDec("l_extendedprice")} * (1 - ${oRate("l_discount")}))")} AS revenue, " +
        "CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey AND " +
        "((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) OR " +
        "(p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR " +
        "(p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))"),

    "sub_correlated_agg" -> q17Sql("lineitem"),

    "fn_geo_pack" ->
      ("WITH x AS (SELECT c_custkey, n_name, " +
        "radians((c_custkey * 7) % 140 - 70 + 0.25) AS lat1, " +
        "radians((c_custkey * 13) % 360 - 180 + 0.25) AS lon1, " +
        "radians(n_nationkey * 5 - 60) AS lat2, " +
        "radians(n_nationkey * 14 - 175) AS lon2 " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey) " +
        "SELECT c_custkey, n_name, " +
        "CAST(ROUND(2 * 6371.0 * asin(sqrt(pow(sin((lat2-lat1)/2), 2) + " +
        "cos(lat1) * cos(lat2) * pow(sin((lon2-lon1)/2), 2))), 2) AS DOUBLE) AS dist_km, " +
        "CAST(ROUND(degrees(atan2(sin(lon2-lon1) * cos(lat2), " +
        "cos(lat1) * sin(lat2) - sin(lat1) * cos(lat2) * cos(lon2-lon1))), 2) AS DOUBLE) AS bearing_deg " +
        "FROM x ORDER BY c_custkey"),

    "report_daily_topn" ->
      (s"WITH g AS (SELECT CAST(ts AS DATE) AS dt, user_id, SUM(${oDec("value")}) AS gmv " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "r AS (SELECT dt, user_id, gmv, ROW_NUMBER() OVER " +
        "(PARTITION BY dt ORDER BY gmv DESC, user_id) AS rank FROM g) " +
        s"SELECT dt, CAST(rank AS INT) AS rank, user_id, ${oMoney("gmv")} AS gmv " +
        "FROM r WHERE rank <= 3 ORDER BY dt, rank")
  )
}
