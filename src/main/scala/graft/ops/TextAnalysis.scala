package graft.ops

import graft.T
import graft.T.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Builder-mandated text-analysis battery (beyond SURVEY §2.10's core):
  * n-gram language ID, quality scoring, token counting, document
  * fingerprinting, SimHash, and an IVF-bucketed ANN variant. All
  * deterministic; all but SimHash carry DuckDB oracles.
  *
  * Scale notes: language-ID trains its trigram profiles from the corpus
  * itself with two key-partitioned aggregations (no driver-side model);
  * IVF assigns vectors to a coarse quantizer once (linear scan of
  * k centroids — the ANN posture where the probe searches nprobe buckets
  * instead of the full corpus); SimHash folds 64 bit-counters in a single
  * map-side-combinable aggregation, one shuffle by doc_id.
  */
object TextAnalysis {
  import T._

  // Language ID samples a 120-char prefix (standard practice — the
  // signal saturates quickly and it bounds per-doc cost at any scale).
  private val trigramsExpr =
    "transform(sequence(1, greatest(length(substring(text, 1, 120)) - 2, 1)), " +
      "i -> substring(substring(text, 1, 120), i, 3))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Char-trigram language ID: score(doc, lang) = sum of per-lang
    // document frequencies of the doc's distinct trigrams; argmax wins.
    "text_langid_ngram" -> ((s, d) => {
      // The corpus lang domain is fixed; pivoting on it keeps the profile
      // one-row-per-trigram so scoring is a 1:1 broadcast join (no ×langs
      // row blowup, no window shuffle, no second join back to docs).
      val langs = Seq("de", "en", "es", "fr", "zh")
      val docs = t(s, d, "documents")
      // tg feeds both the profile build and the scoring join — persist so
      // the trigram explode runs once, not twice (A/B at sf0.1: 1.66 s
      // [1.52, 1.93] persisted vs 2.13 s [2.03, 2.20] recomputed — the
      // opposite call from report_basket_affinity, where the subtree is
      // cheap and ReusedExchange already shares it).
      val tg = docs.select(col("doc_id"), col("lang"),
          explode(array_distinct(expr(trigramsExpr))).as("tg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // per-lang document frequencies, one row per trigram — tiny
      val profile = tg.groupBy("tg").pivot("lang", langs).count()
      val scored = tg.join(broadcast(profile), "tg")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(coalesce(col(langs.head), lit(0L))).as(s"s_${langs.head}"),
          langs.tail.map(l => sum(coalesce(col(l), lit(0L))).as(s"s_$l")): _*)
      // argmax over the 5 score columns; reversed-index second field so a
      // score tie resolves to the alphabetically FIRST lang (the window's
      // `p_lang asc` tie-break). A 0-score lang can never win: each doc's
      // own lang scores ≥ its trigram count ≥ 1.
      val win = greatest(langs.zipWithIndex.map { case (l, i) =>
        struct(col(s"s_$l").as("score"),
          lit(langs.size - 1 - i).as("ri"))
      }: _*)
      scored
        .withColumn("pred_lang", element_at(
          array(langs.reverse.map(lit): _*), win.getField("ri") + 1))
        .select(col("doc_id"), col("pred_lang"), col("lang"),
          (col("pred_lang") === col("lang")).as("correct"),
          win.getField("score").as("score"))
        .orderBy("doc_id")
    }),

    "text_quality_score" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("tokens", split(col("text"), " "))
        // carry text through the narrow projection — joining documents
        // back to itself just to re-fetch text would be a second full
        // scan + shuffle at scale
        .select(
          col("doc_id"), col("text"),
          size(col("tokens")).as("n_tok"),
          size(expr("filter(tokens, x -> x IN ('the', 'a'))")).as("n_stop"))
        .select(
          col("doc_id"), col("n_tok"), col("n_stop"),
          dround(col("n_stop").cast(DoubleType) / col("n_tok"), 4).as("stop_ratio"),
          dround((length(col("text")) - (col("n_tok") - 1)).cast(DoubleType)
            / col("n_tok"), 4).as("avg_word_len"),
          dround((length(col("text")) -
            length(replace(col("text"), lit("a"), lit(""))))
            .cast(DoubleType) / length(col("text")), 4).as("a_ratio"))
        // quality combines the three ROUNDED 4dp ratios in exact decimal
        // (0.7 - 0.4·sr - 0.3·ar + least(0.03·awl, 0.3) — multiplication
        // only, no division). The terms have at most 6 decimal places, so
        // rounding AT scale 6 is exact (tie-free): double sums flip the
        // last ulp between engines, and a 4dp round hits real .00005 ties
        // where Spark (half-up) and the oracle (half-even) disagree —
        // both observed at sf0.1.
        .withColumn("quality",
          round(lit(BigDecimal("0.7")) -
            lit(BigDecimal("0.4")) * col("stop_ratio").cast(DecimalType(10, 4)) -
            lit(BigDecimal("0.3")) * col("a_ratio").cast(DecimalType(10, 4)) +
            least(lit(BigDecimal("0.03")) *
              col("avg_word_len").cast(DecimalType(10, 4)),
              lit(BigDecimal("0.3"))), 6).cast(DoubleType))
        .orderBy("doc_id")),

    "text_token_count" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
          .cast(IntegerType).as("re_tokens"),
        length(col("text")).as("n_char"),
        ceil(length(col("text")) / lit(4.0)).cast(IntegerType).as("est_bpe"))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, d) => {
      val fp = t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
          .as("fp_tokenset"))
      val w = Window.partitionBy("fp_exact")
      fp.withColumn("dup_group_size", count(lit(1)).over(w))
        .orderBy("doc_id")
    }),

    // IVF ANN: coarse quantizer = 8 seed centroids; each vector is
    // assigned to its nearest centroid; the probe searches only its
    // nprobe=2 nearest buckets instead of the full corpus.
    "vec_ivf_topk" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb")))
      // Nearest-centroid assignment as a map-side-combinable argmax agg
      // (same rewrite as vec_neardup_pairs): max_by on (c_cos, -cid)
      // reproduces the (c_cos DESC, cid ASC) window argmax without
      // shuffling the 8×-row crossJoin through a window sort. max_by on
      // the un-negated cosine keeps the window's (and the oracle's)
      // NULL/NaN ordering: a NULL score can never win, NaN sorts
      // greatest on both engines — negating the score (min_by) would
      // flip both edge cases.
      val assign = e.crossJoin(cents)
        .select(col("vec_id"), col("label"), col("embedding"), col("cid"),
          expr("graft_cosine(embedding, c_emb)").as("c_cos"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"),
            struct(col("c_cos"), (-col("cid")).as("nid"))).as("cid"),
          first(col("label")).as("label"),
          first(col("embedding")).as("embedding"))
        .select("vec_id", "label", "embedding", "cid")
        // both the probe (vec_id = 0) and the search side read assign —
        // unpersisted, the crossJoin+agg subtree runs twice
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probeBuckets = assign.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"))
        .crossJoin(cents)
        .select(col("cid"), col("p_emb"),
          expr("graft_cosine(p_emb, c_emb)").as("pc"))
        .orderBy(col("pc").desc, col("cid").asc).limit(2)
        .select("cid", "p_emb")
      assign.filter(col("vec_id") =!= 0)
        .join(broadcast(probeBuckets), "cid")
        .select(col("vec_id"), col("label"), col("cid"),
          expr("graft_cosine(embedding, p_emb)").as("raw"))
        .orderBy(col("raw").desc, col("vec_id")).limit(10)
        .select(col("vec_id"), col("label"), col("cid"),
          dround(col("raw"), 6).as("cos_sim"))
    }),

    // Embedding-cosine near-dup: pairs above a high cosine threshold,
    // candidates restricted to same-coarse-bucket (the IVF assignment) so
    // the pair join is an equi-join on cid, not a cross product. The
    // oracle mirrors the same bucketing, so results match exactly.
    "vec_neardup_pairs" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb")))
      // Nearest-centroid assignment as a map-side-combinable argmax agg:
      // max_by on (cos, -cid) reproduces the (cos DESC, cid ASC) argmax
      // without the 8×-row window shuffle, and keeps the window's (and
      // the oracle's) NULL/NaN ordering — a NULL score never wins, NaN
      // sorts greatest on both engines (negating the score would flip
      // both). Persisted because the self-join below reads it twice —
      // unpersisted, Spark recomputes the whole crossJoin+agg subtree
      // per side.
      val assign = e.crossJoin(cents)
        .select(col("vec_id"), col("embedding"), col("cid"),
          expr("graft_cosine(embedding, c_emb)").as("c_cos"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"),
            struct(col("c_cos"), (-col("cid")).as("nid"))).as("cid"),
          first(col("embedding")).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = assign.select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
      val b = assign.select(col("cid"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb"))
      a.join(b, Seq("cid")).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("cid"),
          expr("graft_cosine(a_emb, b_emb)").as("raw"))
        .filter(col("raw") >= 0.35)
        .select(col("a_id"), col("b_id"), col("cid"),
          dround(col("raw"), 6).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // n-gram (bigram-shingle) Jaccard: near-dup on word-order-sensitive
    // shingles rather than token sets; bounded slice (all-pairs fixture).
    "text_ngram_jaccard" -> ((s, d) => {
      val sh = t(s, d, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), array_distinct(
          expr("transform(sequence(1, greatest(size(toks) - 1, 1)), " +
            "i -> concat_ws(' ', toks[i-1], toks[i]))")).as("shs"))
      val sizes = sh.select(col("doc_id"), size(col("shs")).as("n"))
      val ex = sh.select(col("doc_id"), explode(col("shs")).as("sh"))
      ex.as("a").join(ex.as("b"), col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
        .withColumn("jac", col("inter") / (col("sa.n") + col("sb.n") - col("inter")))
        .filter(col("jac") >= 0.6)
        .select(col("a_id"), col("b_id"), dround(col("jac"), 6).as("jac"))
        .orderBy("a_id", "b_id")
    }),

    // t2=N: SimHash needs a shared 64-bit token hash, which the oracle
    // dialect lacks; asserted structurally in ScalaTest instead.
    "text_simhash" -> ((s, d) =>
      simhashDF(t(s, d, "documents")).orderBy("doc_id")),

    // t2=N: SimHash near-dup JOIN — the second bucketed near-dup family
    // (besides MinHash-LSH). The 64-bit simhash is banded into 4×16-bit
    // chunks; by pigeonhole any pair at Hamming distance ≤ 3 shares at
    // least one identical chunk, so the chunk equi-join is a COMPLETE
    // candidate generator for that radius — a key-partitioned shuffle,
    // never an all-pairs product. Verified candidates keep
    // bit_count(xor) ≤ 3. ScalaTest asserts recall vs the exact-dup
    // groups and agreement with token-set Jaccard on the bounded fixture.
    "text_simhash_neardup" -> ((s, d) => {
      // persisted: both sides of the band join read it — unpersisted,
      // the tokenize + 64-counter agg subtree runs twice
      val sh = simhashDF(t(s, d, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chunks = sh.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("ci"),
              expr(s"shiftright(simhash, ${16 * j}) & 65535").as("ck"))): _*))
            .as("c"))
        .select(col("doc_id"), col("simhash"), col("c.ci"), col("c.ck"))
      val a = chunks.select(col("ci"), col("ck"),
        col("doc_id").as("a_id"), col("simhash").as("sh_a"))
      val b = chunks.select(col("ci"), col("ck"),
        col("doc_id").as("b_id"), col("simhash").as("sh_b"))
      // hamming is a pure function of (sh_a, sh_b) — identical for every
      // chunk-duplicate of a pair — so the radius filter BEFORE the pair
      // dedup is semantics-preserving and shrinks the dedup shuffle from
      // all band-collision candidates to only the pairs at radius ≤ 3
      // (near-dup-light corpora: orders of magnitude fewer rows).
      a.join(b, Seq("ci", "ck")).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          expr("bit_count(sh_a ^ sh_b)").cast(IntegerType).as("hamming"))
        .filter(col("hamming") <= 3)
        .dropDuplicates("a_id", "b_id")
        .orderBy("a_id", "b_id")
    })
  )

  /** (doc_id, simhash): 64 signed bit-counters folded in ONE map-side-
    * combinable aggregation (single shuffle keyed by doc_id). */
  private def simhashDF(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j"))
    val folded = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    folded.select(col("doc_id"), simhash.as("simhash"))
  }

  private val oTrigrams =
    "list_distinct([substring(substring(text, 1, 120), CAST(i AS INT), 3) " +
      "FOR i IN generate_series(1, greatest(length(substring(text, 1, 120)) - 2, 1))])"

  val oracles: Map[String, String] = Map(
    "text_langid_ngram" ->
      (s"WITH tg AS (SELECT doc_id, lang, unnest($oTrigrams) AS tg FROM documents), " +
        "profile AS (SELECT lang AS p_lang, tg, CAST(COUNT(*) AS BIGINT) AS df FROM tg GROUP BY 1, 2), " +
        "scored AS (SELECT doc_id, p_lang, CAST(SUM(df) AS BIGINT) AS score " +
        "FROM (SELECT doc_id, tg FROM tg) t JOIN profile USING (tg) GROUP BY 1, 2), " +
        "best AS (SELECT doc_id, p_lang, score, ROW_NUMBER() OVER " +
        "(PARTITION BY doc_id ORDER BY score DESC, p_lang ASC) AS rn FROM scored) " +
        "SELECT b.doc_id, b.p_lang AS pred_lang, d.lang, (b.p_lang = d.lang) AS correct, b.score " +
        "FROM best b JOIN documents d ON b.doc_id = d.doc_id WHERE rn = 1 ORDER BY b.doc_id"),
    "text_quality_score" ->
      ("WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents), " +
        "m AS (SELECT doc_id, CAST(len(tokens) AS INT) AS n_tok, " +
        "CAST(len(list_filter(tokens, x -> x IN ('the', 'a'))) AS INT) AS n_stop, " +
        "round(CAST(len(list_filter(tokens, x -> x IN ('the', 'a'))) AS DOUBLE) / len(tokens), 4) AS stop_ratio, " +
        "round(CAST(length(text) - (len(tokens) - 1) AS DOUBLE) / len(tokens), 4) AS avg_word_len, " +
        "round(CAST(length(text) - length(replace(text, 'a', '')) AS DOUBLE) / length(text), 4) AS a_ratio " +
        "FROM q) " +
        "SELECT *, CAST(round(CAST(0.7 AS DECIMAL(4,1)) " +
        "- CAST(0.4 AS DECIMAL(4,1)) * CAST(stop_ratio AS DECIMAL(10,4)) " +
        "- CAST(0.3 AS DECIMAL(4,1)) * CAST(a_ratio AS DECIMAL(10,4)) " +
        "+ least(CAST(0.03 AS DECIMAL(5,2)) * CAST(avg_word_len AS DECIMAL(10,4)), " +
        "CAST(0.3 AS DECIMAL(5,2))), 6) AS DOUBLE) AS quality FROM m ORDER BY doc_id"),
    "text_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens, " +
        "CAST(length(text) AS INT) AS n_char, " +
        "CAST(ceil(length(text) / 4.0) AS INT) AS est_bpe " +
        "FROM documents ORDER BY doc_id"),
    "text_fingerprint" ->
      ("WITH fp AS (SELECT doc_id, md5(text) AS fp_exact, " +
        "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_tokenset " +
        "FROM documents) " +
        "SELECT doc_id, fp_exact, fp_tokenset, " +
        "CAST(COUNT(*) OVER (PARTITION BY fp_exact) AS BIGINT) AS dup_group_size " +
        "FROM fp ORDER BY doc_id"),
    "vec_neardup_pairs" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "cents AS (SELECT vec_id AS cid, emb AS c_emb FROM e WHERE vec_id < 8), " +
        "assign AS (SELECT vec_id, emb, cid FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_cosine_similarity(e.emb, c.c_emb) DESC, c.cid ASC) AS rn FROM e, cents c) WHERE rn = 1) " +
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cid, " +
        "round(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim " +
        "FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35 ORDER BY a_id, b_id"),
    "text_ngram_jaccard" ->
      ("WITH dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 500), " +
        "sh AS (SELECT doc_id, list_distinct([concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT) + 1]) " +
        "FOR i IN generate_series(1, greatest(len(toks) - 1, 1))]) AS shs FROM dt), " +
        "sz AS (SELECT doc_id, len(shs) AS n FROM sh), " +
        "ex AS (SELECT doc_id, unnest(shs) AS s FROM sh), " +
        "p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS inter " +
        "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, round(inter / (sa.n + sb.n - inter), 6) AS jac " +
        "FROM p JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id " +
        "WHERE inter / (sa.n + sb.n - inter) >= 0.6 ORDER BY a_id, b_id"),
    "vec_ivf_topk" ->
      ("WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "cents AS (SELECT vec_id AS cid, emb AS c_emb FROM e WHERE vec_id < 8), " +
        "assign AS (SELECT vec_id, label, emb, cid FROM (" +
        "SELECT e.vec_id, e.label, e.emb, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_cosine_similarity(e.emb, c.c_emb) DESC, c.cid ASC) AS rn FROM e, cents c) WHERE rn = 1), " +
        "probe AS (SELECT emb AS p_emb FROM assign WHERE vec_id = 0), " +
        "pb AS (SELECT c.cid, p.p_emb FROM cents c, probe p " +
        "ORDER BY list_cosine_similarity(p.p_emb, c.c_emb) DESC, c.cid ASC LIMIT 2) " +
        "SELECT a.vec_id, a.label, a.cid, round(list_cosine_similarity(a.emb, pb.p_emb), 6) AS cos_sim " +
        "FROM assign a JOIN pb ON a.cid = pb.cid WHERE a.vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(a.emb, pb.p_emb) DESC, a.vec_id LIMIT 10")
  )
}
