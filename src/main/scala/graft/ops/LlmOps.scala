package graft.ops

import graft.{Graft, IdVec, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.10 — LLM-data-pipeline operators (dedup, similarity
  * search, text analysis, UDF/UDTF surfaces).
  *
  * Scale posture (100 TB): exact dedup is a hash-groupBy (one shuffle on
  * the text hash, not the text); Jaccard candidate generation goes through
  * an inverted index (explode distinct tokens → equi-join on token) so the
  * join is key-partitioned rather than a cross product; cosine is computed
  * with higher-order functions (codegen-friendly, no UDF serialization);
  * the kNN self-join precomputes norms once. MinHash-LSH (approximate,
  * t2=N) replaces the exact pair join when the corpus no longer fits a
  * token self-join — see MinHashDedup.
  */
object LlmOps {
  import T._

  /** dot(a,b) over float arrays, widened to double BEFORE multiply so the
    * arithmetic matches DuckDB's list_cosine_similarity exactly. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))

  /** The packed-block kNN core behind vec_knn_join, parameterized so the
    * spec can drive it with a sparse id fixture (empty residue classes
    * mod B) — see the vec_knn_join entry's comment for the full design.
    * `emb` needs (vec_id, embedding); returns the global top-k pairs. */
  private[graft] def knnJoin(emb: DataFrame, B: Int, k: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val blocks = emb
      .select(pmod(col("vec_id"), lit(B)).cast("int").as("blk"),
        col("vec_id").as("id"), col("embedding"))
      .groupBy("blk")
      .agg(collect_list(struct(col("id"), col("embedding"))).as("vecs"))
    val tagged = blocks
      .select(col("blk"), explode(sequence(lit(0), lit(B - 1))).as("j"),
        col("vecs"))
      .select(least(col("blk"), col("j")).as("bi"),
        greatest(col("blk"), col("j")).as("bj"),
        (col("j") >= col("blk")).as("isA"), col("vecs"))
    val paired = tagged.groupBy("bi", "bj")
      .agg(first(when(col("isA"), col("vecs")), ignoreNulls = true).as("va"),
        first(when(!col("isA"), col("vecs")), ignoreNulls = true).as("vb"))
    val scored = paired
      .as[(Int, Int, Array[IdVec], Array[IdVec])]
      .flatMap { case (bi, bj, va, vb) =>
        // An empty residue class mod B (sparse/gappy vec_ids, or B >
        // distinct residues on a small table) yields a one-sided pair
        // row. Off-diagonal with either side absent → no cross pairs
        // exist, emit nothing (falling back to va would double-count
        // block i's internal pairs already scored by its diagonal).
        // The diagonal (k,k) arrives A-side only by construction —
        // score it against itself.
        if (bi == bj) Graft.blockTopK(bi, bj, va, va, k)
        else if (va == null || vb == null) Iterator.empty
        else Graft.blockTopK(bi, bj, va, vb, k)
      }
      .toDF("a_id", "b_id", "raw")
    scored.orderBy(col("raw").desc, col("a_id"), col("b_id"))
      .limit(k)
      .select(col("a_id"), col("b_id"), dround(col("raw"), 6).as("cos_sim"))
  }

  /** Exact all-pairs Jaccard over (doc_id, text). Inherently quadratic in
    * the candidate join, so it REFUSES inputs above `maxDocs` with a loud
    * error instead of silently truncating — a user pointing this at a real
    * corpus gets a refusal, not a runaway job. The scale path for a full
    * corpus is MinHashDedup (LSH banding); this is its bounded verifier.
    * The row count is a metadata-only action on a parquet source. */
  def jaccardPairs(docs: DataFrame, minJaccard: Double,
                   maxDocs: Long = 10000L): DataFrame = {
    val n = docs.count()
    require(n <= maxDocs,
      s"jaccardPairs is exact all-pairs (O(n^2) candidate join): got $n " +
        s"documents > maxDocs=$maxDocs. Slice the input explicitly, raise " +
        "maxDocs deliberately, or use the LSH path (MinHashDedup / " +
        "text_minhash_dedup) for a full corpus.")
    val toks = docs
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val sizes = toks.select(col("doc_id"), size(col("toks")).as("n"))
    val ex = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
    val inter = ex.as("a")
      .join(ex.as("b"), col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
      .withColumn("jac",
        col("inter") / (col("sa.n") + col("sb.n") - col("inter")))
      .filter(col("jac") >= minJaccard)
      .select(col("a_id"), col("b_id"), dround(col("jac"), 6).as("jac"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Group on sha2(text) so the shuffle carries a 64-char key, not the
    // full document; text is reduced to (hash, length) map-side — at
    // 100 TB the exchange moves ~100 B/row regardless of document size.
    "text_exact_dedup" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("h"),
          length(col("text")).as("ln0"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"),
          max(col("ln0")).as("ln"))
        .select("doc_id", "dup_cnt", "ln")
        .orderBy("doc_id")),

    // Exact Jaccard is the ground-truth fixture; it is inherently
    // quadratic on this 31-word-vocabulary corpus (~224M joined rows at
    // sf0.1), so the key runs jaccardPairs on an EXPLICIT 1000-doc slice
    // (the helper itself refuses oversized input — no silent bound). The
    // scale path for the full corpus is text_minhash_dedup (LSH banding).
    "text_jaccard_pairs" -> ((s, d) =>
      jaccardPairs(t(s, d, "documents").filter(col("doc_id") < 1000), 0.8)),

    // Uses the native codegen'd CosineSimilarity expression (graft.expr);
    // the zip_with/aggregate formulation in dot()/norm() is the pure
    // built-in fallback and computes identical doubles (ExprSpec asserts).
    "vec_cosine_topk" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      val e = t(s, d, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb")))
      e.filter(col("vec_id") =!= 0).crossJoin(probe)
        .select(col("vec_id"), col("label"),
          expr("graft_cosine(embedding, p_emb)").as("raw"))
        .orderBy(col("raw").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), dround(col("raw"), 6).as("cos_sim"))
    }),

    // Distributed exact all-pairs kNN: block-matrix triangle self-join,
    // PACKED and SHUFFLED in a single pass. Each vector hashes into one
    // of B blocks; each block folds into ONE packed row (collect_list of
    // (id, vec)). Block k then explodes to its B partner keys, tagged by
    // side — k is the A side of pairs (k, j≥k) and the B side of pairs
    // (i<k, k) — and one groupBy on the pair key reassembles each of the
    // B(B+1)/2 triangle pairs from its two tagged rows (the diagonal
    // pair (k,k) arrives A-side only; the kernel scores it against
    // itself). One scan, two exchanges, NO join — so the packed-block
    // aggregation is computed once, not once per join side. NOTHING is
    // broadcast and nothing lands on the driver: the pair exchange
    // carries each block ~B/2 times, which is the point — a broadcast of
    // the packed table would require every executor (and the driver) to
    // hold the ENTIRE dataset and dies at Spark's 8 GB broadcast cap
    // long before 100 TB. B needs no sizing job: the scan's metadata
    // size estimate bounds a block to task memory (64 MB), and the
    // context's parallelism sets the task-count floor (B(B+1)/2 ≥ 2·par)
    // — at 100 TB the memory bound dominates and B grows with the data;
    // past ~10^5 blocks exact all-pairs is the wrong tool and
    // vec_ivf_topk is the scale path.
    // Each block-pair row is scored in a flatMap kernel over primitive
    // float arrays with a bounded local top-k under the global output
    // order, so TakeOrdered over the locals equals the full enumeration's
    // top-k; the kernel's double arithmetic is the exact sequential fold
    // of expr/CosineSimilarity — results hash-match the naive-join oracle.
    "vec_knn_join" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
      val par = s.sparkContext.defaultParallelism
      val bMem = (bytes / (64L << 20)).toLong + 1
      val bPar = math.ceil((math.sqrt(16.0 * par + 1) - 1) / 2).toLong
      val B = math.max(2L, math.max(bMem, bPar)).toInt
      knnJoin(emb, B, 20)
    }),

    "text_lang_stats" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          dround(sum(col("n_chars")).cast(DoubleType) / count(lit(1)), 4)
            .cast(DoubleType).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")),

    "text_wordcount_topk" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    "udf_scalar_norm" -> ((s, d) => {
      val normText = udf((x: String) =>
        if (x == null) null else x.trim.toLowerCase.replaceAll("\\s+", " "))
      t(s, d, "documents")
        .select(col("doc_id"),
          normText(concat(lit("  "), upper(col("text")), lit("  "))).as("norm_text"))
        .orderBy("doc_id")
    }),

    // t2=N (approximate): MinHash-LSH dedup assignment (doc -> cluster
    // representative). ScalaTest asserts candidate recall vs exact pairs
    // and rep-consistency for exact duplicates. Rows-only check driver-side.
    "text_minhash_dedup" -> ((s, d) =>
      MinHashDedup.dedupAssign(t(s, d, "documents"))
        .select(col("doc_id"), col("rep"),
          (col("doc_id") =!= col("rep")).as("is_dup"))
        .orderBy("doc_id")),

    // t2=N: multimodal binary decode pipeline (stubbed codec, real
    // plumbing); no SQL-expressible oracle.
    "mm_decode_pipeline" -> ((s, d) =>
      Multimodal.decodePipeline(s, d).orderBy("doc_id")),

    // t2=N: resize + frame-sample stage over the same binary plumbing.
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSamplePipeline(s, d).orderBy("doc_id")),

    // Custom Generator expression through SQL LATERAL VIEW (the second
    // UDTF surface besides Dataset.flatMap below).
    "udtf_ngrams_expr" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
        .createOrReplaceTempView("docs_ng")
      s.sql("SELECT doc_id, g.pos, g.ngram FROM docs_ng " +
        "LATERAL VIEW graft_ngrams(tokens) g AS pos, ngram " +
        "ORDER BY doc_id, pos")
    }),

    // Generator/UDTF surface: one row per bigram via Dataset.flatMap.
    "udtf_generate" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
        .as[(Long, Seq[String])]
        .flatMap { case (id, toks) =>
          toks.iterator.sliding(2).withPartial(false).zipWithIndex.map {
            case (pair, i) => (id, i + 1, pair.mkString(" "))
          }
        }
        .toDF("doc_id", "pos", "bigram")
        .withColumn("pos", col("pos").cast(IntegerType))
        .orderBy("doc_id", "pos")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_exact_dedup" ->
      ("SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_cnt, " +
        "CAST(MAX(LENGTH(text)) AS INT) AS ln FROM documents GROUP BY sha256(text) ORDER BY doc_id"),
    "text_jaccard_pairs" ->
      ("WITH dt AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents WHERE doc_id < 1000), " +
        "ex AS (SELECT doc_id, unnest(toks) AS tok FROM dt), " +
        "sz AS (SELECT doc_id, len(toks) AS n FROM dt), " +
        "p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS inter " +
        "FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, round(inter / (sa.n + sb.n - inter), 6) AS jac " +
        "FROM p JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id " +
        "WHERE inter / (sa.n + sb.n - inter) >= 0.8 ORDER BY a_id, b_id"),
    // CAST(... AS DOUBLE[]) is load-bearing: list_cosine_similarity on
    // FLOAT[] computes in float32, which diverges from Spark's double math.
    "vec_cosine_topk" ->
      ("WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, label, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pe), 6) AS cos_sim " +
        "FROM embeddings e, p WHERE vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pe) DESC, vec_id LIMIT 10"),
    "vec_knn_join" ->
      ("SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, a_id, b_id LIMIT 20"),
    "text_lang_stats" ->
      ("SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_chars, " +
        "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "text_wordcount_topk" ->
      ("SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 20"),
    "udf_scalar_norm" ->
      ("SELECT doc_id, trim(regexp_replace(lower('  ' || upper(text) || '  '), " +
        "'\\s+', ' ', 'g')) AS norm_text FROM documents ORDER BY doc_id"),
    "udtf_ngrams_expr" ->
      ("WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents WHERE doc_id < 100), " +
        "n AS (SELECT doc_id, tokens, unnest(generate_series(1, len(tokens) - 2)) AS i FROM dt) " +
        "SELECT doc_id, CAST(i AS INT) AS pos, " +
        "tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2] AS ngram " +
        "FROM n ORDER BY doc_id, pos"),
    "udtf_generate" ->
      ("WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents WHERE doc_id < 200), " +
        "n AS (SELECT doc_id, tokens, unnest(generate_series(1, len(tokens) - 1)) AS i FROM dt) " +
        "SELECT doc_id, CAST(i AS INT) AS pos, tokens[i] || ' ' || tokens[i + 1] AS bigram " +
        "FROM n ORDER BY doc_id, pos")
  )
}
