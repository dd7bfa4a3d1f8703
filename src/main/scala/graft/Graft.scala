package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{CosineSimilarity, NGrams}

/** Engine-level registration + scale utilities. */
object Graft {

  /** Register the custom Catalyst expressions as SQL functions (usable in
    * expr()/spark.sql/LATERAL VIEW). Idempotent per session. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ngrams",
      exprs => NGrams(exprs.head, 3), "scala_udf")
  }

  /** Skew-mitigating equi-join (SURVEY §4.2 "salting for skew"): explode
    * the build side into `salt` replicas and scatter the probe side with
    * a random-free deterministic salt (hash of a unique column), so one
    * hot key spreads over `salt` reducers. Semantics = plain inner join.
    *
    * AQE's skew-join split handles sort-merge skew automatically; this is
    * the explicit fallback for aggregations/joins where AQE cannot split
    * (e.g. a single hot key on the build side of a shuffled hash join).
    */
  /** Small-file compaction (lake maintenance): rewrite a parquet
    * directory into `targetFiles` files. At 100 TB, per-partition
    * streaming ingest leaves thousands of KB-sized files per dt; reading
    * them back costs a task each — periodic compaction keeps scan task
    * counts proportional to data size, not ingest cadence. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFiles: Int): Unit =
    spark.read.parquet(inPath).repartition(targetFiles)
      .write.mode("overwrite").parquet(outPath)

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeUnique: String, salt: Int): DataFrame = {
    val p = probe.withColumn("_salt",
      pmod(xxhash64(col(probeUnique)), lit(salt)).cast("int"))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
