package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory,
  * §2.11 for post-contract additions) and §7 (build plan). One `queries`
  * entry per implemented operator; each t2=Y key has a DuckDB oracle in
  * `oracleSql` (SURVEY §0, [B:2]).
  *
  * 317 query keys (294 DuckDB-oracled; counts pinned by
  * EntryCountSpec so the doc cannot drift from the code) across: Relational
  * (scans/filters/joins/sorts/sets),
  * Aggregates (grouping/windows/UDAF/HLL sketches), Scalars (function
  * packs), SourcesSinks (partitioned parquet / jsonlines / csv / orc),
  * StreamingOps (event-time windows, sessions, dedup, stream-stream
  * joins), LlmOps + MinHashDedup + Multimodal + TextAnalysis (dedup
  * families, similarity search, language/quality/token/fingerprint
  * analysis, TF-IDF, ANN), MoreOps (percentiles, latest-by, CDC merge,
  * pivot/unpivot, subqueries, reports, funnel, sampling, profiling,
  * salted join), Round3Ops (sessionization, bucketed range join, SCD2,
  * mode, histogram, stats/regexp/lambda packs, bucketed co-located
  * join, partition-pruned scan, small-file compaction).
  */
object SparkEntry {
  /** Flagship query (SURVEY §5.2 t1): 5-way star join on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_multiway_star")(spark, "/root/testdata/sf0.001")

  /** The per-module query maps, exposed so EntryCountSpec can prove no
    * key name is defined twice — `++` silently keeps the LAST binding,
    * so a later round re-inventing an existing key would otherwise
    * eclipse the original without any count or test moving. */
  private[graft] def queryParts: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(ops.Relational.queries, ops.Aggregates.queries,
      ops.Scalars.queries, ops.SourcesSinks.queries,
      ops.StreamingOps.queries, ops.LlmOps.queries,
      ops.TextAnalysis.queries, ops.MoreOps.queries,
      ops.Round3Ops.queries, ops.Round4Ops.queries, ops.Round5Ops.queries,
      ops.Round6Ops.queries, ops.Round9Ops.queries, ops.Round9bOps.queries,
      ops.Round9cOps.queries, ops.Round10Ops.queries, ops.Round11Ops.queries,
      ops.Round12Ops.queries, ops.Round13Ops.queries, ops.Round14Ops.queries,
      ops.Round15Ops.queries, ops.Round16Ops.queries, ops.Round17Ops.queries,
      ops.Round18Ops.queries, ops.Round19Ops.queries,
      ops.Round20Ops.queries)

  private[graft] def oracleParts: Seq[Map[String, String]] =
    Seq(ops.Relational.oracles, ops.Aggregates.oracles,
      ops.Scalars.oracles, ops.SourcesSinks.oracles,
      ops.StreamingOps.oracles, ops.LlmOps.oracles,
      ops.TextAnalysis.oracles, ops.MoreOps.oracles,
      ops.Round3Ops.oracleSql, ops.Round4Ops.oracleSql, ops.Round5Ops.oracleSql,
      ops.Round6Ops.oracleSql, ops.Round9Ops.oracleSql, ops.Round9bOps.oracleSql,
      ops.Round9cOps.oracleSql, ops.Round10Ops.oracleSql, ops.Round11Ops.oracleSql,
      ops.Round12Ops.oracleSql, ops.Round13Ops.oracleSql,
      ops.Round14Ops.oracleSql, ops.Round15Ops.oracleSql,
      ops.Round16Ops.oracleSql, ops.Round17Ops.oracleSql,
      ops.Round18Ops.oracleSql, ops.Round19Ops.oracleSql,
      ops.Round20Ops.oracleSql)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryParts.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleParts.reduce(_ ++ _)
}
