package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + determinism canon (SURVEY.md §7.2).
  *
  * Every t2 query must hash-match a DuckDB oracle on the same parquet, so:
  *  - money/double aggregates go through exact DECIMAL arithmetic and are
  *    finalized with round(_,4) cast to double (order-independent sums);
  *  - every result ends in a total ORDER BY over a unique key set;
  *  - event timestamps (ns- or µs-encoded parquet, µs in Spark) are
  *    truncated to second granularity (or epoch millis) before hashing.
  */
object T {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, path) cache of the resolved source relations — the
    * local stand-in for a metastore catalog's table cache. Every
    * `spark.read.parquet` builds a fresh InMemoryFileIndex (directory
    * listing) and re-reads the parquet footer for the schema; a catalog
    * table pays that once and serves the cached relation thereafter,
    * which is exactly the semantics here: the 10 source tables are
    * immutable for the life of a session (all sinks write under
    * target/, never into the sf dir, and those paths do NOT go through
    * this cache — a re-read after a write must re-list). Keyed by
    * session so tests with multiple sessions never share plans.
    *
    * LRU-bounded at 64 entries (round-11 review): entries pin their
    * SparkSession and resolved plans, so an UNBOUNDED map would leak a
    * session per cloned-session test for the JVM's lifetime. 64 covers
    * a bench run's working set (10 tables × a few sessions) with room;
    * past it the least-recently-used relation is dropped and costs one
    * ~100 ms re-list on its next access — an eviction policy, not a
    * correctness surface. Compute happens OUTSIDE the lock (the nested
    * events→t call pattern made ConcurrentHashMap.computeIfAbsent throw
    * "Recursive update" — see `events`); the benign double-compute race
    * keeps the first entry. */
  private val relCacheMax = 64
  private val relCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > relCacheMax
    }

  private def cachedRel(key: (SparkSession, String))(
      compute: => DataFrame): DataFrame = {
    val hit = relCache.synchronized(relCache.get(key))
    if (hit != null) hit
    else {
      val df = compute
      relCache.synchronized {
        val prev = relCache.get(key)
        if (prev != null) prev else { relCache.put(key, df); df }
      }
    }
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    cachedRel((spark, path))(spark.read.parquet(path))
  }

  /** `events.ts` has been regenerated across rounds under TWO physical
    * parquet encodings, and this loader must accept both (round-9 verdict:
    * a silent testdata regeneration from `timestamp[ns]` to `timestamp[us]`
    * took down 55 query keys because the old loader hard-assumed nanos):
    *
    *  - `timestamp[ns]`: Spark 4 refuses to read NANOS as a timestamp, so
    *    with `nanosAsLong` it surfaces as a `LongType` of epoch-nanos. We
    *    expose it as `ts_ns` (exact — matches DuckDB `epoch_ns`) and derive
    *    a µs-truncated `ts` via integer division (ns ≈ 1.7e18 > 2^53, so
    *    double math would be lossy).
    *  - `timestamp[us]`: a plain Spark timestamp (TIMESTAMP or, when the
    *    file is not UTC-adjusted, TIMESTAMP_NTZ — cast to TimestampType;
    *    session TZ is UTC so values are identical). `ts_ns` is derived as
    *    `unix_micros(ts) * 1000` so every ts_ns order-by/tiebreak usage and
    *    oracle stays valid (no oracle references sub-µs precision).
    *
    * Both branches yield the same columns in the same order:
    * (event_id, ts_ns LONG, user_id, event_type, value, props, ts TIMESTAMP).
    */
  /** Nests a t() lookup inside its own compute (the reason cachedRel
    * computes outside the lock — a compute-under-lock design deadlocks
    * or, with ConcurrentHashMap.computeIfAbsent, threw "Recursive
    * update" whenever the two keys shared a hash bin). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    cachedRel((spark, s"$sfDir#events-normalized"))(
      eventsUncached(spark, sfDir))

  private def eventsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
          .select("event_id", "ts_ns", "user_id", "event_type", "value",
            "props", "ts")
    }
  }

  // ---- determinism canon ------------------------------------------------
  // Widths are chosen so the hot money expression dec(x) * (1 - rate(d))
  // lands at DECIMAL(18,4) — within Spark's 18-digit long-backed Decimal
  // fast path (and DuckDB's INT64 decimal). The previous (18,2)/(5,2)
  // canon widened the product to (24,4), forcing BigDecimal arithmetic on
  // every row: ~25% slower on the Q1/Q3-shape aggregations. Values are
  // identical (both widths are exact); per-row money is bounded well
  // under (12,2)'s 1e10, and SUM results widen by +10 digits as before.
  /** Exact 2-dp money input (values verified exactly 2dp in testdata). */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rates (discount/tax) — exact 2dp in [0,1]. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Finalize a decimal aggregate to a hash-stable double. */
  def money(c: Column): Column = round(c, 4).cast(DoubleType)

  /** Round a genuine DOUBLE with DuckDB's exact semantics (DuckRound) —
    * the canon for every double that is rounded before an oracle hash
    * compare. Spark's `round(double, p)` rounds the exact decimal
    * expansion HALF_UP while DuckDB rounds the scaled double; when the
    * two sides feed identical doubles in (the suite's IEEE-identity
    * canon), identical rounding semantics make the compare exact at any
    * boundary. `money` stays Spark `round`: its input is DECIMAL, where
    * both engines already round the exact value identically. */
  def dround(c: Column, p: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(graft.expr.DuckRound(GraftSqlBridge.expression(c), p))
  }
  /** events.ts truncated to whole seconds — safe in both engines. */
  def tsSec(c: Column): Column = date_trunc("second", c)

  // Oracle-side (DuckDB) mirrors of the canon, for building oracleSql.
  def oDec(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def oRate(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def oMoney(e: String): String = s"CAST(ROUND($e, 4) AS DOUBLE)"
  def oTsSec(e: String): String = s"date_trunc('second', $e)"

  /** 16-bit Morton interleave of two long ordinals — the z-order key
    * the clustered layouts share (Round5Ops' spatial joins,
    * GraftTable.compactChain's OPTIMIZE ZORDER). One definition so the
    * bit-width can never drift between them. */
  def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Midnight-UTC epoch MICROS of an ISO date — the literal twin of the
    * `unix_micros(col cast TimestampType)` stats ordinal (UTC session),
    * shared by every band-bound builder. */
  def epochUs(date: String): Long =
    java.time.LocalDate.parse(date)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L

  /** Writer-private fixture dir under target/tmp, deleted up front so
    * every query key stays a pure function of its inputs — the ONE
    * staging-convention helper the table-fixture rounds share (it was
    * five verbatim private copies by round 18; a convention change must
    * land exactly here). */
  def freshDir(s: SparkSession, d: String, tag: String): String = {
    val dir = s"target/tmp/g${tag}_${new java.io.File(d).getName}"
    graft.sources.GraftTable.fsOf(s, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true) // pure-function reset
    dir
  }
}
