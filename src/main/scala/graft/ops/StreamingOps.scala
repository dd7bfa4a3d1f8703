package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY.md §2.9 — event-time semantics over `events`.
  *
  * The t2 queries run the SAME logical plans in batch mode (the harness
  * oracle only runs batch SQL); `MemoryStream` ScalaTests prove the
  * incremental execution path (watermarks, late data, state) on identical
  * plans — Structured Streaming shares the analyzer/optimizer with batch,
  * so batch parity is the correctness anchor (SURVEY §3.2 E3).
  *
  * Session/sliding boundaries are compared in epoch-µs: Spark truncates
  * the parquet ns timestamps to µs, DuckDB keeps ns, so any raw-ts
  * comparison would drift (SURVEY §7.2 item 3).
  */
object StreamingOps {
  import T._

  /** Shared plan: tumbling 1h window — used by the t2 batch query and the
    * MemoryStream test (with watermark) alike. */
  /** Latest-per-user reduction shared by the foreachBatch upsert sink.
    * `max_by` over the (ts, event_id) TOTAL order (event_id is unique —
    * pinned by SchemaCanarySpec) is associative and commutative, so the
    * merged table is the same fixpoint whatever the chunking/replay
    * order, and re-applying an already-applied batch is a no-op — the
    * idempotence that makes an at-least-once foreachBatch sink behave
    * exactly-once at the table level. */
  def latestPerUser(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.ts").as("ts"),
        col("r.event_id").as("event_id"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))

  /** One upsert step: merge a micro-batch into the keyed parquet serving
    * table at `dir` (read current → union → latest-per-user → write to a
    * staging dir → two renames). Guarantee boundary, stated precisely:
    * readers never see a HALF-WRITTEN table (only fully-written dirs are
    * ever at `dir`), and no committed data is ever lost (the previous
    * table is renamed ASIDE, not deleted, before the new one renames in
    * — a crash between the renames leaves `dir`.old and/or `dir`.next
    * fully intact for recovery). What two plain renames cannot give is
    * atomic visibility: a reader racing the swap can observe a brief
    * missing-path window. Serving at scale closes that with a
    * manifest-resolved read path — the exact construction
    * Round10Ops.incrementalDailyLoad demonstrates — or dynamic partition
    * overwrite so only touched key-ranges rewrite. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(dir)
    val upd = latestPerUser(
      batch.select("user_id", "ts", "event_id", "event_type", "value"))
    val merged =
      if (fs.exists(cur)) latestPerUser(spark.read.parquet(dir).unionByName(upd))
      else upd
    val next = new Path(dir + ".next")
    val old = new Path(dir + ".old")
    merged.write.mode("overwrite").parquet(next.toString)
    fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(next, cur)
    fs.delete(old, true)
  }

  /** Streaming entry: foreachBatch(upsertBatch) — the standard pattern
    * for maintaining a queryable serving table from a stream when the
    * sink has no native MERGE. Caller starts/stops the returned writer. */
  def upsertStreamWriter(spark: SparkSession, stream: DataFrame,
      dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => upsertBatch(spark, batch.toDF(), dir)
    stream.writeStream.foreachBatch(fn)
  }

  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), money(sum(dec(col("value")))).as("sum_val"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_val"))

  /** Watermarked variant for true streaming (t2=N, ScalaTest). */
  def tumblingStream(events: DataFrame): DataFrame =
    tumblingAgg(events.withWatermark("ts", "10 minutes"))

  /** Watermarked session windows for true streaming (t2=N, ScalaTest):
    * out-of-order events within the watermark must MERGE adjacent
    * sessions before the window finalizes. */
  def sessionStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
        col("cnt"), col("sum_val"))

  /** Arbitrary stateful op (t2=N, ScalaTest): running per-user count and
    * value sum across micro-batches via mapGroupsWithState. */
  def statefulRunningCount(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], st: GroupState[(Long, Double)]) =>
          val (c0, s0) = st.getOption.getOrElse((0L, 0.0))
          var c = c0; var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          st.update((c, s))
          (user, c, s)
      }
      .toDF("user_id", "cnt", "sum_val")
  }

  /** transformWithState twin of statefulRunningCount (t2=N, ScalaTest):
    * SURVEY §2.9 names Spark 4's arbitrary-state surface explicitly —
    * typed named state handles (ValueState/ListState/MapState), TTL and
    * timers, RocksDB-backed. Same semantics as the mapGroupsWithState
    * version, so the golden test asserts identical cross-batch state. */
  def statefulRunningCountTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "cnt", "sum_val")
  }

  /** Custom-state sessionizer (t2=N, ScalaTest): flatMapGroupsWithState
    * with an EVENT-TIME timeout — sessions close (and emit their span +
    * event count) only when the watermark passes last-event + gap, so
    * out-of-order events inside the gap still extend the open session.
    * This is the surface for session semantics richer than
    * `session_window` (e.g. per-session custom accumulators). */
  def sessionizeState(spark: SparkSession, events: DataFrame,
                      gapSec: Long = 1800): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      // keep `ts` itself (a projection that casts it away would drop the
      // watermark attribute the event-time timeout validates against)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         st: GroupState[(Long, Long, Int)]) =>
          if (st.hasTimedOut) {
            val (start, last, n) = st.get
            st.remove()
            Iterator((user, n, last - start))
          } else {
            val times = rows.map(_._2.getTime / 1000).toSeq
            val (start, last, n) =
              st.getOption.getOrElse((times.min, times.max, 0))
            val ns = (math.min(start, times.min),
              math.max(last, times.max), n + times.size)
            st.update(ns)
            st.setTimeoutTimestamp((ns._2 + gapSec) * 1000)
            Iterator.empty
          }
      }
      .toDF("user_id", "n_events", "dur_sec")
  }

  /** Watermarked stream-stream interval self-join (t2=N, ScalaTest):
    * clicks ⋈ purchases of the same user where the purchase lands within
    * 1 h after the click. Both sides carry watermarks and the join
    * condition bounds event time in both directions, so Spark can expire
    * join state — the unbounded-state stream join is rejected by the
    * planner, this shape is the scalable one. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_val"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"),
        col("p_val"))
  }

  /** LEFT OUTER watermarked stream-stream interval join — the harder,
    * commonly-needed semantics: every click emits, converted or not
    * (funnel/attribution feeds need the unconverted rows). Matched pairs
    * emit as they join; an UNMATCHED click can only emit once the
    * watermark proves no qualifying purchase can still arrive (past
    * c_ts + 1 h + the purchase-side delay), at which point Spark emits
    * it null-padded and drops its state — so state stays bounded by the
    * interval + watermark horizon exactly as in the inner join, and the
    * null-padded rows are late by one watermark advance, never wrong.
    * The click event_id rides along: (user, click) keys the output
    * grain, and downstream dedup/attribution joins on it. */
  def clickPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_eid"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_val"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("c_eid"), col("c_ts"),
        col("p_ts"), col("p_val"))
  }

  /** Streaming ingest-time dedup (golden-tested only — the
    * `stream_dedup_incremental` MemoryStream test; no query key, because
    * dropDuplicatesWithinWatermark is streaming-only and cannot run
    * under batch Verify): documents arrive in micro-batches and are dropped if
    * (a) their content hash already exists in the historical corpus, or
    * (b) a duplicate arrived earlier in the stream within the watermark
    * horizon — the ingest-time shape of a training-data pipeline, and
    * the streaming twin of the batch `text_dedup_incremental` anti-join.
    *
    * History is probed through a broadcast Bloom sketch built ONCE from
    * the corpus hashes (the text_bloom_decontaminate artifact — ~KBs,
    * deterministic treeAggregate build): per batch there is NO join and
    * NO shuffle of the historical side, which is the only workable
    * posture when the corpus is 100 TB and the stream is an ingest
    * firehose. Bloom guarantees zero false NEGATIVES — no historical
    * duplicate ever passes; at fpp=1e-4 roughly 1 in 10⁴ genuinely-new
    * docs is sacrificed (dropped as a presumed dup), the standard
    * ingest-dedup trade (an exact rescue pass, if required, is the batch
    * anti-join replayed over the day's accepted docs). Within-stream
    * duplicates are handled by dropDuplicatesWithinWatermark on the
    * content hash — state is bounded by the watermark horizon instead of
    * growing with the stream. */
  def incrementalDedupStream(spark: SparkSession, corpus: DataFrame,
      stream: DataFrame): DataFrame = {
    val ch = corpus.select(sha2(col("text"), 256).as("h"))
    // counted Bloom capacity (text_bloom_decontaminate precedent): a
    // hardcoded capacity would silently saturate at a larger corpus and
    // void the fpp contract
    val nHist = math.max(ch.count(), 1000L)
    val bf = ch.stat.bloomFilter("h", nHist, 1e-4)
    val bfB = spark.sparkContext.broadcast(bf)
    val inHistory = udf((h: String) => h != null && bfB.value.mightContain(h))
    stream
      .withColumn("h", sha2(col("text"), 256))
      .withWatermark("ts", "10 minutes")
      .filter(!inHistory(col("h")))
      .dropDuplicatesWithinWatermark("h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_1h" -> ((s, d) =>
      tumblingAgg(T.events(s, d)).orderBy("ws", "event_type")),

    "stream_sliding_1h_15m" -> ((s, d) =>
      T.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), money(sum(dec(col("value")))).as("sum_val"))
        .select(col("w.start").as("ws"), col("cnt"), col("sum_val"))
        .orderBy("ws")),

    "stream_session_30m" -> ((s, d) =>
      T.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), money(sum(dec(col("value")))).as("sum_val"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("cnt"), col("sum_val"))
        .orderBy("user_id", "start_us")),

    "stream_dedup_exact" -> ((s, d) =>
      T.events(s, d)
        .dropDuplicates("user_id", "event_id")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id", "event_id")),

    // Batch run of the watermarked stream-stream interval join (the
    // MemoryStream golden test drives the same plan incrementally;
    // withWatermark is a no-op in batch, so the oracle checks the join
    // semantics the stream executes). Timestamps exported as epoch-µs —
    // the engines' shared grain (SURVEY §7.2 item 3).
    "stream_interval_join" -> ((s, d) =>
      clickPurchaseJoin(T.events(s, d))
        .select(col("user_id"), unix_micros(col("c_ts")).as("c_us"),
          unix_micros(col("p_ts")).as("p_us"), col("p_val"))
        .orderBy("user_id", "c_us", "p_us", "p_val")),

    // Batch run of the LEFT OUTER watermarked interval join (the
    // MemoryStream golden test drives the same plan incrementally and
    // pins WHEN the null-padded rows may emit; batch checks WHAT they
    // are). The click event_id makes the sort key total even when one
    // user clicks twice in the same microsecond.
    "stream_outer_interval_join" -> ((s, d) =>
      clickPurchaseLeftJoin(T.events(s, d))
        .select(col("user_id"), col("c_eid"),
          unix_micros(col("c_ts")).as("c_us"),
          unix_micros(col("p_ts")).as("p_us"), col("p_val"))
        .orderBy(col("user_id"), col("c_eid"), col("c_us"),
          col("p_us").asc_nulls_first, col("p_val").asc_nulls_first))
  )

  private val sumVal = s"${oMoney(s"SUM(${oDec("value")})")} AS sum_val"

  /** Per-user running (count, sum) with an explicit named ValueState —
    * the StatefulProcessor behind statefulRunningCountTws. */
  class RunningCountProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("agg",
        org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      val (c0, s0) = if (st.exists()) st.get() else (0L, 0.0)
      var c = c0; var s = s0
      rows.foreach { r => c += 1; s += r._2 }
      st.update((c, s))
      Iterator.single((user, c, s))
    }
  }

  /** transformWithState sessionizer with EVENT-TIME TIMERS (t2=N,
    * ScalaTest): the timer-based twin of `sessionizeState` — each input
    * re-arms a timer at last-event + gap; when the watermark passes it,
    * `handleExpiredTimer` emits the closed session and clears state.
    * Timers are the transformWithState replacement for
    * GroupStateTimeout: explicit, multiple per key, and decoupled from
    * input arrival. Golden test asserts the same session as the
    * flatMapGroupsWithState version. */
  def sessionizeTws(spark: SparkSession, events: DataFrame,
                    gapSec: Long = 1800): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapSec),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
      .toDF("user_id", "n_events", "dur_sec")
  }

  /** Per-user session state closed by an event-time timer — the
    * StatefulProcessor behind sessionizeTws. */
  class SessionTimerProcessor(gapSec: Long) extends org.apache.spark.sql
      .streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), (Long, Int, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Int)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Int)]("session",
        org.apache.spark.sql.Encoders.product[(Long, Long, Int)], TTLConfig.NONE)
    override def handleInputRows(user: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[(Long, Int, Long)] = {
      val times = rows.map(_._2.getTime / 1000).toSeq
      val prev = if (st.exists()) Some(st.get()) else None
      prev.foreach { case (_, last, _) =>
        getHandle.deleteTimer((last + gapSec) * 1000)
      }
      val (start0, last0, n0) =
        prev.getOrElse((times.min, times.max, 0))
      val ns = (math.min(start0, times.min),
        math.max(last0, times.max), n0 + times.size)
      st.update(ns)
      getHandle.registerTimer((ns._2 + gapSec) * 1000)
      Iterator.empty
    }
    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Int, Long)] = {
      val (start, last, n) = st.get()
      st.clear()
      Iterator.single((user, n, last - start))
    }
  }

  val oracles: Map[String, String] = Map(
    "stream_tumbling_1h" ->
      (s"SELECT date_trunc('hour', ts) AS ws, event_type, CAST(COUNT(*) AS BIGINT) AS cnt, $sumVal " +
        "FROM events GROUP BY 1, 2 ORDER BY ws, event_type"),
    // Each event belongs to 4 sliding windows: starts time_bucket15(ts)-i*15m.
    "stream_sliding_1h_15m" ->
      ("WITH x AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) " +
        "- i * INTERVAL '15 minutes' AS ws, value " +
        "FROM events, unnest(generate_series(0, 3)) AS t(i)) " +
        s"SELECT ws, CAST(COUNT(*) AS BIGINT) AS cnt, $sumVal FROM x GROUP BY ws ORDER BY ws"),
    // Gaps-and-islands in epoch-µs; new session when gap >= 30 min
    // (Spark session_window intervals are [start, last+gap)).
    "stream_session_30m" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events), " +
        "f AS (SELECT *, CASE WHEN us - LAG(us) OVER w >= 1800000000 OR LAG(us) OVER w IS NULL " +
        "THEN 1 ELSE 0 END AS brk FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)), " +
        "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f) " +
        "SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us, " +
        s"CAST(COUNT(*) AS BIGINT) AS cnt, $sumVal " +
        "FROM g GROUP BY user_id, sess ORDER BY user_id, start_us"),
    "stream_dedup_exact" ->
      ("SELECT DISTINCT user_id, event_id, event_type, value FROM events " +
        "ORDER BY user_id, event_id"),
    "stream_interval_join" ->
      ("SELECT c.user_id AS user_id, epoch_us(c.ts) AS c_us, " +
        "epoch_us(p.ts) AS p_us, p.value AS p_val " +
        "FROM events c JOIN events p ON c.user_id = p.user_id " +
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR " +
        "WHERE c.event_type = 'click' AND p.event_type = 'purchase' " +
        "ORDER BY user_id, c_us, p_us, p_val"),
    // The purchase filter must live in the RIGHT-side derived table, not
    // a WHERE over the join — a post-join WHERE would drop the
    // null-padded rows the outer join exists to keep. NULLS FIRST
    // matches Spark's ascending default.
    "stream_outer_interval_join" ->
      ("SELECT c.user_id AS user_id, c.event_id AS c_eid, epoch_us(c.ts) AS c_us, " +
        "epoch_us(p.ts) AS p_us, p.p_val AS p_val " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
        "LEFT JOIN (SELECT user_id, ts, value AS p_val FROM events " +
        "WHERE event_type = 'purchase') p ON c.user_id = p.user_id " +
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR " +
        "ORDER BY user_id, c_eid, c_us, p_us NULLS FIRST, p_val NULLS FIRST")
  )
}
