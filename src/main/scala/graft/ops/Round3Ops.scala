package graft.ops

import graft.T
import graft.T.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Typed-Dataset row for the lineitem pipeline (top-level so the
  * case-class Encoder derives). */
case class LineItemRow(l_orderkey: Long, l_quantity: Double,
                       l_extendedprice: Double, l_returnflag: String)

/** Round-3 operator additions: batch sessionization, the bucketed range
  * join (scale path for theta joins), TF-IDF keyword extraction, SCD2
  * run-compression, deterministic mode, an ORC source round trip, and a
  * width-bucket histogram.
  *
  * Determinism canon per SURVEY §7.2: event time as epoch-µs on both
  * engines, decimal sums for double aggregates, total ORDER BY, explicit
  * tie-breaks on every argmax/row_number.
  */
object Round3Ops {
  import T._

  private val sessionGapUs = 30L * 60 * 1000000 // 30 min in µs

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization in batch: a session break is >30 min of
    // user inactivity. lag → break flag → running sum = session id; all
    // three windows share one (user_id) shuffle + one sort, then the
    // per-session rollup reuses the same key partitioning. This is the
    // batch twin of stream_session_30m (session_window in streaming).
    "report_sessionize_batch" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("brk", when(col("prev_us").isNull ||
          col("us") - col("prev_us") > sessionGapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")
    }),

    // Range (theta) join |a.value − b.value| ≤ 0.25 as a bucketed
    // EQUI-join: bucket = floor(value/0.25); the right side fans out to
    // bucket−1/bucket/bucket+1 so every qualifying pair meets in exactly
    // one bucket (|Δvalue| ≤ W ⇒ |Δbucket| ≤ 1), then the exact predicate
    // filters. Shuffle is hash-on-(type,bucket) — no nested-loop, no
    // cross product; this is the 100-TB shape for bounded-distance theta
    // joins. The ORACLE runs the naive range join, so the hash-match
    // proves the bucketing loses no pair and duplicates none.
    "join_range_bucketed" -> ((s, d) => {
      val width = 0.25
      val ev = T.events(s, d).filter(col("value") <= 10)
        .select(col("event_id"), col("event_type"), col("value"),
          floor(col("value") / width).cast(LongType).as("b0"))
      val a = ev.select(col("event_type"), col("b0").as("b"),
        col("event_id").as("a_id"), col("value").as("a_val"))
      val bb = ev.select(col("event_type"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"),
        col("event_id").as("b_id"), col("value").as("b_val"))
      a.join(bb, Seq("event_type", "b"))
        .filter(abs(col("a_val") - col("b_val")) <= width &&
          col("a_id") < col("b_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          money(sum(abs(col("a_val") - col("b_val"))
            .cast(DecimalType(18, 4)))).as("sum_gap"))
        .orderBy("event_type")
    }),

    // TF-IDF top-3 terms per document. tf and df are grouped aggregates
    // (map-side combinable); N reaches the plan as a broadcast 1-row
    // crossJoin, never a driver collect. Ranking uses the 6-dp ROUNDED
    // score (then term ASC): the corpus vocabulary is small integers, so
    // mathematically-equal scores like 2·ln(10) vs ln(100) are computed
    // with different float error per engine — ranking on the raw double
    // would tie-break differently across engines.
    "text_tfidf_topterms" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          dround(col("tf") * log(col("n_docs") / col("df")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("rk"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // SCD type-2 from an event changelog: per user, collapse consecutive
    // runs of the same event_type, emit [valid_from, valid_to) intervals
    // with a version number and a current flag. lag-filter + lead share
    // one user_id shuffle; the run-compression filter happens before the
    // second window so the lead/row_number sort sees only run heads.
    "cdc_scd2" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val heads = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      heads
        .withColumn("valid_to", lead(col("us"), 1).over(w))
        .withColumn("version", row_number().over(w))
        .select(col("user_id"), col("event_type"),
          col("us").as("valid_from"), col("valid_to"), col("version"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "version")
    }),

    // Deterministic MODE per group: two-level aggregate (count per value,
    // then argmax via min_by on (−cnt, value)) — both levels map-side
    // combinable, and the (cnt DESC, value ASC) tie-break is explicit so
    // both engines resolve multi-modal groups identically. Built-in
    // mode() is tie-unspecified on BOTH engines — unusable under a
    // hash-match contract.
    "agg_mode" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy("l_returnflag")
        .agg(min_by(struct(col("l_quantity"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("l_quantity"))).as("m"))
        .select(col("l_returnflag"), col("m.l_quantity").as("mode_qty"),
          col("m.cnt").as("cnt"))
        .orderBy("l_returnflag")
    }),

    // ORC round trip: write a lineitem projection as ORC, read it back,
    // aggregate. Proves the second columnar format end-to-end (schema,
    // compression, pushdown); the oracle computes the same aggregate from
    // the original parquet, so the hash-match proves losslessness.
    "source_orc" -> ((s, d) => {
      val path = "target/tmp/orc_roundtrip"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("l_returnflag")
        .agg(money(sum(dec(col("l_quantity")))).as("sum_qty"),
          money(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Width-bucket histogram: fixed-width value buckets per event type —
    // single map-side-combinable aggregate, the standard distribution
    // profile for numeric columns at scale.
    "agg_histogram" -> ((s, d) =>
      T.events(s, d)
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket")),

    // Statistical moment pack: corr/covar/stddev/var are all single-pass
    // mergeable co-moment aggregates (two-phase in Spark). 6-dp rounding
    // absorbs the ~1e-12 cross-engine merge-order float drift.
    "agg_stats_pack" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(dround(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          dround(covar_samp(col("l_quantity"), col("l_extendedprice")), 6)
            .as("covar_qp"),
          dround(stddev_samp(col("l_quantity")), 6).as("sd_q"),
          dround(var_samp(col("l_quantity")), 6).as("var_q"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Regexp scalar pack: extract / replace-all / match over the docs
    // corpus — all codegen'd built-ins, no UDF.
    "fn_regexp_pack" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]{6,})", 1).as("first_long"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("novowel_len"),
        col("text").rlike("scan .* merge").as("has_scan_merge"))
        .orderBy("doc_id")),

    // NOT IN subquery with the three-valued-logic trap kept visible: the
    // planner rewrites both to semi/anti joins (the scalable form) — no
    // per-row re-execution of the subquery.
    "sub_in_notin" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("r3_cust")
      t(s, d, "orders").createOrReplaceTempView("r3_ord")
      s.sql("""
        SELECT c_custkey, c_mktsegment FROM r3_cust
        WHERE c_custkey IN (SELECT o_custkey FROM r3_ord WHERE o_orderstatus = 'F')
          AND c_custkey NOT IN (SELECT o_custkey FROM r3_ord WHERE o_orderstatus = 'O')
        ORDER BY c_custkey""")
    }),

    // Bucketed co-located join: both fact tables written bucketed on the
    // join key (bucketBy + sortBy + saveAsTable), so the join consumes
    // the tables' bucket partitioning directly — NO shuffle exchange on
    // either join input (plan-audited). At 100 TB this is the difference
    // between re-shuffling both facts per query and a one-time layout
    // cost amortized over every join on that key.
    "join_bucketed_colocated" -> ((s, d) => {
      // a previous JVM's warehouse dir orphans the managed-table
      // location (the in-memory catalog forgot the table but the files
      // remain) — drop both and clear the leftover dirs first
      Seq("g_orders_bucketed", "g_customer_bucketed").foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
        }
        if (loc.exists()) rm(loc)
      }
      t(s, d, "orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("g_orders_bucketed")
      t(s, d, "customer").write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("g_customer_bucketed")
      // merge hint: keep the broadcast planner from hiding the bucket
      // co-location this operator exists to demonstrate
      s.table("g_orders_bucketed").hint("merge")
        .join(s.table("g_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          money(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q13 flavor: how many customers placed k orders — LEFT OUTER
    // join so zero-order customers land in the k=0 bucket, then a
    // distribution over the per-customer counts (two key-partitioned
    // aggregations, no window).
    "report_order_counts" -> ((s, d) => {
      val c = t(s, d, "customer").select("c_custkey")
      val o = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Higher-order (lambda) array functions — filter/aggregate/exists/
    // forall/transform all run inside codegen, no UDF: the idiomatic way
    // to process array columns without exploding them through a shuffle.
    "fn_lambda_pack" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(expr("filter(toks, x -> length(x) > 4)")).as("n_long"),
          expr("aggregate(toks, 0, (acc, x) -> acc + length(x))")
            .as("total_len"),
          expr("exists(toks, x -> x = 'scan')").as("has_scan"),
          expr("forall(toks, x -> length(x) < 20)").as("all_short"),
          array_join(expr("transform(slice(toks, 1, 3), x -> upper(x))"),
            ",").as("first3_upper"))
        .orderBy("doc_id")),

    // Small-file compaction: the operational fix for the classic
    // many-tiny-files layout (here 64 shards of a 150k-row table) —
    // read, coalesce (no shuffle), rewrite. The oracle checks the
    // compacted copy is content-identical to the source; the ScalaTest
    // checks the file counts.
    "sink_compact_small_files" -> ((s, d) => {
      val frag = "target/tmp/compact_frag"
      val out = "target/tmp/compact_out"
      t(s, d, "orders").repartition(64).write.mode("overwrite").parquet(frag)
      s.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("o_orderstatus")
    }),

    // URL parsing pack: parse_url host/path/query-param extraction over
    // synthesized URLs (the corpus has no URL column; the construction
    // is deterministic from doc columns). The ORACLE mirrors the
    // semantics with regexps — DuckDB 1.0 has no parse_url — so the
    // hash-match pins Spark's parse_url behavior on these shapes.
    "fn_url_pack" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id"),
          lit("?lang="), col("lang"), lit("&v=2")))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("q_lang"))
        .orderBy("doc_id")),

    // Bitwise aggregates: bit_or/bit_and/bit_xor fold per group — e.g.
    // presence-mask rollups; map-side combinable single shuffle.
    "agg_bit_pack" -> ((s, d) =>
      T.events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("shiftleft(1L, cast(user_id % 16 as int))").as("mask"))
        .groupBy("event_type")
        .agg(bit_or(col("mask")).as("users_mask"),
          bit_and(col("mask")).as("common_mask"),
          bit_xor(col("mask")).as("parity_mask"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // first/last IGNORE NULLS over an ordered frame — the
    // carry-forward-last-observation window idiom (null-gap filling).
    "win_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
        .withColumn("last_purchase_value",
          last(col("pv"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("us"),
          col("last_purchase_value"))
        .orderBy("user_id", "us", "event_id")
    }),

    // Dynamic partition overwrite — the INSERT OVERWRITE ... PARTITION
    // idiom ETL pipelines rebuild a single day with: full write, then a
    // one-partition rewrite (values doubled) under
    // partitionOverwriteMode=dynamic. Only the touched date directory
    // may be replaced; the oracle computes the expected merged state, so
    // a static-mode wipe (all other days lost) hash-mismatches loudly.
    "sink_dynamic_overwrite" -> ((s, d) => {
      val path = "target/tmp/dyn_overwrite"
      val ev = T.events(s, d).withColumn("dt", col("ts").cast(DateType))
        .select("event_id", "event_type", "value", "dt")
      ev.repartition(col("dt"))
        .write.partitionBy("dt").mode("overwrite").parquet(path)
      // per-write option (not a session conf mutation): scoped to this
      // writer only, so concurrent writes on the session keep their mode
      ev.filter(col("dt") === "2024-01-05")
        .withColumn("value", col("value") * 2)
        .repartition(col("dt"))
        .write.partitionBy("dt").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
      s.read.parquet(path)
        .groupBy("dt")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("value")))).as("sum_val"))
        .orderBy("dt")
    }),

    // try_-family error handling: malformed casts and division by zero
    // yield NULL instead of an ANSI runtime error — the quarantine-style
    // ingestion path for dirty data.
    "fn_try_pack" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        expr("try_cast(substr(text, 1, 3) AS INT)").as("bad_int"),
        expr("try_cast(n_chars AS INT)").as("good_int"),
        expr("try_divide(n_chars, doc_id % 3)").as("maybe_div"),
        expr("try_cast(lang AS DATE)").as("bad_date"))
        .orderBy("doc_id")),

    // grouping_id over a cube: lets a consumer distinguish "NULL because
    // subtotal" from "NULL data" — required for correct cube post-
    // processing at any scale.
    "agg_grouping_id" -> ((s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping_id().cast(LongType).as("gid"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Timestamp/interval arithmetic pack on the order dates.
    "fn_interval_arith" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3d"),
        date_trunc("month", col("o_orderdate")).cast(DateType)
          .as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey")),

    // Correlated LATERAL subquery: per-customer top order via a lateral
    // derived table — the planner decorrelates it into a join, no
    // per-row re-execution.
    "sub_lateral_join" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("r3l_cust")
      t(s, d, "orders").createOrReplaceTempView("r3l_ord")
      s.sql("""
        SELECT c_custkey, c_mktsegment, t.max_price, t.n_orders
        FROM r3l_cust,
        LATERAL (SELECT MAX(o_totalprice) AS max_price,
                        COUNT(*) AS n_orders
                 FROM r3l_ord WHERE o_custkey = c_custkey) t
        WHERE t.n_orders > 0
        ORDER BY c_custkey""")
    }),

    // DAU / WAU: daily and weekly distinct actives — the staple activity
    // report; two independent distinct-aggregations, each one shuffle.
    "report_dau_wau" -> ((s, d) => {
      val ev = T.events(s, d)
        .select(col("user_id"), col("ts").cast(DateType).as("dt"))
      val dau = ev.groupBy("dt")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ev
        .select(date_trunc("week", col("dt")).cast(DateType).as("wk"),
          col("user_id"))
        .groupBy("wk").agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau,
          date_trunc("week", col("dt")).cast(DateType) === col("wk"))
        .select(col("dt"), col("dau"), col("wk"), col("wau"))
        .orderBy("dt")
    }),

    // One k-means iteration over the embeddings — the IVF index BUILD
    // step made explicit: nearest-centroid assignment (min_by argmin,
    // map-side combinable) then per-(centroid, dimension) mean.
    // posexplode keys the shuffle by (cid, dim); per-dimension sums go
    // through DECIMAL so the float adds are order-independent (the same
    // canon money uses — float32 inputs are exact in decimal(28,10)).
    "vec_centroid_recluster" -> ((s, d) => {
      graft.Graft.registerFunctions(s)
      val e = t(s, d, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb")))
      val assign = e.crossJoin(cents)
        .select(col("vec_id"), col("embedding"), col("cid"),
          expr("graft_cosine(embedding, c_emb)").as("c_cos"))
        .groupBy("vec_id")
        .agg(min_by(col("cid"),
            struct((-col("c_cos")).as("nc"), col("cid"))).as("cid"),
          first(col("embedding")).as("embedding"))
      assign
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg((sum(col("v").cast(DecimalType(28, 10))) /
            count(lit(1))).as("raw"),
          count(lit(1)).as("n_members"))
        .select(col("cid"), col("dim"),
          round(col("raw"), 6).cast(DoubleType).as("centroid_v"),
          col("n_members"))
        .orderBy("cid", "dim")
    }),

    // PMI collocations: pointwise mutual information of adjacent word
    // pairs vs their unigram probabilities — the corpus-statistics pass
    // that surfaces multi-word expressions. Three grouped counts + two
    // broadcast-sized joins; totals enter as 1-row crossJoins. PMI is
    // emitted ROUNDED (6 dp) and the output is keyed by the bigram
    // itself, so no cross-engine float ordering is involved.
    "text_pmi_bigrams" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = docs.select(split(col("text"), " ").as("w"))
      val uni = toks.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val t1 = uni.agg(sum(col("c1")).as("t1"))
      val big = toks
        .select(posexplode(col("w")).as(Seq("i", "a")), col("w"))
        .filter(col("i") < size(col("w")) - 1)
        .select(col("a"), element_at(col("w"), col("i") + 2).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c2"))
      val t2 = big.agg(sum(col("c2")).as("t2"))
      big.filter(col("c2") >= 5)
        .join(uni.select(col("tok").as("a"), col("c1").as("ca")), "a")
        .join(uni.select(col("tok").as("b"), col("c1").as("cb")), "b")
        .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
        .select(col("a"), col("b"), col("c2"),
          dround(log((col("c2") / col("t2")) /
            ((col("ca") / col("t1")) * (col("cb") / col("t1")))), 6)
            .as("pmi"))
        .orderBy("a", "b")
    }),

    // Two-stage report: daily GMV then a 7-day trailing moving average —
    // the rollup feeds a RANGE-framed window over day numbers, so gaps
    // in the calendar (none here) would still bound the frame by TIME
    // not by row count. Decimal sums keep the window math exact.
    "report_gmv_moving_avg" -> ((s, d) => {
      val daily = T.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("ts").cast(DateType).as("dt"))
        .agg(sum(dec(col("value"))).as("gmv_d"))
      val w = Window.orderBy(col("dayn")).rangeBetween(-6, 0)
      daily
        .withColumn("dayn", datediff(col("dt"), lit("2024-01-01").cast(DateType)))
        .withColumn("ma7_raw", avg(col("gmv_d")).over(w))
        .select(col("dt"), money(col("gmv_d")).as("gmv"),
          money(col("ma7_raw")).as("gmv_ma7"))
        .orderBy("dt")
    }),

    // Quality-filter pass — the training-data curation idiom: score every
    // doc on cheap per-row signals, keep survivors, report the reason
    // mix. One projection + one filter, no shuffle until the tiny rollup.
    "text_quality_filter" -> ((s, d) => {
      val scored = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
        .withColumn("uniq_ratio",
          dround(size(array_distinct(col("toks"))) /
            greatest(col("n_tok"), lit(1)).cast(DoubleType), 6))
        .withColumn("keep",
          col("n_tok") >= 5 && col("uniq_ratio") >= 0.5)
      scored.filter(col("keep"))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("uniq_ratio"))
        .orderBy("doc_id")
    }),

    // Typed Dataset[T] pipeline: case-class Encoder, lambda filter,
    // groupByKey + mapGroups — the type-safe API surface, oracle-checked
    // like any untyped query. Per-element BigDecimal(2dp) accumulation
    // mirrors the dec() canon so the group sums are exact. (mapGroups
    // skips partial aggregation — for production-scale aggregates use an
    // Aggregator like udaf_geomean; this key exists to pin the typed
    // surface itself.)
    "typed_dataset_pipeline" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_returnflag")
        .as[LineItemRow]
        .filter(_.l_quantity > 10)
        .groupByKey(_.l_returnflag)
        .mapGroups { (flag, rows) =>
          // accumulate exact 2dp money as Long cents — zero allocations
          // in the per-row loop. PRECONDITION: prices are POSITIVE 2dp
          // money (TPC-H extendedprice), where round-to-nearest-cent is
          // exact and math.round (half-up toward +∞) coincides with
          // BigDecimal HALF_UP (half away from zero); for negative
          // amounts or >2dp inputs the two rounding modes differ and
          // this shortcut would not be decimal-exact
          var n = 0L
          var cents = 0L
          rows.foreach { r =>
            n += 1
            cents += math.round(r.l_extendedprice * 100d)
          }
          (flag, n, (BigDecimal(cents) / 100).setScale(4).toDouble)
        }
        .toDF("l_returnflag", "n", "revenue")
        .orderBy("l_returnflag")
    }),

    // Multimodal ingest metadata, ORACLE-checked: the binary-column path
    // (payload bytes + typed meta struct) rolled up per source language.
    // The corpus is ASCII, so octet_length(payload) == length(text) and
    // DuckDB can verify the binary path end-to-end — upgrading the
    // multimodal family beyond rows-only evidence.
    "mm_metadata_stats" -> ((s, d) =>
      Multimodal.binaryTable(s, d)
        .select(col("meta.src_lang").as("src_lang"),
          length(col("payload")).as("blen"),
          col("meta.orig_len").as("olen"))
        .groupBy("src_lang")
        .agg(count(lit(1)).as("n"),
          sum(col("blen").cast(LongType)).as("total_bytes"),
          min(col("olen")).as("min_len"), max(col("olen")).as("max_len"))
        .orderBy("src_lang")),

    // sequence() generation + per-element transform, stringified (array
    // canon) — the row-local series generator.
    "fn_sequence_pack" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        array_join(transform(
          sequence(lit(1), (col("o_orderkey") % 5 + 1).cast(IntegerType)),
          x => x * x), ",").as("squares"),
        size(sequence(lit(1),
          (col("o_orderkey") % 5 + 1).cast(IntegerType))).as("n"))
        .orderBy("o_orderkey")),

    // Session-size distribution: the 30-min sessionization composed into
    // a histogram — how many sessions have k events.
    "report_session_histogram" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("brk", when(col("prev_us").isNull ||
          col("us") - col("prev_us") > sessionGapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("n_events")
    }),

    // Embedding L2-norm distribution per label — the vector-sanity pass
    // run before any similarity work. The norm folds left-to-right via
    // aggregate() (same sequential order DuckDB's list_sum uses, so the
    // doubles agree bit-for-bit); the per-group mean goes through
    // decimal on the 6-dp-rounded norms.
    "vec_norm_stats" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("norm", T.dround(sqrt(expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), " +
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")), 6))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"),
          money(sum(col("norm").cast(DecimalType(18, 8))) /
            count(lit(1))).as("avg_norm"))
        .orderBy("label")),

    // Null-safe equality join (<=>): NULL keys MATCH each other instead
    // of vanishing — the semantics a changelog join needs when "key
    // absent" is itself a join value. DuckDB mirror: IS NOT DISTINCT FROM.
    "join_null_safe" -> ((s, d) => {
      val e = T.events(s, d).select(col("event_id"),
        when(col("value") < 50, floor(col("value") / 10).cast(LongType))
          .as("k"))
      val dim = s.range(5).select(col("id").as("k"),
          concat(lit("band_"), col("id")).as("band"))
        .unionAll(s.range(1).select(lit(null).cast(LongType).as("k"),
          lit("band_null").as("band")))
      e.join(dim, e("k") <=> dim("k"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"))
        .orderBy("band")
    }),

    // Schema evolution: two parquet batches with different column sets
    // read through mergeSchema — the old batch's missing column surfaces
    // as NULL. The oracle computes the expected merged aggregate, so a
    // wrong union schema or dropped batch hash-mismatches.
    "source_schema_evolution" -> ((s, d) => {
      val p = "target/tmp/schema_evo"
      val ev = T.events(s, d)
      ev.select("event_id", "value")
        .write.mode("overwrite").parquet(s"$p/batch=1")
      ev.select("event_id", "value", "event_type")
        .write.mode("overwrite").parquet(s"$p/batch=2")
      s.read.option("mergeSchema", "true").parquet(p)
        .agg(count(lit(1)).as("n_rows"),
          count(col("event_type")).as("n_typed"),
          money(sum(dec(col("value")))).as("sum_val"))
    }),

    // Array set operations vs a probe vocabulary — union/intersect/
    // except/overlap, emitted sorted-and-joined (set semantics make the
    // native ordering engine-specific, and raw array columns crash the
    // driver's hasher — SURVEY §7.2 item 6).
    "fn_array_setops" -> ((s, d) => {
      val probe = array(lit("scan"), lit("merge"), lit("the"))
      t(s, d, "documents")
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .select(col("doc_id"),
          array_join(array_sort(array_union(col("toks"), probe)), ",")
            .as("u"),
          array_join(array_sort(array_intersect(col("toks"), probe)), ",")
            .as("i"),
          array_join(array_sort(array_except(col("toks"), probe)), ",")
            .as("e"),
          arrays_overlap(col("toks"), probe).as("o"))
        .orderBy("doc_id")
    }),

    // Boolean/conditional aggregates: count_if + universal/existential
    // quantifiers per group — single map-side-combinable pass.
    "agg_countif_pack" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count_if(col("l_discount") > 0.05).as("n_disc"),
          bool_or(col("l_quantity") > 45).as("any_bulk"),
          bool_and(col("l_extendedprice") > 0).as("all_paid"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Partition-pruned scan: write date-partitioned parquet, read back
    // with a partition predicate — the scan must touch only 3 of ~30
    // date directories (plan-audited: PartitionFilters non-empty). THE
    // core 100-TB pattern: time-partitioned facts + pruned reads.
    "scan_partition_prune" -> ((s, d) => {
      val path = "target/tmp/scan_partition_prune"
      T.events(s, d)
        .withColumn("dt", col("ts").cast(DateType))
        .repartition(col("dt"))
        .write.partitionBy("dt").mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("dt").between("2024-01-10", "2024-01-12"))
        .groupBy("dt", "event_type")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("value")))).as("sum_val"))
        .orderBy("dt", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "report_sessionize_batch" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
        "l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM ev), " +
        "n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM l), " +
        "sess AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM n) " +
        "SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "MIN(us) AS start_us, MAX(us) AS end_us, MAX(us) - MIN(us) AS dur_us " +
        "FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    "join_range_bucketed" ->
      ("WITH ev AS (SELECT event_id, event_type, value FROM events WHERE value <= 10) " +
        "SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        s"${oMoney("SUM(CAST(abs(a.value - b.value) AS DECIMAL(18,4)))")} AS sum_gap " +
        "FROM ev a JOIN ev b ON a.event_type = b.event_type " +
        "AND abs(a.value - b.value) <= 0.25 AND a.event_id < b.event_id " +
        "GROUP BY a.event_type ORDER BY a.event_type"),
    "text_tfidf_topterms" ->
      ("WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
        "tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tf GROUP BY 1, 2), " +
        "dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfc GROUP BY 1), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents), " +
        "scored AS (SELECT doc_id, term, round(tf * ln(n_docs / df), 6) AS tfidf " +
        "FROM tfc JOIN dfc USING (term) CROSS JOIN nn), " +
        "rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id " +
        "ORDER BY tfidf DESC, term ASC) AS INT) AS rk FROM scored) " +
        "SELECT doc_id, term, rk, tfidf FROM rk WHERE rk <= 3 ORDER BY doc_id, rk"),
    "cdc_scd2" ->
      ("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "l AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type FROM ev), " +
        "heads AS (SELECT * FROM l WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, event_type, us AS valid_from, " +
        "lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS version, " +
        "(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL) AS is_current " +
        "FROM heads ORDER BY user_id, version"),
    "agg_mode" ->
      ("WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM lineitem GROUP BY 1, 2), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag " +
        "ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c) " +
        "SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM r WHERE rn = 1 " +
        "ORDER BY l_returnflag"),
    "source_orc" ->
      (s"SELECT l_returnflag, ${oMoney(s"SUM(${oDec("l_quantity")})")} AS sum_qty, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS sum_price, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag " +
        "ORDER BY l_returnflag"),
    "agg_histogram" ->
      ("SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events " +
        "GROUP BY 1, 2 ORDER BY event_type, bucket"),
    "agg_stats_pack" ->
      ("SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp, " +
        "round(stddev_samp(l_quantity), 6) AS sd_q, " +
        "round(var_samp(l_quantity), 6) AS var_q, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "fn_regexp_pack" ->
      ("SELECT doc_id, regexp_extract(text, '([a-z]{6,})', 1) AS first_long, " +
        "CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS novowel_len, " +
        "regexp_matches(text, 'scan .* merge') AS has_scan_merge " +
        "FROM documents ORDER BY doc_id"),
    "sub_in_notin" ->
      ("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
        "AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') " +
        "ORDER BY c_custkey"),
    "join_bucketed_colocated" ->
      (s"SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "report_order_counts" ->
      ("WITH pc AS (SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count " +
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
        "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) " +
        "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM pc " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "fn_lambda_pack" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long, " +
        "CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS INT) AS total_len, " +
        "list_contains(toks, 'scan') AS has_scan, " +
        "list_bool_and(list_transform(toks, x -> length(x) < 20)) AS all_short, " +
        "array_to_string(list_transform(toks[1:3], x -> upper(x)), ',') AS first3_upper " +
        "FROM t ORDER BY doc_id"),
    "sink_compact_small_files" ->
      (s"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS total " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "fn_url_pack" ->
      ("WITH u AS (SELECT doc_id, 'https://' || source || '.example.com/docs/' || doc_id " +
        "|| '?lang=' || lang || '&v=2' AS url FROM documents) " +
        "SELECT doc_id, url, " +
        "regexp_extract(url, '^https://([^/]+)/', 1) AS host, " +
        "regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path, " +
        "regexp_extract(url, 'lang=([^&]*)', 1) AS q_lang " +
        "FROM u ORDER BY doc_id"),
    "agg_bit_pack" ->
      ("WITH m AS (SELECT event_type, CAST(1 AS BIGINT) << CAST(user_id % 16 AS INT) AS mask FROM events) " +
        "SELECT event_type, bit_or(mask) AS users_mask, bit_and(mask) AS common_mask, " +
        "bit_xor(mask) AS parity_mask, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM m GROUP BY event_type ORDER BY event_type"),
    "win_ignore_nulls" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, " +
        "CASE WHEN event_type = 'purchase' THEN value END AS pv FROM events) " +
        "SELECT user_id, event_id, us, " +
        "last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value " +
        "FROM e ORDER BY user_id, us, event_id"),
    "agg_grouping_id" ->
      ("SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, " +
        "CAST(GROUPING(o_orderstatus) AS INT) AS g_status " +
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "fn_interval_arith" ->
      ("SELECT o_orderkey, o_orderdate + INTERVAL 3 DAY AS plus3d, " +
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "last_day(o_orderdate) AS month_end, " +
        "CAST(year(o_orderdate) AS INT) AS yr, CAST(quarter(o_orderdate) AS INT) AS qtr " +
        "FROM orders ORDER BY o_orderkey"),
    "sub_lateral_join" ->
      ("SELECT c_custkey, c_mktsegment, t.max_price, t.n_orders " +
        "FROM customer, LATERAL (SELECT MAX(o_totalprice) AS max_price, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders WHERE o_custkey = c_custkey) t " +
        "WHERE t.n_orders > 0 ORDER BY c_custkey"),
    "report_dau_wau" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events), " +
        "dau AS (SELECT dt, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM ev GROUP BY dt), " +
        "wau AS (SELECT CAST(date_trunc('week', dt) AS DATE) AS wk, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM ev GROUP BY 1) " +
        "SELECT dt, dau, wk, wau FROM dau JOIN wau ON CAST(date_trunc('week', dt) AS DATE) = wk " +
        "ORDER BY dt"),
    "vec_centroid_recluster" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "cents AS (SELECT vec_id AS cid, emb AS c_emb FROM e WHERE vec_id < 8), " +
        "assign AS (SELECT vec_id, emb, cid FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_cosine_similarity(e.emb, c.c_emb) DESC, c.cid ASC) AS rn FROM e, cents c) WHERE rn = 1), " +
        "x AS (SELECT cid, CAST(i - 1 AS INT) AS dim, " +
        "CAST(emb[CAST(i AS INT)] AS DECIMAL(28,10)) AS v " +
        "FROM assign, UNNEST(generate_series(1, len(emb))) AS t(i)) " +
        "SELECT cid, dim, CAST(ROUND(SUM(v) / COUNT(*), 6) AS DOUBLE) AS centroid_v, " +
        "CAST(COUNT(*) AS BIGINT) AS n_members " +
        "FROM x GROUP BY cid, dim ORDER BY cid, dim"),
    "typed_dataset_pipeline" ->
      (s"SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS revenue " +
        "FROM lineitem WHERE l_quantity > 10 " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "mm_metadata_stats" ->
      ("SELECT lang AS src_lang, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(length(text)) AS BIGINT) AS total_bytes, " +
        "CAST(MIN(length(text)) AS INT) AS min_len, " +
        "CAST(MAX(length(text)) AS INT) AS max_len " +
        "FROM documents GROUP BY lang ORDER BY src_lang"),
    "fn_sequence_pack" ->
      ("SELECT o_orderkey, array_to_string([x * x FOR x IN " +
        "generate_series(1, CAST(o_orderkey % 5 + 1 AS INT))], ',') AS squares, " +
        "CAST(len(generate_series(1, CAST(o_orderkey % 5 + 1 AS INT))) AS INT) AS n " +
        "FROM orders ORDER BY o_orderkey"),
    "report_session_histogram" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
        "l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM ev), " +
        "n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM l), " +
        "sess AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM n), " +
        "sz AS (SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM sess GROUP BY 1, 2) " +
        "SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM sz " +
        "GROUP BY n_events ORDER BY n_events"),
    "vec_norm_stats" ->
      ("WITH e AS (SELECT label, round(sqrt(list_sum(list_transform(" +
        "CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm FROM embeddings) " +
        "SELECT label, CAST(COUNT(*) AS BIGINT) AS n, MIN(norm) AS min_norm, " +
        "MAX(norm) AS max_norm, " +
        s"${oMoney("SUM(CAST(norm AS DECIMAL(18,8))) / COUNT(*)")} AS avg_norm " +
        "FROM e GROUP BY label ORDER BY label"),
    "join_null_safe" ->
      ("WITH e AS (SELECT event_id, CASE WHEN value < 50 THEN " +
        "CAST(FLOOR(value / 10) AS BIGINT) END AS k FROM events), " +
        "dim AS (SELECT CAST(id AS BIGINT) AS k, 'band_' || id AS band " +
        "FROM range(5) t(id) UNION ALL SELECT NULL, 'band_null') " +
        "SELECT band, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.k " +
        "GROUP BY band ORDER BY band"),
    "report_gmv_moving_avg" ->
      (s"WITH daily AS (SELECT CAST(ts AS DATE) AS dt, SUM(${oDec("value")}) AS gmv_d " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "x AS (SELECT dt, gmv_d, datediff('day', DATE '2024-01-01', dt) AS dayn FROM daily) " +
        s"SELECT dt, ${oMoney("gmv_d")} AS gmv, " +
        s"${oMoney("AVG(gmv_d) OVER (ORDER BY dayn RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)")} AS gmv_ma7 " +
        "FROM x ORDER BY dt"),
    "text_quality_filter" ->
      ("WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents), " +
        "x AS (SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tok, " +
        "round(len(list_distinct(toks)) / greatest(len(toks), 1), 6) AS uniq_ratio FROM s) " +
        "SELECT doc_id, lang, n_tok, uniq_ratio FROM x " +
        "WHERE n_tok >= 5 AND uniq_ratio >= 0.5 ORDER BY doc_id"),
    "source_schema_evolution" ->
      ("SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(*) AS BIGINT) AS n_typed, " +
        s"${oMoney(s"2 * SUM(${oDec("value")})")} AS sum_val FROM events"),
    "fn_array_setops" ->
      ("WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks, " +
        "['scan', 'merge', 'the'] AS probe FROM documents) " +
        "SELECT doc_id, " +
        // list_sort of an empty list yields NULL in DuckDB; Spark's
        // array_join of an empty array yields '' — coalesce to match
        "array_to_string(list_sort(list_distinct(list_concat(toks, probe))), ',') AS u, " +
        "COALESCE(array_to_string(list_sort(list_filter(toks, x -> list_contains(probe, x))), ','), '') AS i, " +
        "COALESCE(array_to_string(list_sort(list_filter(toks, x -> NOT list_contains(probe, x))), ','), '') AS e, " +
        "len(list_filter(toks, x -> list_contains(probe, x))) > 0 AS o " +
        "FROM t ORDER BY doc_id"),
    "agg_countif_pack" ->
      ("SELECT l_returnflag, CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc, " +
        "bool_or(l_quantity > 45) AS any_bulk, bool_and(l_extendedprice > 0) AS all_paid, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "text_pmi_bigrams" ->
      ("WITH dt AS (SELECT string_split(text, ' ') AS w FROM documents), " +
        "uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1 FROM " +
        "(SELECT unnest(w) AS tok FROM dt) GROUP BY tok), " +
        "t1 AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1 FROM uc), " +
        "bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c2 FROM " +
        "(SELECT w[CAST(i AS INT)] AS a, w[CAST(i AS INT) + 1] AS b " +
        "FROM dt, UNNEST(generate_series(1, len(w) - 1)) AS t(i)) GROUP BY a, b), " +
        "t2 AS (SELECT CAST(SUM(c2) AS BIGINT) AS t2 FROM bc) " +
        "SELECT a, b, c2, round(ln((c2 / t2.t2) / ((ca.c1 / t1.t1) * (cb.c1 / t1.t1))), 6) AS pmi " +
        "FROM bc JOIN uc ca ON bc.a = ca.tok JOIN uc cb ON bc.b = cb.tok " +
        "CROSS JOIN t1 CROSS JOIN t2 WHERE c2 >= 5 ORDER BY a, b"),
    "sink_dynamic_overwrite" ->
      ("WITH ev AS (SELECT CAST(ts AS DATE) AS dt, " +
        "CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05' THEN value * 2 ELSE value END AS v " +
        "FROM events) " +
        "SELECT dt, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(s"SUM(${oDec("v")})")} AS sum_val " +
        "FROM ev GROUP BY dt ORDER BY dt"),
    "fn_try_pack" ->
      ("SELECT doc_id, TRY_CAST(substr(text, 1, 3) AS INT) AS bad_int, " +
        "TRY_CAST(n_chars AS INT) AS good_int, " +
        "n_chars / NULLIF(doc_id % 3, 0) AS maybe_div, " +
        "TRY_CAST(lang AS DATE) AS bad_date " +
        "FROM documents ORDER BY doc_id"),
    "scan_partition_prune" ->
      ("SELECT CAST(ts AS DATE) AS dt, event_type, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(s"SUM(${oDec("value")})")} AS sum_val FROM events " +
        "WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12' " +
        "GROUP BY 1, 2 ORDER BY dt, event_type")
  )
}
