package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** SURVEY.md §2.1 (scans), §2.2 (filters/projections), §2.3 (joins),
  * §2.6 (sort/top-k), §2.7 (set ops). Pure built-in Spark — Catalyst
  * handles pushdown/pruning/join selection (SURVEY §4.2).
  */
object Relational {
  import T._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 scans ----------------------------------------------------
    "scan_full" -> ((s, d) =>
      t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber")),

    "scan_prune_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    "scan_filter_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- §2.2 projections / filters ------------------------------------
    "project_arith" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        money(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_complex_pred" -> ((s, d) =>
      t(s, d, "customer").filter(
        (col("c_mktsegment").like("BUILD%") ||
          col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE")) &&
        col("c_acctbal").between(-500, 8000) &&
        !(col("c_nationkey") === 3))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "c_nationkey")
        .orderBy("c_custkey")),

    "filter_null_semantics" -> ((s, d) => {
      val c = t(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("bal"))
      c.filter(col("bal").isNull ||
          col("bal") <=> lit(0.0) || col("bal") > 9000)
        .select(col("c_custkey"), col("bal"),
          col("bal").isNull.as("is_null"),
          (col("bal") <=> lit(null).cast(DoubleType)).as("ns_eq_null"))
        .orderBy("c_custkey")
    }),

    // ---- §2.3 joins ----------------------------------------------------
    "join_broadcast_dim" -> ((s, d) =>
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")),

    "join_shuffle_large" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("o_orderpriority")),

    "join_multiway_star" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .groupBy("r_name", "n_name")
        .agg(money(sum(dec(col("l_extendedprice")) *
          (lit(1) - rate(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("r_name", "n_name")),

    "join_left_outer" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("cnt_li"))
        .orderBy("o_orderkey")),

    "join_right_outer" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("cnt"))
        .orderBy("c_custkey")),

    "join_full_outer" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "F").groupBy("o_custkey")
        .agg(count(lit(1)).as("f_cnt")).withColumnRenamed("o_custkey", "ak")
      val b = o.filter(col("o_orderstatus") === "O").groupBy("o_custkey")
        .agg(count(lit(1)).as("o_cnt")).withColumnRenamed("o_custkey", "bk")
      a.join(b, col("ak") === col("bk"), "full")
        .select(coalesce(col("ak"), col("bk")).as("custkey"),
          col("f_cnt"), col("o_cnt"))
        .orderBy("custkey")
    }),

    "join_left_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "join_left_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "join_cross_small" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    "join_theta_range" -> ((s, d) => {
      val a = t(s, d, "nation").select(
        col("n_nationkey").as("a_key"), col("n_name").as("a_name"))
      val b = t(s, d, "nation").select(
        col("n_nationkey").as("b_key"), col("n_name").as("b_name"))
      a.join(b, col("a_key") < col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .orderBy("a_key", "b_key")
    }),

    // Band join inside events: clicks within 5 minutes before a purchase,
    // same user. Compared in epoch-µs so Spark (µs) and DuckDB (ns) agree.
    "join_interval_events" -> ((s, d) => {
      val e = T.events(s, d)
      // Interval join (clicks within 5 min before each purchase) keyed on
      // (user, time-bucket) rather than user alone: clicks fan out to
      // their own and the NEXT 5-min bucket, so every qualifying pair
      // meets in exactly one bucket (c ∈ [p−W, p] ⇒ c_bucket ∈
      // {p_bucket−1, p_bucket}) and the join never enumerates a user's
      // full purchase×click cross product — per-user-quadratic candidates
      // become per-5-minute candidates. Integer `div` keeps bucketing
      // exact; the oracle runs the plain interval join, so the hash-match
      // proves the fan-out loses/duplicates nothing.
      val W = 300000000L // 5 min in µs
      val p = e.filter(col("event_type") === "purchase").select(
        col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
        .withColumn("tb", expr(s"p_us div $W"))
      val c = e.filter(col("event_type") === "click").select(
        col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
        .withColumn("tb", explode(array(expr(s"c_us div $W"),
          expr(s"c_us div $W") + 1)))
      p.join(c, col("user_id") === col("c_user") &&
          p("tb") === c("tb") &&
          col("c_us") >= col("p_us") - lit(W) &&
          col("c_us") <= col("p_us"))
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id", "click_id")
    }),

    // As-of: latest prior click per purchase (binlog latest-state idiom).
    "join_asof_latest" -> ((s, d) => {
      val e = T.events(s, d)
      // As-of join (latest click at-or-before each purchase, per user) as a
      // merged-stream running max: union both event kinds, one shuffle on
      // user_id + one sort, then a running max(struct(c_us, click_id)) whose
      // struct ordering reproduces the (c_us DESC, click_id DESC) tie-break.
      // The naive purchases⋈clicks equi-join on user_id is quadratic per
      // user (n_p × n_c candidate rows before the rn=1 filter) — it took
      // 10 s at sf0.1 and would be unrunnable at 100 TB; this shape is
      // O(n log n) per user and partition-parallel.
      val merged = e.filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1))
            .as("kind"),
          col("event_id"))
      // Clicks sort before purchases at equal timestamp (kind 0 < 1) so the
      // c_us <= p_us bound is inclusive, matching the join predicate.
      val w = Window.partitionBy("user_id")
        .orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged
        .withColumn("best", max(when(col("kind") === 0,
          struct(col("t").as("c_us"), col("event_id").as("click_id"))))
          .over(w))
        .filter(col("kind") === 1 && col("best").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("best.click_id").as("click_id"),
          (col("t") - col("best.c_us")).as("gap_us"))
        .orderBy("purchase_id")
    }),

    // ---- §2.6 sorts / top-k --------------------------------------------
    "sort_multikey_nulls" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("bal"))
        .orderBy(col("bal").desc_nulls_last, col("c_mktsegment").asc,
          col("c_custkey").asc)),

    "topk_orders" -> ((s, d) =>
      broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(money(sum(dec(col("l_extendedprice")) *
          (lit(1) - rate(col("l_discount"))))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast(DateType).as("odate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    // ---- §2.7 set ops --------------------------------------------------
    "set_union_all" -> ((s, d) => {
      val e = T.events(s, d).select("event_id", "event_type", "value")
      e.filter(col("value") > 50)
        .unionAll(e.filter(col("event_type") === "click"))
        .orderBy("event_id", "event_type", "value")
    }),

    "set_union_distinct" -> ((s, d) => {
      val e = T.events(s, d).select("event_id", "event_type", "value")
      e.filter(col("value") > 50)
        .union(e.filter(col("event_type") === "click")).distinct()
        .orderBy("event_id")
    }),

    "set_intersect" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 0).select("c_custkey")
        .intersect(c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
        .orderBy("c_custkey")
    }),

    "set_except" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 0).select("c_custkey")
        .except(c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
        .orderBy("c_custkey")
    })
  )

  private val rev =
    s"""${oMoney(s"SUM(${oDec("l_extendedprice")} * (1 - ${oRate("l_discount")}))")}"""

  val oracles: Map[String, String] = Map(
    "scan_full" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_prune_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_filter_pushdown" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' ORDER BY l_orderkey, l_linenumber"),
    "project_arith" ->
      (s"SELECT l_orderkey, l_linenumber, ${oMoney(s"${oDec("l_extendedprice")} * " +
        s"(1 - ${oRate("l_discount")}) * (1 + ${oRate("l_tax")})")} AS revenue " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "filter_complex_pred" ->
      ("SELECT c_custkey, c_name, c_mktsegment, c_acctbal, c_nationkey FROM customer " +
        "WHERE (c_mktsegment LIKE 'BUILD%' OR c_mktsegment IN ('MACHINERY','AUTOMOBILE')) " +
        "AND c_acctbal BETWEEN -500 AND 8000 AND NOT (c_nationkey = 3) ORDER BY c_custkey"),
    "filter_null_semantics" ->
      ("WITH c AS (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal FROM customer) " +
        "SELECT c_custkey, bal, (bal IS NULL) AS is_null, (bal IS NOT DISTINCT FROM NULL) AS ns_eq_null " +
        "FROM c WHERE bal IS NULL OR bal IS NOT DISTINCT FROM 0.0 OR bal > 9000 ORDER BY c_custkey"),
    "join_broadcast_dim" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
    "join_shuffle_large" ->
      (s"SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(s"SUM(${oDec("l_quantity")})")} AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "join_multiway_star" ->
      (s"SELECT r_name, n_name, $rev AS revenue, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "join_left_outer" ->
      ("SELECT o_orderkey, CAST(COUNT(l_orderkey) AS BIGINT) AS cnt_li FROM orders " +
        "LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderkey ORDER BY o_orderkey"),
    "join_right_outer" ->
      ("SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS cnt FROM " +
        "(SELECT * FROM orders WHERE o_totalprice > 400000) o RIGHT JOIN customer " +
        "ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey"),
    "join_full_outer" ->
      ("WITH a AS (SELECT o_custkey AS ak, CAST(COUNT(*) AS BIGINT) AS f_cnt FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey), " +
        "b AS (SELECT o_custkey AS bk, CAST(COUNT(*) AS BIGINT) AS o_cnt FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) " +
        "SELECT COALESCE(ak, bk) AS custkey, f_cnt, o_cnt FROM a FULL JOIN b ON ak = bk ORDER BY custkey"),
    "join_left_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_totalprice > 300000 AND o_custkey = c_custkey) ORDER BY c_custkey"),
    "join_left_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_totalprice > 300000 AND o_custkey = c_custkey) ORDER BY c_custkey"),
    "join_cross_small" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "join_theta_range" ->
      ("SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key, a.n_name AS a_name, b.n_name AS b_name " +
        "FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey ORDER BY a_key, b_key"),
    "join_interval_events" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT event_id AS click_id, user_id AS c_user, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click') " +
        "SELECT purchase_id, user_id, click_id FROM p JOIN c ON user_id = c_user " +
        "AND c_us >= p_us - 300000000 AND c_us <= p_us ORDER BY purchase_id, click_id"),
    "join_asof_latest" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT event_id AS click_id, user_id AS c_user, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'), " +
        "j AS (SELECT purchase_id, user_id, click_id, p_us - c_us AS gap_us, " +
        "ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY c_us DESC, click_id DESC) AS rn " +
        "FROM p JOIN c ON user_id = c_user AND c_us <= p_us) " +
        "SELECT purchase_id, user_id, click_id, gap_us FROM j WHERE rn = 1 ORDER BY purchase_id"),
    "sort_multikey_nulls" ->
      ("SELECT c_custkey, c_mktsegment, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal " +
        "FROM customer ORDER BY bal DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC"),
    "topk_orders" ->
      (s"SELECT l_orderkey, $rev AS revenue, CAST(o_orderdate AS DATE) AS odate, o_orderpriority " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "set_union_all" ->
      ("SELECT event_id, event_type, value FROM events WHERE value > 50 " +
        "UNION ALL SELECT event_id, event_type, value FROM events WHERE event_type = 'click' " +
        "ORDER BY event_id, event_type, value"),
    "set_union_distinct" ->
      ("SELECT event_id, event_type, value FROM events WHERE value > 50 " +
        "UNION SELECT event_id, event_type, value FROM events WHERE event_type = 'click' " +
        "ORDER BY event_id"),
    "set_intersect" ->
      ("SELECT c_custkey FROM customer WHERE c_acctbal > 0 " +
        "INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey"),
    "set_except" ->
      ("SELECT c_custkey FROM customer WHERE c_acctbal > 0 " +
        "EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey")
  )
}
