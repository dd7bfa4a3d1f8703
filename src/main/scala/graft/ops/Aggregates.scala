package graft.ops

import graft.T
import graft.T.dround
import graft.functions.GeoMean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** SURVEY.md §2.4 (aggregations) + §2.5 (window functions).
  *
  * Averages are exposed as round(sum(decimal)::double / count, 4) on both
  * sides — the decimal sum is order-independent (safe under Spark partial
  * aggregation at any partition count) and the final double division is a
  * single IEEE op identical across engines (SURVEY §7.2 item 1).
  */
object Aggregates {
  import T._

  /** round(sumDec::double / cnt, 4) — deterministic "average". */
  private def avgX(sumDec: org.apache.spark.sql.Column,
                   cnt: org.apache.spark.sql.Column) =
    dround(sumDec.cast(DoubleType) / cnt, 4).cast(DoubleType)
  private def oAvgX(sumDec: String) =
    s"CAST(ROUND(CAST($sumDec AS DOUBLE) / COUNT(*), 4) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregations ---------------------------------------------
    "agg_global" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        avgX(sum(rate(col("l_discount"))), count(lit(1))).as("avg_disc"))),

    "agg_group_pricing" -> ((s, d) => {
      val disc = dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          money(sum(disc)).as("sum_disc_price"),
          money(sum(disc * (lit(1) + rate(col("l_tax"))))).as("sum_charge"),
          avgX(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
          avgX(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
          avgX(sum(rate(col("l_discount"))), count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_having" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("tot_dec"),
          count(lit(1)).as("cnt"))
        .filter(col("tot_dec") > 3000000)
        .select(col("o_custkey"), money(col("tot_dec")).as("total"), col("cnt"))
        .orderBy("o_custkey")),

    "agg_count_distinct" -> ((s, d) =>
      T.events(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")),

    "agg_multi_distinct" -> ((s, d) =>
      T.events(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"),
          countDistinct(col("ts").cast(DateType)).as("days"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    "agg_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"),
          grouping_id().cast(IntegerType).as("gid"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    "agg_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          grouping_id().cast(IntegerType).as("gid"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "agg_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               ${"CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE)"} AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }),

    // Raw array column is dropped from the final projection (driver hasher
    // cannot hash array cells); the sorted content is carried as a joined
    // string plus its length.
    "agg_collect_sorted" -> ((s, d) =>
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_sort(collect_list(col("n_name"))).as("names"),
          count(lit(1)).as("cnt"))
        .select(col("r_name"), col("cnt"),
          array_join(col("names"), "|").as("names_str"),
          size(col("names")).cast("long").as("n_names"))
        .orderBy("r_name")),

    // t2=N (approximate): ScalaTest asserts within 5% of exact.
    "agg_approx_distinct" -> ((s, d) =>
      T.events(s, d).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // t2=N (approximate): the distributed-sketch rollup idiom — build one
    // HLL sketch per (event_type, day) partition, then UNION the binary
    // sketches across days and estimate. At 100 TB the daily sketches are
    // the materialized layer (a few KB each); any date-range distinct
    // count is a sketch merge, never a re-scan of raw events. ScalaTest
    // bounds the estimate against exact countDistinct.
    "agg_hll_union" -> ((s, d) => {
      val ev = T.events(s, d)
      val daily = ev.groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    }),

    "udaf_geomean" -> ((s, d) => {
      val geo = udaf(GeoMean)
      T.events(s, d).filter(col("value") > 0)
        .groupBy("event_type")
        .agg(dround(geo(col("value")), 4).as("geomean"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // ---- §2.5 window functions -----------------------------------------
    "win_latest_dedup" -> ((s, d) => {
      val e = T.events(s, d).withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value", "us")
        .orderBy("user_id")
    }),

    "win_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
      t(s, d, "part").select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        dround(percent_rank().over(w), 6).as("prnk"))
        .orderBy("p_brand", "p_partkey")
    }),

    "win_lag_lead" -> ((s, d) => {
      val e = T.events(s, d).withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      e.select(col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_event"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
        .orderBy("event_id")
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
          money(sum(dec(col("o_totalprice"))).over(w)).as("run_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "win_sliding_frame" -> ((s, d) => {
      val e = T.events(s, d).withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy("event_type")
        .orderBy(col("us"), col("event_id")).rowsBetween(-3, 0)
      e.select(col("event_id"), col("event_type"),
          money(sum(dec(col("value"))).over(w)).as("mov_sum"),
          count(lit(1)).over(w).as("mov_cnt"))
        .orderBy("event_id")
    }),

    "win_range_frame" -> ((s, d) => {
      // RANGE frame over the last 10 minutes, keyed in epoch-µs so the
      // boundary arithmetic is integral and engine-exact.
      val e = T.events(s, d).withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy("event_type").orderBy(col("us"))
        .rangeBetween(-600000000L, 0L)
      e.select(col("event_id"), col("event_type"),
          money(sum(dec(col("value"))).over(w)).as("r_sum"),
          count(lit(1)).over(w).as("r_cnt"))
        .orderBy("event_id")
    }),

    "win_ntile_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("tile"),
          first(col("c_custkey")).over(wf).as("fv"),
          last(col("c_custkey")).over(wf).as("lv"))
        .orderBy("c_custkey")
    })
  )

  private val oSumQty = s"""SUM(${oDec("l_quantity")})"""
  private val oDiscPrice = s"""${oDec("l_extendedprice")} * (1 - ${oRate("l_discount")})"""

  val oracles: Map[String, String] = Map(
    "agg_global" ->
      (s"SELECT CAST(COUNT(*) AS BIGINT) AS cnt, ${oMoney(oSumQty)} AS sum_qty, " +
        "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, " +
        s"${oAvgX(s"SUM(${oRate("l_discount")})")} AS avg_disc FROM lineitem"),
    "agg_group_pricing" ->
      (s"SELECT l_returnflag, l_linestatus, ${oMoney(oSumQty)} AS sum_qty, " +
        s"${oMoney(s"SUM(${oDec("l_extendedprice")})")} AS sum_base_price, " +
        s"${oMoney(s"SUM($oDiscPrice)")} AS sum_disc_price, " +
        s"${oMoney(s"SUM($oDiscPrice * (1 + ${oRate("l_tax")}))")} AS sum_charge, " +
        s"${oAvgX(oSumQty)} AS avg_qty, " +
        s"${oAvgX(s"SUM(${oDec("l_extendedprice")})")} AS avg_price, " +
        s"${oAvgX(s"SUM(${oRate("l_discount")})")} AS avg_disc, " +
        "CAST(COUNT(*) AS BIGINT) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "agg_having" ->
      (s"SELECT o_custkey, ${oMoney(s"SUM(${oDec("o_totalprice")})")} AS total, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey " +
        s"HAVING SUM(${oDec("o_totalprice")}) > 3000000 ORDER BY o_custkey"),
    "agg_count_distinct" ->
      ("SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "agg_multi_distinct" ->
      ("SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users, " +
        "CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY event_type ORDER BY event_type"),
    "agg_rollup" ->
      (s"SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(s"SUM(${oDec("o_totalprice")})")} AS total, " +
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid " +
        "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "agg_cube" ->
      (s"SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"${oMoney(oSumQty)} AS sum_qty, " +
        "CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
    "agg_grouping_sets" ->
      (s"SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "agg_collect_sorted" ->
      ("SELECT r_name, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "array_to_string(list(n_name ORDER BY n_name), '|') AS names_str, " +
        "CAST(COUNT(*) AS BIGINT) AS n_names " +
        "FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"),
    "udaf_geomean" ->
      ("SELECT event_type, CAST(ROUND(EXP(SUM(LN(value)) / COUNT(*)), 4) AS DOUBLE) AS geomean, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE value > 0 " +
        "GROUP BY event_type ORDER BY event_type"),
    "win_latest_dedup" ->
      ("SELECT user_id, event_id, event_type, value, us FROM (" +
        "SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id"),
    "win_rank_dense" ->
      ("SELECT p_brand, p_partkey, p_retailprice, " +
        "CAST(RANK() OVER w AS BIGINT) AS rnk, CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk, " +
        "ROUND(PERCENT_RANK() OVER w, 6) AS prnk FROM part " +
        "WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC) " +
        "ORDER BY p_brand, p_partkey"),
    "win_lag_lead" ->
      ("SELECT event_id, user_id, LAG(event_id, 1) OVER w AS prev_event, " +
        "LEAD(event_id, 1) OVER w AS next_event, " +
        "epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) ORDER BY event_id"),
    "win_running_sum" ->
      (s"SELECT o_custkey, o_orderkey, ${oMoney(s"SUM(${oDec("o_totalprice")}) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_total " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),
    "win_sliding_frame" ->
      (s"SELECT event_id, event_type, ${oMoney(s"SUM(${oDec("value")}) OVER w")} AS mov_sum, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS mov_cnt FROM events " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "win_range_frame" ->
      (s"SELECT event_id, event_type, ${oMoney(s"SUM(${oDec("value")}) OVER w")} AS r_sum, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS r_cnt FROM events " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "win_ntile_firstlast" ->
      ("SELECT c_custkey, c_mktsegment, CAST(NTILE(4) OVER w AS INT) AS tile, " +
        "FIRST_VALUE(c_custkey) OVER wf AS fv, LAST_VALUE(c_custkey) OVER wf AS lv " +
        "FROM customer WINDOW " +
        "w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey), " +
        "wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY c_custkey")
  )
}
