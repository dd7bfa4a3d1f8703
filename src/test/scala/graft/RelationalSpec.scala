package graft

import org.apache.spark.sql.functions._

/** Per-operator unit tier (SURVEY §5.2): structural invariants with
  * hand-computable expectations on sf0.001. */
class RelationalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("every declared query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("semi and anti partition the customer table") {
    val total = T.t(spark, sf, "customer").count()
    assert(q("join_left_semi").count() + q("join_left_anti").count() == total)
  }

  test("theta self-join yields n*(n-1)/2 ordered pairs") {
    val n = T.t(spark, sf, "nation").count()
    assert(q("join_theta_range").count() == n * (n - 1) / 2)
  }

  test("cross join is |region| * |nation|") {
    assert(q("join_cross_small").count() == 5 * 25)
  }

  test("latest-record dedup returns exactly one row per user") {
    val users = T.events(spark, sf).select("user_id").distinct().count()
    val out = q("win_latest_dedup")
    assert(out.count() == users)
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("as-of join keeps at most one click per purchase, never after it") {
    val out = q("join_asof_latest")
    assert(out.groupBy("purchase_id").count().filter(col("count") > 1).count() == 0)
    assert(out.filter(col("gap_us") < 0).count() == 0)
  }

  test("full outer preserves keys from both sides") {
    val out = q("join_full_outer")
    val o = T.t(spark, sf, "orders")
    val keys = o.select(col("o_custkey")).distinct().count()
    assert(out.count() == keys)
  }

  test("union_all cardinality = sum of slices; union_distinct deduplicates") {
    val e = T.events(spark, sf)
    val a = e.filter(col("value") > 50).count()
    val b = e.filter(col("event_type") === "click").count()
    assert(q("set_union_all").count() == a + b)
    assert(q("set_union_distinct").count() <= a + b)
  }

  test("topk returns exactly 10 rows in descending revenue order") {
    val rows = q("topk_orders").collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (x, y) => x >= y })
  }

  test("rollup has grand-total row and per-status subtotals") {
    val rows = q("agg_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == T.t(spark, sf, "orders").count())
  }

  test("sink_csv: report round-trips through CSV with header") {
    val out = q("sink_csv").collect()
    val direct = T.t(spark, sf, "orders").groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        T.money(sum(T.dec(col("o_totalprice")))).as("total"))
      .orderBy("o_orderpriority").collect()
    assert(out.toSeq == direct.toSeq)
  }

  test("running sum: per-customer max equals the customer's total") {
    val out = q("win_running_sum").groupBy("o_custkey")
      .agg(max("run_total").as("mx"))
    val exp = T.t(spark, sf, "orders").groupBy("o_custkey")
      .agg(T.money(sum(T.dec(col("o_totalprice")))).as("tot"))
    val bad = out.join(exp, "o_custkey").filter(col("mx") =!= col("tot"))
    assert(bad.count() == 0)
    assert(q("win_running_sum").filter(col("run_total") <= 0).count() == 0)
  }
}
