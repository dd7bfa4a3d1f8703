package graft

import org.apache.spark.sql.types._

/** Schema-drift canary (round-9 verdict task 3).
  *
  * The driver regenerates /root/testdata between rounds, and round 9 proved
  * it can silently change a column's PHYSICAL parquet type (events.ts went
  * timestamp[ns] → timestamp[us], killing 55 query keys and 27 tests with
  * one inscrutable analysis exception each). This spec pins the expected
  * logical schema of every table so the NEXT regeneration fails ONE named
  * test with a clear message instead of 27 mysterious ones.
  *
  * events.ts is asserted as "a timestamp OR a nanos-long" — both physical
  * encodings are legitimate (see T.events), and the loader's OUTPUT contract
  * (ts TIMESTAMP + ts_ns LONG, fixed column order) is asserted separately.
  */
class SchemaCanarySpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    T.t(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("canary: region/nation dims") {
    assert(fields("region") === Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") === Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
  }

  test("canary: customer/supplier/part dims") {
    assert(fields("customer") === Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields("supplier") === Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields("part") === Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("canary: orders/lineitem facts (date columns must stay timestamps)") {
    val o = fields("orders")
    assert(o("o_orderkey") === LongType && o("o_custkey") === LongType)
    assert(o("o_totalprice") === DoubleType)
    assert(o("o_orderdate").isInstanceOf[TimestampType.type] ||
      o("o_orderdate").isInstanceOf[TimestampNTZType.type],
      s"o_orderdate drifted to ${o("o_orderdate")}")
    assert(o("o_orderstatus") === StringType && o("o_orderpriority") === StringType)
    val l = fields("lineitem")
    assert(Seq("l_orderkey", "l_partkey", "l_suppkey").forall(l(_) === LongType))
    assert(l("l_linenumber") === IntegerType)
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .forall(l(_) === DoubleType))
    assert(Seq("l_returnflag", "l_linestatus").forall(l(_) === StringType))
    assert(l("l_shipdate").isInstanceOf[TimestampType.type] ||
      l("l_shipdate").isInstanceOf[TimestampNTZType.type],
      s"l_shipdate drifted to ${l("l_shipdate")}")
  }

  test("canary: events.ts is a timestamp OR a nanos-long (both readable)") {
    // Raw read under the same conf the loader sets — this is the exact
    // branch point in T.events. Any third encoding fails HERE, by name.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = fields("events")
    assert(e("event_id") === LongType && e("user_id") === LongType)
    assert(e("event_type") === StringType && e("props") === StringType)
    assert(e("value") === DoubleType)
    val ok = e("ts") match {
      case LongType => true // timestamp[ns] surfaced via nanosAsLong
      case _: TimestampType.type => true // timestamp[us], UTC-adjusted
      case _: TimestampNTZType.type => true // timestamp[us], no TZ
      case _ => false
    }
    assert(ok, s"events.ts drifted to unsupported encoding ${e("ts")} — " +
      "update T.events' dtype branch")
  }

  test("canary: T.events output contract (ts TIMESTAMP, ts_ns LONG, fixed order)") {
    val ev = T.events(spark, sf)
    assert(ev.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      "event_id" -> LongType, "ts_ns" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType, "ts" -> TimestampType))
    // ts and ts_ns must agree at µs grain regardless of physical encoding.
    // Integer `div`, NOT `/`: ts_ns ≈ 1.7e18 > 2^53, double division is lossy.
    import org.apache.spark.sql.functions._
    val bad = ev.filter(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad === 0L, s"$bad rows where ts and ts_ns disagree at µs grain")
    val n = ev.count()
    assert(n > 0L)
    // Every (ts_ns, event_id) order-by in the suite (OHLC, streaks,
    // sessionize, latest-dedup) relies on event_id as the tiebreak; with
    // the µs-grain ts_ns encoding, ts_ns ties are MORE likely than under
    // ns data, so the totality guarantee is event_id uniqueness. Pin it.
    assert(ev.select("event_id").distinct.count() === n,
      "event_id is no longer unique — ts_ns tiebreaks lose totality")
  }

  test("canary: events/orders/lineitem timestamp encodings at ALL scale factors") {
    // Round 9's drift hit all three SFs at once, but nothing guarantees a
    // future regeneration is uniform — assert the loader-relevant dtypes
    // per SF (schema-only reads; no data scanned).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      def dt(tab: String, c: String) = T.t(spark, dir, tab).schema(c).dataType
      val tsOk = dt("events", "ts") match {
        case LongType | _: TimestampType.type | _: TimestampNTZType.type => true
        case _ => false
      }
      assert(tsOk, s"$dir events.ts drifted to ${dt("events", "ts")}")
      for ((tab, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
        val ok = dt(tab, c) match {
          case _: TimestampType.type | _: TimestampNTZType.type => true
          case _ => false
        }
        assert(ok, s"$dir $tab.$c drifted to ${dt(tab, c)}")
      }
      assert(T.events(spark, dir).schema("ts").dataType === TimestampType)
    }
  }

  test("canary: documents/embeddings") {
    assert(fields("documents") === Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val em = fields("embeddings")
    assert(em("vec_id") === LongType && em("label") === IntegerType)
    assert(em("embedding") === ArrayType(FloatType, containsNull = true) ||
      em("embedding") === ArrayType(FloatType, containsNull = false),
      s"embedding drifted to ${em("embedding")}")
  }
}
