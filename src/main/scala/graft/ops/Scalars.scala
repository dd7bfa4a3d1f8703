package graft.ops

import graft.T
import graft.T.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.8 — scalar function packs. One t2 query per pack; each
  * evaluates many built-ins into a single ordered projection so one oracle
  * hash covers the whole pack. Oracle-dialect deltas (measured on DuckDB
  * 1.0.0): floor/ceil return DOUBLE (Spark: LONG), sign returns TINYINT
  * (Spark: DOUBLE), length/instr/len return BIGINT (Spark: INT),
  * regexp_replace needs the 'g' flag, date_trunc('month') returns DATE,
  * and tz-dependent functions (to_timestamp) are avoided in favor of
  * naive interval arithmetic.
  */
object Scalars {
  import T._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string_pack" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        concat(col("p_brand"), lit("#"), col("p_name")).as("c1"),
        concat_ws("-", col("p_brand"), col("p_type")).as("c2"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("tr"),
        lpad(col("p_brand"), 10, "*").as("lp"),
        substring(col("p_name"), 1, 8).as("sub"),
        length(col("p_name")).as("ln"),
        replace(col("p_name"), lit(" "), lit("_")).as("rep"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rx"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("rxr"),
        instr(col("p_name"), "r").as("ins"),
        reverse(col("p_name")).as("rev"))
        .orderBy("p_partkey")),

    "fn_date_pack" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mtrunc"),
        date_add(col("o_orderdate").cast(DateType), 30).as("dplus"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).as("ddiff"),
        last_day(col("o_orderdate")).as("ld"),
        unix_timestamp(col("o_orderdate")).as("ux"),
        from_unixtime(unix_timestamp(col("o_orderdate")) + 86400).as("fu"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("fmt"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd").as("td"))
        .orderBy("o_orderkey")),

    "fn_math_pack" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        // decimal multiply: 2dp × 3dp = exact 5dp, so round-to-2 ties
        // (cents ending in 5) resolve identically on both engines —
        // double math here flips the tie on ~1e-4 of rows at sf0.1
        round(dec(col("c_acctbal")) * lit(BigDecimal("1.337")), 2)
          .cast(DoubleType).as("rd"),
        floor(col("c_acctbal")).as("fl"),
        ceil(col("c_acctbal")).as("ce"),
        abs(col("c_acctbal")).as("ab"),
        dround(sqrt(abs(col("c_acctbal"))), 4).as("sq"),
        dround(exp(col("c_acctbal") / 10000.0), 6).as("ex"),
        dround(log(abs(col("c_acctbal")) + 1), 6).as("lnn"),
        dround(log10(abs(col("c_acctbal")) + 1), 6).as("lg"),
        pow(pmod(col("c_custkey"), lit(7)), 2).as("pw"),
        pmod(col("c_custkey"), lit(7)).as("pm"),
        signum(col("c_acctbal")).cast(IntegerType).as("sg"),
        greatest(col("c_acctbal"), lit(0.0)).as("gr"),
        least(col("c_acctbal"), lit(0.0)).as("le"))
        .orderBy("c_custkey")),

    "fn_cond_pack" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bucket"),
        expr("if(c_acctbal < 0, 'debt', 'ok')").as("iff"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("co"),
        expr("nvl(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR')").as("nv"),
        nullif(signum(col("c_acctbal")).cast(IntegerType), lit(0)).as("n2"))
        .orderBy("c_custkey")),

    "fn_array_pack" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("tokens", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("tokens")).as("n_tok"),
          size(array_distinct(col("tokens"))).as("n_uniq"),
          array_contains(col("tokens"), "spark").as("has_spark"),
          array_join(slice(col("tokens"), 1, 3), " ").as("first3"),
          element_at(array_sort(col("tokens")), 1).as("tok1"))
        .orderBy("doc_id")),

    "fn_map_pack" -> ((s, d) => {
      val e = T.events(s, d)
        .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
      e.select(
          col("event_id"),
          element_at(col("m"), "k").as("kv"),
          size(map_keys(col("m"))).as("nk"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("ks"),
          element_at(
            map_from_arrays(array(lit("k2")),
              array(element_at(col("m"), "k") * 2)), "k2").as("kv2"))
        .orderBy("event_id")
    }),

    "fn_json_pack" -> ((s, d) => {
      val e = T.events(s, d)
      e.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("gjo"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("jk"),
          to_json(struct(col("user_id").as("u"))).as("tj"))
        .orderBy("event_id")
    }),

    "fn_cast_pack" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast(StringType).as("ks"),
        col("o_orderkey").cast(StringType).cast(LongType).as("ki"),
        col("o_orderkey").cast(DoubleType).as("kd"),
        col("o_orderdate").cast(DateType).cast(StringType).as("dstr"),
        col("o_orderdate").cast(DateType).cast(StringType)
          .cast(TimestampType).as("ts2"),
        expr("try_cast(concat(cast(o_orderkey AS STRING), '9') AS BIGINT)").as("tc_ok"),
        expr("try_cast(concat(cast(o_orderkey AS STRING), 'x') AS INT)").as("tc_bad"),
        col("o_totalprice").cast(IntegerType).as("di"))
        .orderBy("o_orderkey"))
  )

  val oracles: Map[String, String] = Map(
    "fn_string_pack" ->
      ("SELECT p_partkey, p_brand || '#' || p_name AS c1, concat_ws('-', p_brand, p_type) AS c2, " +
        "upper(p_name) AS up, lower(p_type) AS lo, trim('  ' || p_name || '  ') AS tr, " +
        "lpad(p_brand, 10, '*') AS lp, substring(p_name, 1, 8) AS sub, " +
        "CAST(length(p_name) AS INT) AS ln, replace(p_name, ' ', '_') AS rep, " +
        "regexp_extract(p_name, '([a-z]+)', 1) AS rx, regexp_replace(p_name, '[aeiou]', '*', 'g') AS rxr, " +
        "CAST(instr(p_name, 'r') AS INT) AS ins, reverse(p_name) AS rev " +
        "FROM part ORDER BY p_partkey"),
    "fn_date_pack" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, " +
        "CAST(day(o_orderdate) AS INT) AS dd, CAST(date_trunc('month', o_orderdate) AS DATE) AS mtrunc, " +
        "CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS dplus, " +
        "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS ddiff, " +
        "last_day(o_orderdate) AS ld, CAST(epoch(o_orderdate) AS BIGINT) AS ux, " +
        "strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS fu, " +
        "strftime(o_orderdate, '%Y/%m/%d') AS fmt, CAST(o_orderdate AS DATE) AS td " +
        "FROM orders ORDER BY o_orderkey"),
    "fn_math_pack" ->
      (s"SELECT c_custkey, CAST(round(${oDec("c_acctbal")} * CAST(1.337 AS DECIMAL(4,3)), 2) AS DOUBLE) AS rd, CAST(floor(c_acctbal) AS BIGINT) AS fl, " +
        "CAST(ceil(c_acctbal) AS BIGINT) AS ce, abs(c_acctbal) AS ab, " +
        "round(sqrt(abs(c_acctbal)), 4) AS sq, round(exp(c_acctbal / 10000.0), 6) AS ex, " +
        "round(ln(abs(c_acctbal) + 1), 6) AS lnn, round(log10(abs(c_acctbal) + 1), 6) AS lg, " +
        "pow(mod(c_custkey, 7), 2) AS pw, CAST(mod(c_custkey, 7) AS BIGINT) AS pm, " +
        "CAST(sign(c_acctbal) AS INT) AS sg, greatest(c_acctbal, 0.0) AS gr, least(c_acctbal, 0.0) AS le " +
        "FROM customer ORDER BY c_custkey"),
    "fn_cond_pack" ->
      ("SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 1000 THEN 'low' " +
        "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket, " +
        "CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'ok' END AS iff, " +
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS co, " +
        "coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS nv, " +
        "nullif(CAST(sign(c_acctbal) AS INT), 0) AS n2 " +
        "FROM customer ORDER BY c_custkey"),
    "fn_array_pack" ->
      ("WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) " +
        "SELECT doc_id, CAST(len(tokens) AS INT) AS n_tok, " +
        "CAST(len(list_distinct(tokens)) AS INT) AS n_uniq, " +
        "list_contains(tokens, 'spark') AS has_spark, " +
        "array_to_string(tokens[1:3], ' ') AS first3, " +
        "list_sort(tokens)[1] AS tok1 FROM dt ORDER BY doc_id"),
    "fn_map_pack" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS kv, " +
        "CAST(len(json_keys(props)) AS INT) AS nk, " +
        "array_to_string(list_sort(json_keys(props)), ',') AS ks, " +
        "2 * CAST(json_extract_string(props, '$.k') AS INT) AS kv2 " +
        "FROM events ORDER BY event_id"),
    "fn_json_pack" ->
      ("SELECT event_id, json_extract_string(props, '$.k') AS gjo, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS jk, " +
        "to_json(struct_pack(u := user_id))::VARCHAR AS tj " +
        "FROM events ORDER BY event_id"),
    "fn_cast_pack" ->
      ("SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS ks, " +
        "CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS ki, CAST(o_orderkey AS DOUBLE) AS kd, " +
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS dstr, " +
        "CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS TIMESTAMP) AS ts2, " +
        "try_cast(CAST(o_orderkey AS VARCHAR) || '9' AS BIGINT) AS tc_ok, " +
        "try_cast(CAST(o_orderkey AS VARCHAR) || 'x' AS INT) AS tc_bad, " +
        "CAST(trunc(o_totalprice) AS INT) AS di " +
        "FROM orders ORDER BY o_orderkey")
  )
}
