package graft

import org.apache.spark.sql.functions._

/** Round-6 operator tests beyond the DuckDB oracle gate: the
  * file-provenance scan (no SQL-expressible oracle — the driver's views
  * abstract paths away) and a Spark-side brute-force parity check for
  * the grid-bucketed spatial join (the oracle proves the result; this
  * proves the BUCKETING loses no pair against the unbucketed plan). */
class Round6Spec extends SparkSpec {

  test("scan_metadata_files reports the real source file name, size and row count") {
    val rows = SparkEntry.queries("scan_metadata_files")(spark, sf).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert(r.getAs[String]("src_file") == "lineitem.parquet", r)
    val onDisk = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/lineitem.parquet"))
    assert(r.getAs[Long]("src_bytes") == onDisk, s"$r vs $onDisk")
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.getAs[Long]("n_rows") == n, s"$r vs $n")
  }

  test("source_binaryfile length and content size match the file on disk") {
    val rows = SparkEntry.queries("source_binaryfile")(spark, sf).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert(r.getAs[String]("file_name") == "region.parquet", r)
    val onDisk = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/region.parquet"))
    assert(r.getAs[Long]("length") == onDisk, s"$r vs $onDisk")
    assert(r.getAs[Long]("content_len") == onDisk, s"$r vs $onDisk")
  }

  test("join_grid_spatial equals the unbucketed brute-force distance join") {
    val bucketed = SparkEntry.queries("join_grid_spatial")(spark, sf)
    val cust = T.t(spark, sf, "customer").select(col("c_custkey"),
      ((col("c_custkey") * 7) % 140 - 70 + lit(0.25)).as("x"),
      ((col("c_custkey") * 13) % 360 - 180 + lit(0.25)).as("y"))
    val supp = T.t(spark, sf, "supplier").select(col("s_suppkey"),
      ((col("s_suppkey") * 11) % 140 - 70 + lit(0.5)).as("sx"),
      ((col("s_suppkey") * 17) % 360 - 180 + lit(0.5)).as("sy"))
    val dx = col("x") - col("sx")
    val dy = col("y") - col("sy")
    val brute = cust.crossJoin(supp)
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= 4.0)
      .select(col("c_custkey"), col("s_suppkey"), col("dist2"))
      .orderBy("c_custkey", "s_suppkey")
    assert(bucketed.collect().toSeq == brute.collect().toSeq)
  }
}
