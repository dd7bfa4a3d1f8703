package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Oracle result-type audit (VERDICT r17 "Next round" item 1 guard).
  *
  * The suite's only two hash-reds across three rounds were the only two
  * oracles whose result carried a DuckDB HUGEINT column — an uncast
  * SUM(BIGINT), which DuckDB widens to int128 and the driver's hash path
  * serializes differently than Spark's LongType even at equal values.
  * Row count and name-based schema still pass, and value-level local
  * checks normalize through Python ints, so the class is invisible to
  * every other gate. This spec DESCRIBEs every oracleSql entry through
  * DuckDB (tools/oracle_types.py) and fails on HUGEINT/UHUGEINT result
  * columns or DECIMAL precision beyond Spark's 38 ceiling, so the class
  * can never recur.
  *
  * Audits the exact JSON Verify ships (Verify.oracleJson). Cancels (not
  * passes) if the local python3+duckdb bridge is absent, so a broken
  * bridge can't masquerade as a green audit.
  */
class OracleTypeAuditSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("no oracle result column is HUGEINT or DECIMAL(>38)") {
    val bridgeOk =
      try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
      catch { case _: Throwable => false }
    assume(bridgeOk, "python3+duckdb bridge unavailable; audit runs driver-side")
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir absent")

    val jsonFile = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(jsonFile, Verify.oracleJson)
    val out = new StringBuilder
    // sbt runs tests from the repo root — resolve the tool relative to
    // it, not a hardcoded checkout path
    val rc = Process(Seq("python3", "tools/oracle_types.py", sfDir,
      jsonFile.toString), new java.io.File(sys.props("user.dir")))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(jsonFile)
    assert(rc == 0, s"oracle type audit failed:\n$out")
    assert(out.toString.contains(s"audited ${SparkEntry.oracleSql.size} oracles"),
      s"audit did not cover the full oracle map:\n$out")
  }
}
