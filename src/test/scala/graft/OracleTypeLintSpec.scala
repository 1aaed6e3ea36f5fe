package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/**
 * Oracle output-type lint, wired into `sbt test`.
 *
 * The driver hashes pandas-rendered DuckDB output; an uncast sum(int) types
 * as HUGEINT (int128) which pandas renders as float64, so `250` hashes as
 * `250.0` and the row mismatches even when values are bit-equal (round-9
 * span_screen — the ONLY red row of the round, and invisible to the local
 * strict gate because it VARCHAR-casts before comparing). This spec renders
 * every oracle (static + dynamic) and shells out to
 * `tools/oracle_type_lint.py`, which DESCRIBEs each query in DuckDB and
 * fails on HUGEINT/UHUGEINT/DECIMAL in the final schema. DuckDB only exists
 * on the Python side here (driver tooling), hence the subprocess; if the
 * interpreter or module is absent the test cancels rather than green-washes.
 */
class OracleTypeLintSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // The ONE escaper Verify.main's dump uses — shared, not mirrored, so
  // the lint always DESCRIBEs exactly what the driver's json.load sees.
  private def jq(s: String): String = Verify.jsonEscape(s)

  test("every oracle's final output schema is free of lossy DuckDB types") {
    val py = new ProcessBuilder("python3", "-c", "import duckdb")
      .redirectErrorStream(true).start()
    assume(py.waitFor() == 0, "python3+duckdb unavailable; lint runs driver-side only")

    val dynamic = SparkEntry.dynamicOracleSql(spark, sf)
    val all = SparkEntry.oracleSql ++ dynamic
    val json = all.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempDirectory("oracle_lint")
    val path = tmp.resolve("oracle_sql.json")
    Files.writeString(path, json)

    val proc = new ProcessBuilder(
      "python3", "tools/oracle_type_lint.py", sf, path.toString)
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    val failing = out.linesIterator.filter(_.startsWith("FAIL")).toSeq
    assert(rc == 0, s"oracle type lint failed:\n${failing.mkString("\n")}")
  }
}
