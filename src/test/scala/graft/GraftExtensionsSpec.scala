package graft

import org.apache.spark.sql.{GraftExtensionsBridge, SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("GraftExtensions injects graft_dot as a SQL-resolvable native function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyTo(ext, spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(got == 32.0)
    // Registered like a built-in: visible to the catalog's function listing.
    assert(spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).contains("graft_dot"))
  }

  test("GraftExtensions injects graft_sorted_intersect as SQL-resolvable") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyTo(ext, spark)
    val got = spark.sql(
      "SELECT graft_sorted_intersect(array(1, 3, 5, 9), array(2, 3, 5, 8)) AS n")
      .collect().head.getLong(0)
    assert(got == 2L)
    assert(spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0))
      .contains("graft_sorted_intersect"))
    // The sortedness PRECONDITION must reach SQL users who can't read the
    // Scaladoc: DESCRIBE FUNCTION carries the warning that unsorted input
    // silently undercounts.
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED graft_sorted_intersect")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("sorted ascending"), s"usage text missing: $desc")
    assert(desc.contains("silently undercounts"), s"warning missing: $desc")
  }

  test("graft_dot via extensions rejects wrong arity with the standard error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyTo(ext, spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot"))
  }
}
