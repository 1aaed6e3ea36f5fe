package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TableProfileSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val df = Seq(
    (Some(1.0), Some("a")), (Some(2.5), Some("b")), (None, Some("a")),
    (Some(2.5), None), (Some(-3.0), Some("c"))
  ).toDF("x", "s")

  test("exact profile: counts, nulls, distincts, typed min/max per column") {
    val p = TableProfile.profile(df, Seq("x"), Seq("s"), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = p("x"); val s = p("s")
    assert(x.getLong(1) == 5 && x.getLong(2) == 1 && x.getLong(3) == 3)
    assert(x.getDouble(4) == -3.0 && x.getDouble(5) == 2.5)
    assert(x.isNullAt(6) && x.isNullAt(7))
    assert(s.getLong(1) == 5 && s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("approx mode satisfies the 10% HLL bound vs exact (scale-path contract)") {
    val big = spark.range(20000)
      .selectExpr("cast(id % 997 as double) as x", "cast(id % 31 as string) as s")
    val exact = TableProfile.profile(big, Seq("x"), Seq("s"), exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = TableProfile.profile(big, Seq("x"), Seq("s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, e) =>
      assert(math.abs(approx(c) - e) <= 0.1 * e, s"$c: approx ${approx(c)} vs exact $e")
    }
    // NEITHER mode may plan an Expand: the approx mode is one scan of
    // HLL sketches, and the exact mode is a union of single-column
    // aggregates precisely to avoid the k-fold row replication that
    // multiple count(DISTINCT) in one aggregate would plan.
    val approxPlan = TableProfile.profile(big, Seq("x"), Seq("s"))
      .queryExecution.executedPlan.toString
    val exactPlan = TableProfile.profile(big, Seq("x"), Seq("s"), exact = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"))
    assert(!exactPlan.contains("Expand"))
  }

  test("profile refuses a column listed as both numeric and string") {
    // Overlap would duplicate aggregate aliases (ambiguous-reference
    // AnalysisException in approx mode) and duplicate rows in exact mode —
    // fail loudly at the API instead.
    val df = spark.range(10).selectExpr("cast(id as double) as x")
    val e = intercept[IllegalArgumentException] {
      TableProfile.profile(df, Seq("x"), Seq("x"))
    }
    assert(e.getMessage.contains("BOTH"))
  }
}
