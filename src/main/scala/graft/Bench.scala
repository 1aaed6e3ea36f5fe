package graft

import org.apache.spark.sql.SparkSession

/**
 * Bench surface: one JSON line with per-query seconds at SPARK_GRAFT_SF_DIR.
 *
 * Queries are warmed once at sf0.001 (codegen + JIT + catalog caches) so the
 * measured pass reflects execution, not first-compile overhead; results are
 * materialized through the noop sink so every operator actually runs
 * (count() alone lets Catalyst prune projections).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // Warmup at the smallest SF (cheap; compiles every query's codegen)
    SparkEntry.queries.foreach { case (_, fn) =>
      try runOne(fn, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runOne(fn, sfDir)
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
