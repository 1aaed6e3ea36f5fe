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

    // Optional comma-separated query filter for local iteration
    // (SPARK_GRAFT_ONLY=a,b). Unset = the full driver contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }

    // Warmup at the smallest SF (cheap; compiles every query's codegen)
    queries.foreach { case (_, fn) =>
      try runOne(fn, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }

    // GC before each measured query so a previous query's garbage doesn't
    // land its pause inside this one's timing; two full measured passes
    // with per-query min because single-shot timings on a shared box
    // swing +-40% from GC/page-cache/JIT noise.
    // Errors are tracked PER PASS: a query that fails once but succeeds in
    // the other pass reports the successful pass's time (transient GC/OOM
    // blips shouldn't mark a working query broken); only a query that
    // failed in BOTH passes is flagged and has its time negated.
    def measure(): (Map[String, Double], Map[String, String]) = {
      val errs = scala.collection.mutable.LinkedHashMap[String, String]()
      val times = queries.map { case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        try runOne(fn, sfDir)
        catch { case e: Throwable =>
          errs(name) = e.toString.takeWhile(_ != '\n').take(200)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      (times, errs.toMap)
    }
    val (pass1, errs1) = measure()
    val (pass2, errs2) = measure()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = queries.keys.map { k =>
      val v = (errs1.contains(k), errs2.contains(k)) match {
        case (false, false) => math.min(pass1(k), pass2(k))
        case (false, true)  => pass1(k)
        case (true, false)  => pass2(k)
        case (true, true)   => errors(k) = errs2(k); math.min(pass1(k), pass2(k))
      }
      k -> v
    }.toMap
    // A query crashed in both passes must not masquerade as fast: negate.
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (errors.contains(k)) -v else v)
    }.mkString("{", ",", "}")
    def jstr(s: String) =
      "\"" + s.flatMap(c => if (c == '"' || c == '\\') "\\" + c else c.toString) + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // The driver captures stdout with a bounded tail — rounds 5/6 lost ~10
    // of 77 per-query timings to truncation. The COMPLETE line also lands
    // in a file (overwritten per run) so per-query comparison across
    // rounds never depends on how much tail survived.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
  }
}
