package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/**
 * Dump `.explain("formatted")` for declared queries to files — the
 * committed plan evidence (plans/r17/<query>_<suffix>.txt). Run:
 *
 *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> [q1 q2 ...]"
 *
 * No jobs are executed for pure plans; queries whose CONSTRUCTION runs
 * eager work (bpeTrain's dictionary collect, the bin-artifact exports)
 * still pay that work to build the final frame — acceptable here, this
 * tool is for evidence capture, not timing.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [queries]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSet
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "plan-dump")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names(name)) {
        try graft.GraftCaches.scoped {
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] $name -> ${name}_$suffix.txt")
        } catch {
          case e: Throwable =>
            println(s"[plandump] $name FAILED: ${e.toString.take(160)}")
        } finally {
          graft.GraftCaches.clearAll()
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
