package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.TextFunctions

/** Where does the `nb_classify` bench query spend its time? Times the
  * token pass, the trained tables, and the full classify twice (cold +
  * warm) with cache clears between stages. */
object ProfileNbClassify {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-nb")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = GraftSession.table(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("token explode + count") {
        docs.select(col("doc_id"), col("source").as("label"),
            explode(TextFunctions.words(col("text"))).as("w"))
          .groupBy("label", "w").count()
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
      time("full nbClassify") {
        val t0 = System.nanoTime()
        val out = TextFunctions.nbClassify(docs, "doc_id", "text", "source")
        println(f"[prof]   plan built: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t1 = System.nanoTime()
        out.queryExecution.executedPlan
        println(f"[prof]   planned: ${(System.nanoTime() - t1) / 1e9}%.2f s")
        out.write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
      time("nbClassify + orderBy (the bench shape)") {
        TextFunctions.nbClassify(docs, "doc_id", "text", "source")
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
    }
    spark.stop()
  }
}
