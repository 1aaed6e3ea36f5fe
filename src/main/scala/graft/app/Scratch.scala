package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness — not part of the API.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
    val small = graft.GraftSession.table(spark, "/root/testdata/sf0.001", "documents")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    // warmups
    noop(graft.functions.Dedup.containmentPairs(small, "doc_id", "text"))
    noop(graft.functions.Dedup.nearDupClusters(small, "doc_id", "text", 0.7))

    t("containment sf0.1") {
      noop(graft.functions.Dedup.containmentPairs(docs, "doc_id", "text"))
    }
    t("containment again") {
      noop(graft.functions.Dedup.containmentPairs(docs, "doc_id", "text"))
    }
    t("clusters sf0.1") {
      noop(graft.functions.Dedup.nearDupClusters(docs, "doc_id", "text", 0.7))
    }
    spark.stop()
  }
}
