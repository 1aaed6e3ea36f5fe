package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.{Dedup, TextFunctions}

object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile")
    val dir = "/root/testdata/sf0.1"
    val docs = GraftSession.table(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingle sets") {
      Dedup.shingleSets(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures") {
      Dedup.signatures(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("lsh candidates")(
      println("cands=" + Dedup.lshCandidates(docs, "doc_id", "text").count()))
    time("full nearDupPairs")(
      println("pairs=" + Dedup.nearDupPairs(docs, "doc_id", "text", 0.7).count()))
    spark.stop()
  }
}
