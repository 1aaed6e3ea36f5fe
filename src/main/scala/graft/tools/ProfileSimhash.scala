package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.{Dedup, TextFunctions}

object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-simhash")
    val docs = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm scan")(docs.count())
    time("shingles only") {
      docs.select(col("doc_id"), TextFunctions.shingles(col("text")).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles -> typed roundtrip") {
      import spark.implicits._
      docs.select(col("doc_id").cast("long"), TextFunctions.shingles(col("text")))
        .as[(Long, Seq[String])].map(t => t._1).write.format("noop").mode("overwrite").save()
    }
    time("simhash full")(Dedup.simhash64(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("simhash full again")(Dedup.simhash64(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
