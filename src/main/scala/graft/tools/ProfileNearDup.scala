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
    val sh = docs.select(col("doc_id").as("doc"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
    time("shingles count")(println(sh.count()))
    val shCached = sh.cache(); shCached.count()
    time("signatures") {
      val s = Dedup.signatures(shCached, "doc", "sh")
      s.write.format("noop").mode("overwrite").save(); s
    }
    val cands = time("lsh candidates")(
      { val c = Dedup.lshCandidates(shCached, "doc", "sh").cache(); println("cands=" + c.count()); c })
    time("verify join") {
      val a = shCached.withColumnRenamed("doc", "id_a").withColumnRenamed("sh", "sh_a")
      val b = shCached.withColumnRenamed("doc", "id_b").withColumnRenamed("sh", "sh_b")
      val out = cands.join(a, "id_a").join(b, "id_b")
        .withColumn("j", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("j") >= 0.7)
      println("pairs=" + out.count())
    }
    spark.stop()
  }
}
