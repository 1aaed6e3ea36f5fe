package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.GraftCaches.Cacheable
import graft.functions.{Dedup, Ingest}

/** Where does the `ingest_screen` bench query spend its time? Decomposes
  * the query into the two index builds and the screen, each timed with a
  * cache clear in between, then the composed query as the bench sees it. */
object ProfileIngestScreen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile")
    val dir = "/root/testdata/sf0.1"
    val docs = GraftSession.table(spark, dir, "documents")
    val idxDocs = docs.filter(col("doc_id") % 2 === 1 ||
      col("doc_id") % 4 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("nearDupIndex build") {
        Dedup.nearDupIndex(idxDocs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
      time("chunkIndex build") {
        Dedup.chunkIndex(idxDocs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
      time("screen given prebuilt (cached) indexes") {
        val nd = Dedup.nearDupIndex(idxDocs, "doc_id", "text").graftCached
        val ch = Dedup.chunkIndex(idxDocs, "doc_id", "text").graftCached
        nd.count(); ch.count()
        val t0 = System.nanoTime()
        Ingest.screenBatch(batch, nd, ch, "doc_id", "text", threshold = 0.7)
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
        println(f"[prof]   screen alone: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      graft.GraftCaches.clearAll()
      time("stage: nearDupJoinIndexed over batch") {
        val nd = Dedup.nearDupIndex(idxDocs, "doc_id", "text").graftCached
        nd.count()
        val t0 = System.nanoTime()
        println("  matched=" + Dedup.nearDupJoinIndexed(
          batch, nd, "doc_id", "text", 0.7).count() +
          f" in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      graft.GraftCaches.clearAll()
      time("stage: chunkDedupIndexed over batch") {
        val ch = Dedup.chunkIndex(idxDocs, "doc_id", "text").graftCached
        ch.count()
        val t0 = System.nanoTime()
        println("  rows=" + Dedup.chunkDedupIndexed(
          batch, ch, "doc_id", "text").count() +
          f" in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      graft.GraftCaches.clearAll()
      time("planning only (executedPlan forced, no jobs)") {
        val df = Ingest.screenBatch(batch,
            Dedup.nearDupIndex(idxDocs, "doc_id", "text"),
            Dedup.chunkIndex(idxDocs, "doc_id", "text"),
            "doc_id", "text", threshold = 0.7)
          .orderBy("doc_id")
        val p = df.queryExecution.executedPlan
        println(s"[prof]   plan nodes: ${p.collect { case x => x }.size}")
      }
      graft.GraftCaches.clearAll()
      time("planning only, indexes from parquet (the ingestBatch shape)") {
        val tmp = java.nio.file.Files.createTempDirectory("prof-idx-").toString
        Dedup.nearDupIndex(idxDocs, "doc_id", "text")
          .write.parquet(tmp + "/nd")
        Dedup.chunkIndex(idxDocs, "doc_id", "text")
          .write.parquet(tmp + "/ch")
        graft.GraftCaches.clearAll()
        val t0 = System.nanoTime()
        val df = Ingest.screenBatch(batch,
            spark.read.parquet(tmp + "/nd"),
            spark.read.parquet(tmp + "/ch"),
            "doc_id", "text", threshold = 0.7)
          .orderBy("doc_id")
        df.queryExecution.executedPlan
        println(f"[prof]   parquet-index planning: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[prof]   parquet-index execution: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      graft.GraftCaches.clearAll()
      time("composed query (as bench runs it)") {
        Ingest.screenBatch(batch,
            Dedup.nearDupIndex(idxDocs, "doc_id", "text"),
            Dedup.chunkIndex(idxDocs, "doc_id", "text"),
            "doc_id", "text", threshold = 0.7)
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
      time("composed, decisions cached before orderBy") {
        Ingest.screenBatch(batch,
            Dedup.nearDupIndex(idxDocs, "doc_id", "text"),
            Dedup.chunkIndex(idxDocs, "doc_id", "text"),
            "doc_id", "text", threshold = 0.7)
          .graftCached
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.GraftCaches.clearAll()
    }
    spark.stop()
  }
}
