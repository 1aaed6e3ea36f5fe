package graft.app

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Dedup

/**
 * The INCREMENTAL ingestion loop executed end-to-end on the persisted
 * near-dup index — the scenario [[graft.functions.Dedup.nearDupIndex]]
 * exists for: the corpus-side cost is paid once per document EVER (at
 * index time), not once per batch.
 *
 *   batch 1 -> index built, written to parquet
 *   batch 2 -> screened against the STORED index (no batch-1 re-shingle);
 *              accepted docs' index rows APPENDED
 *   batch 3 -> screened against the grown index: a near-dup of a batch-2
 *              doc is rejected PURELY via the appended rows, a near-dup
 *              of a batch-1 doc via the original rows, novel docs pass
 *
 * Asserts every decision, including the one only the append can make.
 */
object IncrementalIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val idxDir = Files.createTempDirectory("ndidx-inc-").toString + "/index"
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    def screen(batch: DataFrame): Set[Long] = {
      val kept = Dedup.ingestDedupIndexed(
          batch, spark.read.parquet(idxDir), "doc_id", "text", threshold = 0.7)
        .select("doc_id").as[Long].collect().toSet
      // Accepted docs join the index NOW via the idempotent append
      // operator — one fused pass over the batch only; the existing index
      // contributes just a doc-id scan to the no-double-index anti-join.
      Dedup.indexAppend(batch.filter($"doc_id".isin(kept.toSeq: _*)),
        "doc_id", "text", idxDir)
      graft.GraftCaches.clearAll() // drop the per-screen operator caches
      kept
    }

    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "spark is a distributed engine that runs queries in parallel over a cluster"
    val d = "an entirely novel report about the weather and the harvest this year"

    // Batch 1 bootstraps the index — indexAppend creates the directory.
    val batch1 = docs(
      1L -> a,
      2L -> b,
      3L -> "completely different text on alarm processing and overrides")
    val n1 = Dedup.indexAppend(batch1, "doc_id", "text", idxDir)
    assert(n1 == 3, s"bootstrap append: $n1")
    // IDEMPOTENCE: re-appending the same batch (a crashed loop's retry)
    // is a no-op — 0 rows appended, index contents unchanged.
    val n1b = Dedup.indexAppend(batch1, "doc_id", "text", idxDir)
    assert(n1b == 0, s"re-append must no-op, appended $n1b")
    assert(spark.read.parquet(idxDir).count() == 3, "retry double-indexed")

    // Batch 2: near-dup of batch-1 doc rejected, two novel docs accepted.
    val kept2 = screen(docs(
      4L -> a.replace("bank", "bend"), // near-dup of doc 1
      5L -> d,                         // novel -> accepted + indexed
      6L -> "fresh content about training data pipelines and shuffles"))
    assert(kept2 == Set(5L, 6L), s"batch 2: $kept2")

    // Batch 3: doc 7 duplicates BATCH-2 doc 5 — rejectable only through
    // the appended index rows; doc 9 duplicates batch-1 doc 2; doc 8 novel.
    val kept3 = screen(docs(
      7L -> d.replace("year", "season"), // near-dup of appended doc 5 (one
                                         // trailing-word edit: jaccard ~0.82)
      8L -> "yet another unrelated document with its own vocabulary entirely",
      9L -> b.replace("cluster", "fleet")))   // near-dup of original doc 2
    assert(kept3 == Set(8L), s"batch 3 (7 must fail via the APPEND): $kept3")

    val indexed = spark.read.parquet(idxDir).select("doc").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 3L, 5L, 6L, 8L), s"index contents: $indexed")

    println("[demo] IncrementalIngestDemo PASS: bootstrap re-append no-oped, " +
      "batch-2 near-dup rejected via stored index, batch-3 near-dup " +
      "rejected via APPENDED rows, index = " +
      indexed.toSeq.sorted.mkString(","))
    graft.GraftCaches.clearAll() // leave no dead frames registered
    spark.stop()
  }
}
