package graft.app

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.{Dedup, IVF}

/**
 * The COMPLETE incremental-ingestion loop executed end-to-end across all
 * three persisted index families — the round-7 capability tied together:
 *
 *   per batch: 1. NEAR-DUP screen against the stored minhash index
 *              2. EXACT-SUBSTRING screen against the stored chunk counts
 *                 (content-defined chunks, so shifted boilerplate counts)
 *              3. accepted docs append to BOTH text indexes, their
 *                 embeddings to the IVF vector index — every append
 *                 IDEMPOTENT (a crashed loop's retry re-runs the whole
 *                 batch safely)
 *
 * The corpus is never re-shingled, re-chunked, re-assigned, or re-read:
 * each batch pays only its own size plus index scans. Asserts every
 * accept/reject decision, the retry no-ops, and that a later vector
 * query retrieves an appended embedding.
 */
object FullIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Files.createTempDirectory("full-ingest-").toString
    val ndDir = base + "/neardup"
    val chDir = base + "/chunks"
    val ivfDir = base + "/ivf"

    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    def vecOf(seed: Int): Array[Float] =
      Array.tabulate(8)(d => math.sin(seed * 3 + d).toFloat)

    val boiler = "all rights reserved corpus contact us for terms boundary"
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = s"spark is a distributed engine that runs queries in parallel $boiler"

    // ---- bootstrap: batch 1 seeds all three indexes -----------------------
    val batch1 = docs(1L -> a, 2L -> b)
    Dedup.indexAppend(batch1, "doc_id", "text", ndDir)
    Dedup.chunkIndexAppend(batch1, "doc_id", "text", chDir, "epoch-1")
    IVF.buildIvfIndex(
      Seq(1L -> vecOf(1), 2L -> vecOf(2)).toDF("vec_id", "embedding"),
      nlist = 1).write(ivfDir)

    // ---- the per-batch screen+append loop ---------------------------------
    def ingest(batch: DataFrame, embeddings: Map[Long, Array[Float]],
        epoch: String): Set[Long] = {
      // 0. retry semantics: a doc id already in the index WAS ingested —
      //    report it accepted without re-screening (its own chunks are in
      //    the chunk index now and would reject it as a "duplicate").
      val already = spark.read.parquet(ndDir).select($"doc".as("doc_id"))
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
        .as[Long].collect().toSet
      val toScreen = batch.filter(!$"doc_id".isin(already.toSeq: _*))
      // 1. near-dup screen (banded minhash against stored signatures)
      val afterNd = Dedup.ingestDedupIndexed(
        toScreen, spark.read.parquet(ndDir), "doc_id", "text", threshold = 0.7)
      // 2. exact-substring screen: reject docs whose chunks are mostly
      //    already-seen (here: ANY stored chunk — maxDf 1 — and a
      //    majority of the doc's chunks duplicated)
      val screened = Dedup.chunkDedupIndexed(
        afterNd, Dedup.chunkIndexRead(spark, chDir), "doc_id", "text")
      val kept = screened
        .filter(col("n_chunks") === 0L ||
          col("n_dup").cast("double") / col("n_chunks") < 0.5)
        .select("doc_id").as[Long].collect().toSet ++ already
      val accepted = batch.filter($"doc_id".isin(kept.toSeq: _*))
      // 3. idempotent appends to all three indexes
      Dedup.indexAppend(accepted, "doc_id", "text", ndDir)
      Dedup.chunkIndexAppend(accepted, "doc_id", "text", chDir, epoch)
      val emb = kept.toSeq.sorted.flatMap(id =>
        embeddings.get(id).map(v => (id, v)))
      if (emb.nonEmpty)
        IVF.indexAppend(emb.toDF("vec_id", "embedding"), ivfDir)
      graft.GraftCaches.clearAll()
      kept
    }

    // ---- batch 2: one near-dup (rejected by minhash), one boilerplate
    //      copy at a SHIFTED offset (rejected by the CDC chunk screen —
    //      fixed windows would have missed it), one novel doc ------------
    val batch2 = docs(
      4L -> a.replace("bank", "bend"),      // near-dup of doc 1
      5L -> s"zzz zz $boiler",              // boilerplate shifted 2 tokens
      6L -> "an entirely novel report about the weather and the harvest")
    val kept2 = ingest(batch2, Map(6L -> vecOf(6)), "epoch-2")
    assert(kept2 == Set(6L), s"batch 2: $kept2")

    // Retry of the whole batch (crash recovery): every append no-ops.
    val ndRows = spark.read.parquet(ndDir).count()
    val chTotal = Dedup.chunkIndexRead(spark, chDir)
      .agg(org.apache.spark.sql.functions.sum("df_cnt")).collect()(0).getLong(0)
    val kept2retry = ingest(batch2, Map(6L -> vecOf(6)), "epoch-2")
    assert(kept2retry == Set(6L), s"retry decisions changed: $kept2retry")
    assert(spark.read.parquet(ndDir).count() == ndRows, "retry grew nd index")
    assert(Dedup.chunkIndexRead(spark, chDir)
      .agg(org.apache.spark.sql.functions.sum("df_cnt")).collect()(0).getLong(0)
      == chTotal, "retry grew chunk index")
    assert(spark.read.parquet(ivfDir + "/vectors").count() == 3,
      "retry grew vector index")

    // ---- batch 3: a near-dup of the batch-2 ACCEPTED doc is rejected
    //      purely via the appended rows; a vector query finds doc 6's
    //      appended embedding ------------------------------------------------
    val kept3 = ingest(docs(
      7L -> "an entirely novel report about the weather and the harvests",
      8L -> "completely fresh content on training pipelines and shuffles"),
      Map(8L -> vecOf(8)), "epoch-3")
    assert(kept3 == Set(8L), s"batch 3 (7 must fail via the APPEND): $kept3")

    val idx = IVF.IvfIndex.read(spark, ivfDir)
    val hit = IVF.ivfTopKIndexed(
        Seq(100L -> vecOf(6)).toDF("vec_id", "embedding"), idx, k = 1)
      .select("cand_id").as[Long].collect()
    assert(hit.headOption.contains(6L),
      s"appended embedding must be retrievable: ${hit.toSeq}")

    println("[demo] FullIngestDemo PASS: minhash + CDC-chunk + vector " +
      "indexes screened and appended idempotently across three batches; " +
      "shifted boilerplate rejected, retry no-oped, appended vector " +
      "retrieved")
    spark.stop()
  }
}
