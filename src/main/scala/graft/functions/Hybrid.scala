package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval fusion — reciprocal-rank fusion (Cormack, Clarke &
 * Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
 * individual Rank Learning Methods") over the engine's two rankers: the
 * lexical BM25 top-k ([[TextFunctions.bm25TopKBatch]]) and the vector
 * IVF top-k ([[IVF.ivfTopK]]). This is the retrieval shape a
 * decontamination / dedup / RAG pipeline actually deploys: lexical
 * recall catches exact-term matches embeddings smooth over, vector
 * recall catches paraphrases BM25 cannot see, and RRF needs no score
 * calibration between the two (ranks only — scores from different
 * rankers are not commensurable).
 *
 * Exactness: the classic formula sums 1/(K + rank); floats would make
 * the sum engine-order-sensitive, so the engine's micro-unit discipline
 * applies — each contribution is the INTEGER `1_000_000 div (K + rank)`
 * and the fused score an exact integer sum (consecutive contributions
 * stay distinct until (K + r)(K + r + 1) exceeds 1e6 — rank ~940 at the
 * default K = 60, far past any top-k cut; ties break on doc_id).
 *
 * Scale shape: both rankers are two-phase top-k by contract, so their
 * outputs are queries x k rows — the fusion is ONE aggregation over a
 * BOUNDED frame (never corpus-sized), and the final rank window
 * partitions a frame of at most queries x (rankers x k) rows. The
 * corpus is scanned only inside the rankers themselves.
 */
object Hybrid {

  /**
   * Fuse bounded per-query rankings by reciprocal rank. Each input
   * frame must carry (query_id, doc_id, rank) with rank 1-based and at
   * most one row per (query_id, doc_id) — i.e. a top-k output, which is
   * what makes the fusion input bounded by contract.
   *
   * Output: (query_id, doc_id, rrf_micro, n_rankers, rank), top `k`
   * per query by (rrf_micro desc, doc_id). `n_rankers` says how many
   * rankers surfaced the doc — the agreement signal a recall audit
   * reads.
   */
  def rrfFuse(ranked: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(ranked.size >= 2,
      s"rrfFuse: fusion needs >= 2 rankers, got ${ranked.size}")
    require(k > 0 && rrfK > 0,
      s"rrfFuse: k and rrfK must be positive, got k=$k rrfK=$rrfK")
    val contrib = ranked.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000L div (${rrfK}L + CAST(rank AS BIGINT))").as("c")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("rrf_micro"), count(lit(1)).as("n_rankers"))
    // The fused frame is bounded (queries x rankers x k), so a plain
    // rank window is safe here — the two-phase TopN guard protects
    // corpus-sized inputs, which this is not by contract.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * The composed hybrid ranker: BM25 and IVF top-`kPer` per query, RRF-
   * fused to the final top `k`. `queries` carries (query_id, terms) —
   * the lexical side's term sets — and the VECTOR side uses the
   * embedding whose `vec_id` equals the query_id (the corpus convention:
   * a document's embedding shares its id, so a query IS a probe
   * document). Self-matches are excluded on the vector side by
   * [[IVF.ivfTopK]]'s own contract and can still surface lexically —
   * the fused list is the caller's place to drop them if unwanted.
   */
  def hybridTopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      embeddings: DataFrame,
      queries: DataFrame, // (query_id, terms)
      k: Int = 10,
      kPer: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val lex = TextFunctions.bm25TopKBatch(corpus, idCol, textCol, queries,
        k = kPer)
      .select(col("query_id").cast("long").as("query_id"),
        col(idCol).cast("long").as("doc_id"), col("rank"))
    val qvecs = embeddings.join(
      queries.select(col("query_id").cast("long").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val vec = IVF.ivfTopK(qvecs, embeddings, k = kPer)
      .select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
    rrfFuse(Seq(lex, vec), k, rrfK)
  }

  /**
   * The RECURRING-pipeline form of [[hybridTopK]] — both rankers served
   * from PERSISTED artifacts (the train-once posture of the model
   * family): the stored [[TextFunctions.Bm25BatchModel]] (union idf +
   * corpus stats + the query set) and the stored [[IVF.IvfIndex]]
   * (quantizer + corpus assignment). Value-identical to the live form
   * by construction — each stored ranker shares its live twin's scoring
   * code path (the `bm25_batch_model` / `ann_ivf_topk_indexed`
   * contracts), and the fusion arithmetic is the same integer RRF. At
   * 100 TB this is the shape that matters: the corpus is never
   * re-scanned for idf training or quantizer assignment per query
   * batch.
   */
  def hybridTopKIndexed(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bm25Model: TextFunctions.Bm25BatchModel,
      index: IVF.IvfIndex,
      queries: DataFrame, // (query_id, terms) — must match the model's set
      k: Int = 10,
      kPer: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val lex = TextFunctions.bm25TopKBatchModel(bm25Model, corpus, idCol,
        textCol, k = kPer)
      .select(col("query_id").cast("long").as("query_id"),
        col(idCol).cast("long").as("doc_id"), col("rank"))
    val qvecs = index.vectors
      .select(col("vec_id"), col("embedding"))
      .join(queries.select(col("query_id").cast("long").as("vec_id")),
        Seq("vec_id"), "left_semi")
    val vec = IVF.ivfTopKIndexed(qvecs, index, k = kPer)
      .select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
    rrfFuse(Seq(lex, vec), k, rrfK)
  }
}
