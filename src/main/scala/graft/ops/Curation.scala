package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftCaches.Cacheable
import graft.functions.{Dedup, TextFunctions}

/**
 * The end-to-end curation manifest — the composition a training-data user
 * actually runs, as ONE reusable operator: quality/language gate ->
 * benchmark decontamination (eval slice held out of the corpus) -> exact
 * dedup -> near-dup removal -> bigram-LM floor -> deterministic shard +
 * sequence packing of the survivors. Every stage is an operator with its
 * own green oracle; `SparkEntry`'s `corpus_curate` query value-checks
 * this composition against DuckDB, and ScaleStress times it at 20x to
 * show the growth curve.
 *
 * Scale shape: each drop set reduces to an id-only frame before ONE
 * union+distinct and ONE anti join; `quality` rides seqPack's own shard
 * exchange via carryCols (round 17), so `survivors` has a single
 * consumer — no persist, no manifest re-join: the five-operator drop
 * pipeline executes exactly once, inside the one seqPack input join.
 */
object Curation {

  /** Output per surviving doc: (doc_id, quality, shard, n_tokens,
    * tok_start, seq_first, seq_last) — the packed-layout manifest. */
  def curate(docs: DataFrame, numShards: Int = 16): DataFrame = {
    // ONE (id, text) frame persisted for all six consumers (docStats,
    // decontaminate, exact dedup, near-dup, LM score, and the final text
    // re-join): each stage otherwise issues its own source scan — six
    // passes over the corpus text instead of one cache fill + five
    // in-memory reads. MEMORY_AND_DISK spills rather than evicts at
    // scale, and GraftCaches.clearAll() reclaims it between jobs.
    val d = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .graftCached
    val gate = TextFunctions.docStats(d, "doc_id", "text").toDF()
      .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      .select(col("doc_id"), col("quality"))
    val deconDrop = Dedup.decontaminate(d, "doc_id", "text")
      .filter(col("contaminated")).select("doc_id")
    val exactDrop = Dedup.exactDedup(d, "doc_id", "text")
      .filter(col("id") =!= col("canonical_id")).select(col("id").as("doc_id"))
    val nearDrop = Dedup.nearDupPairs(d, "doc_id", "text", 0.7)
      .select(col("id_b").as("doc_id")).distinct()
    val lmDrop = Dedup.lmScore(d, "doc_id", "text")
      .filter(when(col("n_bigrams") === 0, lit(true))
        .otherwise(expr("lm_score_micro div n_bigrams") < 32000))
      .select("doc_id")
    val drops = deconDrop.union(exactDrop).union(nearDrop).union(lmDrop)
      .distinct()
    // quality rides seqPack's own exchange (carryCols) — the former
    // corpus-sized re-join of the survivor frame is gone, leaving the
    // survivor frame a single consumer (no persist needed).
    val survivors = gate.filter(col("doc_id") % 97 =!= 0)
      .join(drops, Seq("doc_id"), "left_anti")
    TrainShuffle.seqPack(
        survivors.join(d, Seq("doc_id")), "doc_id", "text",
        numShards = numShards, carryCols = Seq("quality"))
      .select(col("doc_id"), col("quality"), col("shard"), col("n_tokens"),
        col("tok_start"), col("seq_first"), col("seq_last"))
  }
}
