package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic global shuffle for training-data export.
 *
 * Training runs need the corpus in a reproducible pseudo-random order,
 * sharded for parallel readers. The scale-correct shape is NOT a global
 * `orderBy(rand())` (one total sort, non-reproducible) and NOT a
 * `row_number` over few shards (low-cardinality window = one reducer per
 * shard): it is a pure per-row assignment — shard = md5-hash(id) mod S,
 * sort_key = md5(id || salt) — followed by `repartition(shard)` +
 * `sortWithinPartitions(sort_key)` at write time, which Spark executes as
 * one hash exchange with a per-partition (not global) sort. Both columns
 * are engine-portable md5 derivations (no rand(), no murmur3), so any
 * engine reproduces the exact same order.
 */
object TrainShuffle {

  /** 28-bit md5 hash of a string column (engine-portable, mirrors
    * Dedup.shingleHash). */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /**
   * Pure assignment: (id columns..., shard, sort_key). `salt` varies the
   * permutation between epochs while keeping each epoch reproducible.
   */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "shuf"): DataFrame = {
    require(numShards > 0, s"shardAssign: numShards must be positive, got $numShards")
    df.withColumn("shard",
        h28(concat(col(idCol).cast("string"), lit(":" + salt + ":shard"))) % numShards)
      .withColumn("sort_key",
        md5(concat(col(idCol).cast("string"), lit(":" + salt + ":ord"))))
  }

  /**
   * The physical shuffle: one hash exchange on `shard`, then a
   * per-partition sort on (shard, sort_key) — no global sort, no window,
   * no driver involvement. Hash partitioning keeps every shard WHOLE in
   * exactly one partition (several shards may share a partition; the
   * leading sort column keeps each contiguous), so a
   * `.write.partitionBy("shard")` emits one deterministically-ordered
   * file sequence per shard.
   */
  def shuffled(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "shuf"): DataFrame =
    shardAssign(df, idCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))

  /**
   * Sequence packing for pretraining export (GPT-style concat-and-chunk):
   * documents are laid out in the deterministic shuffle order within each
   * shard, separated by one end-of-document token, and the resulting
   * token stream is cut into fixed `budget`-token training sequences —
   * documents straddle sequence boundaries, so no padding is wasted.
   * Emits per doc: its shard, token count, starting offset in the shard's
   * token stream, and the first/last sequence index it occupies.
   *
   * The cumulative offset is a window sum partitioned by shard. That is a
   * per-shard sequential pass BY DESIGN — packing defines a total order
   * inside each shard — and it scales because `numShards` scales with the
   * corpus (one shard ~ one bounded training file: at 100 TB you run tens
   * of thousands of shards, so no reducer ever sees more than a file's
   * worth of rows). The hazard is only the fixed-tiny-cardinality window
   * over an unbounded partition (see ops.TopN), which this is not.
   *
   * `tokensCol` (the MODEL-token hook): empty (default) budgets in
   * whitespace tokens of `textCol`; a column name budgets in THAT
   * column's caller-supplied counts instead — e.g. a trained subword
   * tokenizer's ([[graft.functions.Bpe.bpeCount]]), which is what a
   * real pretraining export packs by (whitespace counts misestimate a
   * BPE budget by 1.3–2x). When set, `textCol` is ignored and a NULL
   * or negative count fails LOUD (it would silently corrupt every
   * later offset in the shard through the cumulative sum).
   */
  def seqPack(df: DataFrame, idCol: String, textCol: String,
      numShards: Int, budget: Int = 256, salt: String = "shuf",
      tokensCol: String = ""): DataFrame = {
    require(budget > 0, s"seqPack: budget must be positive, got $budget")
    val nTokens =
      if (tokensCol.isEmpty)
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
      else
        when(col(tokensCol).isNull || col(tokensCol) < 0, raise_error(concat(
          lit(s"seqPack: null/negative $tokensCol for ${idCol}="),
          col(idCol).cast("string"),
          lit(" — caller token counts must cover every row"))).cast("long"))
          .otherwise(col(tokensCol).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("sort_key"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    shardAssign(df, idCol, numShards, salt)
      .withColumn("n_tokens", nTokens)
      .withColumn("tok_start", coalesce(sum(col("n_tokens") + 1L).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"tok_start div $budget"))
      .withColumn("seq_last", expr(s"(tok_start + n_tokens - 1) div $budget"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("tok_start"),
        col("seq_first"), col("seq_last"))
  }

  /**
   * Packing-efficiency audit over a [[seqPack]] layout — the
   * observability row a training run reads before shipping shards: per
   * shard, how many documents landed, the token mass, the number of
   * fixed-size sequences the layout occupies, how many docs STRADDLE a
   * sequence boundary (cross-doc attention contamination pressure under
   * concat-and-chunk), and the fill fraction (token mass over sequence
   * capacity; the complement is separator+tail waste). `budget` must be
   * the seqPack call's own.
   *
   * Exactness: counts stay integer; fill_frac is ONE IEEE division of
   * exact integers. Scale shape: ONE map-side-combining groupBy over
   * shard — numShards rows out, no window, no join. split_docs counts
   * seq_last > seq_first (not !=): a zero-token doc at an exact
   * boundary has seq_last < seq_first by the layout arithmetic and
   * straddles nothing.
   *
   * Output: (shard, n_docs, total_tokens, n_seqs, split_docs,
   * fill_frac).
   */
  /**
   * The TRAINER-FACING export artifact: the [[seqPack]] layout
   * materialized as actual fixed-size token-id sequences — per
   * (shard, seq), the `ARRAY<INT>` id slice a pretraining data loader
   * reads, built from a trained tokenizer's
   * [[graft.functions.Bpe.bpeEncodeIds]] output (one stateless
   * broadcast-model encode pass, persisted so the layout branch and the
   * stream branch share it).
   *
   * Stream construction is EXACTLY the layout's arithmetic: each doc's
   * ids occupy absolute positions `[tok_start, tok_start + n)` of its
   * shard's stream and position `tok_start + n` holds one `sepId`
   * end-of-document marker (the `n_tokens + 1` slot the cumulative sum
   * reserves). Sequence k is stream positions `[k*budget, (k+1)*budget)`.
   * Per shard, exactly [[packReport]]'s `n_seqs = max(seq_last) + 1`
   * sequences are emitted — a trailing separator that spills past the
   * last doc token's sequence is trimmed, keeping this artifact and the
   * audit row consistent — and the final sequence is emitted UNPADDED
   * (length <= budget; pad-id policy belongs to the consumer).
   *
   * `sepId` defaults to -1 — deliberately OUTSIDE the vocabulary domain
   * (ids are >= 0, unk = 0) so a separator can never alias a real
   * token; production vocabs with a reserved EOS pass its id.
   *
   * Scale shape: the token-level explode IS the export's inherent cost
   * (every id is written once); it partial-aggregates into
   * budget-bounded (shard, seq) groups on ONE shuffle, the per-shard
   * sequence counts are a numShards-row broadcast, and nothing sorts
   * globally (array_sort orders WITHIN each bounded group).
   */
  def packIdSequences(df: DataFrame, idCol: String, textCol: String,
      model: graft.functions.Bpe.TokenizerModel, numShards: Int,
      budget: Int = 256, salt: String = "shuf", sepId: Int = -1): DataFrame = {
    require(budget > 0, s"packIdSequences: budget must be positive, got $budget")
    require(sepId < 0,
      s"packIdSequences: sepId must be negative (outside the id vocab; " +
        s"unk = 0, tokens > 0) unless your vocab reserves one — got $sepId")
    import graft.GraftCaches.Cacheable
    val enc = graft.functions.Bpe.bpeEncodeIds(df, idCol, textCol, model)
      .graftCached
    val layout = seqPack(enc, "doc_id", "", numShards, budget, salt,
      tokensCol = "n_tokens_bpe")
    val stream = layout
      .join(enc.select(col("doc_id"), col("token_ids")), "doc_id")
      .select(col("shard"), col("tok_start"),
        posexplode(concat(col("token_ids"), array(lit(sepId)))))
      .select(col("shard"), (col("tok_start") + col("pos")).as("abs"),
        col("col").as("id"))
    val nSeqs = layout.groupBy("shard")
      .agg((max(col("seq_last")) + 1L).as("n_seqs"))
    stream.withColumn("seq", expr(s"abs div $budget"))
      .join(broadcast(nSeqs), "shard")
      .filter(col("seq") < col("n_seqs"))
      .groupBy("shard", "seq")
      .agg(array_sort(collect_list(struct(col("abs"), col("id"))))
        .as("pairs"))
      .select(col("shard"), col("seq"),
        transform(col("pairs"), p => p.getField("id")).as("ids"),
        size(col("pairs")).cast("long").as("n_ids"))
  }

  def packReport(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"packReport: budget must be positive, got $budget")
    packed.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (max("seq_last") + 1L).as("n_seqs"),
        sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
          .as("split_docs"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("n_seqs"), col("split_docs"),
        (col("total_tokens").cast("double") /
          (col("n_seqs") * budget).cast("double")).as("fill_frac"))
  }
}
