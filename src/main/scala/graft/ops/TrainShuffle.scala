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
}
