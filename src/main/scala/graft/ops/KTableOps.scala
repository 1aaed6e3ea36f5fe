package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Changelog-table ("KTable") primitives — S1 in SURVEY.md §2.1.
 *
 * A changelog is a DataFrame of upserts/deletes: key columns, a monotonically
 * increasing sequence column (Kafka (partition, offset) analogue; here any
 * totally-ordered column such as an event id), value columns, and deletes
 * expressed as an all-null value (a "tombstone" indicator column).
 *
 * Scale notes: `latestByKey` is ONE shuffle implemented as a hash aggregate
 * over `max_by(struct(values), seq)` — partial aggregation runs map-side, so
 * at 100 TB each executor reduces its own partitions to one candidate row per
 * key before anything crosses the network. This beats the classic
 * `row_number() over (partition by ... order by ...) = 1` window formulation,
 * which shuffles EVERY row and then sorts each partition. No skew concern:
 * keys are alarm names / user ids with bounded per-key fan-in after map-side
 * combine.
 */
object KTableOps {

  /**
   * Latest record per key by `ordCols` (lexicographic when several).
   * Keeps the full row, including tombstones — callers that want "current
   * table" semantics should follow with [[dropTombstones]].
   */
  def latestByKey(df: DataFrame, keyCols: Seq[String], ordCols: Seq[String]): DataFrame = {
    val ord: Column =
      if (ordCols.sizeIs == 1) col(ordCols.head)
      else struct(ordCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(df.columns.map(col): _*), ord).as("__row"))
      .select(col("__row.*"))
  }

  /** Compacted-table view: latest per key, deletes applied. */
  def latestTable(
      df: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      tombstoneCol: String): DataFrame =
    latestByKey(df, keyCols, ordCols).filter(!col(tombstoneCol)).drop(tombstoneCol)
}
