package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, the latest right row with the
 * same key and timestamp <= (or strictly <, when `strict`) the left row's.
 * The point-in-time join every feature/training pipeline needs; absent
 * from both the reference and Spark's built-ins.
 *
 * Implemented by composition (preference (a) of the custom-operator
 * ladder): tag + union both sides, ONE window pass per key ordered by
 * (ts, tag) carrying the last-seen right payload, then keep left rows.
 * That is a single shuffle on the key — no range-join row explosion, no
 * per-key collect; skew behaves like any window (salt upstream if one key
 * dominates).
 *
 * Inputs must not share column names (prefix the right side). Ties: with
 * `strict` a right row at exactly the left timestamp is NOT matched;
 * otherwise it is.
 */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.filterNot(c => keyCols.contains(c) || c == leftTs)
    val rightCols = right.columns.filterNot(keyCols.contains)

    // At equal ts the right row must sort before the left row to be
    // visible (non-strict), after it to be hidden (strict).
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)

    val leftStruct = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rightStruct = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(leftTag).as("__tag"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rightStruct).as("__r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rightTag).as("__tag"),
        lit(null).cast(leftStruct).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(
        keyCols.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
