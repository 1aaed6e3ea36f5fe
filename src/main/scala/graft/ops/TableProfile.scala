package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass per-column data profile — the "what is in this table" utility
 * every curation job runs before trusting a new drop of data: row count,
 * null count, distinct count, and min/max per column, computed in a
 * SINGLE aggregate over one scan and unpivoted to a row per column.
 *
 * Distinct counting has two modes with different 100 TB behavior:
 * `exact = false` (the scale default) uses approx_count_distinct (HLL,
 * one pass, no data expansion); `exact = true` uses count(DISTINCT col),
 * which Spark plans through an Expand operator that replicates every row
 * once PER distinct-counted column — exact numbers, k-fold shuffle
 * volume. At scale run approx and bound it; the oracle query runs exact
 * for the value gate plus the approx contract (within 10% of exact, the
 * same invariant approx_distinct pins).
 *
 * Numeric min/max surface as DOUBLE, string min/max as VARCHAR, each
 * null for the other family — engine-portable types only (no
 * reader-dependent DECIMAL/date rendering in the output).
 */
object TableProfile {

  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String],
      exact: Boolean = false,
      rsd: Double = 0.02): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "profile: no columns")
    val all = numericCols ++ stringCols
    // rsd is HLL's relative STANDARD DEVIATION, not a bound — 0.02 keeps
    // 2-sigma error ~4-5% (the default 0.05 misses a 10% bound routinely).
    def nd(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c), rsd)
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ all.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        nd(c).as(s"${c}__nd"))
    } ++ numericCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    } ++ stringCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__smin"), max(col(c)).as(s"${c}__smax"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single row to (column, ...) rows via a literal-name
    // stack; everything below the agg is a 1-row local transform.
    val rows = all.map { c =>
      val isNum = numericCols.contains(c)
      struct(lit(c).as("column"), col("_n").as("n"),
        col(s"${c}__nulls").as("n_null"), col(s"${c}__nd").as("n_distinct"),
        (if (isNum) col(s"${c}__min") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${c}__max") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__smin")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__smax")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
