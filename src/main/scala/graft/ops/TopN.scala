package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * Two-phase distributed per-group top-N.
 *
 * `row_number() OVER (PARTITION BY g ORDER BY ...)` shuffles the ENTIRE
 * input into one reducer task per distinct `g` and sorts it there — fine
 * when `g` has thousands of values, a single-task bottleneck when it has
 * five (market segments, languages): at 100 TB one task receives 20 TB.
 * The fix is the classic two-phase shape (the same discipline as
 * `TakeOrdered` / the IVF training sample): a bounded per-input-partition
 * heap keeps at most n rows per group (phase 1, NO shuffle, O(n·groups)
 * memory per task), and only the survivors — at most n·groups·partitions
 * rows, trivially small — are shuffled and globally ranked (phase 2).
 */
object TopN {

  /**
   * Phase 1: per input partition, keep the `n` smallest rows per group
   * under `ord`. The result is a guaranteed superset of the global
   * per-group top-n (any global top-n row is top-n within its own
   * partition), so an exact rank over the survivors equals the rank the
   * full window would have produced, provided `ord` is a total order
   * (break ties with a unique key).
   */
  def partitionTopN[T, G](ds: Dataset[T], n: Int)(group: T => G)(
      implicit ord: Ordering[T], enc: Encoder[T]): Dataset[T] = {
    require(n > 0, s"partitionTopN: n must be positive, got $n")
    ds.mapPartitions { it =>
      // Max-heap under ord: the worst retained row is at the head, so a
      // better arrival evicts it in O(log n).
      val heaps = mutable.HashMap.empty[G, mutable.PriorityQueue[T]]
      it.foreach { t =>
        val h = heaps.getOrElseUpdate(group(t), mutable.PriorityQueue.empty[T](ord))
        if (h.size < n) h.enqueue(t)
        else if (ord.lt(t, h.head)) { h.dequeue(); h.enqueue(t) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  /**
   * Exact per-query top-k ranking for the ANN operators — the two-phase
   * discipline applied to `(query, candidate, score)` frames: a bare
   * `row_number() OVER (PARTITION BY query)` ships EVERY candidate of a
   * query into one task, which for the brute-force and PQ scans is the
   * whole corpus per query — at 100 TB a handful of query partitions each
   * sorting billions of rows. Phase 1 prunes per input partition with a
   * bounded heap (no shuffle, superset of the global top-k by the
   * [[partitionTopN]] argument); the window then ranks at most
   * k x partitions rows per query. Scores tie-break by candidate id, so
   * the order is total and the ranks equal the unpruned window's exactly.
   *
   * Output: (queryCol, candCol, scoreCol, rank), rank 1..k descending by
   * score — identical schema and values to the window it replaces.
   */
  def topKByQuery(
      scored: DataFrame,
      queryCol: String,
      candCol: String,
      scoreCol: String,
      k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // Best-first = smallest under this ordering. NaN must rank FIRST to
    // mirror Spark's `ORDER BY score DESC` (NaN sorts as the largest
    // double there) — a negate-and-compare ordering would send NaN to
    // the worst end instead and the heap would prune rows the window
    // keeps (zero-norm vectors score NaN cosine).
    implicit val ord: Ordering[(Long, Long, Double)] =
      new Ordering[(Long, Long, Double)] {
        def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
          val s = java.lang.Double.compare(b._3, a._3) // desc, NaN greatest
          if (s != 0) s else java.lang.Long.compare(a._2, b._2)
        }
      }
    val pruned = partitionTopN(
      scored.select(col(queryCol).cast("long"), col(candCol).cast("long"),
        col(scoreCol).cast("double")).as[(Long, Long, Double)], k)(_._1)
      .toDF(queryCol, candCol, scoreCol)
    val w = Window.partitionBy(queryCol).orderBy(col(scoreCol).desc, col(candCol))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(queryCol, candCol, scoreCol, "rank")
  }
}
