package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{GraftSession, SparkEntry}

/**
 * Prints the formatted physical plan per query plus a one-line audit:
 * #Exchanges (shuffles), broadcast joins, parquet pushdown evidence.
 * Run after changing any operator — the plan IS the product at 100 TB.
 *
 * [[audit]] is the shared counting core; PlanGateSpec pins golden bounds
 * on these counts for the most expensive queries, so dropping a persist
 * or un-broadcasting a dimension fails CI instead of surfacing as a
 * mystery regression in the next bench.
 */
object PlanAudit {

  /** Plan-shape counts extracted from the (pre-execution) physical plan. */
  final case class Counts(
      shuffles: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      parquetScans: Int,
      scansWithPushedFilters: Int,
      cachedScans: Int,
      mapPartitions: Int) {
    override def toString: String =
      s"shuffles=$shuffles broadcastJoins=$broadcastJoins " +
        s"sortMergeJoins=$sortMergeJoins parquetScans=$parquetScans " +
        s"scansWithPushedFilters=$scansWithPushedFilters " +
        s"cachedScans=$cachedScans mapPartitions=$mapPartitions"
  }

  def audit(df: DataFrame): Counts = {
    val plan = df.queryExecution.executedPlan.toString
    Counts(
      shuffles = "Exchange".r.findAllIn(plan).length -
        "BroadcastExchange".r.findAllIn(plan).length,
      broadcastJoins =
        "BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(plan).length,
      sortMergeJoins = "SortMergeJoin".r.findAllIn(plan).length,
      parquetScans = "FileScan parquet".r.findAllIn(plan).length,
      scansWithPushedFilters =
        "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length,
      // Plan branches served from a persisted frame: a FileScan nested
      // under InMemoryRelation prints once per branch but EXECUTES once
      // (cache fill); cachedScans counts the reuse points.
      cachedScans = "InMemoryTableScan".r.findAllIn(plan).length,
      // Typed mapPartitions nodes — the two-phase top-k rankers' phase-1
      // heap (TopN.partitionTopN) appears as one of these; a gate floor
      // on it catches a revert to the bare per-query window (which would
      // pass every oracle but funnel whole corpora into single tasks).
      mapPartitions = "MapPartitions".r.findAllIn(plan).length)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plan-audit")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.drop(1).toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, dir)
          println(s"[audit] $name: ${audit(df)}")
          if (only.nonEmpty) println(df.queryExecution.toString)
        } catch {
          case e: Throwable => println(s"[audit] $name: FAILED ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
