package graft.tools

import graft.{GraftSession, SparkEntry}

/**
 * Prints the formatted physical plan per query plus a one-line audit:
 * #Exchanges (shuffles), broadcast joins, parquet pushdown evidence.
 * Run after changing any operator — the plan IS the product at 100 TB.
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plan-audit")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.drop(1).toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          val exchanges = "Exchange".r.findAllIn(plan).length -
            "BroadcastExchange".r.findAllIn(plan).length
          val bcasts = "BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(plan).length
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val scans = "FileScan parquet".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          // Plan branches served from a persisted frame: a FileScan nested
          // under InMemoryRelation prints once per branch but EXECUTES once
          // (cache fill); cachedScans counts the reuse points.
          val cached = "InMemoryTableScan".r.findAllIn(plan).length
          println(s"[audit] $name: shuffles=$exchanges broadcastJoins=$bcasts " +
            s"sortMergeJoins=$smj parquetScans=$scans scansWithPushedFilters=$pushed " +
            s"cachedScans=$cached")
          if (only.nonEmpty) println(df.queryExecution.toString)
        } catch {
          case e: Throwable => println(s"[audit] $name: FAILED ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
