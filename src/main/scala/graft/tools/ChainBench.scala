package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Dedup

/** Focused A/B probe for clusterEdges staging cost: the 200k-node chain
  * (worst case — 19 star rounds, so per-round overhead dominates). */
object ChainBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "chain-bench")
    val n = 200000L
    val ids = spark.range(n).toDF("id")
    val chain = spark.range(n - 1).select(col("id").as("u"), (col("id") + 1).as("v"))
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val c = Dedup.clusterEdges(ids, chain).select("cluster_id").distinct().count()
      println(f"[chain] run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s (clusters=$c)")
    }
    spark.stop()
  }
}
