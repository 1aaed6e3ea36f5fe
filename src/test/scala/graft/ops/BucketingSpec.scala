package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/**
 * Bucketing = the ahead-of-time shuffle: tables written bucketed by the
 * join key join WITHOUT any Exchange (the 100 TB pattern for fact-fact
 * joins that would otherwise shuffle terabytes per query). Asserted on
 * the physical plan, not just the result.
 */
class BucketingSpec extends AnyFunSuite {

  // getOrCreate may return a session shared with other suites, whose
  // builder configs are frozen — set what we need as runtime confs.
  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  /** Disable broadcast within `body` so colocation is actually exercised. */
  private def withNoBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero shuffles and matches the plain join") { withNoBroadcast {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = GraftSession.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")

    // A previous JVM's run may have left the managed locations on disk
    // while this session's catalog has no such tables — clear both sides.
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists) rm(loc)
    }

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == expected.count())
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
  } }

  test("group-by on the bucket key aggregates without a shuffle") { withNoBroadcast {
    val agg = spark.table("li_bucketed").groupBy("l_orderkey")
      .agg(sum("l_extendedprice"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n$plan")
    assert(agg.count() > 0)
  } }
}
