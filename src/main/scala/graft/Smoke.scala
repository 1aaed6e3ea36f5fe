package graft

import org.apache.spark.sql.SparkSession

/**
 * Mimics the driver's smoke check: a BARE SparkSession (none of our configs)
 * calling SparkEntry.entry, expecting rows > 0. Guards against code that
 * only works under GraftSession-created sessions.
 */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    df.show(5, truncate = false)
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
