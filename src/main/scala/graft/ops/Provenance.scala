package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * S5 provenance headers (reference `ProcessingRule.java:74-86`): every
 * output record is stamped with user/producer/host headers. On the Kafka
 * sink this is the `headers array<struct<key:string,value:binary>>` column
 * written with `kafka.includeHeaders=true`; computed once per job as
 * literals (the reference resolves them once at rule construction too).
 */
object Provenance {

  def headerArray(
      user: String = sys.props.getOrElse("user.name", "unknown"),
      producer: String = "graft-effective-processor",
      host: String = java.net.InetAddress.getLocalHost.getHostName): Column =
    array(
      struct(lit("user").as("key"), encode(lit(user), "utf-8").as("value")),
      struct(lit("producer").as("key"), encode(lit(producer), "utf-8").as("value")),
      struct(lit("host").as("key"), encode(lit(host), "utf-8").as("value")))

  /** Stamp the standard provenance headers column onto an output DataFrame. */
  def withHeaders(df: DataFrame): DataFrame =
    df.withColumn("headers", headerArray())
}
