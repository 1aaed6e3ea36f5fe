package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Provenance
import graft.serde.ConfluentFraming

/**
 * Kafka edge for production deployment (reference topics,
 * `EffectiveProcessor.java:22-48`). The `kafka` format is resolved at
 * runtime via DataSourceV2 service loading, so this module compiles and
 * ships without the connector on the classpath; deploying against a real
 * cluster means adding `spark-sql-kafka-0-10` to the submit classpath —
 * no code change. The self-contained file edge in graft.app is the
 * in-container testable twin of this module.
 */
object KafkaEdge {

  final case class KafkaConfig(
      bootstrapServers: String = sys.env.getOrElse("BOOTSTRAP_SERVERS", "localhost:9092"),
      startingOffsets: String = "earliest")

  /** Topic names mirroring the public JAWS deployment (SURVEY §1.3). */
  object Topics {
    val Actions = "alarm-actions"
    val Instances = "alarms"
    val Activations = "alarm-activations"
    val Overrides = "alarm-overrides"
    val EffectiveRegistrations = "effective-registrations"
    val EffectiveNotifications = "effective-notifications"
    val EffectiveAlarms = "effective-alarms"
  }

  /**
   * S1/S2 source: raw keyed records of a topic with Confluent-framed Avro
   * values unframed into (key, schema_id, payload, partition, offset,
   * timestamp, headers). `seq` is the per-partition offset — the ordering
   * key every stateful operator folds by.
   */
  def readChangelog(spark: SparkSession, cfg: KafkaConfig, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("includeHeaders", "true")
      .load()
      .select(
        col("key").cast("string").as("name"),
        col("partition"),
        col("offset").as("seq"),
        col("timestamp"),
        (col("value").isNull).as("tombstone"),
        when(col("value").isNotNull && ConfluentFraming.isFramed(col("value")),
          ConfluentFraming.schemaId(col("value"))).as("schema_id"),
        when(col("value").isNotNull && ConfluentFraming.isFramed(col("value")),
          ConfluentFraming.payload(col("value"))).as("payload"),
        col("headers"))

  /**
   * S3/S5 sink: frame the Avro payload, stamp provenance headers, write
   * keyed records (null payload = tombstone).
   */
  def writeChangelog(
      df: DataFrame, // (name: string, payload: binary nullable, schema_id: int)
      cfg: KafkaConfig,
      topic: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    Provenance.withHeaders(
      df.select(
        col("name").cast("string").as("key"),
        when(col("payload").isNotNull,
          ConfluentFraming.frame(col("payload"), col("schema_id"))).as("value")))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", topic)
      .option("includeHeaders", "true")
      .option("checkpointLocation", checkpoint)
}
