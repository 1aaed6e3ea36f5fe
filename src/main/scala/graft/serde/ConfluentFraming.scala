package graft.serde

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Confluent Schema-Registry wire format (public format: 1 magic byte 0x00 +
 * 4-byte big-endian schema id + Avro payload) as pure Column expressions —
 * the S4 serde edge (reference `SpecificAvroSerde` configuration,
 * `RegistrationRule.java:71-79`) re-expressed so framing/unframing stays
 * inside whole-stage codegen on the Kafka `value` binary column.
 */
object ConfluentFraming {

  /** 4-byte big-endian binary from an int column (hex round trip, codegen'd). */
  private def int32be(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** Frame an Avro payload: magic 0x00 ++ schemaId ++ payload. */
  def frame(payload: Column, schemaId: Column): Column =
    concat(unhex(lit("00")), int32be(schemaId), payload)

  /** True when the value carries the Confluent magic byte. */
  def isFramed(value: Column): Column =
    length(value) >= 5 && hex(substring(value, 1, 1)) === "00"

  /** Schema id of a framed value (int). */
  def schemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")

  /** Avro payload with the 5-byte header stripped. */
  def payload(value: Column): Column =
    value.substr(lit(6), length(value) - 5)
}
