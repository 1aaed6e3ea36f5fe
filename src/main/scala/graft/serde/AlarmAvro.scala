package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import graft.model._

/**
 * Avro codec for the alarm entities over avro-core (the spark-avro module
 * is not on this classpath, so from_avro/to_avro are unavailable; encode/
 * decode runs as a batched mapPartitions transform at the Kafka edge
 * instead — same place the reference pays its serde cost).
 *
 * Schemas mirror the jaws-libj field sets observed in the reference
 * (SURVEY.md §1.2); unions are flattened the same way as graft.model.
 */
object AlarmAvro {

  val activationSchemaJson: String =
    """{"type":"record","name":"Activation","fields":[
      |{"name":"union","type":"string"},
      |{"name":"note","type":["null","string"],"default":null},
      |{"name":"sevr","type":["null","string"],"default":null},
      |{"name":"stat","type":["null","string"],"default":null}]}""".stripMargin

  val overrideSchemaJson: String =
    """{"type":"record","name":"AlarmOverride","fields":[
      |{"name":"overrideType","type":"string"},
      |{"name":"comments","type":["null","string"],"default":null},
      |{"name":"oneshot","type":["null","boolean"],"default":null},
      |{"name":"expiration","type":["null","long"],"default":null},
      |{"name":"reason","type":["null","string"],"default":null}]}""".stripMargin

  private def parse(json: String) = new Schema.Parser().parse(json)

  lazy val activationSchema: Schema = parse(activationSchemaJson)
  lazy val overrideSchema: Schema = parse(overrideSchemaJson)

  /** Reusable per-partition encoder (binary Avro, no container header). */
  final class Encoder(schema: Schema) extends Serializable {
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    def encode(rec: GenericRecord): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }
  }

  final class Decoder(schema: Schema) extends Serializable {
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    def decode(bytes: Array[Byte]): GenericRecord =
      reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
  }

  def activationToRecord(a: Activation): GenericRecord = {
    val r = new GenericData.Record(activationSchema)
    r.put("union", a.union)
    a.note.foreach(r.put("note", _))
    a.sevr.foreach(r.put("sevr", _))
    a.stat.foreach(r.put("stat", _))
    r
  }

  def recordToActivation(r: GenericRecord): Activation = {
    def s(f: String): Option[String] = Option(r.get(f)).map(_.toString)
    Activation(r.get("union").toString, s("note"), s("sevr"), s("stat"))
  }

  def overrideToRecord(o: AlarmOverride): GenericRecord = {
    val r = new GenericData.Record(overrideSchema)
    r.put("overrideType", o.overrideType)
    o.comments.foreach(r.put("comments", _))
    o.oneshot.foreach(v => r.put("oneshot", java.lang.Boolean.valueOf(v)))
    o.expiration.foreach(v => r.put("expiration", java.lang.Long.valueOf(v)))
    o.reason.foreach(r.put("reason", _))
    r
  }

  def recordToOverride(r: GenericRecord): AlarmOverride = {
    def s(f: String): Option[String] = Option(r.get(f)).map(_.toString)
    AlarmOverride(
      r.get("overrideType").toString,
      s("comments"),
      Option(r.get("oneshot")).map(_.asInstanceOf[Boolean]),
      Option(r.get("expiration")).map(_.asInstanceOf[Long]),
      s("reason"))
  }
}
