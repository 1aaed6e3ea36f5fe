package graft.serde

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Activation, AlarmOverride, OverrideType}

class SerdeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("Confluent framing: frame -> unframe round trip preserves payload and schema id") {
    val payloads = Seq(
      (1, Array[Byte](1, 2, 3, -1)),
      (1234567, Array[Byte]()),
      (0, Array.tabulate(64)(_.toByte)))
    val df = payloads.toDF("schema_id", "payload")
    val framed = df.select(
      col("schema_id"),
      col("payload"),
      ConfluentFraming.frame(col("payload"), col("schema_id")).as("framed"))
    val back = framed.select(
      col("schema_id"), col("payload"),
      ConfluentFraming.isFramed(col("framed")).as("ok"),
      ConfluentFraming.schemaId(col("framed")).as("sid"),
      ConfluentFraming.payload(col("framed")).as("p"))
      .as[(Int, Array[Byte], Boolean, Int, Array[Byte])].collect()
    back.foreach { case (sid0, p0, ok, sid, p) =>
      assert(ok)
      assert(sid == sid0)
      assert(p.toSeq == p0.toSeq)
    }
  }

  test("framed value length = payload + 5; unframed garbage detected") {
    val df = Seq(Array[Byte](9, 9)).toDF("payload")
    val n = df.select(length(ConfluentFraming.frame(col("payload"), lit(42))).as("n"))
      .as[Int].head()
    assert(n == 7)
    val bad = Seq(Array[Byte](1, 0, 0, 0, 1, 7)).toDF("v")
      .select(ConfluentFraming.isFramed(col("v"))).as[Boolean].head()
    assert(!bad)
  }

  test("Avro round trip: activation and override records survive encode/decode") {
    val enc = new AlarmAvro.Encoder(AlarmAvro.activationSchema)
    val dec = new AlarmAvro.Decoder(AlarmAvro.activationSchema)
    val acts = Seq(
      Activation("Activation"),
      Activation("NoActivation"),
      Activation("EPICSActivation", sevr = Some("MAJOR"), stat = Some("HIHI")),
      Activation("NoteActivation", note = Some("check pump")))
    acts.foreach { a =>
      assert(AlarmAvro.recordToActivation(dec.decode(enc.encode(AlarmAvro.activationToRecord(a)))) == a)
    }
    val oenc = new AlarmAvro.Encoder(AlarmAvro.overrideSchema)
    val odec = new AlarmAvro.Decoder(AlarmAvro.overrideSchema)
    val ovs = Seq(
      AlarmOverride(OverrideType.Shelved, Some("c"), Some(true), Some(123L), Some("Other")),
      AlarmOverride(OverrideType.Latched),
      AlarmOverride(OverrideType.Disabled, comments = Some("maintenance")))
    ovs.foreach { o =>
      assert(AlarmAvro.recordToOverride(odec.decode(oenc.encode(AlarmAvro.overrideToRecord(o)))) == o)
    }
  }

  test("end-to-end: avro-encoded + confluent-framed column decodes in a mapPartitions pass") {
    val acts = Seq(Activation("Activation"), Activation("NoActivation", note = None))
    val enc = new AlarmAvro.Encoder(AlarmAvro.activationSchema)
    val framedDf = acts.map(a => enc.encode(AlarmAvro.activationToRecord(a))).toDF("payload")
      .select(ConfluentFraming.frame(col("payload"), lit(7)).as("value"))
    val decoded = framedDf
      .select(ConfluentFraming.payload(col("value")).as("p")).as[Array[Byte]]
      .mapPartitions { it =>
        val dec = new AlarmAvro.Decoder(AlarmAvro.activationSchema)
        it.map(b => AlarmAvro.recordToActivation(dec.decode(b)))
      }.collect().toSeq
    assert(decoded == acts)
  }
}
