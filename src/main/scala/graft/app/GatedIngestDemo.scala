package graft.app

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.Ingest

/**
 * The STREAM-NATIVE ingestion loop with the full gate stack armed —
 * [[graft.functions.Ingest.ingestSink]] under a file "topic" with the
 * structural-quality (Gopher), boilerplate (span-index), and SAMPLING
 * (importance-draw) gates on, and the recovery contract exercised ON
 * the gated decisions: Structured Streaming replays a failed
 * micro-batch under the SAME batch id, so a `rejected_quality` /
 * `rejected_boilerplate` / `rejected_sampled` decision must reproduce
 * identically on replay while every append no-ops (epoch-marker skip).
 *
 * Scenario (dupRatio disarms the chunk screen so each rejection is
 * attributable to exactly one gate — the IngestSpec span-gate pattern):
 *   batch 0 seeds two gopher-passing docs (one carries passage P) —
 *           both accepted, spans appended;
 *   batch 1 offers a junk doc (fails the Gopher rules →
 *           rejected_quality), an assembled-boilerplate doc (mostly P,
 *           but below the near-dup threshold → rejected_boilerplate,
 *           the smeared-reuse case only the span gate catches), a
 *           zero-score doc (gopher-clean and novel, but the importance
 *           draw never keeps score 0 → rejected_sampled), and a novel
 *           full-score doc (accepted);
 *   replay  of batch 1 through the sink under the same id reproduces
 *           both rejections, flips the acceptance to accepted_prior,
 *           and appends nothing anywhere.
 */
object GatedIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("gated-ingest-")
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val nd = s"$root/nd"; val ch = s"$root/chunks"; val sp = s"$root/spans"

    // Passage P: 60 tokens, stopword-rich, all-alpha — every doc built
    // on it passes the Gopher rules on its own structure.
    val passage = (1 to 10).map(i => s"the field$i of the delta region")
      .mkString(" ")
    val doc1 = s"$passage plus a perfectly original closing thought " +
      "composed here today for the record with some extra remarks about " +
      "local sports teams"
    val doc2 = (1 to 10).map(i => s"a plain note on the orchard$i yields")
      .mkString(" ")
    val junk = "short junk ###"
    val assembled = s"$passage and nothing else of real substance beyond " +
      "this brief trailing remark appended now quickly before the " +
      "morning deadline arrives soon"
    val novel = (1 to 10).map(i => s"a fresh report on the harvest$i outcomes")
      .mkString(" ")
    val sampled = (1 to 10).map(i => s"the clean survey of the meadow$i flora")
      .mkString(" ")

    val reports = ArrayBuffer.empty[(Long, Map[Long, String], Long, Long, Long)]
    val sink: (DataFrame, Long) => Unit = Ingest.ingestSink(
      "doc_id", "text", nd, ch,
      dupRatio = 2.0,
      qualityGate = true,
      spanRootPath = Some(sp), spanK = 5, maxBoilerplate = 0.5,
      samplingGate = Some(("score", 100L)),
      onReport = (id, r) => reports += ((id,
        r.decisions.as[(Long, String)].collect().toMap,
        r.appendedDocs, r.appendedChunks, r.appendedSpans)))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("score", LongType)))
    val q = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", s"$root/chk")
      .start()

    def writeBatch(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val f = Files.createTempFile("batch-", ".json")
      Files.writeString(f, rows.map { case (id, text, score) =>
        s"""{"doc_id":$id,"text":"$text","score":$score}"""
      }.mkString("\n"))
      Files.move(f, Paths.get(s"$inDir/$name.json"))
      q.processAllAvailable()
    }

    try {
      writeBatch("b1", Seq((1L, doc1, 100L), (2L, doc2, 100L)))
      writeBatch("b2", Seq((10L, junk, 100L), (11L, assembled, 100L),
        (12L, novel, 100L), (13L, sampled, 0L)))
    } finally q.stop()

    assert(reports.map(_._1).toSeq == Seq(0L, 1L), s"batch ids: $reports")
    assert(reports(0)._2 == Map(1L -> Ingest.Accepted, 2L -> Ingest.Accepted),
      s"seed batch must pass both gates: ${reports(0)._2}")
    assert(reports(0)._5 > 0, s"seed batch must append spans: ${reports(0)}")
    assert(reports(1)._2 == Map(
      10L -> Ingest.RejectedQuality,
      11L -> Ingest.RejectedBoilerplate,
      12L -> Ingest.Accepted,
      13L -> Ingest.RejectedSampled),
      s"gated decisions: ${reports(1)._2}")

    // RECOVERY: replay batch 1 through the sink under the SAME batch id
    // (what the streaming runtime does after a crash). Both gate
    // rejections must reproduce bit-for-bit — quality from the doc's own
    // text, boilerplate against a span store that only GAINED this
    // batch's spans — the acceptance short-circuits to accepted_prior,
    // and every append no-ops (-1 = epoch-marker skip).
    val ndRowsBefore = Ingest.ndIndexAt(spark, nd).count()
    sink(Seq((10L, junk, 100L), (11L, assembled, 100L), (12L, novel, 100L),
        (13L, sampled, 0L))
      .toDF("doc_id", "text", "score"), 1L)
    val replay = reports(2)
    assert(replay._2 == Map(
      10L -> Ingest.RejectedQuality,
      11L -> Ingest.RejectedBoilerplate,
      12L -> Ingest.AcceptedPrior,
      13L -> Ingest.RejectedSampled),
      s"replayed gated decisions must be stable: ${replay._2}")
    assert(replay._3 == 0 && replay._4 == -1L && replay._5 == -1L,
      s"replay must append nothing: $replay")
    assert(Ingest.ndIndexAt(spark, nd).count() == ndRowsBefore,
      "near-dup index must be byte-stable across the replay")

    println("[demo] GatedIngestDemo PASS: quality + span + sampling " +
      "gates armed in the streaming sink; rejected_quality, " +
      "rejected_boilerplate, and rejected_sampled reproduced under a " +
      "same-batch-id replay with zero appends")
    graft.GraftCaches.clearAll() // leave no dead frames registered
    spark.stop()
  }
}
