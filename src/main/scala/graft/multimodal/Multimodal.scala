package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines: media payloads as
 * opaque `binary` columns + typed metadata, with decode / feature-extract /
 * frame-sample as batched per-partition transforms.
 *
 * The Spark-side plumbing (schema, partitioning, batch shape, explode
 * semantics) is real and tested; the actual codec calls are STUBBED with
 * deterministic byte-level stand-ins because no image/audio libraries exist
 * in this environment — each stub is marked and takes/returns exactly the
 * shapes a real decoder would, so swapping in javax.imageio / ffmpeg
 * bindings is a local change inside `decodeStub`.
 */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  final case class MediaMeta(
      modality: String, // image | audio | video
      format: String, // container/codec tag
      width: Option[Int],
      height: Option[Int],
      sampleRate: Option[Int],
      durationMs: Option[Long])

  final case class MediaRecord(
      doc_id: Long,
      content: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: String,
      feature: Array[Float]) // embedding-shaped output a real decoder would emit

  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /**
   * Wrap the documents table as media records: payload = utf-8 bytes of the
   * text (deterministic stand-in for real blobs), modality assigned by
   * doc_id % 3, metadata populated per modality. At 100 TB the payload
   * column dominates row size, so everything downstream projects it away as
   * early as possible — only transforms that consume bytes keep it.
   */
  def asMediaRecords(docs: DataFrame): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("content"),
      struct(
        modality.as("modality"),
        when(modality === "image", "png")
          .when(modality === "audio", "wav")
          .otherwise("mp4").as("format"),
        when(modality === "image", (col("n_chars") % 640).cast("int") + 1)
          .otherwise(lit(null).cast("int")).as("width"),
        when(modality === "image", (col("n_chars") % 480).cast("int") + 1)
          .otherwise(lit(null).cast("int")).as("height"),
        when(modality === "audio", lit(16000)).otherwise(lit(null).cast("int"))
          .as("sampleRate"),
        when(modality =!= "image", col("n_chars").cast("long") * 10)
          .otherwise(lit(null).cast("long")).as("durationMs")).as("meta"))
  }

  /**
   * STUB decode: a real implementation would decode the codec and run a
   * vision/audio encoder over pixel/sample buffers. The deterministic
   * stand-in derives an 8-dim "feature" from the payload bytes so the
   * pipeline shape (binary in, fixed-dim float vector out, batched per
   * partition) is exercised end-to-end.
   */
  private def decodeStub(content: Array[Byte], md: java.security.MessageDigest): Array[Float] = {
    md.reset()
    val d = md.digest(content)
    Array.tabulate(8)(i => ((d(i) & 0xff) - 128) / 128.0f)
  }

  /**
   * Feature extraction as a batched per-partition transform — the Scala
   * analogue of a pandas `mapInPandas` UDF: one decoder instance per
   * partition, rows streamed through it, no per-row setup cost.
   */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.modality"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, content, modality) =>
          val feature = decodeStub(content, md)
          md.reset()
          val checksum = md.digest(content).map("%02x".format(_)).mkString
          MediaFeatures(id, modality, content.length.toLong, checksum, feature)
        }
      }
  }

  /**
   * STUB frame sampling: a real implementation would seek the container and
   * decode N key frames; the stand-in slices the payload into N equal byte
   * windows (same output shape: one row per sampled frame). Non-video rows
   * are filtered before any bytes move.
   */
  def sampleFrames(media: DataFrame, n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("meta.modality") === "video")
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val len = content.length
        if (len == 0) Iterator.empty
        else (0 until n).iterator.map { i =>
          val start = (len.toLong * i / n).toInt
          val end = (len.toLong * (i + 1) / n).toInt
          Frame(id, i, java.util.Arrays.copyOfRange(content, start, math.max(end, start)))
        }
      }
  }
}
