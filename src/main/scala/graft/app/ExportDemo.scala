package graft.app

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TrainShuffle

/**
 * The training-data EXPORT executed end-to-end — not just the spec-tested
 * assignment columns, but the actual `write.partitionBy("shard")` a
 * pretraining pipeline ships: [[TrainShuffle.shuffled]] lays the corpus
 * out as one hash exchange + per-partition sort, the writer emits one
 * deterministically-ordered file per shard, and THIS demo proves the
 * contract that matters to a training run:
 *
 *  1. every document lands in exactly one shard file, none lost;
 *  2. within each shard, the on-disk row order is exactly the declared
 *     (sort_key, doc_id) order — reading the file back IS the epoch
 *     order, no shuffle needed at training time;
 *  3. two independent exports produce IDENTICAL per-shard manifests
 *     (the md5-derived assignment has no rand()/partition-order
 *     dependence), so a re-run of a failed export job is a no-op, not a
 *     reshuffled corpus.
 */
object ExportDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val numShards = 8
    val docs = GraftSession.table(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    /** Export + read back: per-shard doc_id sequence in FILE order. */
    def export(out: String): Map[Int, Seq[Long]] = {
      TrainShuffle.shuffled(docs, "doc_id", numShards)
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      (0 until numShards).map { s =>
        val files = Option(new File(s"$out/shard=$s").listFiles())
          .getOrElse(Array.empty[File])
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        // Hash-partitioning keeps each shard whole in one task -> one file.
        assert(files.length == 1,
          s"shard=$s: expected one file per shard, got ${files.length}")
        val ids = files.toSeq.flatMap { f =>
          spark.read.parquet(f.getPath).select("doc_id")
            .collect().map(_.getLong(0)).toSeq
        }
        s -> ids
      }.toMap
    }

    val root = Files.createTempDirectory("graft-export-")
    val run1 = export(s"$root/run1")
    val run2 = export(s"$root/run2")

    // 1. Nothing lost, nothing duplicated.
    val all = run1.values.flatten.toSeq
    val nDocs = docs.count()
    assert(all.size == nDocs && all.distinct.size == nDocs,
      s"export must be a permutation: ${all.size} rows of $nDocs docs")

    // 2. On-disk order per shard == the declared deterministic order.
    val expected = TrainShuffle.shardAssign(docs, "doc_id", numShards)
      .select(col("shard").cast("int"), col("sort_key"), col("doc_id"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, rows) => s -> rows.sortBy(r => (r._2, r._3)).map(_._3).toSeq }
    (0 until numShards).foreach { s =>
      assert(run1.getOrElse(s, Nil) == expected.getOrElse(s, Nil),
        s"shard=$s file order diverges from the declared (sort_key, id) order")
    }

    // 3. Byte-equivalent manifests across independent runs.
    assert(run1 == run2, "two exports must produce identical shard manifests")

    val sizes = run1.map { case (s, ids) => s"$s:${ids.size}" }.toSeq.sorted

    // ---- Stage 2: the export a TRAINER consumes — packed integer id
    // sequences, not text. Train a BYTE-level tokenizer (the
    // GPT-2-lineage production alphabet: total base coverage, so no
    // doc can hit <unk>), encode to ARRAY<INT>, ship through the SAME
    // deterministic shard layout, and prove the round trip: every
    // shard row's ids decode back — through the persisted model's
    // vocab alone — to exactly the normalized text that was encoded.
    import graft.functions.{Bpe, TextFunctions}
    val model = Bpe.bpeTrain(docs, "text", numMerges = 48,
      alphabet = Bpe.AlphabetByte)
    val modelDir = s"$root/tok"
    model.write(modelDir)
    val stored = Bpe.TokenizerModel.read(spark, modelDir)
    val idsOut = s"$root/ids"
    TrainShuffle.shuffled(
        Bpe.bpeEncodeIds(docs, "doc_id", "text", stored), "doc_id", numShards)
      .write.mode("overwrite").partitionBy("shard").parquet(idsOut)
    val backIds = spark.read.parquet(idsOut)
      .select(col("doc_id"), col("token_ids"), col("n_tokens_bpe"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getLong(2)))
    assert(backIds.length == nDocs && backIds.map(_._1).distinct.length == nDocs,
      s"id export must be a permutation: ${backIds.length} of $nDocs")
    val texts = docs.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    backIds.foreach { case (d, ids, n) =>
      assert(ids.length.toLong == n, s"doc $d: stamped count $n != ${ids.length}")
      val decoded = stored.decodeIds(ids)
      val want = TextFunctions.normalizeScala(texts(d))
      assert(decoded == want,
        s"doc $d: shard ids do not decode back to the normalized text")
    }

    // ---- Stage 3: the packed-sequence files THEMSELVES
    // (TrainShuffle.packIdSequences through the same persisted model):
    // fixed-size ARRAY<INT> training sequences written
    // partitionBy(shard) — the bytes a pretraining loader mmaps — read
    // back and cross-checked against the packing audit.
    val budget = 128
    val seqOut = s"$root/seqs"
    TrainShuffle.packIdSequences(docs, "doc_id", "text", stored,
        numShards, budget = budget)
      .write.mode("overwrite").partitionBy("shard").parquet(seqOut)
    val back = spark.read.parquet(seqOut)
      .select(col("shard").cast("int"), col("seq"), col("ids"), col("n_ids"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Int](2).toSeq, r.getLong(3)))
    val audit = TrainShuffle.packReport(
        TrainShuffle.seqPack(Bpe.bpeEncodeIds(docs, "doc_id", "text", stored),
          "doc_id", "", numShards, budget, tokensCol = "n_tokens_bpe"),
        budget)
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(3), r.getLong(2)))).toMap
    (0 until numShards).foreach { s =>
      val seqs = back.filter(_._1 == s).sortBy(_._2)
      assert(seqs.map(_._2).toSeq == (0L until seqs.length.toLong).toSeq,
        s"shard=$s: sequence indices not dense in the written files")
      assert(seqs.length.toLong == audit(s)._1,
        s"shard=$s: ${seqs.length} written sequences != audit n_seqs ${audit(s)._1}")
      assert(seqs.init.forall(_._4 == budget) && seqs.last._4 <= budget,
        s"shard=$s: sequences not budget-packed")
    }
    // Written id mass = token mass + one separator per doc, minus any
    // trailing separators trimmed with their spilled tail sequence.
    val packedIds = back.map(_._4).sum
    val tokenMass = audit.values.map(_._2).sum
    assert(packedIds >= tokenMass && packedIds <= tokenMass + nDocs,
      s"packed id mass $packedIds outside [$tokenMass, ${tokenMass + nDocs}]")

    // ---- Stage 4: the SFT export (TrainShuffle.packNoSplitIds through
    // the same persisted model): padded whole-doc bins with boundary
    // offsets written partitionBy(shard), read back and cross-checked
    // against the padding audit (packNoSplitReport over the same
    // layout) — bins, capacity, token mass and boundaries must agree
    // file-for-file.
    val sftOut = s"$root/sft"
    TrainShuffle.packNoSplitIds(docs, "doc_id", "text", stored,
        numShards, budget = budget)
      .write.mode("overwrite").partitionBy("shard").parquet(sftOut)
    val sftBack = spark.read.parquet(sftOut)
      .select(col("shard").cast("int"), col("bin"), col("n_ids"),
        col("n_docs"), col("starts"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4).toSeq))
    val sftAudit = TrainShuffle.packNoSplitReport(
        TrainShuffle.packNoSplit(
          Bpe.bpeEncodeIds(docs, "doc_id", "text", stored),
          "doc_id", "", numShards, budget, tokensCol = "n_tokens_bpe"),
        budget)
      .collect()
      .map(r => r.getLong(0).toInt -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(sftBack.map(_._4).sum == nDocs,
      "SFT bins must hold every doc exactly once")
    (0 until numShards).foreach { s =>
      val bins = sftBack.filter(_._1 == s).sortBy(_._2)
      // A shard no doc hashes to has no audit row (packNoSplitReport
      // emits only populated shards) — fail with a meaningful message
      // instead of a bare Map NoSuchElementException, and require the
      // written side to agree the shard is empty.
      val (nBins, packedTokens) = sftAudit.getOrElse(s, {
        assert(bins.isEmpty,
          s"shard=$s: written bins exist but the padding audit has no row")
        (0L, 0L)
      })
      assert(bins.map(_._2).toSeq == (0L until bins.length.toLong).toSeq &&
        bins.length.toLong == nBins,
        s"shard=$s: written bins not dense / != audit n_bins $nBins")
      assert(bins.map(_._3).sum == packedTokens,
        s"shard=$s: written id mass != audit packed_tokens $packedTokens")
      bins.foreach { case (_, bin, nIds, nBinDocs, starts) =>
        assert(nIds <= budget, s"shard=$s bin=$bin over budget")
        assert(starts.length.toLong == nBinDocs &&
          starts.headOption.forall(_ == 0L) &&
          starts.zip(starts.drop(1)).forall { case (a, b) => a <= b } &&
          starts.lastOption.forall(_ <= nIds),
          s"shard=$s bin=$bin boundary offsets inconsistent")
      }
    }

    // ---- Stage 5: the loader-native BINARY shard files
    // (sources.BinShards): flat little-endian int32 .bin + offsets .idx
    // per shard — the bytes a trainer actually mmaps, no parquet framing
    // in the hot path. Written from the SAME packed frame as stage 3,
    // read back BIT-IDENTICALLY, and the per-shard integrity digest
    // computed FROM THE FILES equals the digest of the frame (the same
    // values the pack_ids_digest oracle row gates in DuckDB).
    val packedFrame = TrainShuffle.packIdSequences(docs, "doc_id", "text",
      stored, numShards, budget = budget)
    val binDir = s"$root/bin"
    val nShardFiles =
      graft.sources.BinShards.write(packedFrame, binDir, budget, numShards)
    assert(nShardFiles == numShards.toLong,
      s"binary export wrote $nShardFiles shard pairs, expected $numShards")
    def packedSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard").cast("long"), col("seq"), col("ids"), col("n_ids"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getLong(3))).toSet
    val binBack = graft.sources.BinShards.read(spark, binDir)
    assert(packedSet(binBack) == packedSet(packedFrame),
      "binary shard round trip must be bit-identical to the packed frame")
    def digestMap(df: org.apache.spark.sql.DataFrame) =
      TrainShuffle.packDigest(df, budget).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
    val binDigest = digestMap(binBack)
    assert(binDigest == digestMap(packedFrame),
      "file-derived integrity digest diverges from the frame digest")
    // The SFT twin: the padded-bin export as sft-*.bin/.idx (boundary
    // offsets ship inside the index), read back bit-identically with
    // its own digest (ids AND starts checksums) surviving the files.
    val sftFrame = TrainShuffle.packNoSplitIds(docs, "doc_id", "text",
      stored, numShards, budget = budget)
    val sftBinDir = s"$root/sftbin"
    val nSftFiles =
      graft.sources.BinShards.writeNoSplit(sftFrame, sftBinDir, budget,
        numShards)
    assert(nSftFiles == numShards.toLong,
      s"SFT binary export wrote $nSftFiles shard pairs, expected $numShards")
    def sftSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard").cast("long"), col("bin"), col("ids"),
        col("n_ids"), col("n_docs"), col("starts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getLong(3), r.getLong(4), r.getSeq[Long](5).toList)).toSet
    val sftBinBack = graft.sources.BinShards.readNoSplit(spark, sftBinDir)
    assert(sftSet(sftBinBack) == sftSet(sftFrame),
      "SFT binary round trip must be bit-identical to the padded bins")
    def sftDigestMap(df: org.apache.spark.sql.DataFrame) =
      TrainShuffle.packNoSplitDigest(df, budget).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sftDigestMap(sftBinBack) == sftDigestMap(sftFrame),
      "SFT file-derived digest diverges from the frame digest")

    println(s"[demo] ExportDemo PASS: $nDocs docs -> $numShards shards " +
      s"(${sizes.mkString(", ")}), file order = declared order, " +
      "re-run manifest identical; id export: every shard row's " +
      s"ARRAY<INT> (vocab ${stored.vocab.length}) decodes back to the " +
      "normalized text via the persisted model; packed sequences: " +
      s"${back.length} budget-$budget files match the packing audit " +
      s"($packedIds ids over $tokenMass tokens); SFT bins: " +
      s"${sftBack.length} padded bins match the padding audit, " +
      s"boundaries aligned; binary shards: $nShardFiles pretraining + " +
      s"$nSftFiles SFT .bin/.idx pairs round-trip bit-identically, " +
      "file digests == frame digests")
    graft.GraftCaches.clearAll() // leave no dead frames registered
    spark.stop()
  }
}
