package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.ops.TrainShuffle

/** The managed binary-export family ([[BinFamily]]): batch-sized epoch
  * appends into reserved shard spans, idempotent replay, crash repair,
  * the config gate, and the fold (repack + CURRENT flip + grace
  * generation) — plus [[TrainShuffle.repackSequences]]'s own contract. */
class BinFamilySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val budget = 64
  private val span = 2 // shardsPerEpoch

  private lazy val docs = GraftSession.table(spark, sf, "documents")
  private lazy val model =
    graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)

  /** Deterministic 3-way doc split — the md5 draw every fixture uses. */
  private def batch(i: Int): DataFrame =
    docs.filter(expr(
      s"cast(conv(substr(md5(concat(cast(doc_id as string), " +
        s"':famsplit')), 1, 7), 16, 10) as bigint) % 3 = $i"))

  private def pack(i: Int): DataFrame =
    TrainShuffle.packIdSequences(batch(i), "doc_id", "text", model,
      numShards = span, budget = budget, salt = s"fam-e$i")

  private def shifted(i: Int): DataFrame =
    pack(i).withColumn("shard", col("shard") + (span.toLong * i))

  private def collectPacked(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Int](2).toList, r.getLong(3))).toSet

  test("append: epochs land in disjoint reserved spans; replay is a no-op; crash repair") {
    val root = Files.createTempDirectory("binfam-").toString
    (0 until 3).foreach { i =>
      val n = BinFamily.appendEpoch(pack(i), root, budget, span,
        s"e$i", compactEvery = 10)
      assert(n >= 0L, s"epoch e$i must apply, got $n")
    }
    val expected = collectPacked(
      (0 until 3).map(shifted).reduce(_ unionByName _))
    assert(collectPacked(BinShards.read(spark, root)) == expected,
      "the managed root must read as the union of the shifted epoch packs")
    val info = BinShards.commitInfo(spark, root)
    assert(info.get("epochs").contains("3"), s"$info")
    assert(info("shards").toLong == expected.map(_._1).size.toLong,
      s"marker shard count must equal the distinct shard files: $info")
    // Point lookup resolves the root too.
    val one = expected.find(_._4 == budget.toLong).get
    assert(BinShards.readSequence(spark, root, one._1, one._2).toList ==
      one._3)
    // Replay: the committed epoch returns -1 and touches nothing.
    val gen = BinFamily.resolveDir(spark, root)
    val mt = Files.getLastModifiedTime(Paths.get(gen, "shard-00000.bin"))
    Thread.sleep(1100)
    assert(BinFamily.appendEpoch(pack(1), root, budget, span,
      "e1", compactEvery = 10) == -1L)
    assert(Files.getLastModifiedTime(
        Paths.get(gen, "shard-00000.bin")) == mt,
      "a replayed epoch must not touch any file")
    // Crash repair: simulate a die-mid-append of e2 — root marker and
    // generation commit marker gone, a partial file littering its span.
    Files.delete(Paths.get(root, "epochs", "e2"))
    Files.delete(Paths.get(gen, "_BIN_COMMIT"))
    Files.copy(Paths.get(gen, "shard-00000.bin"),
      Paths.get(gen, "shard-00005.bin"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(Paths.get(gen, ".shard-00005.bin.crc"))
    val mtSurvivor =
      Files.getLastModifiedTime(Paths.get(gen, "shard-00000.bin"))
    Thread.sleep(1100)
    val n2 = BinFamily.appendEpoch(pack(2), root, budget, span,
      "e2", compactEvery = 10)
    assert(n2 >= 0L)
    assert(collectPacked(BinShards.read(spark, root)) == expected,
      "the repaired append must reproduce the exact artifact")
    assert(Files.getLastModifiedTime(
        Paths.get(gen, "shard-00000.bin")) == mtSurvivor,
      "committed epochs' files must survive the repair byte-untouched")
    // Config gate: a mismatched budget refuses loud instead of
    // corrupting the artifact.
    val eCfg = intercept[IllegalArgumentException] {
      BinFamily.appendEpoch(
        TrainShuffle.packIdSequences(batch(0), "doc_id", "text", model,
          numShards = span, budget = 32, salt = "fam-e9"),
        root, 32, span, "e9", compactEvery = 10)
    }
    assert(eCfg.getMessage.contains("config mismatch"), s"$eCfg")
  }

  test("fold: compactEvery re-chunks into a dense canonical successor and flips CURRENT") {
    val root = Files.createTempDirectory("binfam-fold-").toString
    BinFamily.appendEpoch(pack(0), root, budget, span, "e0",
      compactEvery = 2)
    val preFold = (0 until 2).map(shifted).reduce(_ unionByName _)
    BinFamily.appendEpoch(pack(1), root, budget, span, "e1",
      compactEvery = 2)
    // CURRENT flipped; the folded generation equals repackSequences of
    // the pre-fold artifact (same global stream, canonical chunking).
    val gen = BinFamily.resolveDir(spark, root)
    assert(gen.endsWith("gen-00001"), s"CURRENT must flip, got $gen")
    val folded = BinShards.read(spark, root)
    assert(collectPacked(folded) ==
      collectPacked(TrainShuffle.repackSequences(preFold, budget, span)),
      "the folded generation must be the canonical repack of the stream")
    // Dense canonical shape: shards 0..W-1, every non-final seq of
    // every shard full, only the global last short.
    val rows = folded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val shards = rows.map(_._1).toSet
    assert(shards == (0L until shards.size.toLong).toSet &&
      shards.size <= span, s"folded shards not dense: $shards")
    val short = rows.filter(_._3 < budget.toLong)
    assert(short.length <= 1 &&
      short.forall(s => s._1 == shards.max &&
        s._2 == rows.filter(_._1 == shards.max).map(_._2).max),
      s"only the globally-final sequence may be short: ${short.toList}")
    // Total id mass is preserved exactly through the fold.
    assert(rows.map(_._3).sum ==
      preFold.agg(sum("n_ids")).collect()(0).getLong(0))
    // Appending after a fold starts at the folded shard count; a
    // second fold sweeps gen-00000 but keeps gen-00001 (grace).
    BinFamily.appendEpoch(pack(2), root, budget, span, "e2",
      compactEvery = 2)
    val withE2 = BinShards.read(spark, root)
    assert(withE2.agg(max("shard")).collect()(0).getLong(0) >=
      shards.size.toLong,
      "the post-fold append must land past the folded base")
    assert(!Files.exists(Paths.get(root, "gen-00000")) ||
      BinFamily.resolveDir(spark, root).endsWith("gen-00001"),
      "pre-fold state must not linger past its grace roll")
    // Replaying a PRE-FOLD epoch is still a no-op: root markers
    // outlive generations.
    assert(BinFamily.appendEpoch(pack(0), root, budget, span, "e0",
      compactEvery = 2) == -1L)
  }

  test("SFT family: padded-bin epochs append, replay no-op, fold re-layouts bins byte-identically") {
    def packSft(i: Int): DataFrame =
      TrainShuffle.packNoSplitIds(batch(i), "doc_id", "text", model,
        numShards = span, budget = budget, salt = s"fam-e$i")
    def shiftedSft(i: Int): DataFrame =
      packSft(i).withColumn("shard", col("shard") + (span.toLong * i))
    def collectSft(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getLong(3), r.getLong(4), r.getSeq[Long](5).toList)).toSet
    val root = Files.createTempDirectory("binfam-sft-").toString
    (0 until 2).foreach { i =>
      val n = BinFamily.appendEpochSft(packSft(i), root, budget, span,
        s"e$i", compactEvery = 10)
      assert(n >= 0L, s"sft epoch e$i must apply, got $n")
    }
    val expected = collectSft(
      (0 until 2).map(shiftedSft).reduce(_ unionByName _))
    assert(collectSft(BinShards.readNoSplit(spark, root)) == expected,
      "the managed sft root must read as the union of shifted epoch packs")
    // The marker carries the KIND (every kind-dispatched reader/TVF
    // resolves on it) and the family state.
    val info = BinShards.commitInfo(spark, root)
    assert(info.get("kind").contains("sft") &&
      info.get("epochs").contains("2"), s"$info")
    // The sft point lookup resolves the managed root too.
    val one = expected.head
    val (ids, starts) = BinShards.readBin(spark, root, one._1, one._2)
    assert(ids.toList == one._3 && starts.toList == one._6)
    // Replay: committed epoch no-ops.
    assert(BinFamily.appendEpochSft(packSft(0), root, budget, span,
      "e0", compactEvery = 10) == -1L)
    // A family root is ONE kind: the packed append refuses loud.
    val eKind = intercept[Exception] {
      BinFamily.appendEpoch(pack(2), root, budget, span, "e2",
        compactEvery = 10)
    }
    assert(eKind.getMessage.contains("config mismatch"), s"$eKind")
    // Fold at compactEvery=2: bins RE-LAYOUT densely — the payload
    // SEQUENCE in global (shard, bin) order is byte-identical (ids and
    // doc-boundary starts ride through unchanged; only addressing
    // moves), shards dense, and a post-fold append lands past the
    // folded base.
    val root2 = Files.createTempDirectory("binfam-sft-fold-").toString
    BinFamily.appendEpochSft(packSft(0), root2, budget, span, "e0",
      compactEvery = 2)
    BinFamily.appendEpochSft(packSft(1), root2, budget, span, "e1",
      compactEvery = 2)
    val gen2 = BinFamily.resolveDir(spark, root2)
    assert(gen2.endsWith("gen-00001"), s"CURRENT must flip, got $gen2")
    def orderedPayloads(df: DataFrame) = df
      .orderBy("shard", "bin").collect()
      .map(r => (r.getSeq[Int](2).toList, r.getLong(3), r.getLong(4),
        r.getSeq[Long](5).toList)).toList
    val preFold = orderedPayloads(
      (0 until 2).map(shiftedSft).reduce(_ unionByName _))
    val folded = BinShards.readNoSplit(spark, root2)
    assert(orderedPayloads(folded) == preFold,
      "the fold must re-layout bins byte-identically in global order")
    val fShards = folded.select("shard").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(fShards == (0L until fShards.size.toLong).toSet &&
      fShards.size <= span, s"folded sft shards not dense: $fShards")
    BinFamily.appendEpochSft(packSft(2), root2, budget, span, "e2",
      compactEvery = 2)
    assert(BinShards.readNoSplit(spark, root2)
      .agg(max("shard")).collect()(0).getLong(0) >= fShards.size.toLong,
      "the post-fold sft append must land past the folded base")
    assert(BinFamily.appendEpochSft(packSft(0), root2, budget, span,
      "e0", compactEvery = 2) == -1L,
      "root markers outlive sft generations too")
    // relayoutBins refuses a non-dense frame loud.
    val eDense = intercept[Exception] {
      TrainShuffle.relayoutBins(
        Seq((0L, 1L, Array(1, 2), 2L, 1L, Array(0L)))
          .toDF("shard", "bin", "ids", "n_ids", "n_docs", "starts"), 2)
        .collect()
    }
    assert(eDense.getMessage.contains("not dense"), s"$eDense")
  }

  test("appendEpochs (concurrent exports) is byte-equivalent to the serial replay across a fold") {
    // Serial root: e0, e1 -> fold -> e2, one appendEpoch at a time.
    val serialRoot = Files.createTempDirectory("binfam-ser-").toString
    (0 until 3).foreach { i =>
      BinFamily.appendEpoch(pack(i), serialRoot, budget, span,
        s"e$i", compactEvery = 2)
    }
    // Batch root: ONE appendEpochs call — e0/e1 export concurrently
    // into their disjoint spans, the fold serializes, e2 lands on the
    // folded successor.
    val batchRoot = Files.createTempDirectory("binfam-bat-").toString
    val n = BinFamily.appendEpochs(
      (0 until 3).map(i => s"e$i" -> pack(i)), batchRoot, budget, span,
      compactEvery = 2)
    assert(n >= 0L)
    // Same rows...
    assert(collectPacked(BinShards.read(spark, batchRoot)) ==
      collectPacked(BinShards.read(spark, serialRoot)),
      "batch append must reproduce the serial artifact")
    // ...and the same FILE BYTES per shard (the resume posture: the
    // artifact identity is its bytes, not just its frame).
    val serGen = Paths.get(BinFamily.resolveDir(spark, serialRoot))
    val batGen = Paths.get(BinFamily.resolveDir(spark, batchRoot))
    import scala.jdk.CollectionConverters._
    def shardFiles(p: java.nio.file.Path) =
      Files.list(p).iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".bin") || n.endsWith(".idx"))
        .toSeq.sorted
    val names = shardFiles(serGen)
    assert(names == shardFiles(batGen), "same shard file set")
    names.foreach { f =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(serGen.resolve(f)),
        Files.readAllBytes(batGen.resolve(f))),
        s"shard file $f must be byte-identical to the serial replay")
    }
    // Marker state matches too (epochs count, shard count).
    val serInfo = BinShards.commitInfo(spark, serialRoot)
    val batInfo = BinShards.commitInfo(spark, batchRoot)
    assert(serInfo("epochs") == batInfo("epochs") &&
      serInfo("shards") == batInfo("shards"), s"$serInfo vs $batInfo")
    // Replay: a second batch call with the same ids is a no-op.
    assert(BinFamily.appendEpochs(
      (0 until 3).map(i => s"e$i" -> pack(i)), batchRoot, budget, span,
      compactEvery = 2) == -1L)
  }

  test("repackSequences validates the packed invariant loud") {
    val bad = Seq((0L, 0L, Array(1, 2), 2L), (0L, 1L, Array(3, 4, 5), 3L))
      .toDF("shard", "seq", "ids", "n_ids") // non-final short at budget 3
    val e = intercept[IllegalArgumentException] {
      TrainShuffle.repackSequences(bad, 3, 2).collect()
    }
    assert(e.getMessage.contains("packed invariant"), s"$e")
    // A valid hand-built frame re-chunks across shard seams in stream
    // order: shard 0 = (1,2,3),(4) and shard 1 = (5,6) — both with
    // unpadded tails — concatenate to the single stream 1..6 and
    // re-chunk to ((1,2,3),(4,5,6)) at budget 3 over 2 shards.
    val ok = Seq((0L, 0L, Array(1, 2, 3), 3L), (0L, 1L, Array(4), 1L),
        (1L, 0L, Array(5, 6), 2L))
      .toDF("shard", "seq", "ids", "n_ids")
    val out = TrainShuffle.repackSequences(ok, 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList))
      .toSet
    assert(out == Set((0L, 0L, List(1, 2, 3)), (1L, 0L, List(4, 5, 6))),
      s"$out")
  }
}
