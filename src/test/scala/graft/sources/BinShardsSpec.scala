package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.ops.TrainShuffle

/** Binary shard export ([[BinShards]]): bit-identical round trip against
  * the packed frame, digest stability through the files, crash-window
  * (commit marker) behavior, and loud validation of malformed inputs. */
class BinShardsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def packedFrame(budget: Int, numShards: Int) = {
    val docs = GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    TrainShuffle.packIdSequences(docs, "doc_id", "text", model,
      numShards, budget = budget)
  }

  private def collectPacked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Int](2).toList, r.getLong(3))).toSet

  test("round trip is bit-identical and the digest survives the files") {
    val budget = 64
    val packed = packedFrame(budget, 4)
    val dir = Files.createTempDirectory("binshards-").toString
    val n = BinShards.write(packed, dir, budget, 4)
    assert(n == 4L, s"expected 4 shard file pairs, wrote $n")
    assert(Files.exists(Paths.get(dir, "_BIN_COMMIT")))
    assert(Files.exists(Paths.get(dir, "shard-00000.bin")) &&
      Files.exists(Paths.get(dir, "shard-00000.idx")))
    val back = BinShards.read(spark, dir)
    assert(back.columns.toSeq == Seq("shard", "seq", "ids", "n_ids"))
    assert(collectPacked(back) == collectPacked(packed),
      "binary round trip must reproduce the packed frame exactly")
    // The integrity digest computed FROM THE FILES equals the digest of
    // the original frame — the artifact itself is what the oracle gates.
    val a = TrainShuffle.packDigest(packed, budget).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val b = TrainShuffle.packDigest(back, budget).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(a == b, s"digest drift through the binary files: $a vs $b")
    // The .bin is EXACTLY 4 bytes per id — flat int32, no framing.
    val idMass = packed.agg(sum("n_ids")).collect()(0).getLong(0)
    val binBytes = (0 until 4)
      .map(s => Files.size(Paths.get(dir, f"shard-$s%05d.bin"))).sum
    assert(binBytes == 4L * idMass, s"$binBytes != 4 * $idMass")
  }

  test("torn export: a marker-less dir refuses to read; rewrite heals it") {
    val budget = 32
    val packed = packedFrame(budget, 2)
    val dir = Files.createTempDirectory("binshards-torn-").toString
    BinShards.write(packed, dir, budget, 2)
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val e = intercept[IllegalArgumentException] {
      BinShards.read(spark, dir)
    }
    assert(e.getMessage.contains("_BIN_COMMIT"), s"$e")
    BinShards.write(packed, dir, budget, 2)
    assert(collectPacked(BinShards.read(spark, dir)) == collectPacked(packed))
  }

  test("corrupt index fails loud; narrowed re-export leaves no stale shards") {
    val budget = 32
    val packed = packedFrame(budget, 4)
    val dir = Files.createTempDirectory("binshards-corrupt-").toString
    BinShards.write(packed, dir, budget, 4)
    // Flip the magic: the reader must refuse the shard.
    val idx = Paths.get(dir, "shard-00001.idx")
    val bytes = Files.readAllBytes(idx)
    bytes(0) = (bytes(0) ^ 0x7f).toByte
    Files.write(idx, bytes)
    // Drop the local-FS checksum sidecar so the reader sees the
    // corrupted bytes themselves (on HDFS/object stores the block
    // checksum would catch this first — both paths are loud).
    Files.deleteIfExists(Paths.get(dir, ".shard-00001.idx.crc"))
    val e = intercept[Exception] { BinShards.read(spark, dir).collect() }
    assert(e.getMessage != null && e.getMessage.contains("magic"),
      s"corrupt idx must fail loud: $e")
    // Narrowed re-export (4 -> 2 shards): stale shard-00002/3 removed.
    BinShards.write(packedFrame(budget, 2), dir, budget, 2)
    assert(!Files.exists(Paths.get(dir, "shard-00002.idx")) &&
      !Files.exists(Paths.get(dir, "shard-00003.bin")),
      "stale shards from the wider export must be gone")
    assert(collectPacked(BinShards.read(spark, dir)) ==
      collectPacked(packedFrame(budget, 2)))
  }

  test("SFT export: round trip bit-identical, boundary metadata intact, digests survive the files") {
    val budget = 512 // ~3x the mean doc length so bins co-locate docs
    val docs = GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    val packed = TrainShuffle.packNoSplitIds(docs, "doc_id", "text", model,
      numShards = 4, budget = budget)
    val dir = Files.createTempDirectory("binshards-sft-").toString
    val n = BinShards.writeNoSplit(packed, dir, budget, 4)
    assert(n == 4L)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getLong(3), r.getLong(4), r.getSeq[Long](5).toList)).toSet
    val back = BinShards.readNoSplit(spark, dir)
    assert(back.columns.toSeq ==
      Seq("shard", "bin", "ids", "n_ids", "n_docs", "starts"))
    assert(key(back) == key(packed),
      "SFT binary round trip must reproduce the packed frame exactly")
    // Multi-doc bins must exist or the starts section is untested.
    assert(packed.collect().exists(_.getLong(4) > 1L),
      "fixture must pack multi-doc bins")
    def dig(df: org.apache.spark.sql.DataFrame) =
      TrainShuffle.packNoSplitDigest(df, budget).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(dig(packed) == dig(back), "digest drift through the sft files")
    // A marker-less dir refuses to read; kind is recorded in the marker.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val e = intercept[IllegalArgumentException] {
      BinShards.readNoSplit(spark, dir)
    }
    assert(e.getMessage.contains("_BIN_COMMIT"), s"$e")
  }

  test("point lookup readSequence matches the full read; non-drained and corrupt-budget paths are loud-safe") {
    val budget = 32
    val packed = packedFrame(budget, 4)
    val dir = Files.createTempDirectory("binshards-seek-").toString
    BinShards.write(packed, dir, budget, 4)
    // Every (shard, seq) the full read yields must byte-seek to the
    // same ids — the .idx header's all-but-final-length-equals-budget
    // contract is exactly what makes the O(1) lookup valid.
    val full = BinShards.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Int](2).toList)
      .toMap
    assert(full.nonEmpty)
    full.foreach { case ((shard, seq), ids) =>
      assert(BinShards.readSequence(spark, dir, shard, seq).toList == ids,
        s"point lookup drifted at shard $shard seq $seq")
    }
    // Out-of-range and missing-shard lookups fail loud.
    val eOut = intercept[IllegalArgumentException] {
      BinShards.readSequence(spark, dir, 0L, 1000000L)
    }
    assert(eOut.getMessage.contains("out of range"), s"$eOut")
    val eShard = intercept[IllegalArgumentException] {
      BinShards.readSequence(spark, dir, 99L, 0L)
    }
    assert(eShard.getMessage.contains("no shard"), s"$eShard")
    // A NON-DRAINED consumer (limit(1) over a multi-sequence export)
    // must not wedge the reader: the task-completion listener owns the
    // close, so early aborts leak nothing and later reads still work.
    val one = BinShards.read(spark, dir).limit(1).collect()
    assert(one.length == 1)
    assert(collectPacked(BinShards.read(spark, dir)) == collectPacked(packed),
      "full read after a limit(1) consumer must still see every sequence")
    // A corrupt/foreign budget field fails the module's loud require,
    // not a NegativeArraySizeException/OOM from sizing buffers off it.
    val idx = Paths.get(dir, "shard-00000.idx")
    val bytes = Files.readAllBytes(idx)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(8, -7) // budget field, after magic+version
    Files.write(idx, bytes)
    Files.deleteIfExists(Paths.get(dir, ".shard-00000.idx.crc"))
    val eBudget = intercept[Exception] {
      BinShards.read(spark, dir).collect()
    }
    assert(eBudget.getMessage != null &&
      eBudget.getMessage.contains("bad budget"), s"$eBudget")
    val eBudgetSeek = intercept[IllegalArgumentException] {
      BinShards.readSequence(spark, dir, 0L, 0L)
    }
    assert(eBudgetSeek.getMessage.contains("bad budget"), s"$eBudgetSeek")
  }

  test("resume: a torn multi-shard export rewrites only the missing pairs") {
    val budget = 32
    val packed = packedFrame(budget, 4)
    val dir = Files.createTempDirectory("binshards-resume-").toString
    BinShards.write(packed, dir, budget, 4, resumeToken = "fixture-v1")
    val before = collectPacked(BinShards.read(spark, dir))
    // Simulate a crash after 2 of 4 shards: marker gone, two pairs gone
    // (one idx-only remnant — an incomplete pair must NOT be kept).
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    Files.delete(Paths.get(dir, "shard-00002.bin"))
    Files.delete(Paths.get(dir, "shard-00003.bin"))
    Files.delete(Paths.get(dir, "shard-00003.idx"))
    val mtime0 = Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin"))
    val mtime1 = Files.getLastModifiedTime(Paths.get(dir, "shard-00001.bin"))
    Thread.sleep(1100) // local-FS mtime granularity
    val n = BinShards.write(packed, dir, budget, 4, resume = true,
      resumeToken = "fixture-v1")
    assert(n == 4L, s"resume must end with all 4 pairs, got $n")
    // resume=true without a content-identity token is refused loud —
    // an empty token cannot distinguish survivors' content.
    val eTok = intercept[IllegalArgumentException] {
      BinShards.write(packed, dir, budget, 4, resume = true)
    }
    assert(eTok.getMessage.contains("non-empty resumeToken"), s"$eTok")
    // The surviving complete pairs were KEPT (bytes untouched), the
    // torn/missing ones rewritten; content identical to the original.
    assert(Files.getLastModifiedTime(
        Paths.get(dir, "shard-00000.bin")) == mtime0 &&
      Files.getLastModifiedTime(
        Paths.get(dir, "shard-00001.bin")) == mtime1,
      "resume must not rewrite valid surviving shard pairs")
    assert(Files.exists(Paths.get(dir, "shard-00002.bin")) &&
      Files.exists(Paths.get(dir, "shard-00002.idx")),
      "the idx-only remnant must have been swept and rewritten as a pair")
    assert(collectPacked(BinShards.read(spark, dir)) == before,
      "resumed export must be bit-identical to the uninterrupted one")
    // A changed SHARD COUNT fails the _BIN_CONFIG gate even though the
    // survivors are structurally valid at the same budget — keeping
    // them would silently mix two different document distributions.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val mtPre = Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin"))
    Thread.sleep(1100)
    val packedNarrow = packedFrame(budget, 2)
    val nNarrow = BinShards.write(packedNarrow, dir, budget, 2,
      resume = true, resumeToken = "fixture-v1")
    assert(nNarrow == 2L &&
      Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin")) != mtPre,
      "a numShards change must rewrite everything (config-gate miss)")
    assert(collectPacked(BinShards.read(spark, dir)) ==
      collectPacked(packedNarrow))
    // A changed resumeToken (the salt/tokenizer identity hook) also
    // forces the full rewrite — content changed, structure did not.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val mtTok = Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin"))
    Thread.sleep(1100)
    val nTok = BinShards.write(packedNarrow, dir, budget, 2,
      resume = true, resumeToken = "salt=epoch1")
    assert(nTok == 2L &&
      Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin")) != mtTok,
      "a resumeToken change must rewrite everything")
    // A resume under a DIFFERENT budget keeps nothing either (both the
    // config gate and per-pair validation reject it).
    val packed2 = packedFrame(16, 2)
    val n2 = BinShards.write(packed2, dir, 16, 2, resume = true,
      resumeToken = "fixture-v1")
    assert(n2 == 2L &&
      !Files.exists(Paths.get(dir, "shard-00002.idx")) &&
      !Files.exists(Paths.get(dir, "shard-00003.idx")),
      "config-mismatched pairs must be swept, out-of-range ones removed")
    assert(collectPacked(BinShards.read(spark, dir)) ==
      collectPacked(packed2))
    // A packed write over a former SFT dir leaves no stale sft files
    // behind a fresh marker (one artifact kind per dir).
    val sftDir = Files.createTempDirectory("binshards-kindswap-").toString
    val docs = graft.GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    BinShards.writeNoSplit(graft.ops.TrainShuffle.packNoSplitIds(
      docs, "doc_id", "text", model, 2, 512), sftDir, 512, 2)
    BinShards.write(packedFrame(budget, 2), sftDir, budget, 2)
    assert(!Files.exists(Paths.get(sftDir, "sft-00000.bin")) &&
      !Files.exists(Paths.get(sftDir, "sft-00000.idx")),
      "a packed write must sweep the other kind's files")
  }

  private def sftPacked(budget: Int, numShards: Int) = {
    val docs = GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    TrainShuffle.packNoSplitIds(docs, "doc_id", "text", model,
      numShards, budget = budget)
  }

  private def collectSft(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Int](2).toList, r.getLong(3), r.getLong(4),
      r.getSeq[Long](5).toList)).toSet

  test("SFT resume: a torn export rewrites only the missing pairs; config gate") {
    val budget = 512
    val packed = sftPacked(budget, 4)
    val dir = Files.createTempDirectory("binshards-sftresume-").toString
    BinShards.writeNoSplit(packed, dir, budget, 4,
      resumeToken = "sft-fixture-v1")
    val before = collectSft(BinShards.readNoSplit(spark, dir))
    // Crash: marker gone, one pair gone, one bin-only remnant.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    Files.delete(Paths.get(dir, "sft-00002.bin"))
    Files.delete(Paths.get(dir, "sft-00002.idx"))
    Files.delete(Paths.get(dir, "sft-00003.idx"))
    val mt0 = Files.getLastModifiedTime(Paths.get(dir, "sft-00000.bin"))
    val mt1 = Files.getLastModifiedTime(Paths.get(dir, "sft-00001.bin"))
    Thread.sleep(1100)
    val n = BinShards.writeNoSplit(packed, dir, budget, 4, resume = true,
      resumeToken = "sft-fixture-v1")
    assert(n == 4L, s"sft resume must end with all 4 pairs, got $n")
    assert(Files.getLastModifiedTime(
        Paths.get(dir, "sft-00000.bin")) == mt0 &&
      Files.getLastModifiedTime(Paths.get(dir, "sft-00001.bin")) == mt1,
      "sft resume must not rewrite valid surviving pairs")
    assert(collectSft(BinShards.readNoSplit(spark, dir)) == before,
      "resumed sft export must be bit-identical to the uninterrupted one")
    // Empty token under resume is refused, same as the packed writer.
    val eTok = intercept[IllegalArgumentException] {
      BinShards.writeNoSplit(packed, dir, budget, 4, resume = true)
    }
    assert(eTok.getMessage.contains("non-empty resumeToken"), s"$eTok")
    // A changed resumeToken forces the full rewrite.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val mtTok = Files.getLastModifiedTime(Paths.get(dir, "sft-00000.bin"))
    Thread.sleep(1100)
    val nTok = BinShards.writeNoSplit(packed, dir, budget, 4,
      resume = true, resumeToken = "sft-fixture-v2")
    assert(nTok == 4L &&
      Files.getLastModifiedTime(Paths.get(dir, "sft-00000.bin")) != mtTok,
      "an sft resumeToken change must rewrite everything")
    assert(collectSft(BinShards.readNoSplit(spark, dir)) == before)
  }

  test("SFT point lookup readBin matches the full read; bounds are loud") {
    val budget = 512
    val packed = sftPacked(budget, 3)
    val dir = Files.createTempDirectory("binshards-sftseek-").toString
    BinShards.writeNoSplit(packed, dir, budget, 3)
    val full = BinShards.readNoSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getSeq[Int](2).toList, r.getSeq[Long](5).toList)))
      .toMap
    assert(full.nonEmpty)
    // Multi-doc bins must exist or the starts-slice seek is untested.
    assert(full.values.exists(_._2.length > 1),
      "fixture must pack multi-doc bins")
    full.foreach { case ((shard, bin), (ids, starts)) =>
      val (gotIds, gotStarts) = BinShards.readBin(spark, dir, shard, bin)
      assert(gotIds.toList == ids && gotStarts.toList == starts,
        s"sft point lookup drifted at shard $shard bin $bin")
    }
    val eOut = intercept[IllegalArgumentException] {
      BinShards.readBin(spark, dir, 0L, 1000000L)
    }
    assert(eOut.getMessage.contains("out of range"), s"$eOut")
    val eShard = intercept[IllegalArgumentException] {
      BinShards.readBin(spark, dir, 99L, 0L)
    }
    assert(eShard.getMessage.contains("no shard"), s"$eShard")
  }

  test("identity lines are stamped into the marker and config-gated") {
    val budget = 32
    val packed = packedFrame(budget, 2)
    val dir = Files.createTempDirectory("binshards-ident-").toString
    val ident = Map("vocab_size" -> "123", "alphabet" -> "char",
      "pretok" -> "words")
    BinShards.write(packed, dir, budget, 2, resumeToken = "id-v1",
      identity = ident)
    val info = BinShards.commitInfo(spark, dir)
    assert(info.get("vocab_size").contains("123") &&
      info.get("alphabet").contains("char") &&
      info.get("pretok").contains("words"),
      s"identity must be readable from the marker alone: $info")
    // A reserved key can never shadow a writer-owned field.
    val eRes = intercept[IllegalArgumentException] {
      BinShards.write(packed, dir, budget, 2,
        identity = Map("budget" -> "9"))
    }
    assert(eRes.getMessage.contains("writer-owned"), s"$eRes")
    // A changed identity is a config miss: resume rewrites everything.
    Files.delete(Paths.get(dir, "_BIN_COMMIT"))
    val mt = Files.getLastModifiedTime(Paths.get(dir, "shard-00000.bin"))
    Thread.sleep(1100)
    BinShards.write(packed, dir, budget, 2, resume = true,
      resumeToken = "id-v1", identity = ident + ("vocab_size" -> "999"))
    assert(Files.getLastModifiedTime(
        Paths.get(dir, "shard-00000.bin")) != mt,
      "an identity change must miss the config gate and rewrite")
    assert(BinShards.commitInfo(spark, dir)
      .get("vocab_size").contains("999"))
    // The sft writer stamps identity the same way.
    val sftDir = Files.createTempDirectory("binshards-identsft-").toString
    BinShards.writeNoSplit(sftPacked(512, 2), sftDir, 512, 2,
      identity = ident)
    val sftInfo = BinShards.commitInfo(spark, sftDir)
    assert(sftInfo.get("kind").contains("sft") &&
      sftInfo.get("vocab_size").contains("123"), s"$sftInfo")
  }

  test("numShards past the %05d name domain is refused loud") {
    val frame = Seq((0L, 0L, Array(1), 1L)).toDF("shard", "seq", "ids", "n_ids")
    val e = intercept[IllegalArgumentException] {
      BinShards.write(frame, "/tmp/never-written", 4, 100000)
    }
    assert(e.getMessage.contains("99999"), s"$e")
    val e2 = intercept[IllegalArgumentException] {
      BinShards.writeNoSplit(frame, "/tmp/never-written", 4, 100000)
    }
    assert(e2.getMessage.contains("99999"), s"$e2")
  }

  test("write validates the frame: non-dense or oversized sequences are loud") {
    val dir = Files.createTempDirectory("binshards-bad-").toString
    val gap = Seq((0L, 0L, Array(1, 2), 2L), (0L, 2L, Array(3), 1L))
      .toDF("shard", "seq", "ids", "n_ids")
    val e1 = intercept[Exception] { BinShards.write(gap, dir, 2, 1) }
    assert(e1.getMessage.contains("not dense"), s"$e1")
    val over = Seq((0L, 0L, Array(1, 2, 3), 3L))
      .toDF("shard", "seq", "ids", "n_ids")
    val e2 = intercept[Exception] { BinShards.write(over, dir, 2, 1) }
    assert(e2.getMessage.contains("n_ids mismatch/over"), s"$e2")
    val short = Seq((0L, 0L, Array(1), 1L), (0L, 1L, Array(2, 3), 2L))
      .toDF("shard", "seq", "ids", "n_ids")
    val e3 = intercept[Exception] { BinShards.write(short, dir, 2, 1) }
    assert(e3.getMessage.contains("short but not final"), s"$e3")
    // The ownership claim holds on BOTH exporters: a shard at/past the
    // declared count would %05d-widen past the name domain every
    // reader and sweeper matches — invisible files behind a valid
    // marker. The packed writer refuses via its range claim; the sft
    // writer must too.
    val oor = Seq((5L, 0L, Array(1, 2), 2L))
      .toDF("shard", "seq", "ids", "n_ids")
    val e4 = intercept[Exception] { BinShards.write(oor, dir, 2, 4) }
    assert(e4.getMessage.contains("outside"), s"$e4")
    val oorSft = Seq((5L, 0L, Array(1, 2), 2L, 1L, Array(0L)))
      .toDF("shard", "bin", "ids", "n_ids", "n_docs", "starts")
    val e5 = intercept[Exception] {
      BinShards.writeNoSplit(oorSft, dir, 2, 4)
    }
    assert(e5.getMessage.contains("outside"), s"$e5")
  }
}
