package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loader-native BINARY shard files for the packed pretraining export —
 * the last inch between [[graft.ops.TrainShuffle.packIdSequences]]'s
 * relational frame and what a trainer actually mmaps: flat fixed-width
 * little-endian int32 token ids plus a tiny offsets index, the public
 * Megatron-LM-lineage `.bin`/`.idx` convention (data file of raw ids,
 * index file of per-sequence extents; no parquet/arrow framing in the
 * hot read path).
 *
 * Layout per shard `s` under `dir`:
 *  - `shard-SSSSS.bin` — the shard's sequences concatenated in `seq`
 *    order, each id one little-endian int32 (the separator -1 included
 *    verbatim: ids are signed by the [[graft.ops.TrainShuffle]]
 *    contract, sepId < 0 < vocab ids).
 *  - `shard-SSSSS.idx` — header (magic `GRFT` int32, version int32,
 *    budget int32, n_seqs int64, n_ids int64) then one int32 LENGTH per
 *    sequence. All lengths equal `budget` except possibly the last
 *    (the unpadded-final-sequence contract), so a loader seeks to
 *    sequence k at byte `4·k·budget` without reading the index at all
 *    — the index exists to validate and to size the tail.
 *  - `_BIN_COMMIT` — directory-level commit marker, DELETED FIRST and
 *    WRITTEN LAST (the `TokenizerModel.write` crash-window discipline):
 *    a torn export — task died mid-file, job died between shards — can
 *    never present as complete. [[read]] refuses a marker-less dir.
 *
 * Scale shape: one file PAIR per shard, written by the ONE task that
 * owns the shard's hash partition ([[graft.ops.TrainShuffle.shuffled]]'s
 * argument: hash partitioning keeps every shard whole; several shards
 * may share a task and are written sequentially). numShards scales with
 * the corpus — a shard is one bounded training file — so no task ever
 * buffers more than one sequence (ids stream straight to the data file;
 * only the int32 length-per-sequence table is held, n_seqs entries).
 * Files land via write-temp-then-rename, so a re-run (or a speculative
 * attempt) replaces files atomically-per-file instead of interleaving
 * bytes; single logical writer per dir assumed, as for every managed
 * index family.
 *
 * Integrity: the artifact is ORACLE-GATED through
 * [[graft.ops.TrainShuffle.packDigest]] — the round trip
 * `read(write(packed))` is bit-identical to `packed` (spec), so the
 * digest row DuckDB independently replays (`pack_ids_digest`) gates the
 * binary files' content, not just their relational twin.
 */
object BinShards {

  val Magic: Int = 0x47524654 // "GRFT" — the packed (pretraining) format
  val MagicSft: Int = 0x47524653 // "GRFS" — the no-split (SFT) format
  val Version: Int = 1
  /** Ceiling on a header's `budget` before the readers size buffers
    * from it: a corrupt/foreign idx must fail the module's loud require,
    * not a NegativeArraySizeException or an OOM — and 4*budget must stay
    * inside Int (2^28 ids = a 1 GiB single SEQUENCE, far past any real
    * training budget). */
  val MaxBudget: Int = 1 << 28
  /** Ceiling on numShards: the on-disk names are `%05d`-formatted and
    * every reader/sweeper/keep-test matches exactly five digits, so a
    * wider export would produce shards the whole module silently
    * ignores behind a valid commit marker — data truncation. Refused
    * loud at write time instead (one training file per shard keeps
    * real counts far below this anyway). */
  val MaxShards: Int = 99999
  /** Above this many surviving candidate pairs, the resume keep-test
    * runs as a small Spark job instead of a serial driver loop — at
    * 10k shards on object storage the per-pair idx round trips are
    * the resume's startup cost, and they parallelize embarrassingly. */
  private val KeepTestDriverMax = 32
  private[sources] val CommitMarker = "_BIN_COMMIT"
  private[sources] val ConfigMarker = "_BIN_CONFIG"
  private val HeaderBytes = 4 + 4 + 4 + 8 + 8
  private val SftHeaderBytes = 4 + 4 + 4 + 8 + 8 + 8
  private[sources] val ShardFile = """shard-(\d{5})\.idx""".r
  private[sources] val ShardBinFile = """shard-(\d{5})\.bin""".r
  private[sources] val SftFile = """sft-(\d{5})\.idx""".r
  private[sources] val SftBinFile = """sft-(\d{5})\.bin""".r
  /** Marker keys the writers own — caller-supplied identity lines must
    * not collide with them (a caller overriding `budget` in the marker
    * would defeat the wrong-budget-replay protection; `epochs` is
    * BinFamily's committed-epoch count, equally load-bearing for the
    * manifest surface). */
  private val ReservedMarkerKeys =
    Set("version", "kind", "budget", "shards", "epochs")

  private[sources] def fsOf(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  /** Parsed + validated packed-idx contents: (budget, nSeqs, nIds,
    * lens). The ONE validation implementation shared by [[read]] (loud
    * requires) and the resume keep-test (boolean wrapper) — two copies
    * would drift on the next format change. */
  private def parsePackedIdx(bytes: Array[Byte], fileLen: Long,
      where: String): (Int, Long, Long, Array[Int]) = {
    val idx = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(idx.getInt() == Magic && idx.getInt() == Version,
      s"$where bad magic/version")
    val budget = idx.getInt()
    require(budget > 0 && budget <= MaxBudget,
      s"$where bad budget $budget — corrupt or foreign idx (readers " +
        "size buffers from this field)")
    val nSeqs = idx.getLong()
    val nIds = idx.getLong()
    require(nSeqs > 0, s"$where has zero sequences")
    require(fileLen == HeaderBytes + 4L * nSeqs,
      s"$where length table size mismatch")
    val lens = Array.fill(nSeqs.toInt)(idx.getInt())
    require(lens.map(_.toLong).sum == nIds &&
      lens.forall(l => l > 0 && l <= budget) &&
      lens.dropRight(1).forall(_ == budget),
      s"$where inconsistent sequence lengths")
    (budget, nSeqs, nIds, lens)
  }

  /** Does shard `s` have a COMPLETE pair on disk that validates against
    * this write's config? The resume keep-test: [[parsePackedIdx]]'s
    * full validation plus the same budget, shard inside the current
    * range, bin size exactly 4*n_ids. Validation failures of any kind
    * (truncated, foreign, corrupt) just mean "rewrite it". */
  private def validShardPair(fs: FileSystem, dir: String, s: Long,
      budget: Int, numShards: Int): Boolean = {
    if (s >= numShards) return false
    val idxPath = new Path(dir, f"shard-$s%05d.idx")
    val binPath = new Path(dir, f"shard-$s%05d.bin")
    try {
      if (!fs.exists(idxPath) || !fs.exists(binPath)) return false
      val len = fs.getFileStatus(idxPath).getLen
      if (len < HeaderBytes || len > (1L << 31) - 1) return false
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(idxPath)
      try in.readFully(0L, bytes) finally in.close()
      val (b, _, nIds, _) = parsePackedIdx(bytes, len, idxPath.toString)
      b == budget && fs.getFileStatus(binPath).getLen == 4L * nIds
    } catch { case _: Exception => false }
  }

  /** Parsed + validated SFT-idx contents: (budget, nBins, nIds, nDocs,
    * lens, docCounts, buffer positioned at the starts section). The ONE
    * validation implementation shared by [[readNoSplit]] (loud
    * requires), [[readBin]] and the SFT resume keep-test — the
    * [[parsePackedIdx]] posture applied to the no-split format. */
  private def parseSftIdx(bytes: Array[Byte], fileLen: Long,
      where: String): (Int, Long, Long, Long, Array[Int], Array[Int],
      ByteBuffer) = {
    val idx = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(idx.getInt() == MagicSft && idx.getInt() == Version,
      s"$where bad magic/version")
    val budget = idx.getInt()
    require(budget > 0 && budget <= MaxBudget,
      s"$where bad budget $budget — corrupt or foreign idx (readers " +
        "size buffers from this field)")
    val nBins = idx.getLong()
    val nIds = idx.getLong()
    val nDocs = idx.getLong()
    require(fileLen ==
        SftHeaderBytes + 4L * nBins + 4L * nBins + 8L * nDocs,
      s"$where section sizes mismatch")
    require(nBins > 0, s"$where has zero bins")
    val lens = Array.fill(nBins.toInt)(idx.getInt())
    val docCounts = Array.fill(nBins.toInt)(idx.getInt())
    require(lens.map(_.toLong).sum == nIds &&
      lens.forall(l => l >= 0 && l <= budget) &&
      docCounts.map(_.toLong).sum == nDocs && docCounts.forall(_ >= 1),
      s"$where inconsistent bin tables")
    (budget, nBins, nIds, nDocs, lens, docCounts, idx)
  }

  /** The SFT twin of [[validShardPair]]: does sft shard `s` have a
    * COMPLETE pair on disk that validates against this write's config?
    * Same contract — any validation failure just means "rewrite it". */
  private def validSftPair(fs: FileSystem, dir: String, s: Long,
      budget: Int, numShards: Int): Boolean = {
    if (s >= numShards) return false
    val idxPath = new Path(dir, f"sft-$s%05d.idx")
    val binPath = new Path(dir, f"sft-$s%05d.bin")
    try {
      if (!fs.exists(idxPath) || !fs.exists(binPath)) return false
      val len = fs.getFileStatus(idxPath).getLen
      if (len < SftHeaderBytes || len > (1L << 31) - 1) return false
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(idxPath)
      try in.readFully(0L, bytes) finally in.close()
      val (b, _, nIds, _, _, _, _) = parseSftIdx(bytes, len,
        idxPath.toString)
      b == budget && fs.getFileStatus(binPath).getLen == 4L * nIds
    } catch { case _: Exception => false }
  }

  /** Run the resume keep-test over the candidate shard numbers. Small
    * candidate sets stay a driver loop (no job overhead); past
    * [[KeepTestDriverMax]] the per-pair idx reads run as ONE bounded
    * Spark job — the 10k-shard resume's startup cost is object-store
    * round trips, and they parallelize embarrassingly. The collected
    * result is shard NUMBERS only (<= numShards longs, bounded). */
  private def keptShards(spark: SparkSession,
      confSer: org.apache.spark.SerializableWritable[Configuration],
      dir: String, candidates: Seq[Long],
      valid: (FileSystem, String, Long) => Boolean): Set[Long] = {
    if (candidates.isEmpty) Set.empty
    else if (candidates.size <= KeepTestDriverMax) {
      val fs = fsOf(dir, confSer.value)
      candidates.filter(s => valid(fs, dir, s)).toSet
    } else {
      import spark.implicits._
      spark.createDataset(candidates)
        .repartition(math.max(1, math.min(candidates.size,
          spark.sparkContext.defaultParallelism * 2)))
        .mapPartitions { it =>
          val fsx = fsOf(dir, confSer.value)
          it.filter(s => valid(fsx, dir, s))
        }
        .collect().toSet
    }
  }

  /** Render caller-supplied artifact identity (tokenizer vocab size,
    * alphabet, pretokenizer mode, ...) as marker lines — sorted for
    * determinism, validated against the writer-owned keys so an
    * identity entry can never shadow `budget`/`shards`/`kind`. */
  private[sources] def identityLines(fn: String,
      identity: Map[String, String]): String = {
    identity.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains("=") && !k.contains("\n") &&
          !v.contains("\n"),
        s"$fn: identity keys must be non-empty and '='/newline-free, " +
          s"values newline-free — got '$k'='$v'")
      require(!ReservedMarkerKeys(k),
        s"$fn: identity key '$k' collides with a writer-owned marker field")
    }
    identity.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v\n" }.mkString
  }

  /** Bounded read of the `_BIN_CONFIG` sidecar under `dir` — the ONE
    * implementation behind both resume gates (write / writeNoSplit) and
    * the append gate (BinFamily.appendEpoch): three copies of the
    * read/size-bound logic would desynchronize the gates on the next
    * config-format change. `strict = true` (the append gate) fails
    * LOUD on an implausible size — appending onto a foreign/corrupt
    * root must refuse; `strict = false` (the resume gates) maps it to
    * None — resume's safe fallback is a full rewrite, never a throw. */
  private[sources] def readConfigSidecar(fs: FileSystem, dir: String,
      strict: Boolean): Option[String] = {
    val cp = new Path(dir, ConfigMarker)
    if (!fs.exists(cp)) None
    else {
      val len = fs.getFileStatus(cp).getLen
      val plausible = len > 0 && len <= 4096
      if (!plausible) {
        require(!strict,
          s"BinShards: implausible $ConfigMarker size $len under $dir " +
            "— foreign or corrupt family root")
        None
      } else {
        val bytes = new Array[Byte](len.toInt)
        val in = fs.open(cp)
        try in.readFully(0L, bytes) finally in.close()
        Some(new String(bytes, "UTF-8"))
      }
    }
  }

  /** The config sidecar's content for this write. `token` is the
    * caller's opaque layout identity (salt, tokenizer id, frame
    * version...) — anything that changes the packed CONTENT without
    * changing the file structure. The identity lines are part of the
    * config: a resume under a different stamped identity is a full
    * rewrite, so the commit marker's identity always describes every
    * byte in the directory. */
  private[sources] def configLine(kind: String, budget: Int, numShards: Int,
      token: String, identity: Map[String, String]): String =
    s"version=$Version\nkind=$kind\nbudget=$budget\nshards=$numShards\n" +
      s"token=$token\n" + identityLines("BinShards", identity)

  /**
   * Write a [[graft.ops.TrainShuffle.packIdSequences]] frame as binary
   * shard files. `budget` and `numShards` must be the pack call's own
   * (the packReport contract). Returns the number of shard file pairs
   * written. Overwrite semantics: stale shard files from a previous
   * (possibly wider) export are removed first — a narrowed re-export
   * can never leave orphan shards that a reader would mistake for
   * current data.
   *
   * `resume = true` is the 10k-shard crash economics switch: instead
   * of sweeping everything, shard pairs already on disk that VALIDATE
   * against this call's config are KEPT and their partitions never
   * re-export — a job that died at shard 9,970 of 10,000 rewrites 30
   * files, not 10,000. The config gate is TWO-LAYERED: the `_BIN_CONFIG`
   * sidecar (written before any export work, surviving crashes) must
   * match this call's (kind, budget, numShards, resumeToken, identity)
   * EXACTLY or nothing is kept — so a resumed call with a different
   * shard count or a different `resumeToken` falls back to a full
   * rewrite instead of silently keeping structurally-valid-but-wrong
   * shards; then each surviving pair must itself validate
   * (magic/version, same budget, shard < numShards, length table
   * consistent, bin size = 4*n_ids). `resumeToken` is REQUIRED
   * non-empty under resume and must carry everything that changes the
   * packed CONTENT without changing file structure — the salt, a
   * tokenizer CONTENT fingerprint, a corpus fingerprint (see
   * `graft_bin_export`'s stamped token): the gate detects CONFIG
   * changes, not content changes behind an unchanged token, so a
   * caller that stamps bare paths re-opens the retrain-in-place hole.
   * Stale/corrupt/out-of-range pairs and temp litter are still swept;
   * past [[KeepTestDriverMax]] candidates the keep-test runs as one
   * bounded Spark job instead of serial driver IO. The marker
   * discipline is unchanged (deleted first, stamped last), so a
   * mid-resume crash still presents as torn; within an unchanged config
   * the pack is deterministic, and the digest gate
   * ([[graft.ops.TrainShuffle.packDigest]] vs the file-derived rows)
   * remains the post-hoc certification that kept bytes match.
   *
   * `identity` — caller-supplied artifact identity lines (tokenizer
   * vocab size / alphabet / pretok, ...) stamped into `_BIN_COMMIT`,
   * so [[commitInfo]] / the `graft_bin_manifest` TVF can catch a
   * wrong-vocab pairing from the files ALONE, without the producer's
   * relational manifest row.
   */
  def write(packed: DataFrame, dir: String, budget: Int,
      numShards: Int, resume: Boolean = false,
      resumeToken: String = "",
      identity: Map[String, String] = Map.empty): Long = {
    require(budget > 0, s"BinShards.write: budget must be positive, got $budget")
    require(numShards > 0 && numShards <= MaxShards,
      s"BinShards.write: numShards must be in [1, $MaxShards] (the %05d " +
        s"shard-name domain every reader matches), got $numShards")
    require(!resumeToken.contains("\n"),
      "BinShards.write: resumeToken must be newline-free")
    require(!resume || resumeToken.nonEmpty,
      "BinShards.write: resume=true requires a non-empty resumeToken — " +
        "an empty token cannot distinguish the survivors' content " +
        "(salt/tokenizer/corpus) from this call's, so nothing could be " +
        "safely kept")
    val spark = packed.sparkSession
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = fsOf(dir, confSer.value)
    val dirPath = new Path(dir)
    // Validate identity (and render the config) BEFORE the marker
    // delete — a rejected call must leave no side effects.
    val config = configLine("packed", budget, numShards, resumeToken,
      identity)
    // Crash-window ordering: kill the marker BEFORE touching any file.
    fs.delete(new Path(dirPath, CommitMarker), false)
    fs.mkdirs(dirPath)
    // Resume is honoured only when the surviving files were written
    // under EXACTLY this config (sidecar match) — a changed shard
    // count/salt/token makes every structurally-valid survivor wrong.
    val configMatches =
      readConfigSidecar(fs, dir, strict = false).contains(config)
    // Pass 1: under resume, find complete shard pairs that validate
    // against THIS config; pass 2: sweep every shard/sft/temp file that
    // is not part of a kept pair. (Two passes because the kept .bin
    // must survive the sweep, and listing order is arbitrary. Anchored
    // full-name matches only — a `.tmp-7-shard-00001.bin` orphan must
    // never ride a kept shard number through the sweep.)
    val names = fs.listStatus(dirPath).map(_.getPath.getName)
    val kept: Set[Long] =
      if (!resume || !configMatches) Set.empty
      else {
        // Candidates = shard numbers with BOTH files present (from the
        // one listing already in hand); the per-pair validation reads
        // distribute past the driver-loop threshold.
        val idxNums = names.collect { case ShardFile(n) => n.toLong }.toSet
        val binNums =
          names.collect { case ShardBinFile(n) => n.toLong }.toSet
        val candidates =
          (idxNums & binNums).filter(_ < numShards).toSeq.sorted
        keptShards(spark, confSer, dir, candidates,
          (fsx, d, s) => validShardPair(fsx, d, s, budget, numShards))
      }
    names.foreach { n =>
      val keepIt = n match {
        case ShardFile(num) => kept(num.toLong)
        case ShardBinFile(num) => kept(num.toLong)
        case _ => false
      }
      // A dir is owned by ONE artifact kind: sweep the other kind's
      // files too, or a packed write over a former sft dir would leave
      // readNoSplit a valid-looking marker over stale sft data.
      if (!keepIt && (n.startsWith("shard-") || n.startsWith("sft-") ||
          n.startsWith(".tmp-")))
        fs.delete(new Path(dirPath, n), false)
    }
    // Record this write's config BEFORE any export work: a crash
    // mid-export leaves the sidecar describing the files on disk, which
    // is exactly what the next resume needs to trust them.
    val cfgOut = fs.create(new Path(dirPath, ConfigMarker), true)
    cfgOut.write(config.getBytes("UTF-8")); cfgOut.close()
    val todo =
      if (kept.isEmpty) packed
      else packed.filter(!col("shard").isin(kept.toSeq: _*))
    exportPackedShardFiles(todo, dir, budget, numShards, confSer,
      minShard = 0L, maxShardExcl = numShards.toLong)
    val written = fs.listStatus(dirPath)
      .count(st => st.getPath.getName match {
        case ShardFile(_) => true  // anchored: a .tmp- orphan from a
        case _ => false            // failed attempt must not inflate
      })                           // the marker's shards= field
    val mk = fs.create(new Path(dirPath, CommitMarker), true)
    mk.write((s"version=$Version\nbudget=$budget\nshards=$written\n" +
      identityLines("BinShards.write", identity)).getBytes("UTF-8"))
    mk.close()
    written.toLong
  }

  /**
   * The packed-format file exporter shared by [[write]] and the
   * managed epoch-append family ([[BinFamily.appendEpoch]]): one file
   * PAIR per shard written by the one task owning the shard's hash
   * partition (temp+rename; the task-completion listener closes a
   * mid-shard casualty's temp handle). `[minShard, maxShardExcl)` is
   * the caller's ownership claim over the shard-number space — a frame
   * row outside it fails loud in the writing task, so an append can
   * never silently overwrite another epoch's files (and a plain write
   * can never emit a shard past its declared count, which the marker's
   * file-count field would otherwise absorb).
   */
  private[sources] def exportPackedShardFiles(frame: DataFrame,
      dir: String, budget: Int, numPartitions: Int,
      confSer: org.apache.spark.SerializableWritable[Configuration],
      minShard: Long, maxShardExcl: Long): Unit = {
    frame
      .select(col("shard").cast("long").as("shard"),
        col("seq").cast("long").as("seq"), col("ids"),
        col("n_ids").cast("long").as("n_ids"))
      .repartition(numPartitions, col("shard"))
      .sortWithinPartitions("shard", "seq")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = confSer.value
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var shard = Long.MinValue
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var tmpBin: Path = null
        // A task that dies mid-shard (a validation require, an
        // executor kill) must not leak the open temp-file handle until
        // executor teardown — the reader-side posture applied to the
        // writer. The orphaned .tmp- file itself is cleaned by the
        // next write's stale sweep and is invisible to readers.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            if (out != null) try out.close() catch { case _: Exception => }
          })
        val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
        var nIds = 0L
        val buf = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
        def flushBuf(): Unit = {
          out.write(buf.array, 0, buf.position()); buf.clear()
        }
        def putInt(v: Int): Unit = {
          if (buf.remaining() < 4) flushBuf()
          buf.putInt(v)
        }
        def closeShard(): Unit = if (shard != Long.MinValue) {
          val fsx = fsOf(dir, conf)
          flushBuf(); out.close(); out = null
          val idxBuf = ByteBuffer
            .allocate(HeaderBytes + 4 * lens.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          idxBuf.putInt(Magic).putInt(Version).putInt(budget)
            .putLong(lens.length.toLong).putLong(nIds)
          lens.foreach(idxBuf.putInt)
          val tmpIdx = new Path(dir, f".tmp-$attempt-shard-$shard%05d.idx")
          val io = fsx.create(tmpIdx, true)
          try io.write(idxBuf.array, 0, idxBuf.position())
          finally io.close()
          val finBin = new Path(dir, f"shard-$shard%05d.bin")
          val finIdx = new Path(dir, f"shard-$shard%05d.idx")
          fsx.delete(finBin, false); fsx.delete(finIdx, false)
          require(fsx.rename(tmpBin, finBin) && fsx.rename(tmpIdx, finIdx),
            s"BinShards.write: rename failed for shard $shard")
        }
        it.foreach { r =>
          val s = r.getLong(0)
          require(s >= minShard && s < maxShardExcl,
            s"BinShards.write: shard $s outside this write's owned " +
              s"range [$minShard, $maxShardExcl) — wrong numShards, or " +
              "an append frame not shifted to its epoch's span")
          if (s != shard) {
            closeShard()
            shard = s; lens.clear(); nIds = 0L
            tmpBin = new Path(dir, f".tmp-$attempt-shard-$shard%05d.bin")
            out = fsOf(dir, conf).create(tmpBin, true)
          }
          val seq = r.getLong(1)
          require(seq == lens.length.toLong,
            s"BinShards.write: shard $shard sequences not dense at $seq " +
              s"(expected ${lens.length}) — not a packIdSequences frame?")
          require(lens.isEmpty || lens.last == budget,
            s"BinShards.write: shard $shard seq ${lens.length - 1} is " +
              "short but not final — not a packIdSequences frame?")
          val ids = r.getSeq[Int](2)
          require(ids.length.toLong == r.getLong(3) && ids.length <= budget,
            s"BinShards.write: shard $shard seq $seq n_ids mismatch/over")
          ids.foreach(putInt)
          lens += ids.length
          nIds += ids.length.toLong
        }
        closeShard()
      }
  }

  /**
   * Read binary shard files back as the exact
   * [[graft.ops.TrainShuffle.packIdSequences]] frame: (shard, seq, ids
   * ARRAY<INT>, n_ids). Refuses a directory without the commit marker
   * (torn export) and validates every idx header + length table against
   * the data file byte-for-byte. Driver cost is ONE bounded directory
   * listing (numShards entries); each shard streams through one task,
   * one sequence in memory at a time.
   */
  def read(spark: SparkSession, dirOrRoot: String): DataFrame = {
    import spark.implicits._
    // A managed BinFamily root resolves to its active generation; a
    // plain export dir passes through (all read-side entry points).
    val dir = BinFamily.resolveDir(spark, dirOrRoot)
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = fsOf(dir, confSer.value)
    val dirPath = new Path(dir)
    require(fs.exists(new Path(dirPath, CommitMarker)),
      s"BinShards.read: no $CommitMarker under $dir — torn or foreign " +
        "export; re-run the write")
    val paths = fs.listStatus(dirPath)
      .map(_.getPath.getName)
      .collect { case n @ ShardFile(_) => s"$dir/$n" }
      .sorted.toSeq
    if (paths.isEmpty)
      return spark.emptyDataset[(Long, Long, Array[Int], Long)]
        .toDF("shard", "seq", "ids", "n_ids")
    spark.createDataset(paths)
      .repartition(paths.size)
      .flatMap { idxPath =>
        val conf = confSer.value
        val shard = new Path(idxPath).getName match {
          case ShardFile(num) => num.toLong
          case other => throw new IllegalArgumentException(
            s"BinShards.read: unexpected shard file name $other")
        }
        val fsx = fsOf(idxPath, conf)
        val idxSt = fsx.getFileStatus(new Path(idxPath))
        require(idxSt.getLen >= HeaderBytes && idxSt.getLen <= (1L << 31) - 1,
          s"BinShards.read: $idxPath header/size out of range " +
            s"(${idxSt.getLen} bytes) — truncated, or a shard far past " +
            "the one-training-file contract (re-shard the export)")
        val idxBytes = new Array[Byte](idxSt.getLen.toInt)
        val in = fsx.open(new Path(idxPath))
        in.readFully(0L, idxBytes); in.close()
        // The ONE shared validation implementation (parsePackedIdx) —
        // the resume keep-test wraps the same parse, so the two can
        // never drift on a format change.
        val (budget, nSeqs, nIds, lens) = parsePackedIdx(idxBytes,
          idxSt.getLen, s"BinShards.read: $idxPath")
        val binPath = new Path(idxPath.stripSuffix(".idx") + ".bin")
        require(fsx.getFileStatus(binPath).getLen == 4L * nIds,
          s"BinShards.read: $binPath size != 4 * n_ids")
        val bin = fsx.open(binPath)
        var binClosed = false
        def closeBin(): Unit = if (!binClosed) { binClosed = true; bin.close() }
        // A non-drained iterator (downstream limit, task kill, a
        // mid-read failure) must not leak the handle until executor
        // teardown: task completion ALWAYS fires, drained or not.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeBin()))
        val byteBuf = new Array[Byte](4 * budget)
        // Lazy per-sequence stream: one budget-sized buffer per task,
        // never a whole shard in memory; the handle closes with the
        // last sequence (eager for the common drained case) or at task
        // completion (the listener above) — whichever comes first.
        new Iterator[(Long, Long, Array[Int], Long)] {
          private var i = 0
          private var off = 0L
          def hasNext: Boolean = i < nSeqs
          def next(): (Long, Long, Array[Int], Long) = {
            val len = lens(i)
            bin.readFully(off, byteBuf, 0, 4 * len)
            off += 4L * len
            val bb = ByteBuffer.wrap(byteBuf, 0, 4 * len)
              .order(ByteOrder.LITTLE_ENDIAN)
            val ids = Array.fill(len)(bb.getInt())
            val row = (shard, i.toLong, ids, len.toLong)
            i += 1
            if (i == nSeqs.toInt) closeBin()
            row
          }
        }
      }
      .toDF("shard", "seq", "ids", "n_ids")
  }

  /**
   * Parse the commit marker of an exported directory — the artifact's
   * own identity row (version, budget, shard count, and `kind=sft` for
   * the no-split twin): one bounded driver read, the dispatch point for
   * kind-agnostic consumers like the `graft_bin_digest` TVF. Refuses a
   * marker-less (torn/foreign) dir exactly like the readers.
   */
  def commitInfo(spark: SparkSession, dirOrRoot: String): Map[String, String] = {
    val dir = BinFamily.resolveDir(spark, dirOrRoot)
    val fs = fsOf(dir, spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, CommitMarker)
    require(fs.exists(marker),
      s"BinShards.commitInfo: no $CommitMarker under $dir — torn or " +
        "foreign export; re-run the write")
    val len = fs.getFileStatus(marker).getLen
    require(len > 0 && len <= 4096,
      s"BinShards.commitInfo: $marker implausible size $len")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(marker)
    try in.readFully(0L, bytes) finally in.close()
    new String(bytes, "UTF-8").split("\n").iterator
      .map(_.trim).filter(_.contains("="))
      .map { line =>
        val Array(k, v) = line.split("=", 2)
        k -> v
      }.toMap
  }

  /**
   * Point lookup of ONE sequence from a packed export — the byte seek
   * the `.idx` header exists for: every non-final sequence length
   * equals `budget`, so sequence k's ids start at data byte
   * `4*k*budget` and its own length is the single idx entry at
   * `HeaderBytes + 4*k`. Three bounded reads (header, one length
   * entry, <= 4*budget data bytes), no Spark job, no length-table
   * scan — the random-access path a training loader uses to fetch one
   * example. Validation is deliberately the O(1) subset of [[read]]'s
   * (marker, magic/version, budget bound, the requested extent); whole-
   * file consistency stays the bulk reader's job — [[BinShardsSpec]]
   * pins this lookup against the full read for every (shard, seq).
   */
  def readSequence(spark: SparkSession, dirOrRoot: String, shard: Long,
      seq: Long): Array[Int] = {
    val dir = BinFamily.resolveDir(spark, dirOrRoot)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(dir, conf)
    require(fs.exists(new Path(dir, CommitMarker)),
      s"BinShards.readSequence: no $CommitMarker under $dir — torn or " +
        "foreign export; re-run the write")
    val idxPath = new Path(dir, f"shard-$shard%05d.idx")
    require(fs.exists(idxPath),
      s"BinShards.readSequence: no shard $shard under $dir")
    val header = new Array[Byte](HeaderBytes)
    val in = fs.open(idxPath)
    try {
      in.readFully(0L, header)
      val h = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
      require(h.getInt() == Magic && h.getInt() == Version,
        s"BinShards.readSequence: $idxPath bad magic/version")
      val budget = h.getInt()
      require(budget > 0 && budget <= MaxBudget,
        s"BinShards.readSequence: $idxPath bad budget $budget — corrupt " +
          "or foreign idx")
      val nSeqs = h.getLong()
      require(seq >= 0 && seq < nSeqs,
        s"BinShards.readSequence: seq $seq out of range [0, $nSeqs) in " +
          s"shard $shard")
      val lenBytes = new Array[Byte](4)
      in.readFully(HeaderBytes + 4L * seq, lenBytes)
      val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN)
        .getInt()
      require(len > 0 && len <= budget &&
          (len == budget || seq == nSeqs - 1),
        s"BinShards.readSequence: shard $shard seq $seq bad length $len")
      val binPath = new Path(dir, f"shard-$shard%05d.bin")
      val bytes = new Array[Byte](4 * len)
      val bin = fs.open(binPath)
      try bin.readFully(4L * seq * budget, bytes) finally bin.close()
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(len)(bb.getInt())
    } finally in.close()
  }

  /**
   * Point lookup of ONE bin from an SFT export — the [[readSequence]]
   * posture applied to the no-split `.idx`'s fixed-width sections.
   * Bins are UNPADDED in the data file, so a bin's byte offset is the
   * prefix sum of the lengths before it: the lookup reads the length
   * and doc-count TABLE PREFIXES up to `bin` (two ranged reads of
   * `4*(bin+1)` bytes each — bounded by the tiny int32 tables, never
   * by data), then seeks straight to the bin's ids and its starts
   * slice. O(bin) table entries + O(1) data reads; no Spark job, no
   * full idx parse, no other bin's data touched. Returns (ids, starts)
   * — the loss-mask metadata rides along, as it does in the bulk read.
   * Whole-file consistency stays [[readNoSplit]]'s job; the spec pins
   * this lookup against the full read for every (shard, bin).
   */
  def readBin(spark: SparkSession, dirOrRoot: String, shard: Long,
      bin: Long): (Array[Int], Array[Long]) = {
    val dir = BinFamily.resolveDir(spark, dirOrRoot)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(dir, conf)
    require(fs.exists(new Path(dir, CommitMarker)),
      s"BinShards.readBin: no $CommitMarker under $dir — torn or " +
        "foreign export; re-run the write")
    val idxPath = new Path(dir, f"sft-$shard%05d.idx")
    require(fs.exists(idxPath),
      s"BinShards.readBin: no shard $shard under $dir")
    val header = new Array[Byte](SftHeaderBytes)
    val in = fs.open(idxPath)
    try {
      in.readFully(0L, header)
      val h = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
      require(h.getInt() == MagicSft && h.getInt() == Version,
        s"BinShards.readBin: $idxPath bad magic/version")
      val budget = h.getInt()
      require(budget > 0 && budget <= MaxBudget,
        s"BinShards.readBin: $idxPath bad budget $budget — corrupt or " +
          "foreign idx")
      val nBins = h.getLong()
      val nIds = h.getLong()
      val nDocs = h.getLong()
      require(bin >= 0 && bin < nBins,
        s"BinShards.readBin: bin $bin out of range [0, $nBins) in " +
          s"shard $shard")
      // Length-table prefix [0..bin]: one ranged read; the bin's data
      // offset is the prefix sum, its length the final entry.
      val lenPrefix = new Array[Byte](4 * (bin.toInt + 1))
      in.readFully(SftHeaderBytes.toLong, lenPrefix)
      val lb = ByteBuffer.wrap(lenPrefix).order(ByteOrder.LITTLE_ENDIAN)
      var idOff = 0L
      var i = 0L
      while (i < bin) { idOff += lb.getInt(); i += 1 }
      val len = lb.getInt()
      require(len >= 0 && len <= budget && idOff + len <= nIds,
        s"BinShards.readBin: shard $shard bin $bin bad length $len")
      // Doc-count-table prefix: same shape, one section over.
      val dcPrefix = new Array[Byte](4 * (bin.toInt + 1))
      in.readFully(SftHeaderBytes + 4L * nBins, dcPrefix)
      val db = ByteBuffer.wrap(dcPrefix).order(ByteOrder.LITTLE_ENDIAN)
      var startOff = 0L
      i = 0L
      while (i < bin) { startOff += db.getInt(); i += 1 }
      val nDocsBin = db.getInt()
      require(nDocsBin >= 1 && startOff + nDocsBin <= nDocs,
        s"BinShards.readBin: shard $shard bin $bin bad doc count $nDocsBin")
      val startBytes = new Array[Byte](8 * nDocsBin)
      in.readFully(SftHeaderBytes + 8L * nBins + 8L * startOff, startBytes)
      val sb = ByteBuffer.wrap(startBytes).order(ByteOrder.LITTLE_ENDIAN)
      val starts = Array.fill(nDocsBin)(sb.getLong())
      require(starts.isEmpty || (starts.head == 0L &&
          starts.zip(starts.tail).forall(p => p._1 <= p._2) &&
          starts.last <= len.toLong),
        s"BinShards.readBin: shard $shard bin $bin starts not ascending " +
          "within the bin's extent")
      val binPath = new Path(dir, f"sft-$shard%05d.bin")
      val bytes = new Array[Byte](4 * len)
      val binIn = fs.open(binPath)
      try binIn.readFully(4L * idOff, bytes) finally binIn.close()
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      (Array.fill(len)(bb.getInt()), starts)
    } finally in.close()
  }

  /**
   * Write a [[graft.ops.TrainShuffle.packNoSplitIds]] frame (the SFT
   * padded-bin export) as binary shard files — the no-split twin of
   * [[write]]. Layout per shard:
   *  - `sft-SSSSS.bin` — the bins' id streams concatenated in `bin`
   *    order, each UNPADDED (n_ids <= budget; pad-id policy belongs to
   *    the consumer), int32 LE.
   *  - `sft-SSSSS.idx` — header (magic `GRFS`, version, budget,
   *    n_bins int64, n_ids int64, n_docs int64) then three fixed-width
   *    sections: per-bin int32 id counts, per-bin int32 doc counts,
   *    and the flattened int64 doc-boundary `starts` in bin order —
   *    the loss-mask metadata ships INSIDE the artifact (the point of
   *    no-split packing), and every section is prefix-sum seekable.
   * Same commit-marker, temp+rename, stale-cleanup and single-writer
   * posture as [[write]]; a directory is owned by ONE artifact kind
   * (the writer clears both prefixes). `resume`, `resumeToken` and
   * `identity` carry [[write]]'s exact contract (two-layer config gate,
   * non-empty token required under resume, identity stamped into the
   * marker) applied to the sft pair validation ([[parseSftIdx]] — the
   * same parse [[readNoSplit]] trusts).
   */
  def writeNoSplit(packed: DataFrame, dir: String, budget: Int,
      numShards: Int, resume: Boolean = false,
      resumeToken: String = "",
      identity: Map[String, String] = Map.empty): Long = {
    require(budget > 0,
      s"BinShards.writeNoSplit: budget must be positive, got $budget")
    require(numShards > 0 && numShards <= MaxShards,
      s"BinShards.writeNoSplit: numShards must be in [1, $MaxShards] " +
        s"(the %05d shard-name domain every reader matches), got $numShards")
    require(!resumeToken.contains("\n"),
      "BinShards.writeNoSplit: resumeToken must be newline-free")
    require(!resume || resumeToken.nonEmpty,
      "BinShards.writeNoSplit: resume=true requires a non-empty " +
        "resumeToken — an empty token cannot distinguish the survivors' " +
        "content (salt/tokenizer/corpus) from this call's, so nothing " +
        "could be safely kept")
    val spark = packed.sparkSession
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = fsOf(dir, confSer.value)
    val dirPath = new Path(dir)
    // Same no-side-effects-on-rejection ordering as [[write]].
    val config = configLine("sft", budget, numShards, resumeToken,
      identity)
    fs.delete(new Path(dirPath, CommitMarker), false)
    fs.mkdirs(dirPath)
    val configMatches =
      readConfigSidecar(fs, dir, strict = false).contains(config)
    val names = fs.listStatus(dirPath).map(_.getPath.getName)
    val kept: Set[Long] =
      if (!resume || !configMatches) Set.empty
      else {
        val idxNums = names.collect { case SftFile(n) => n.toLong }.toSet
        val binNums = names.collect { case SftBinFile(n) => n.toLong }.toSet
        val candidates =
          (idxNums & binNums).filter(_ < numShards).toSeq.sorted
        keptShards(spark, confSer, dir, candidates,
          (fsx, d, s) => validSftPair(fsx, d, s, budget, numShards))
      }
    names.foreach { n =>
      val keepIt = n match {
        case SftFile(num) => kept(num.toLong)
        case SftBinFile(num) => kept(num.toLong)
        case _ => false
      }
      if (!keepIt && (n.startsWith("shard-") || n.startsWith("sft-") ||
          n.startsWith(".tmp-")))
        fs.delete(new Path(dirPath, n), false)
    }
    // Record this write's config so a later resume (or a packed RESUME
    // over this dir — kind mismatch) trusts exactly the right files.
    val cfgOut = fs.create(new Path(dirPath, ConfigMarker), true)
    cfgOut.write(config.getBytes("UTF-8"))
    cfgOut.close()
    val todo =
      if (kept.isEmpty) packed
      else packed.filter(!col("shard").isin(kept.toSeq: _*))
    exportSftShardFiles(todo, dir, budget, numShards, confSer,
      minShard = 0L, maxShardExcl = numShards.toLong)
    val written = fs.listStatus(dirPath)
      .count(st => st.getPath.getName match {
        case SftFile(_) => true // anchored, as in [[write]]
        case _ => false
      })
    val mk = fs.create(new Path(dirPath, CommitMarker), true)
    mk.write((s"version=$Version\nkind=sft\nbudget=$budget\n" +
      s"shards=$written\n" +
      identityLines("BinShards.writeNoSplit", identity)).getBytes("UTF-8"))
    mk.close()
    written.toLong
  }

  /**
   * The SFT-format file exporter shared by [[writeNoSplit]] and the
   * managed epoch-append family ([[BinFamily]]): one file PAIR per
   * shard written by the one task owning the shard's hash partition
   * (temp+rename; task-completion listener closes a mid-shard
   * casualty's temp handle). `[minShard, maxShardExcl)` is the
   * caller's ownership claim over the shard-number space — the
   * [[exportPackedShardFiles]] contract applied to the no-split
   * layout: a frame row outside it fails loud in the writing task, so
   * an append can never silently overwrite another epoch's files, and
   * a plain write can never emit a shard past its declared count
   * (which would %05d-widen past the name domain every reader
   * matches — invisible files behind a valid marker).
   */
  private[sources] def exportSftShardFiles(frame: DataFrame,
      dir: String, budget: Int, numPartitions: Int,
      confSer: org.apache.spark.SerializableWritable[Configuration],
      minShard: Long, maxShardExcl: Long): Unit = {
    frame
      .select(col("shard").cast("long").as("shard"),
        col("bin").cast("long").as("bin"), col("ids"),
        col("n_ids").cast("long").as("n_ids"),
        col("n_docs").cast("long").as("n_docs"), col("starts"))
      .repartition(numPartitions, col("shard"))
      .sortWithinPartitions("shard", "bin")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = confSer.value
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var shard = Long.MinValue
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var tmpBin: Path = null
        // Same mid-shard failure posture as [[write]]: task completion
        // closes whatever temp handle is open.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            if (out != null) try out.close() catch { case _: Exception => }
          })
        val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
        val docCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
        val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
        var nIds = 0L
        val buf = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
        def flushBuf(): Unit = {
          out.write(buf.array, 0, buf.position()); buf.clear()
        }
        def putInt(v: Int): Unit = {
          if (buf.remaining() < 4) flushBuf()
          buf.putInt(v)
        }
        def closeShard(): Unit = if (shard != Long.MinValue) {
          val fsx = fsOf(dir, conf)
          flushBuf(); out.close(); out = null
          val idxBuf = ByteBuffer
            .allocate(SftHeaderBytes + 4 * lens.length +
              4 * docCounts.length + 8 * starts.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          idxBuf.putInt(MagicSft).putInt(Version).putInt(budget)
            .putLong(lens.length.toLong).putLong(nIds)
            .putLong(starts.length.toLong)
          lens.foreach(idxBuf.putInt)
          docCounts.foreach(idxBuf.putInt)
          starts.foreach(idxBuf.putLong)
          val tmpIdx = new Path(dir, f".tmp-$attempt-sft-$shard%05d.idx")
          val io = fsx.create(tmpIdx, true)
          try io.write(idxBuf.array, 0, idxBuf.position())
          finally io.close()
          val finBin = new Path(dir, f"sft-$shard%05d.bin")
          val finIdx = new Path(dir, f"sft-$shard%05d.idx")
          fsx.delete(finBin, false); fsx.delete(finIdx, false)
          require(fsx.rename(tmpBin, finBin) && fsx.rename(tmpIdx, finIdx),
            s"BinShards.writeNoSplit: rename failed for shard $shard")
        }
        it.foreach { r =>
          val s = r.getLong(0)
          require(s >= minShard && s < maxShardExcl,
            s"BinShards.writeNoSplit: shard $s outside this write's " +
              s"owned range [$minShard, $maxShardExcl) — wrong " +
              "numShards, or an append frame not shifted to its " +
              "epoch's span")
          if (s != shard) {
            closeShard()
            shard = s; lens.clear(); docCounts.clear(); starts.clear()
            nIds = 0L
            tmpBin = new Path(dir, f".tmp-$attempt-sft-$shard%05d.bin")
            out = fsOf(dir, conf).create(tmpBin, true)
          }
          val bin = r.getLong(1)
          require(bin == lens.length.toLong,
            s"BinShards.writeNoSplit: shard $shard bins not dense at " +
              s"$bin (expected ${lens.length}) — not a packNoSplitIds frame?")
          val ids = r.getSeq[Int](2)
          require(ids.length.toLong == r.getLong(3) && ids.length <= budget,
            s"BinShards.writeNoSplit: shard $shard bin $bin n_ids " +
              "mismatch/over budget")
          val binStarts = r.getSeq[Long](5)
          require(binStarts.length.toLong == r.getLong(4),
            s"BinShards.writeNoSplit: shard $shard bin $bin n_docs != " +
              "starts length")
          require(binStarts.isEmpty || (binStarts.head == 0L &&
              binStarts.zip(binStarts.tail).forall(p => p._1 <= p._2) &&
              binStarts.last <= ids.length.toLong),
            s"BinShards.writeNoSplit: shard $shard bin $bin starts not " +
              "ascending within the bin's extent")
          ids.foreach(putInt)
          lens += ids.length
          docCounts += binStarts.length
          starts ++= binStarts
          nIds += ids.length.toLong
        }
        closeShard()
      }
  }

  /**
   * Read SFT binary shard files back as the exact
   * [[graft.ops.TrainShuffle.packNoSplitIds]] frame: (shard, bin, ids,
   * n_ids, n_docs, starts). Same marker/validation posture as [[read]];
   * one bin in memory at a time.
   */
  def readNoSplit(spark: SparkSession, dirOrRoot: String): DataFrame = {
    import spark.implicits._
    val dir = BinFamily.resolveDir(spark, dirOrRoot)
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = fsOf(dir, confSer.value)
    val dirPath = new Path(dir)
    require(fs.exists(new Path(dirPath, CommitMarker)),
      s"BinShards.readNoSplit: no $CommitMarker under $dir — torn or " +
        "foreign export; re-run the write")
    val paths = fs.listStatus(dirPath)
      .map(_.getPath.getName)
      .collect { case n @ SftFile(_) => s"$dir/$n" }
      .sorted.toSeq
    if (paths.isEmpty)
      return spark
        .emptyDataset[(Long, Long, Array[Int], Long, Long, Array[Long])]
        .toDF("shard", "bin", "ids", "n_ids", "n_docs", "starts")
    spark.createDataset(paths)
      .repartition(paths.size)
      .flatMap { idxPath =>
        val conf = confSer.value
        val shard = new Path(idxPath).getName match {
          case SftFile(num) => num.toLong
          case other => throw new IllegalArgumentException(
            s"BinShards.readNoSplit: unexpected shard file name $other")
        }
        val fsx = fsOf(idxPath, conf)
        val idxSt = fsx.getFileStatus(new Path(idxPath))
        require(idxSt.getLen >= SftHeaderBytes &&
            idxSt.getLen <= (1L << 31) - 1,
          s"BinShards.readNoSplit: $idxPath header/size out of range " +
            s"(${idxSt.getLen} bytes) — truncated, or a shard far past " +
            "the one-training-file contract (re-shard the export)")
        val idxBytes = new Array[Byte](idxSt.getLen.toInt)
        val in = fsx.open(new Path(idxPath))
        in.readFully(0L, idxBytes); in.close()
        // The ONE shared validation implementation (parseSftIdx) — the
        // resume keep-test and the point lookup wrap the same parse, so
        // they can never drift on a format change.
        val (budget, nBins, nIds, _, lens, docCounts, idx) =
          parseSftIdx(idxBytes, idxSt.getLen,
            s"BinShards.readNoSplit: $idxPath")
        val binPath = new Path(idxPath.stripSuffix(".idx") + ".bin")
        require(fsx.getFileStatus(binPath).getLen == 4L * nIds,
          s"BinShards.readNoSplit: $binPath size != 4 * n_ids")
        val bin = fsx.open(binPath)
        var binClosed = false
        def closeBin(): Unit = if (!binClosed) { binClosed = true; bin.close() }
        // Same non-drained-iterator posture as [[read]]: task completion
        // always fires, so an early-abort consumer can't leak the handle.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeBin()))
        val byteBuf = new Array[Byte](4 * budget)
        new Iterator[(Long, Long, Array[Int], Long, Long, Array[Long])] {
          private var i = 0
          private var off = 0L
          def hasNext: Boolean = i < nBins
          def next(): (Long, Long, Array[Int], Long, Long, Array[Long]) = {
            val len = lens(i)
            bin.readFully(off, byteBuf, 0, 4 * len)
            off += 4L * len
            val bb = ByteBuffer.wrap(byteBuf, 0, 4 * len)
              .order(ByteOrder.LITTLE_ENDIAN)
            val ids = Array.fill(len)(bb.getInt())
            val st = Array.fill(docCounts(i))(idx.getLong())
            val row = (shard, i.toLong, ids, len.toLong,
              docCounts(i).toLong, st)
            i += 1
            if (i == nBins.toInt) closeBin()
            row
          }
        }
      }
      .toDF("shard", "bin", "ids", "n_ids", "n_docs", "starts")
  }
}
