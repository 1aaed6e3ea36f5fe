package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trainable byte-pair-encoding subword tokenizer (Sennrich, Haddow &
 * Birch 2016, "Neural Machine Translation of Rare Words with Subword
 * Units") — the tokenizer whose token counts a training-data pipeline
 * budgets by. Whitespace word counts misestimate a BPE budget by
 * 1.3–2x depending on language/markup; this module lets `seqPack`,
 * `temperatureBudgets`, `packReport` and the mix operators budget in
 * MODEL tokens instead via their `tokensCol` hooks.
 *
 * Design (the persisted-model posture of [[IVF.ClusterModel]] /
 * `Bm25BatchModel`):
 *  - [[bpeTrain]] learns a merge table ONCE — classic BPE over the
 *    corpus's word-frequency dictionary: start from characters plus an
 *    end-of-word sentinel, repeatedly merge the most frequent adjacent
 *    symbol pair (ties broken lexicographically — fully deterministic,
 *    no RNG), recording each merge with its rank.
 *  - [[TokenizerModel]] is the merge table as a parquet-persistable
 *    frame; the parquet round trip is bit-exact (strings + ints).
 *  - [[bpeEncode]] / [[bpeCount]] replay the merges per word in rank
 *    order — ONE stateless typed pass with the model broadcast and a
 *    per-partition word memo (corpus words repeat massively, so each
 *    partition encodes each distinct word once). Stateless per-row ⇒
 *    no shuffle, embarrassingly parallel at any corpus size, and
 *    STREAM-NATIVE in append mode.
 *
 * Exactness: encoding is pure string arithmetic (no floats anywhere),
 * so results are bit-reproducible across engines and runs; the DuckDB
 * oracle replays per-WORD encodings as literals rendered through the
 * SAME [[encodeWord]] code path (the centroid/idf-literal pattern).
 *
 * Scale shape of training: ONE map-side-combining word-count
 * aggregation, frequency-TRUNCATED to the top `maxTrainWords` words
 * via TakeOrdered (bounded heap per partition + driver merge — never a
 * global sort). Truncation is the standard practice for BPE training
 * (the rare tail contributes negligible pair mass) and is the
 * documented approximation, NOT a silent cap on the encode side:
 * encoding handles ANY word (unseen characters simply remain
 * single-character tokens). The merge loop itself is driver-side over
 * the model-sized dictionary with INCREMENTAL pair statistics
 * (pair→count index + pair→postings, updates confined to the words
 * containing the merged pair — Sennrich et al.'s own reference
 * implementation's approach), so per-merge cost tracks the merged
 * pair's actual postings, not the whole dictionary: a full
 * [[MaxMerges]]-scale vocabulary trains in seconds, not the hours the
 * naive per-merge rescan would take.
 *
 * Alphabets: `"char"` starts each word from UTF-16 code units (a
 * non-BMP codepoint begins as two half-surrogate symbols — lossless,
 * spec-pinned); `"byte"` starts from UTF-8 bytes (each byte a
 * single-char symbol, codepoint = unsigned byte value), the GPT-2
 * lineage production tokenizers budget with. The alphabet is RECORDED
 * in the persisted [[TokenizerModel]] (the `_SPAN_K` marker
 * discipline) so an encode can never silently drift from how the
 * model was trained.
 *
 * The reference repo (a Kafka Streams alarm processor) has no text
 * operators at all — no `file:line` anchor exists; the algorithm is
 * public knowledge (Sennrich et al. 2016, §3.2).
 */
object Bpe {

  /** End-of-word sentinel (Sennrich et al.'s `</w>`): appended as its
    * own trailing symbol so merges can capture word-final units; the
    * empty word encodes as just the sentinel. A merge chain over text
    * that literally contains the characters `</w>` could assemble a
    * TOKEN string equal to the sentinel — the two would conflate in
    * later pair statistics, which skews nothing observable (training
    * stays deterministic, encoding stays lossless) but is worth naming
    * for adversarial inputs. */
  val Eow = "</w>"

  /** Ceiling on merge-table size: the model broadcasts to every task
    * and collects to the driver, so it must stay model-sized. 2^16
    * merges is far past real subword vocabularies (GPT-2 uses 50k
    * TOKENS ≈ 50k merges; cap deliberately at the same order). */
  val MaxMerges: Int = 65536

  /** Default frequency-truncation of the TRAINING dictionary. */
  val DefaultTrainWords: Int = 32768

  /** Ceiling on `maxTrainWords`: the dictionary COLLECTS to the
    * driver, so it must stay model-sized. Past 2^20 words, tighten
    * frequency truncation instead of raising the cap — the rare tail
    * contributes negligible pair mass (the documented approximation),
    * while an unbounded collect is a silent driver OOM. */
  val MaxTrainWords: Int = 1 << 20

  /** Per-partition cap on the encode-side word memo
    * ([[bpeEncode]] / [[withBpeCount]]): corpus words repeat massively
    * so the memo is the hot path, but on high-uniqueness text (IDs,
    * hashes, URLs) distinct words grow with the partition — an
    * unbounded map would grow heap with them. Past the cap, rare words
    * fall back to direct [[encodeWord]] calls (no correctness change;
    * the hot head of the distribution is already memoized). */
  val MaxMemoWords: Int = 65536

  /** Char-level alphabet marker: word symbols start as UTF-16 code
    * units (see [[symbolsOf]]). */
  val AlphabetChar = "char"

  /** Byte-level alphabet marker: word symbols start as UTF-8 bytes,
    * each represented as the single char of that unsigned byte value —
    * what GPT-2-lineage production tokenizers budget with. */
  val AlphabetByte = "byte"

  /** Default pretokenizer: [[TextFunctions.words]] — lowercase,
    * whitespace collapsed; punctuation stays glued to words. */
  val PretokWords = "words"

  /** GPT-2-lineage pretokenizer: CASE-PRESERVING, the raw text split
    * into letter runs / digit runs / symbol runs (whitespace never
    * inside a pretoken, and never a pretoken itself — inter-token
    * spacing is not modeled, the standard BPE-over-pretokens setup).
    * Exactly [[pretokPattern]], replayable verbatim in DuckDB's RE2
    * (`regexp_extract_all`) — the char class spells out \s so the two
    * engines' whitespace definitions cannot diverge. */
  val PretokSplit = "split"

  /** Reserved vocab id 0: what an out-of-vocabulary SYMBOL maps to in
    * the id encoding ([[bpeEncodeIds]]). Byte-level models never emit
    * it (the 256-byte base alphabet covers every input); char-level
    * models emit it only for characters absent from the
    * frequency-truncated TRAINING dictionary. */
  val UnkToken = "<unk>"

  /** The [[PretokSplit]] pattern, shared by the Scala scan, the Spark
    * Column form and (verbatim) the DuckDB oracle: letter runs, digit
    * runs, runs of anything else except explicit whitespace
    * (\x09-\x0D + space — spelled out because Java's \s and RE2's \s
    * disagree on \x0B). */
  private[graft] val PretokRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\x09-\\x0D ]+"

  private val pretokPattern = java.util.regex.Pattern.compile(PretokRegex)

  private def requireAlphabet(who: String, alphabet: String): Unit =
    require(alphabet == AlphabetChar || alphabet == AlphabetByte,
      s"$who: unknown alphabet '$alphabet' (expected '$AlphabetChar' or " +
        s"'$AlphabetByte') — encoding against a mislabeled model would " +
        "silently drift from training")

  private def requirePretok(who: String, pretok: String): Unit =
    require(pretok == PretokWords || pretok == PretokSplit,
      s"$who: unknown pretokenizer '$pretok' (expected '$PretokWords' or " +
        s"'$PretokSplit') — encoding with a different pretokenizer than " +
        "training segments different units entirely")

  /** text -> pretoken sequence, per mode. `words`: the normalized
    * whitespace words ("" and null are ONE empty word — the words()
    * convention, one sentinel token). `split`: [[PretokRegex]] matches
    * over the RAW text, case preserved ("" and null are ZERO
    * pretokens). One code path for train and encode — the two cannot
    * drift. */
  private[graft] def pretokensOf(text: String, pretok: String): Array[String] =
    pretok match {
      case PretokWords =>
        TextFunctions.normalizeScala(if (text == null) "" else text)
          .split(" ", -1)
      case PretokSplit =>
        val m = pretokPattern.matcher(if (text == null) "" else text)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) buf += m.group()
        buf.toArray
      case other =>
        throw new IllegalArgumentException(
          s"pretokensOf: unknown pretokenizer '$other'")
    }

  /** Column twin of [[pretokensOf]] for the training dictionary scan
    * (Spark's regexp functions run java.util.regex — byte-identical to
    * the Scala matcher above). */
  private[graft] def pretokCol(c: Column, pretok: String): Column =
    pretok match {
      case PretokWords => TextFunctions.words(c)
      case PretokSplit =>
        regexp_extract_all(coalesce(c, lit("")), lit(PretokRegex), lit(0))
      case other =>
        throw new IllegalArgumentException(
          s"pretokCol: unknown pretokenizer '$other'")
    }

  /**
   * The persisted tokenizer: `merges` = (rank INT, lhs STRING, rhs
   * STRING), one row per learned merge, ranks 0..n-1 in training
   * order, plus the `alphabet` the merges were learned over. Write/read
   * round-trips bit-exactly (parquet strings/ints); the alphabet is
   * persisted as a one-row `meta` frame next to the merges so a loaded
   * model can never replay them over the wrong symbol alphabet (a
   * byte-trained merge table replayed over chars segments differently
   * — loud, not silent).
   */
  final case class TokenizerModel(merges: DataFrame,
      alphabet: String = AlphabetChar,
      pretok: String = PretokWords,
      baseSymbols: Option[Seq[String]] = None) {
    requireAlphabet("TokenizerModel", alphabet)
    requirePretok("TokenizerModel", pretok)

    private[functions] def byteLevel: Boolean = alphabet == AlphabetByte

    /** Persist under `path` ({meta, symbols, merges} parquet + the
      * [[TokenizerModel.CommitMarker]] file). Crash discipline: the
      * commit marker is DELETED first and re-created LAST, so ANY
      * crash inside write() — fresh path or in-place overwrite —
      * leaves meta-without-commit, which [[TokenizerModel.read]] fails
      * LOUD on. In particular the in-place-overwrite hazard (new meta
      * over old merges: a silently mislabeled alphabet/pretok) is
      * closed: the stale commit marker is already gone when the first
      * frame is touched. */
    def write(path: String): Unit = {
      val spark = merges.sparkSession
      import spark.implicits._
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker =
        new org.apache.hadoop.fs.Path(path, TokenizerModel.CommitMarker)
      fs.delete(marker, false)
      Seq((alphabet, pretok)).toDF("alphabet", "pretok").coalesce(1)
        .write.mode("overwrite").parquet(path + "/meta")
      baseSymbols.foreach { syms =>
        syms.toDF("symbol").coalesce(1)
          .write.mode("overwrite").parquet(path + "/symbols")
      }
      merges.write.mode("overwrite").parquet(path + "/merges")
      fs.create(marker, true).close()
    }

    /** Bounded driver read of the ordered merge list — loud past
      * [[MaxMerges]] (a frame that large is not a trained artifact).
      * MEMOIZED (lazy val): the merges frame is immutable for a given
      * model instance, so a long-lived holder — ingestSink stamping
      * every micro-batch, a scoring loop — pays the collect once, not
      * per batch. */
    lazy val mergeList: Seq[(String, String)] = {
      val rows = merges
        .select(col("rank").cast("int"), col("lhs").cast("string"),
          col("rhs").cast("string"))
        .limit(MaxMerges + 1).collect()
      require(rows.length <= MaxMerges,
        s"TokenizerModel: merge table has > $MaxMerges rows — not a " +
          "bpeTrain artifact")
      rows.foreach { r =>
        require(!r.isNullAt(0) && r.getString(1) != null && r.getString(2) != null,
          "TokenizerModel: null rank/lhs/rhs in the merge table")
      }
      val sorted = rows.sortBy(_.getInt(0))
      require(sorted.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
        "TokenizerModel: ranks must be exactly 0..n-1 (duplicate or " +
          "missing rank — merge REPLAY order would be ambiguous)")
      sorted.map(r => (r.getString(1), r.getString(2))).toSeq
    }

    /** pair -> rank lookup for [[encodeWord]] (memoized with
      * [[mergeList]] — same single-collect rationale). */
    lazy val ranks: Map[(String, String), Int] =
      mergeList.zipWithIndex.map { case (p, i) => p -> i }.toMap

    /** The deterministic id-ordered vocabulary — what a TRAINER's
      * integer sequences index into: id 0 = [[UnkToken]], then the
      * base alphabet symbols ascending (codepoint order — incl. the
      * [[Eow]] sentinel), then one token per merge in RANK order
      * (token = lhs+rhs). Duplicates (a merge token colliding with an
      * earlier entry — e.g. two merge chains assembling the same
      * string) keep the FIRST id; ids stay dense. Fully derived from
      * (symbols, merges), so the persisted artifact cannot hold an
      * inconsistent copy; the DuckDB oracle replays this exact
      * assignment rule from the raw symbol/merge literals. */
    lazy val vocab: IndexedSeq[String] = {
      val base = baseSymbols.getOrElse(throw new IllegalArgumentException(
        "TokenizerModel: no symbol table — a merges-only (or pre-vocab) " +
          "char-level artifact cannot emit token IDS (string tokens and " +
          "counts still work); retrain with bpeTrain or use a byte-level " +
          "model (whose base alphabet is canonical)"))
      val ordered =
        UnkToken +: (base.distinct.sorted ++
          mergeList.map { case (l, r) => l + r })
      val seen = scala.collection.mutable.HashSet.empty[String]
      val out = IndexedSeq.newBuilder[String]
      ordered.foreach { t => if (seen.add(t)) out += t }
      out.result()
    }

    /** token string -> id (first occurrence wins — [[vocab]]'s dedup
      * rule); unknown tokens map to [[UnkToken]]'s id 0 at the call
      * sites. */
    lazy val tokenToId: Map[String, Int] =
      vocab.zipWithIndex.toMap

    /** CONTENT fingerprint — md5 over the actual vocabulary and merge
      * list (alphabet/pretok included), NOT any path. The identity the
      * binary-export gates stamp (`graft_bin_export`'s resume token,
      * the ingest loop's bin-family config), so retraining a model IN
      * PLACE (same path, different merges) changes the fingerprint and
      * forces a rewrite/refusal instead of silently pairing stale
      * artifacts with the new vocabulary. NUL-framed fields: vocab and
      * merge symbols are arbitrary strings, so boundary-free
      * concatenation would let distinct models collide. Memoized — the
      * vocab/merge lists are already bounded driver state. */
    lazy val contentFingerprint: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"$alphabet\u0000$pretok\u0000".getBytes("UTF-8"))
      vocab.foreach(t => md.update(s"$t\u0001".getBytes("UTF-8")))
      mergeList.foreach { case (l, r) =>
        md.update(s"$l\u0002$r\u0003".getBytes("UTF-8"))
      }
      md.digest().map("%02x".format(_)).mkString
    }

    /** The vocabulary as a frame (id INT, token STRING) — the
      * inspection/export surface a tokenizer ships alongside its id
      * sequences. */
    def vocabTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      vocab.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "token")
    }

    /** ids -> text: the inverse of [[bpeEncodeIds]] for a WELL-FORMED
      * sequence (every word's last token [[Eow]]-suffixed — which any
      * encode output is). `words` pretok reconstructs the NORMALIZED
      * text exactly (words joined by single spaces); `split` pretok
      * reconstructs the pretoken concatenation (inter-token spacing is
      * not modeled — the standard BPE-over-pretokens lossiness). An
      * [[UnkToken]] id decodes to its literal marker (out-of-vocab
      * symbols are unrecoverable by definition). Loud on out-of-range
      * ids and on a dangling unterminated word. */
    def decodeIds(ids: Seq[Int]): String = {
      val v = vocab
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      ids.foreach { id =>
        require(id >= 0 && id < v.length,
          s"decodeIds: id $id outside vocab [0, ${v.length}) — wrong model?")
        val tok = v(id)
        if (tok.endsWith(Eow)) {
          sb.append(tok.substring(0, tok.length - Eow.length))
          words += decodeWordChars(sb.toString); sb.setLength(0)
        } else sb.append(tok)
      }
      require(sb.isEmpty,
        "decodeIds: dangling partial word (sequence does not end on an " +
          "end-of-word token) — truncated or corrupted id sequence")
      words.mkString(if (pretok == PretokSplit) "" else " ")
    }

    /** byte-level: symbol chars ARE UTF-8 byte values — decode them
      * back to the string they spell; char-level: identity. */
    private def decodeWordChars(s: String): String =
      if (!byteLevel) s
      else {
        val bytes = new Array[Byte](s.length)
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          require(c <= 0xff,
            s"decodeIds: non-byte symbol char U+${c.toInt.toHexString} in a " +
              "byte-level token — mixed-alphabet artifact")
          bytes(i) = c.toByte
          i += 1
        }
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      }
  }

  object TokenizerModel {
    /** Commit-marker file name: created LAST by [[TokenizerModel.write]]
      * (and deleted first), so meta-present-without-it means a write
      * crashed mid-flight — [[read]] refuses the possibly mixed
      * artifact instead of silently pairing a new marker with old
      * merges. */
    val CommitMarker = "_GRAFT_COMMIT"

    /** The byte alphabet's canonical base-symbol table: all 256 byte
      * values (as single chars) + the [[Eow]] sentinel — data-
      * INDEPENDENT (the GPT-2-lineage no-UNK property: every input
      * byte is in vocab), so byte models never need a persisted
      * symbol frame to emit ids. */
    def canonicalByteSymbols: Seq[String] =
      (0 until 256).map(b => b.toChar.toString) :+ Eow

    /** Load a persisted model. A `meta` marker written by [[write]] is
      * authoritative (malformed marker = loud — guessing the alphabet
      * would silently drift the segmentation); an artifact WITHOUT a
      * marker is char-level/words-pretok by construction (the only
      * configuration that ever wrote marker-less models). When meta
      * exists, the [[CommitMarker]] must too — its absence means a
      * crashed write() and a possibly MIXED artifact (new marker over
      * old merges), which no read-side check could otherwise detect. */
    def read(spark: SparkSession, path: String): TokenizerModel = {
      val merges = spark.read.parquet(path + "/merges")
      val metaPath = new org.apache.hadoop.fs.Path(path + "/meta")
      val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (alphabet, pretok) =
        if (!fs.exists(metaPath)) (AlphabetChar, PretokWords)
        else {
          require(fs.exists(
            new org.apache.hadoop.fs.Path(path, CommitMarker)),
            s"TokenizerModel: meta marker present but no $CommitMarker at " +
              s"$path — a write() crashed between frames (the artifact " +
              "may mix a new alphabet/pretok marker with old merges); " +
              "rewrite the model")
          val metaDf = spark.read.parquet(path + "/meta")
          // pretok is OPTIONAL in meta (pre-pretok artifacts recorded
          // only the alphabet — those are 'words' by construction).
          val pretokCol0 =
            if (metaDf.columns.contains("pretok"))
              col("pretok").cast("string")
            else lit(PretokWords)
          val rows = metaDf
            .select(col("alphabet").cast("string"), pretokCol0.as("pretok"))
            .limit(2).collect()
          require(rows.length == 1 && rows(0).getString(0) != null &&
              rows(0).getString(1) != null,
            s"TokenizerModel: malformed alphabet marker at $path/meta " +
              "(expected exactly ONE non-null row) — refusing to guess " +
              "the symbol alphabet")
          (rows(0).getString(0), rows(0).getString(1))
        }
      val symsPath = new org.apache.hadoop.fs.Path(path + "/symbols")
      val baseSymbols: Option[Seq[String]] =
        if (fs.exists(symsPath)) {
          val rows = spark.read.parquet(path + "/symbols")
            .select(col("symbol").cast("string"))
            .limit(MaxMerges + 2).collect()
          require(rows.length <= MaxMerges + 1,
            s"TokenizerModel: symbol table at $path/symbols has > " +
              s"${MaxMerges + 1} rows — not a bpeTrain artifact")
          rows.foreach(r => require(r.getString(0) != null,
            "TokenizerModel: null symbol in the symbol table"))
          Some(rows.map(_.getString(0)).toSeq)
        } else if (alphabet == AlphabetByte) Some(canonicalByteSymbols)
        else None
      TokenizerModel(merges, alphabet, pretok, baseSymbols)
    }
  }

  /**
   * Learn `numMerges` BPE merges from the corpus — the train-once call
   * whose artifact every later batch encodes against.
   *
   * Dictionary: whitespace words of the NORMALIZED text (exactly
   * [[TextFunctions.words]] — lowercase, whitespace collapsed), counted
   * in one map-side-combining aggregation, frequency-truncated to the
   * top `maxTrainWords` (ties by word ascending — deterministic).
   * Merge selection: highest pair count, ties by (lhs, rhs) ascending;
   * training stops early when no adjacent pair occurs at least twice
   * (a merge seen once compresses nothing it would generalize to).
   */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      maxTrainWords: Int = DefaultTrainWords,
      alphabet: String = AlphabetChar,
      pretok: String = PretokWords): TokenizerModel = {
    require(numMerges > 0 && numMerges <= MaxMerges,
      s"bpeTrain: numMerges must be in (0, $MaxMerges], got $numMerges")
    require(maxTrainWords > 0 && maxTrainWords <= MaxTrainWords,
      s"bpeTrain: maxTrainWords must be in (0, $MaxTrainWords], got " +
        s"$maxTrainWords — the dictionary collects to the driver; past " +
        "the cap, tighten frequency truncation instead (the rare tail " +
        "contributes negligible pair mass)")
    requireAlphabet("bpeTrain", alphabet)
    requirePretok("bpeTrain", pretok)
    val spark = df.sparkSession
    import spark.implicits._
    // TakeOrdered (orderBy + limit): bounded per-partition heap, driver
    // merge — the frequency-truncated dictionary, never a global sort.
    val wordCounts = df
      .select(explode(pretokCol(col(textCol), pretok)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxTrainWords)
      .as[(String, Long)].collect().toSeq
    val byteLevel = alphabet == AlphabetByte
    val merges = trainMerges(wordCounts, numMerges, byteLevel)
    // Base symbol table for the id vocabulary: byte = the canonical
    // 256+sentinel (data-independent, no UNK ever); char = the distinct
    // initial symbols of the TRUNCATED dictionary (chars only seen in
    // frequency-truncated tail words map to <unk> ids — the standard
    // UNK semantics, and exactly what the truncation already
    // approximates for counts).
    val base: Seq[String] =
      if (byteLevel) TokenizerModel.canonicalByteSymbols
      else {
        val s = scala.collection.mutable.SortedSet.empty[String]
        wordCounts.foreach { case (w, _) => symbolsOf(w, byteLevel).foreach(s += _) }
        s += Eow
        s.toSeq
      }
    TokenizerModel(merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "lhs", "rhs"), alphabet, pretok, Some(base))
  }

  /**
   * The driver-side merge loop over the (word, count) dictionary —
   * exposed for the oracle/property specs. Deterministic: max count,
   * ties by (lhs, rhs) ascending; stops when no pair count >= 2.
   *
   * INCREMENTAL pair statistics (the approach of Sennrich et al.'s own
   * reference implementation — public knowledge): a pair→count index,
   * pair→postings (indices of the words containing the pair), and a
   * lazy-deletion max-heap over (count, lhs, rhs). Each merge updates
   * ONLY the words in the merged pair's postings — total update work
   * tracks the postings actually touched, not numMerges × whole-
   * dictionary pair mass (the naive rescan, kept as
   * [[trainMergesNaive]] for the determinism spec, which at a
   * production 32k-merge vocabulary is ~10^10 HashMap visits
   * driver-side). Selection order is IDENTICAL to the naive loop:
   * every count change pushes a fresh heap entry, an entry is live iff
   * its count equals the pair's current count, and the heap comparator
   * is (count desc, lhs asc, rhs asc) — so the first live entry popped
   * is exactly the naive loop's argmax, spec-pinned.
   */
  private[graft] def trainMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int, byteLevel: Boolean = false): Seq[(String, String)] = {
    val n = wordCounts.length
    val syms = new Array[Array[String]](n)
    val wcnt = new Array[Long](n)
    var i = 0
    wordCounts.foreach { case (w, c) =>
      syms(i) = symbolsOf(w, byteLevel); wcnt(i) = c; i += 1
    }

    val pairCounts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    val postings = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.HashSet[Int]]

    def addWordStats(wi: Int,
        touched: scala.collection.mutable.HashSet[(String, String)]): Unit = {
      val s = syms(wi); val c = wcnt(wi)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
        postings.getOrElseUpdate(
          p, scala.collection.mutable.HashSet.empty) += wi
        if (touched != null) touched += p
        j += 1
      }
    }
    def removeWordStats(wi: Int,
        touched: scala.collection.mutable.HashSet[(String, String)]): Unit = {
      val s = syms(wi); val c = wcnt(wi)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val left = pairCounts.getOrElse(p, 0L) - c
        if (left <= 0L) pairCounts.remove(p)
        else pairCounts.update(p, left)
        touched += p
        j += 1
      }
      j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        postings.get(p).foreach { set =>
          set -= wi
          if (set.isEmpty) postings.remove(p)
        }
        j += 1
      }
    }

    i = 0
    while (i < n) { addWordStats(i, null); i += 1 }

    final case class Entry(cnt: Long, l: String, r: String)
    val cmp = new java.util.Comparator[Entry] {
      def compare(a: Entry, b: Entry): Int =
        if (a.cnt != b.cnt) java.lang.Long.compare(b.cnt, a.cnt)
        else {
          val c = a.l.compareTo(b.l)
          if (c != 0) c else a.r.compareTo(b.r)
        }
    }
    val heap =
      new java.util.PriorityQueue[Entry](math.max(1, pairCounts.size), cmp)
    pairCounts.foreach { case ((l, r), c) => heap.add(Entry(c, l, r)) }

    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < numMerges && !done) {
      val e = heap.poll()
      if (e == null) done = true
      else {
        val pair = (e.l, e.r)
        val live = pairCounts.getOrElse(pair, 0L)
        if (live != e.cnt) {
          // Stale entry: a fresher entry (or the pair's removal)
          // supersedes it — skip and keep popping.
        } else if (live < 2L) {
          // The heap max among LIVE entries: nothing left merges twice
          // (the naive loop's early stop).
          done = true
        } else {
          out += pair
          val touched =
            scala.collection.mutable.HashSet.empty[(String, String)]
          // Snapshot + sort: postings mutate inside the loop, and a
          // deterministic word order keeps the update sequence (hence
          // any tie-broken float-free arithmetic) reproducible.
          val affected =
            postings.get(pair).map(_.toArray).getOrElse(Array.empty[Int])
          java.util.Arrays.sort(affected)
          for (wi <- affected) {
            removeWordStats(wi, touched)
            syms(wi) = applyMerge(syms(wi), pair)
            addWordStats(wi, touched)
          }
          for (p <- touched) {
            val c = pairCounts.getOrElse(p, 0L)
            if (c > 0L) heap.add(Entry(c, p._1, p._2))
          }
        }
      }
    }
    out.toSeq
  }

  /** The per-merge whole-dictionary rescan — the textbook loop the
    * incremental [[trainMerges]] must agree with merge-for-merge
    * (spec-pinned). Kept ONLY as the determinism yardstick: O(numMerges
    * × total pair mass), fine on fixtures, hours at a production
    * vocabulary. */
  private[graft] def trainMergesNaive(wordCounts: Seq[(String, Long)],
      numMerges: Int, byteLevel: Boolean = false): Seq[(String, String)] = {
    var dict =
      wordCounts.map { case (w, n) => (symbolsOf(w, byteLevel), n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- dict) {
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (bestPair, bestN) =
          counts.minBy { case ((l, r), n) => (-n, l, r) }
        if (bestN < 2L) done = true
        else {
          out += bestPair
          dict = dict.map { case (syms, n) => (applyMerge(syms, bestPair), n) }
        }
      }
    }
    out.toSeq
  }

  /** word -> initial symbol sequence plus the trailing [[Eow]]
    * sentinel ("" -> just the sentinel), per alphabet:
    *
    *  - char ([[AlphabetChar]]): Java chars (UTF-16 code units). A
    *    non-BMP codepoint starts as TWO half-surrogate symbols —
    *    individually not valid strings, but merges glue them back
    *    probabilistically and the segmentation stays LOSSLESS (token
    *    concatenation always reconstructs the word; spec-pinned),
    *    which is all counting/budgeting needs.
    *  - byte ([[AlphabetByte]]): UTF-8 bytes, each the single char of
    *    its unsigned byte value (0..255) — a non-ASCII codepoint
    *    starts as its 2–4 UTF-8 bytes, matching what GPT-2-lineage
    *    production tokenizers count. Token concatenation reconstructs
    *    the word's UTF-8 byte string (decode = byte-chars → bytes →
    *    UTF-8; spec-pinned lossless). */
  private def symbolsOf(word: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) {
      val bytes =
        word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val a = new Array[String](bytes.length + 1)
      var i = 0
      while (i < bytes.length) {
        a(i) = ((bytes(i) & 0xff).toChar).toString; i += 1
      }
      a(bytes.length) = Eow
      a
    } else {
      val a = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { a(i) = word.charAt(i).toString; i += 1 }
      a(word.length) = Eow
      a
    }

  /** Replace every non-overlapping left-to-right occurrence of `pair`
    * with its concatenation — the single merge step shared by training
    * and encoding (one code path, the two cannot drift). */
  private def applyMerge(syms: Array[String],
      pair: (String, String)): Array[String] = {
    if (syms.length < 2) return syms
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        buf += pair._1 + pair._2
        j += 2
      } else {
        buf += syms(j)
        j += 1
      }
    }
    buf.toArray
  }

  /** Encode ONE word by replaying merges in rank order: repeatedly
    * apply the lowest-ranked merge present until none applies — the
    * canonical BPE segmenter. Total: each application shortens the
    * symbol sequence by >= 1, so the loop runs <= len(word) times.
    * Words with characters never seen in training simply keep them as
    * single-character tokens (no UNK needed for counting/budgeting). */
  private[graft] def encodeWord(ranks: Map[(String, String), Int],
      word: String, byteLevel: Boolean = false): Array[String] = {
    var syms = symbolsOf(word, byteLevel)
    var go = syms.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bl = syms(j); br = syms(j + 1) }
        j += 1
      }
      if (bl == null) go = false
      else {
        syms = applyMerge(syms, (bl, br))
        go = syms.length >= 2
      }
    }
    syms
  }

  /**
   * Encode the corpus against a trained (possibly parquet-loaded)
   * model: (doc_id, tokens ARRAY<STRING>, n_tokens_bpe BIGINT), one
   * row per document. ONE stateless typed pass — model broadcast,
   * per-partition word memo (each distinct word encodes once per
   * partition), no shuffle, STREAM-NATIVE. Tokenization mirrors
   * [[TextFunctions.words]] exactly (the shared normalizeScala), so
   * token concatenation reconstructs the normalized text and the
   * DuckDB words CTE drives the oracle. A null text encodes as the
   * empty document (one sentinel token) — the words() convention.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      model: TokenizerModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model.ranks)
    val byteLevel = model.byteLevel
    val pretok = model.pretok
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = b.value
        // Size-capped memo (MaxMemoWords): the hot head of the word
        // distribution memoizes; past the cap, rare words encode
        // directly — bounded heap on high-uniqueness text.
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val ws = pretokensOf(text, pretok)
          val toks = ws.flatMap { w =>
            var t = memo.get(w)
            if (t == null) {
              t = encodeWord(ranks, w, byteLevel)
              if (memo.size < MaxMemoWords) memo.put(w, t)
            }
            t
          }
          (id, toks.toSeq, toks.length.toLong)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens_bpe")
  }

  /**
   * The id-level encode a TRAINER actually consumes: (doc_id,
   * token_ids ARRAY<INT>, n_tokens_bpe), ids into [[TokenizerModel.vocab]]
   * (0 = [[UnkToken]] for out-of-vocabulary symbols — never emitted by
   * byte-level models, whose base alphabet is total). Same single
   * stateless broadcast-model pass as [[bpeEncode]] — the id mapping
   * rides the same per-partition word memo, so it adds zero plan
   * surface (and [[TokenizerModel.decodeIds]] inverts it back to the
   * normalized text, spec-pinned). The vocab is resolved on the DRIVER
   * (loud for pre-vocab char artifacts) before the job runs.
   */
  def bpeEncodeIds(df: DataFrame, idCol: String, textCol: String,
      model: TokenizerModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model.ranks)
    val ids = spark.sparkContext.broadcast(model.tokenToId)
    val byteLevel = model.byteLevel
    val pretok = model.pretok
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = b.value
        val toId = ids.value
        val memo = new java.util.HashMap[String, Array[Int]]()
        it.map { case (id, text) =>
          val ws = pretokensOf(text, pretok)
          val out = ws.flatMap { w =>
            var t = memo.get(w)
            if (t == null) {
              t = encodeWord(ranks, w, byteLevel).map(toId.getOrElse(_, 0))
              if (memo.size < MaxMemoWords) memo.put(w, t)
            }
            t
          }
          (id, out.toSeq, out.length.toLong)
        }
      }
      .toDF("doc_id", "token_ids", "n_tokens_bpe")
  }

  /** The budgeting projection of [[bpeEncode]]: (doc_id, n_tokens_bpe)
    * — what `seqPack`/`temperatureBudgets`/`packReport` consume via
    * their tokensCol hooks. Same single code path. */
  def bpeCount(df: DataFrame, idCol: String, textCol: String,
      model: TokenizerModel): DataFrame =
    bpeEncode(df, idCol, textCol, model).select("doc_id", "n_tokens_bpe")

  /**
   * APPEND the model-token count as a column, keeping every input
   * column — the composition shape for the tokensCol hooks: at corpus
   * scale, `df.join(bpeCount(df, ...))` is a corpus-sized self-join
   * (one full shuffle of both sides on doc id) to re-attach a value
   * that was computed FROM the row itself; this variant computes it in
   * place in the same stateless typed pass (same [[encodeWord]] +
   * per-partition memo core), so `seqPack(withBpeCount(df, ...),
   * tokensCol = outCol)` adds ZERO exchanges beyond seqPack's own.
   * Null texts count as the empty document (one sentinel token).
   */
  def withBpeCount(df: DataFrame, textCol: String, model: TokenizerModel,
      outCol: String = "n_tokens_bpe"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"withBpeCount: column '$outCol' already exists — pick another outCol")
    val spark = df.sparkSession
    val b = spark.sparkContext.broadcast(model.ranks)
    val byteLevel = model.byteLevel
    val pretok = model.pretok
    val ti = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val ranks = b.value
      // Size-capped memo — see bpeEncode (same rationale, same cap).
      val memo = new java.util.HashMap[String, java.lang.Long]()
      it.map { row =>
        val text = if (row.isNullAt(ti)) "" else row.get(ti).toString
        val ws = pretokensOf(text, pretok)
        var n = 0L
        var i = 0
        while (i < ws.length) {
          var c = memo.get(ws(i))
          if (c == null) {
            c = java.lang.Long.valueOf(
              encodeWord(ranks, ws(i), byteLevel).length.toLong)
            if (memo.size < MaxMemoWords) memo.put(ws(i), c)
          }
          n += c.longValue()
          i += 1
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ n)
      }
    }(enc)
  }

  /**
   * Tokenizer FERTILITY eval — the per-group efficiency table a
   * tokenizer report ships (SentencePiece/BPE convention: fertility =
   * model tokens per whitespace word; its complement chars-per-token
   * is the compression view): per `byCol` value (source, language
   * ground truth, domain...), document count, whitespace-word mass,
   * model-token mass, normalized-char mass, `fertility` =
   * n_tokens_bpe / n_words and `chars_per_token` = n_chars /
   * n_tokens_bpe. A tokenizer trained on one language family shows
   * fertility ~1.1–1.3 on its own distribution and spikes on scripts
   * it never saw — the per-group view localizes WHERE the vocab is
   * wasted, which the corpus-wide [[bpeCompression]]-style average
   * hides.
   *
   * Conventions shared with the rest of the module: NULL text is the
   * empty document (its single sentinel word counts 1 word and
   * encodes to the sentinel token); counts are exact integers and
   * each ratio is ONE IEEE division of exact longs (0.0 when its
   * denominator is 0). Scale shape: ONE stateless broadcast-model
   * pass ([[withBpeCount]] — no join-back) + one map-side-combining
   * rollup to |groups| rows; a null group value fails loud (it would
   * silently pool unattributed mass into one row).
   */
  def fertilityReport(df: DataFrame, textCol: String, byCol: String,
      model: TokenizerModel): DataFrame = {
    val grp = when(col(byCol).isNull, raise_error(
        lit(s"fertilityReport: null $byCol — the group column must " +
          "cover every row")).cast("string"))
      .otherwise(col(byCol).cast("string"))
    val norm = TextFunctions.normText(coalesce(col(textCol), lit("")))
    withBpeCount(df, textCol, model)
      .select(grp.as(byCol),
        size(split(norm, " ")).cast("long").as("nw"),
        length(norm).cast("long").as("nc"),
        col("n_tokens_bpe"))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("n_words"),
        sum("n_tokens_bpe").as("n_tokens_bpe"),
        sum("nc").as("n_chars"))
      .withColumn("fertility",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_tokens_bpe").cast("double") /
            col("n_words").cast("double")))
      .withColumn("chars_per_token",
        when(col("n_tokens_bpe") === 0L, lit(0.0))
          .otherwise(col("n_chars").cast("double") /
            col("n_tokens_bpe").cast("double")))
  }

  /**
   * Render per-WORD encodings as SQL VALUES literals for the DuckDB
   * oracle — `('word', 'tok1 tok2 ...', n)` per distinct corpus word,
   * sorted, produced through the SAME [[encodeWord]] path the operator
   * encodes with (the centroid/idf-literal discipline: scoring is
   * independently replayed, training is pinned by determinism +
   * round-trip specs). Bounded: loud past `maxWords` distinct words —
   * a VALUES table must stay model-sized.
   */
  def wordEncodingsSqlValues(model: TokenizerModel, df: DataFrame,
      textCol: String, maxWords: Int = MaxMerges): String = {
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce: a NULL text encodes as the empty document (one
    // sentinel token — the words() convention), so '' must be in the
    // literal table or the oracle's word join would silently DROP null
    // docs while the operator counts them. (Moot for the `split`
    // pretok — null/empty is ZERO pretokens there, and pretokCol
    // already coalesces.)
    val words = df
      .select(explode(
        pretokCol(coalesce(col(textCol), lit("")), model.pretok)).as("w"))
      .distinct()
      .limit(maxWords + 1)
      .as[String].collect()
    require(words.length <= maxWords,
      s"wordEncodingsSqlValues: > $maxWords distinct words — the literal " +
        "oracle table must stay model-sized")
    val ranks = model.ranks
    val byteLevel = model.byteLevel
    words.sorted.map { w =>
      val toks = encodeWord(ranks, w, byteLevel)
      s"('${sqlEsc(w)}', '${sqlEsc(toks.mkString(" "))}', ${toks.length})"
    }.mkString(", ")
  }

  private def sqlEsc(s: String) = s.replace("'", "''")

  /**
   * The RAW vocab inputs as SQL literals for the DuckDB oracle — so
   * the oracle independently REPLAYS the id-assignment rule
   * ([[TokenizerModel.vocab]]: unk, then symbols ascending, then
   * merge tokens by rank, first-occurrence dedup, dense ids) instead
   * of being handed the finished ids. Returns (symbolsValues,
   * mergesValues, numBaseSymbols): `(s)` rows sorted ascending, and
   * `(rank, lhs, rhs)` rows — DuckDB concatenates lhs||rhs itself.
   * Char-alphabet models only (byte models' 0x00-0x1F base symbols
   * don't render as SQL literals; their id path is pinned by the
   * decode round-trip specs instead).
   */
  def vocabSqlValues(model: TokenizerModel): (String, String, Int) = {
    require(!model.byteLevel,
      "vocabSqlValues: byte-level base symbols (control bytes) are not " +
        "SQL-literal-renderable — oracle the char model; byte ids are " +
        "spec-pinned via the decode round trip")
    val base = model.baseSymbols.getOrElse(throw new IllegalArgumentException(
      "vocabSqlValues: model has no symbol table")).distinct.sorted
    val symsVals = base.map(s => s"('${sqlEsc(s)}')").mkString(", ")
    val mergeVals = model.mergeList.zipWithIndex
      .map { case ((l, r), i) => s"($i, '${sqlEsc(l)}', '${sqlEsc(r)}')" }
      .mkString(", ")
    (symsVals, mergeVals, base.length)
  }
}
