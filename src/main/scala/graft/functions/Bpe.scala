package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 * the model-sized dictionary — numMerges * dictSize * avgWordLen
 * symbol visits, bounded by the [[MaxMerges]] / `maxTrainWords`
 * contracts.
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

  /**
   * The persisted tokenizer: `merges` = (rank INT, lhs STRING, rhs
   * STRING), one row per learned merge, ranks 0..n-1 in training
   * order. Write/read round-trips bit-exactly (parquet strings/ints).
   */
  final case class TokenizerModel(merges: DataFrame) {
    def write(path: String): Unit =
      merges.write.mode("overwrite").parquet(path + "/merges")

    /** Bounded driver read of the ordered merge list — loud past
      * [[MaxMerges]] (a frame that large is not a trained artifact). */
    def mergeList: Seq[(String, String)] = {
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

    /** pair -> rank lookup for [[encodeWord]]. */
    def ranks: Map[(String, String), Int] =
      mergeList.zipWithIndex.map { case (p, i) => p -> i }.toMap
  }

  object TokenizerModel {
    def read(spark: SparkSession, path: String): TokenizerModel =
      TokenizerModel(spark.read.parquet(path + "/merges"))
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
      maxTrainWords: Int = DefaultTrainWords): TokenizerModel = {
    require(numMerges > 0 && numMerges <= MaxMerges,
      s"bpeTrain: numMerges must be in (0, $MaxMerges], got $numMerges")
    require(maxTrainWords > 0,
      s"bpeTrain: maxTrainWords must be positive, got $maxTrainWords")
    val spark = df.sparkSession
    import spark.implicits._
    // TakeOrdered (orderBy + limit): bounded per-partition heap, driver
    // merge — the frequency-truncated dictionary, never a global sort.
    val wordCounts = df
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxTrainWords)
      .as[(String, Long)].collect().toSeq
    val merges = trainMerges(wordCounts, numMerges)
    TokenizerModel(merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "lhs", "rhs"))
  }

  /** The driver-side merge loop over the (word, count) dictionary —
    * exposed for the oracle/property specs. Deterministic: max count,
    * ties by (lhs, rhs) ascending; stops when no pair count >= 2. */
  private[graft] def trainMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var dict = wordCounts.map { case (w, n) => (symbolsOf(w), n) }
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

  /** word -> initial symbol sequence: characters plus the trailing
    * [[Eow]] sentinel ("" -> just the sentinel). "Characters" are Java
    * chars (UTF-16 code units): a non-BMP codepoint starts as TWO
    * half-surrogate symbols — individually they are not valid strings,
    * but merges glue them back probabilistically and the segmentation
    * stays LOSSLESS (token concatenation always reconstructs the word;
    * spec-pinned), which is all counting/budgeting needs. A
    * production-grade byte-level variant would start from UTF-8 bytes;
    * same algorithm, different alphabet. */
  private def symbolsOf(word: String): Array[String] = {
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
      word: String): Array[String] = {
    var syms = symbolsOf(word)
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
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = b.value
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val norm = TextFunctions.normalizeScala(if (text == null) "" else text)
          val ws = norm.split(" ", -1)
          val toks = ws.flatMap { w =>
            var t = memo.get(w)
            if (t == null) { t = encodeWord(ranks, w); memo.put(w, t) }
            t
          }
          (id, toks.toSeq, toks.length.toLong)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens_bpe")
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
    val ti = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val ranks = b.value
      val memo = new java.util.HashMap[String, java.lang.Long]()
      it.map { row =>
        val text = if (row.isNullAt(ti)) "" else row.get(ti).toString
        val ws = TextFunctions.normalizeScala(text).split(" ", -1)
        var n = 0L
        var i = 0
        while (i < ws.length) {
          var c = memo.get(ws(i))
          if (c == null) {
            c = java.lang.Long.valueOf(encodeWord(ranks, ws(i)).length.toLong)
            memo.put(ws(i), c)
          }
          n += c.longValue()
          i += 1
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ n)
      }
    }(enc)
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
    val words = df
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .distinct()
      .limit(maxWords + 1)
      .as[String].collect()
    require(words.length <= maxWords,
      s"wordEncodingsSqlValues: > $maxWords distinct words — the literal " +
        "oracle table must stay model-sized")
    val ranks = model.ranks
    def esc(s: String) = s.replace("'", "''")
    words.sorted.map { w =>
      val toks = encodeWord(ranks, w)
      s"('${esc(w)}', '${esc(toks.mkString(" "))}', ${toks.length})"
    }.mkString(", ")
  }
}
