package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftCaches.Cacheable

/**
 * Cross-document duplicated-span detection and removal — exact substring
 * deduplication at the passage level ("Deduplicating Training Data Makes
 * Language Models Better", Lee et al. 2022), the between-docs complement
 * of [[TextFunctions]]' within-doc repetition score and of the
 * document-level dedup family in [[Dedup]]: boilerplate headers, license
 * blocks, and syndicated passages repeat VERBATIM across otherwise
 * distinct documents, survive document-level near-dup screens (the host
 * documents are not near-dups), and a trained model memorizes them.
 *
 * A span is a run of `k` consecutive whitespace tokens of the normalized
 * text ([[TextFunctions.normText]] discipline — the whole family shares
 * one tokenizer with the n-gram/winnowing operators so oracles and
 * operators agree byte-for-byte). A span is DUPLICATED when it occurs in
 * at least `minDf` distinct documents; each duplicated span has one
 * canonical keeper (the smallest doc_id containing it) and is scrubbed
 * from every other document.
 *
 * Scale shape: the occurrence frame is one row per token (the same cost
 * class as the tf-idf/minhash passes); the span-frequency groupBy is the
 * single corpus-sized shuffle, partially aggregated map-side. Everything
 * after is bounded by the DUPLICATED subset: the scrub-position frame
 * only carries docs that actually lose tokens, and the rebuild joins
 * those positions back by doc_id — no all-pairs anywhere, no token-level
 * re-explode (coverage is resolved per-doc from the bounded start list
 * inside one typed pass).
 */
object Spans {

  /**
   * One row per k-token span occurrence: (doc_id, pos, span), pos
   * 1-based over the normalized token sequence. Typed pass (not a
   * `transform` lambda) for the same reason [[Dedup]]'s shingle passes
   * are: Catalyst re-evaluates the tokenize subtree per lambda element,
   * turning an O(len) scan into O(len^2) regex work.
   */
  def spanOccurrences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"spanOccurrences: span length k=$k must be >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val ws = TextFunctions
          .normalizeScala(if (text == null) "" else text).split(" ", -1)
        if (ws.length < k) Iterator.empty
        else Iterator.range(0, ws.length - k + 1).map { i0 =>
          (id, (i0 + 1).toLong, ws.slice(i0, i0 + k).mkString(" "))
        }
      })
      .toDF("doc_id", "pos", "span")
  }

  /**
   * Per-document duplicated-span audit: how much of each document is
   * verbatim-shared passage. Output (doc_id, n_spans, n_dup_spans,
   * dup_frac), one row per input document (docs shorter than k tokens
   * report 0 spans and 0.0), ordered by the caller.
   */
  def spanDupes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"spanDupes: minDf=$minDf must be >= 2")
    val occ = spanOccurrences(docs, idCol, textCol, k).graftCached
    val dup = occ.groupBy("span")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= minDf).select("span")
    val tot = occ.groupBy("doc_id").agg(count(lit(1)).as("spans_t"))
    val nd = occ.join(dup, Seq("span"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("spans_d"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .join(nd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("spans_t"), lit(0L)).as("n_spans"),
        coalesce(col("spans_d"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("spans_t"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("spans_d"), lit(0L)).cast("double") /
            col("spans_t"))
          .as("dup_frac"))
  }

  /**
   * Remove duplicated passages, keeping a canonical copy per SPAN:
   * every token covered by a duplicated span occurrence is dropped from
   * every document EXCEPT the span's keeper (smallest containing
   * doc_id). Overlapping duplicated spans scrub the union of their
   * token windows — so when overlapping spans have DIFFERENT keepers, a
   * keeper's copy of its span can still lose tokens through the other
   * span, and no fully-intact copy of the passage survives (inherent to
   * greedy exact-substring dedup; Lee et al. accept the same). A span
   * repeated only WITHIN one document is not duplicated (that is the
   * repetition score's concern, not this one's).
   *
   * Output (doc_id, clean_text, n_removed), one row per input document.
   * `clean_text` is in normalized form ([[TextFunctions.normText]]) for
   * every document, touched or not — the scrub tokenizes to decide
   * coverage, so the untouched rebuild is the normalized token sequence.
   */
  def spanScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"spanScrub: minDf=$minDf must be >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    // Shared by the keeper aggregate AND the scrub-position join — one
    // tokenize pass, not two (the occurrence frame is the operator's
    // only corpus-sized intermediate).
    val occ = spanOccurrences(docs, idCol, textCol, k).graftCached
    val kp = occ.groupBy("span")
      .agg(countDistinct("doc_id").as("df"), min("doc_id").as("keeper"))
      .filter(col("df") >= minDf)
      .select("span", "keeper")
    // Scrub positions: only non-keeper occurrences of duplicated spans —
    // bounded by the duplicated subset, collapsed to one bounded start
    // list per affected doc before any text is touched.
    val starts = occ.join(kp, Seq("span"))
      .filter(col("doc_id") =!= col("keeper"))
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    scrubByStarts(docs, idCol, textCol, starts, k)
  }

  /** The shared scrub tail: join each doc to its (possibly absent)
    * scrub-start list and rebuild the kept text in one typed pass —
    * [[spanScrub]] and [[spanScrubIndexed]] differ only in how `starts`
    * is computed. */
  private def scrubByStarts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      starts: DataFrame, // (doc_id, starts: array<long>)
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("txt"))
      .join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("txt"),
        coalesce(col("starts"), array().cast("array<long>")).as("starts"))
      .as[(Long, String, Seq[Long])]
      .map { case (id, text, st) => rebuild(id, text, st, k) }
      .toDF("doc_id", "clean_text", "n_removed")
  }

  /**
   * Two-corpus scrub — the recurring-batch form: drop from each BATCH
   * document every token covered by a k-token span that occurs anywhere
   * in the REFERENCE corpus (the reference is canonical and is never
   * modified; no minDf — one reference occurrence makes a span
   * boilerplate). An ingestion loop calls this with the accepted corpus
   * as reference so each incoming batch sheds the passages the corpus
   * already carries, paying batch-tokens + one distinct-span semi-join
   * per batch — never a corpus re-scrub. Within-batch duplication is
   * [[spanScrub]]'s concern; compose them batch-first if both apply.
   *
   * Output (doc_id, clean_text, n_removed) over the batch docs,
   * clean_text normalized as in [[spanScrub]].
   */
  def spanScrubAgainst(
      batch: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame =
    // Reference side reduced to its distinct span set BEFORE the join —
    // the semi-join key stream, not the reference occurrence frame.
    spanScrubIndexed(batch,
      spanOccurrences(ref, idCol, textCol, k).select("span").distinct(),
      idCol, textCol, k)

  /**
   * Streaming boilerplate screen — the stream-native audit half of
   * [[spanScrubAgainst]]: each streamed document reports how many of its
   * k-token spans already occur in the static reference span set (e.g.
   * the distinct-span dump of the accepted corpus). Stateless enrich
   * (stream-static left join against the bounded span frame) plus the
   * built-in windowed count — no custom state store, same design
   * rationale as the chunk screen's streaming twin. The REBUILD stays a
   * batch concern: run [[spanScrubAgainst]] inside foreachBatch (the
   * ingestSink pattern) when the stream should emit scrubbed text.
   *
   * `refSpans` is a static frame with a `span` column (distinct not
   * required — the ref side is deduplicated before the join, so a span
   * stored twice never double-counts). Output per closed watermark
   * window: (doc_id, ts, n_spans, n_ref_spans).
   */
  def spanScreenStream(
      df: DataFrame,
      refSpans: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      watermark: String,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"spanScreenStream: span length k=$k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val spans = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"),
        col(tsCol).cast("timestamp"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, text, ts) =>
        val ws = TextFunctions
          .normalizeScala(if (text == null) "" else text).split(" ", -1)
        // A short doc still reports (n_spans = 0): one null-span row
        // the count() below ignores.
        if (ws.length < k) Iterator.single((id, ts, null: String))
        else Iterator.range(0, ws.length - k + 1).map { i0 =>
          (id, ts, ws.slice(i0, i0 + k).mkString(" "))
        }
      })
      .toDF("doc_id", "ts", "span")
      .withWatermark("ts", watermark)
    spans
      .join(refSpans.select(col("span")).distinct()
          .withColumn("in_ref", lit(1L)),
        Seq("span"), "left")
      .groupBy(col("doc_id"), col("ts"))
      .agg(
        count(col("span")).as("n_spans"),
        sum(coalesce(col("in_ref"), lit(0L))).as("n_ref_spans"))
      .select("doc_id", "ts", "n_spans", "n_ref_spans")
  }

  // ---------------------------------------------------------------------
  // Persisted span index — the passage family's member of the managed
  // index set (near-dup signatures, chunk counts, IVF vectors, PQ codes):
  // span occurrence counts stored per epoch, screened against by
  // recurring batches, folded by compaction. The stored count is the
  // OCCURRENCE count (the chunk family's convention), not spanDupes'
  // distinct-doc df — membership (count >= 1) is what the boilerplate
  // screen consumes, and occurrence counts stay additive under epoch
  // merges without carrying doc identity.
  // ---------------------------------------------------------------------

  /** (span, df_cnt) occurrence counts — the stored row shape. */
  def spanIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame =
    spanOccurrences(df, idCol, textCol, k)
      .groupBy("span").agg(count(lit(1)).as("df_cnt"))

  /** Broadcast-contract bound for [[spanScreenIndexed]]'s batch span
    * set — the [[Dedup.MaxBatchChunks]] rationale: past ~4M distinct
    * spans the "batch" is corpus-shaped and belongs in [[spanDupes]]
    * over the union instead. */
  val MaxBatchSpans: Long = 4L * 1000 * 1000

  /**
   * Screen a batch against a stored span index: per batch doc, how many
   * of its k-token spans already occur in the index (membership, stored
   * count >= 1). The batch's DISTINCT span set broadcasts into a
   * semi-join that prunes the index scan map-side — the index is scanned
   * but never shuffled, and only the pruned matches (bounded by the
   * batch's span count) flow back. The contract is ENFORCED with a
   * bounded CollectLimit count (the [[Dedup.chunkDedupIndexed]]
   * discipline), making this operator EAGER: one bounded batch-sized job
   * runs at construction.
   *
   * Output (doc_id, n_spans, n_ref_spans), one row per batch doc (short
   * docs report 0/0).
   */
  def spanScreenIndexed(
      batch: DataFrame,
      index: DataFrame, // (span, df_cnt)
      idCol: String,
      textCol: String,
      k: Int = 5,
      maxBatchSpans: Long = MaxBatchSpans): DataFrame = {
    val occ = spanOccurrences(batch, idCol, textCol, k).graftCached
    val bset = occ.select("span").distinct().graftCached
    val found = bset
      .limit((math.min(maxBatchSpans, Int.MaxValue.toLong - 1) + 1).toInt)
      .count()
    require(found <= maxBatchSpans,
      s"spanScreenIndexed: batch has > $maxBatchSpans distinct spans — " +
        "too large for the broadcast screen contract; screen in smaller " +
        "batches or run spanDupes over the union instead")
    val idxPruned = index
      .join(broadcast(bset), Seq("span"), "left_semi")
      .select("span").distinct()
      .withColumn("in_ref", lit(1L))
    val perDoc = occ
      .join(broadcast(idxPruned), Seq("span"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("spans_t"),
        sum(coalesce(col("in_ref"), lit(0L))).as("spans_r"))
    batch.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("spans_t"), lit(0L)).as("n_spans"),
        coalesce(col("spans_r"), lit(0L)).as("n_ref_spans"))
  }

  /**
   * The scrub riding a stored (span, df_cnt) frame — the TRANSFORM
   * complement of [[spanScreenIndexed]]'s gate over the same persisted
   * artifact: drop from each batch doc every token covered by a span
   * the store already carries. `spanScrubIndexed(batch,
   * spanIndex(ref))` equals [[spanScrubAgainst]](batch, ref) by
   * construction (a spec pins it); the indexed form is what a
   * recurring loop uses — the reference corpus is never re-tokenized.
   */
  def spanScrubIndexed(
      batch: DataFrame,
      index: DataFrame, // (span, df_cnt)
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame = {
    val starts = spanOccurrences(batch, idCol, textCol, k)
      .join(index.select("span"), Seq("span"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    scrubByStarts(batch, idCol, textCol, starts, k)
  }

  /**
   * Record the store's span length on first use, fail LOUD on a
   * mismatch ever after: spans of different k live in disjoint string
   * spaces, so screening a k=5 store with k=6 would silently match
   * NOTHING (a recall hole invisible at query time — the same hazard
   * class as an embedding-dim drift on a vector index, guarded the same
   * way). The marker is one tiny `_SPAN_K` file beside the epochs;
   * [[Ingest.ingestBatch]] checks it at the ROOT of a managed store so
   * the guard survives generation rolls.
   */
  def recordOrCheckK(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      k: Int): Unit = {
    storedK(spark, indexPath) match {
      case Some(stored) => requireKMatch(indexPath, stored, k)
      case None =>
        // Write-temp-then-rename: fs.create + write is NOT atomic, and a
        // crash between the two leaves an empty `_SPAN_K` that every later
        // storedK would choke on. The rename publishes a fully-written
        // marker or nothing (same posture as EpochStore's epoch commit).
        val p = new org.apache.hadoop.fs.Path(indexPath, "_SPAN_K")
        val tmp = new org.apache.hadoop.fs.Path(indexPath, "_SPAN_K.tmp")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(p.getParent)
        val out = fs.create(tmp, true)
        try out.write(k.toString.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, p)) {
          // A concurrent recorder won the rename; fall back to checking
          // against whatever it published. If NOTHING was published, the
          // rename failed for some other reason (transient FS error) —
          // returning silently would leave k unrecorded, and a later
          // append with a DIFFERENT k would then record that k without
          // this mismatch ever being detected. Fail loud instead.
          fs.delete(tmp, false)
          storedK(spark, indexPath) match {
            case Some(stored) => requireKMatch(indexPath, stored, k)
            case None => throw new IllegalStateException(
              s"span index at $indexPath: failed to record _SPAN_K=$k " +
                "(rename did not succeed and no concurrent marker " +
                "appeared) — transient filesystem error; retry the call")
          }
        }
    }
  }

  /** CHECK-ONLY form for read paths: fail loud when the store records a
    * different k; pass silently when no marker exists (a pre-marker or
    * hand-built store — the reader cannot know). */
  def checkK(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      k: Int): Unit =
    storedK(spark, indexPath).foreach(requireKMatch(indexPath, _, k))

  /** The store's recorded span length, when a `_SPAN_K` marker exists. */
  def storedK(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, "_SPAN_K")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      // Self-describing failure over a bare NumberFormatException: an
      // empty/garbled marker (pre-atomic-write debris, hand edit) would
      // otherwise wedge every read AND append with "''.toInt" and no clue
      // which file to fix.
      raw.toIntOption match {
        case some @ Some(_) => some
        case None => throw new IllegalStateException(
          s"span index at $indexPath has a corrupt _SPAN_K marker " +
            s"(content: '$raw'); delete the marker file to re-record k " +
            "on the next append, or restore it to the store's span length")
      }
    }
  }

  private def requireKMatch(indexPath: String, stored: Int, k: Int): Unit =
    require(stored == k,
      s"span index at $indexPath stores k=$stored spans; screening or " +
        s"appending with k=$k would silently match nothing — use the " +
        "stored k or point at a fresh store")

  /**
   * IDEMPOTENT span-index maintenance — the [[Dedup.chunkIndexAppend]]
   * contract, span-shaped: write `batch`'s [[spanIndex]] rows under
   * `indexPath` as the named epoch `batchId`; re-appending a committed
   * `batchId` is a no-op (idempotence BY EPOCH NAME — span counts carry
   * no doc identity). Returns distinct spans written for a newly
   * committed epoch (0 = legal empty batch), or -1 for a retry skip.
   * Records the store's span length on first append and fails loud on a
   * later k mismatch ([[recordOrCheckK]]).
   */
  def spanIndexAppend(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      batchId: String,
      k: Int = 5): Long = {
    val spark = batch.sparkSession
    recordOrCheckK(spark, indexPath, k)
    EpochStore.append(spark, indexPath, batchId, "spanIndexAppend")(
      spanIndex(batch, idCol, textCol, k))
  }

  private val spanIndexSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "span", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField(
      "df_cnt", org.apache.spark.sql.types.LongType)))

  /** Merge a [[spanIndexAppend]]-maintained directory into one
    * (span, df_cnt) frame — the committed-snapshot merge ([[EpochStore]]
    * contracts: crash debris invisible, stable under this session's own
    * later appends, which [[Ingest.ingestBatch]]'s cached decisions rely
    * on). */
  def spanIndexRead(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame =
    EpochStore.read(spark, indexPath, spanIndexSchema, "span", "df_cnt")

  /** Fold every committed epoch at `indexPath` into one compacted epoch
    * at `destPath` (copy, never in-place — the chunk family's posture);
    * the `_SPAN_K` marker travels with the data so the k-drift guard
    * holds across compaction of raw stores too. Returns distinct spans
    * written. */
  def spanIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      destPath: String): Long = {
    val n = EpochStore.compact(spark, indexPath, destPath,
      "spanIndexCompact")(spanIndexRead)
    storedK(spark, indexPath).foreach(recordOrCheckK(spark, destPath, _))
    n
  }

  /** Shared typed rebuild: drop tokens covered by any k-window at the
    * given 1-based start positions; emit normalized text. */
  private def rebuild(
      id: Long, text: String, st: Seq[Long], k: Int): (Long, String, Long) = {
    val ws = TextFunctions
      .normalizeScala(if (text == null) "" else text).split(" ", -1)
    if (st.isEmpty) (id, ws.mkString(" "), 0L)
    else {
      val covered = new Array[Boolean](ws.length)
      st.foreach { s =>
        var j = s.toInt - 1
        val end = math.min(ws.length, j + k)
        while (j < end) { covered(j) = true; j += 1 }
      }
      val kept = new StringBuilder
      var removed = 0L
      var i = 0
      while (i < ws.length) {
        if (covered(i)) removed += 1
        else {
          if (kept.nonEmpty) kept.append(' ')
          kept.append(ws(i))
        }
        i += 1
      }
      (id, kept.toString, removed)
    }
  }
}
