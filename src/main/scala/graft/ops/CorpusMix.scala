package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus mixing: draw a fixed per-source quota of documents
 * (a training-mix recipe — "40 docs of src0, 10 of src1, …"), selected by
 * md5-of-id rank: no rand(), so the draw is bit-reproducible across runs
 * and engines.
 *
 * Scale shape: a source column has FEW distinct values, so a bare
 * `row_number` window would funnel the whole corpus into one reducer per
 * source (the exact hazard [[TopN]] exists for). Phase 1 runs the bounded
 * per-partition heap with n = max quota; only the <= n * sources *
 * partitions survivors are windowed exactly, then the per-source quota is
 * applied via a broadcast join against the tiny quota table.
 *
 * Sources absent from `quotas` are dropped; a quota larger than the
 * source's population keeps the whole source.
 */
object CorpusMix {

  /**
   * The shared deterministic per-key md5-rank core — [[mix]]'s draw and
   * the embedding-space [[graft.functions.IVF.clusterSample]]'s: rank
   * each key's rows by (md5(id), id), keep rk <= n. md5 hex is ASCII,
   * so Scala string order == Spark UTF8 binary order (the
   * sample_stratified argument) — a fix to the rank discipline lands
   * here ONCE for both callers. Two-phase: the bounded per-partition
   * heap prunes BEFORE the window's exchange, so a hot key costs n rows
   * per partition, never its population through one reducer.
   *
   * Output (keyCol STRING, idCol LONG, rk LONG), caller's column names.
   */
  private[graft] def md5RankTake(
      df: DataFrame, keyCol: String, idCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(keyCol).cast("string"),
        md5(col(idCol).cast("string")).as("mk"),
        col(idCol).cast("long"))
      .as[(String, String, Long)]
    implicit val byHashThenId: Ordering[(String, String, Long)] =
      Ordering.by(t => (t._2, t._3))
    val surv = TopN.partitionTopN(keyed, n)(_._1)
      .toDF(keyCol, "mk", idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("mk"), col(idCol))
    surv.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select(col(keyCol), col(idCol), col("rk"))
  }

  def mix(df: DataFrame, idCol: String, sourceCol: String,
      quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty, "corpusMix: quotas must be non-empty")
    require(quotas.values.forall(_ > 0), s"corpusMix: quotas must be positive: $quotas")
    val spark = df.sparkSession
    import spark.implicits._
    val maxQ = quotas.values.max
    val ranked = md5RankTake(
      df.filter(col(sourceCol).isin(quotas.keys.toSeq: _*))
        .select(col(sourceCol).as("source"), col(idCol).as("doc_id")),
      "source", "doc_id", maxQ)
    val quotaDf = quotas.toSeq.toDF("source", "k")
    ranked.join(broadcast(quotaDf), "source")
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /**
   * Deterministic weighted priority sample of k rows: each row draws an
   * md5-derived integer priority scaled down by its weight —
   * `(h28(id) << 20) div max(weight, 1)` — and the k smallest priorities
   * win, so selection probability grows with weight while the whole draw
   * stays exact-integer (bit-reproducible across engines and runs; no
   * rand(), no float pow/ln whose libm ulps differ per engine). The
   * deterministic sibling of Efraimidis-Spirakis u^(1/w) sampling, in
   * the same spirit as [[mix]]'s md5-rank quotas.
   *
   * Scale shape: orderBy(...).limit(k) plans as TakeOrderedAndProject —
   * a per-partition bounded top-k merged on one reducer over <= k *
   * partitions rows; no global sort, no full-input window.
   */
  /**
   * Token-budget corpus mixing — the recipe a real training run needs
   * ("3B tokens of web, 500M of code"), not a doc-count quota: per
   * source, docs are taken in md5-of-id rank order while the cumulative
   * token count BEFORE the doc stays under the budget (greedy fill; the
   * crossing doc is included, so a budget is met or minimally exceeded,
   * never under-filled while docs remain). Deterministic — no rand(),
   * bit-reproducible across runs and engines.
   *
   * Scale shape — the low-cardinality-window hazard is removed by a
   * bucket histogram, not a heap (the doc-count bound [[mix]] uses does
   * not exist for a token budget): docs bucket by the first 4 hex chars
   * of their hash (65536 buckets/source); per-(source, bucket) token
   * sums are a map-side-combining aggregate; the running bucket totals
   * window over <= 65536 tiny rows per source. Every bucket then
   * classifies as take-all (fits the budget entirely), drop-all, or THE
   * boundary bucket — exactly one per source — and only the boundary
   * bucket's rows (~1/65536 of the source) pay a row-level cumulative
   * window. No full-source window, no single-reducer funnel.
   *
   * Output: (doc_id, source, n_tokens), one row per selected doc.
   */
  def mixByTokens(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budgets: Map[String, Long],
      bucketHexChars: Int = 4): DataFrame = {
    require(budgets.nonEmpty, "mixByTokens: budgets must be non-empty")
    require(budgets.values.forall(_ > 0),
      s"mixByTokens: budgets must be positive: $budgets")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"mixByTokens: bucketHexChars out of range: $bucketHexChars")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.GraftCaches.Cacheable
    val W = org.apache.spark.sql.expressions.Window
    val keyed = df
      .filter(col(sourceCol).isin(budgets.keys.toSeq: _*))
      .select(col(sourceCol).cast("string").as("source"),
        md5(col(idCol).cast("string")).as("mk"),
        col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("bkt", substring(col("mk"), 1, bucketHexChars))
      .graftCached
    val budgetDf = budgets.toSeq.toDF("source", "budget")
    val wB = W.partitionBy("source").orderBy("bkt")
      .rowsBetween(W.unboundedPreceding, -1)
    val bstat = keyed.groupBy("source", "bkt")
      .agg(sum("n_tokens").as("bt"))
      .withColumn("before", coalesce(sum("bt").over(wB), lit(0L)))
      .join(broadcast(budgetDf), "source")
      // STRICT take-all: a bucket whose cumulative total lands EXACTLY on
      // the budget routes through the row-level boundary path, because a
      // zero-token doc sitting at the exact boundary has cum_before ==
      // budget and the per-doc rule (cum_before < budget) excludes it —
      // a bucket-level <= would take it. Unreachable with tokenCount
      // (never 0) but load-bearing for caller-supplied token columns;
      // costs one rare extra boundary bucket, still bounded.
      .withColumn("take_all", col("before") + col("bt") < col("budget"))
      .withColumn("boundary",
        !col("take_all") && col("before") < col("budget"))
    val allIn = keyed.join(
      bstat.filter(col("take_all")).select("source", "bkt"),
      Seq("source", "bkt"), "left_semi")
    // The boundary bucket: row-level cumulative over ~1/16^chars of one
    // source — bounded by construction.
    val wD = W.partitionBy("source", "bkt").orderBy(col("mk"), col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val boundaryIn = keyed.join(
        bstat.filter(col("boundary"))
          .select("source", "bkt", "before", "budget"),
        Seq("source", "bkt"))
      .withColumn("cum_before",
        col("before") + coalesce(sum("n_tokens").over(wD), lit(0L)))
      .filter(col("cum_before") < col("budget"))
    allIn.select("doc_id", "source", "n_tokens")
      .unionAll(boundaryIn.select("doc_id", "source", "n_tokens"))
  }

  /** Bounded-collect contract for [[temperatureBudgets]]: the per-source
    * totals table collects to the driver (it IS the model being computed),
    * so the source cardinality must be model-sized. 64k sources ≈ a few MB
    * of totals — past it the "source" column is not a mixture axis. */
  val MaxBudgetSources = 65536

  /**
   * Temperature-weighted token budgets — the standard alpha-sampling
   * recipe (Devlin et al. 2019 appendix; DoReMi-adjacent): per-source
   * token mass T_s is reweighted to w_s = T_s^alpha and the total token
   * budget B is apportioned as B * w_s / W. `alpha = "prop"` (1.0)
   * reproduces the natural distribution; `"sqrt"` (0.5) upweights small
   * sources — the usual multilingual/multi-domain flattening. Feed the
   * result to [[mixByTokens]] (or call [[temperatureMix]]) to materialize
   * the draw.
   *
   * Exactness discipline: no float pow — "sqrt" uses the exact integer
   * square root (java.math.BigInteger.sqrt), apportionment is exact
   * BigInt floor division with LARGEST-REMAINDER rounding (ties by
   * source name), so sum(budget) == totalBudget EXACTLY and the whole
   * table is bit-reproducible across engines and runs. (The DuckDB
   * oracle mirrors isqrt as floor(sqrt(double)) with a +-1 correction —
   * exact while T_s < 2^52, far past any per-source token mass that
   * fits a driver model.)
   *
   * Scale shape: ONE map-side-combining aggregation to a sources-sized
   * totals frame; the [[MaxBudgetSources]] contract is ENFORCED by a
   * bounded limit-probe count (the chunkDedupIndexed discipline — this
   * makes the operator EAGER), then the totals collect and the
   * apportionment runs driver-side on the model-sized table (the
   * NbModel posture: the output IS the model).
   *
   * Output: (source, tokens_total, weight, budget), one row per source;
   * budgets can be 0 for tiny sources under "sqrt" (filter before
   * [[mixByTokens]], which requires positive budgets).
   */
  def temperatureBudgets(df: DataFrame, sourceCol: String,
      tokensCol: String, totalBudget: Long, alpha: String = "sqrt",
      maxSources: Int = MaxBudgetSources): DataFrame = {
    require(totalBudget > 0,
      s"temperatureBudgets: totalBudget must be positive, got $totalBudget")
    require(alpha == "prop" || alpha == "sqrt",
      s"temperatureBudgets: alpha must be 'prop' or 'sqrt', got '$alpha'")
    require(maxSources > 0 && maxSources <= MaxBudgetSources,
      s"temperatureBudgets: maxSources out of range: $maxSources")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df
      .select(col(sourceCol).cast("string").as("source"),
        col(tokensCol).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("tokens_total"))
    // Guard and collect are ONE bounded job (the decontaminate fusion):
    // CollectLimit pulls at most maxSources + 1 rows, the require reads
    // the collected length — no second aggregation pass.
    val rows0 = totals.limit(maxSources + 1).as[(String, Long)].collect()
    require(rows0.length <= maxSources,
      s"temperatureBudgets: > $maxSources sources — the totals table " +
        "must be model-sized (it collects to the driver). Cap the " +
        "source column's cardinality or raise maxSources deliberately.")
    val rows = rows0.sortBy(_._1)
    rows.foreach { case (s, t) =>
      require(t >= 0, s"temperatureBudgets: negative token total for " +
        s"source '$s': $t")
    }
    val weights = rows.map { case (s, t) =>
      val w = if (alpha == "prop") t
      else java.math.BigInteger.valueOf(t).sqrt().longValueExact()
      (s, t, w)
    }
    val wSum = weights.map(x => BigInt(x._3)).sum
    require(wSum > 0, "temperatureBudgets: all sources have zero " +
      "weight — no token mass to apportion")
    val b = BigInt(totalBudget)
    val based = weights.map { case (s, t, w) =>
      (s, t, w, (b * w / wSum).toLong, b * w % wSum)
    }
    var extra = totalBudget - based.map(_._4).sum
    // Largest remainder, ties by source name — deterministic and exact:
    // after this loop sum(budget) == totalBudget.
    val out = based.sortBy { case (s, _, _, _, rem) => (-rem, s) }
      .map { case (s, t, w, base, _) =>
        val add = if (extra > 0) { extra -= 1; 1L } else 0L
        (s, t, w, base + add)
      }
      .sortBy(_._1)
    spark.createDataset(out.toSeq)
      .toDF("source", "tokens_total", "weight", "budget")
  }

  /** [[temperatureBudgets]] composed with [[mixByTokens]]: compute the
    * alpha-weighted budgets and materialize the md5-rank greedy draw in
    * one call. Zero-budget sources (possible under "sqrt" for tiny
    * sources) are dropped before the fill — mixByTokens' positive-budget
    * contract. Output: (doc_id, source, n_tokens), as mixByTokens. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, totalBudget: Long,
      alpha: String = "sqrt"): DataFrame = {
    val budgets = temperatureBudgets(df, sourceCol, tokensCol,
      totalBudget, alpha)
      .select("source", "budget")
      .collect()
      .collect { case r if r.getLong(1) > 0 => r.getString(0) -> r.getLong(1) }
      .toMap
    mixByTokens(df, idCol, sourceCol, tokensCol, budgets)
  }

  /**
   * Deterministic weighted N-way corpus split (train/val/test and
   * beyond) — the `sample_split` query's 10%-bucket move generalized to
   * arbitrary weights with EXACT proportions: each key draws h32 (first
   * 8 md5 hex chars — a uniform 32-bit integer) and lands in the split
   * whose cumulative-weight range [floor(2^32 * cum_{i-1}/W),
   * floor(2^32 * cum_i/W)) covers it. Thresholds are exact BigInt floor
   * divisions computed once (no float proportions), the draw has no
   * rand(), and the whole assignment is a stateless per-row projection
   * — bit-reproducible across engines/runs and STREAM-NATIVE.
   *
   * `byCol` picks the DRAW KEY: empty (default) splits by document id;
   * a column name splits by THAT column's value, so every row sharing
   * the value lands in the same split — the LEAK-FREE split (near-dups
   * concentrate within domains/clusters; splitting by doc id leaks
   * them across train/test, the classic contamination bug a grouped
   * split exists to prevent). A NULL draw key fails LOUD (the
   * [[importanceSample]] null-score discipline): a null h32 makes
   * every range predicate null, so without the guard every null-keyed
   * row would silently concentrate in the LAST split — exactly the
   * systematic bias a deterministic split exists to rule out, and
   * plausible in grouped mode where the source column can be sparse.
   *
   * Output: (doc_id, split) — plus the `byCol` column when set (the
   * audit shape: the grouping that decided the split is visible).
   */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Long)], byCol: String = "",
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splitAssign: splits must be non-empty")
    require(splits.forall(_._2 > 0),
      s"splitAssign: weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"splitAssign: split names must be unique: ${splits.map(_._1)}")
    // byCol == idCol is the default draw spelled explicitly — normalize
    // it, or the audit projection below would emit doc_id twice and
    // poison downstream references with ambiguity.
    val byColN = if (byCol == idCol) "" else byCol
    val tot = splits.map(x => BigInt(x._2)).sum
    // Upper cut per split; the last is exactly 2^32, so every h32 < 2^32
    // falls in some range — the otherwise() below is unreachable.
    val cuts = splits.map(x => BigInt(x._2))
      .scanLeft(BigInt(0))(_ + _).tail
      .map(c => (BigInt(4294967296L) * c / tot).toLong)
    val keyCol = if (byColN.isEmpty) col(idCol) else col(byColN)
    val h32 = conv(substring(
      md5(concat(keyCol.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")
    // A null key ⇒ null h32 ⇒ every range predicate null: guard FIRST so
    // the row fails loud instead of falling through to the last split.
    // coalesce: the id itself may be the null key, and concat-with-null
    // would null the whole message (raise_error would throw messageless).
    val nullGuard = when(h32.isNull, raise_error(concat(
      lit("splitAssign: null draw key (" +
        (if (byColN.isEmpty) idCol else byColN) + ") for doc_id="),
      coalesce(col(idCol).cast("string"), lit("NULL")),
      lit(" — a null key would silently land the row in the last split")))
      .cast("string"))
    val assigned = splits.map(_._1).zip(cuts)
      .foldLeft(nullGuard) { case (acc, (name, cut)) =>
        acc.when(h32 < lit(cut), lit(name))
      }.otherwise(lit(splits.last._1))
    val base = Seq(col(idCol).cast("long").as("doc_id")) ++
      (if (byColN.isEmpty) Nil else Seq(col(byColN))) :+
      assigned.as("split")
    df.select(base: _*)
  }

  /** Score ceiling for [[importanceSample]]: the kept test cross-multiplies
    * h32 (< 2^32) by maxScore, so 2^30 keeps the product inside a long
    * with headroom. Scores are caller-scaled integers (micro-units,
    * token counts, ...) — 2^30 of dynamic range is far past any of them. */
  val MaxImportanceScore: Long = 1L << 30

  /**
   * Deterministic score-proportional Bernoulli filter — the "soft
   * quality sampling" stage (keep a document with probability
   * score/maxScore, FineWeb-style stochastic filtering) without rand():
   * each doc draws h32 = first 8 md5 hex chars of (id:salt) — a uniform
   * 32-bit integer — and is kept iff h32 * maxScore < score * 2^32. The
   * comparison is ONE exact integer cross-multiply (no division, no
   * float): the threshold itself is exact integer arithmetic, so
   * P(keep) = ceil(score * 2^32 / maxScore) / 2^32 — equal to
   * min(1, score/maxScore) to within 2^-32 per draw (exactly equal
   * when maxScore divides score * 2^32) — and the draw is
   * bit-reproducible across engines and runs ([[weightedSample]]'s
   * posture, per-row Bernoulli instead of global top-k). A score >=
   * maxScore always keeps; a zero score never does; a NEGATIVE or NULL
   * score fails LOUD (both are caller bugs, not probabilities — and a
   * null would otherwise slip through least()'s null-ignoring
   * semantics as an always-keep).
   *
   * Stateless per-row ⇒ embarrassingly parallel at any corpus size, no
   * shuffle at all, and STREAM-NATIVE in append mode (the gopherStats
   * argument). Output: (doc_id, score, kept) — the audit shape
   * ([[sourceCap]]'s): every doc appears, the pipeline sees what was
   * dropped.
   */
  def importanceSample(df: DataFrame, idCol: String, scoreCol: String,
      maxScore: Long, salt: String = "isample"): DataFrame = {
    require(maxScore > 0 && maxScore <= MaxImportanceScore,
      s"importanceSample: maxScore must be in (0, $MaxImportanceScore], " +
        s"got $maxScore — rescale the score column")
    val h32 = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")
    df.select(col(idCol).cast("long").as("doc_id"),
        col(scoreCol).cast("long").as("score"), h32.as("h32"))
      .withColumn("kept",
        // A NULL score must fail LOUD here: least() below IGNORES nulls
        // (Spark semantics), so an unguarded null would silently keep
        // its doc with probability 1 — the bias this operator exists to
        // control.
        when(col("score").isNull, raise_error(concat(
          lit("importanceSample: null score for doc_id="),
          col("doc_id"), lit(" — the score column must cover every row")))
          .cast("boolean"))
          .when(col("score") < 0, raise_error(concat(
            lit("importanceSample: negative score for doc_id="),
            col("doc_id"), lit(" — scores are keep-probabilities, " +
              "scale them non-negative"))).cast("boolean"))
          // least() clamps BEFORE the multiply: a score past maxScore
          // keeps with probability 1 anyway (h32 < 2^32 always), and the
          // clamp bounds both products under 2^62 — no overflow at any
          // caller-supplied score.
          .otherwise(col("h32") * lit(maxScore) <
            least(col("score"), lit(maxScore)) * lit(4294967296L)))
      .select("doc_id", "score", "kept")
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val h28 = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 7), 16, 10)
      .cast("long")
    df.select(col(idCol).cast("long").as(idCol),
        col(weightCol).cast("long").as("weight"),
        (h28 * lit(1048576L)).as("scaled"))
      .withColumn("priority", expr("scaled div greatest(weight, 1)"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("priority"))
  }

  /**
   * Uniform per-source cap with a kept FLAG for every document — the
   * audit complement of [[mix]] (which SELECTS a quota subset): keep
   * `maxPerKey` documents of each source, flag the rest. The web-crawl
   * "domain cap" shape: one hot domain must not dominate the training
   * mix, and the pipeline wants the rejected remainder visible, not
   * silently dropped.
   *
   * `keepBy` picks WHICH `maxPerKey` survive:
   *  - `"byId"` (default): the lowest-id docs. Deterministic and
   *    oracle-simple, but on a real crawl id order usually tracks crawl
   *    order, so the cap systematically prefers the earliest-crawled
   *    pages of a hot domain.
   *  - `"byHash"`: the [[md5RankTake]] draw — md5-of-id rank, the same
   *    unbiased deterministic selection [[mix]] uses. Still no rand():
   *    bit-reproducible across runs and engines, just UNCORRELATED with
   *    crawl order.
   *
   * Precondition: `idCol` must be unique (the doc-id contract every
   * caller in this repo already satisfies). Duplicate ids within a key
   * would make the rank cut nondeterministic AND multiply rows through
   * the kept-flag join-back — both silently.
   *
   * Scale shape: same two-phase discipline as [[mix]] on BOTH modes —
   * the bounded per-partition heap (n = cap) prunes BEFORE any shuffle,
   * the exact window ranks only <= cap * sources * partitions
   * survivors, and the kept flags join back semi-join-shaped on doc id.
   * A hot source costs cap rows per input partition, never its full
   * population through one reducer.
   *
   * Output (doc_id, keyCol, kept), one row per input document.
   */
  def sourceCap(df: DataFrame, idCol: String, keyCol: String,
      maxPerKey: Int, keepBy: String = "byId"): DataFrame = {
    require(maxPerKey > 0, s"sourceCap: maxPerKey must be positive, got $maxPerKey")
    require(keepBy == "byId" || keepBy == "byHash",
      s"sourceCap: keepBy must be 'byId' or 'byHash', got '$keepBy'")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(keyCol).cast("string").as(keyCol))
    val keptIds =
      if (keepBy == "byHash")
        md5RankTake(base.select(col(keyCol), col("doc_id")),
            keyCol, "doc_id", maxPerKey)
          .select(col("doc_id"), lit(true).as("kept"))
      else {
        // (doc_id, key) — the id alone already orders each key's group,
        // but partitionTopN's contract asks for a TOTAL order over the
        // element type, which the key component completes.
        implicit val ord: Ordering[(Long, String)] =
          Ordering.Tuple2(Ordering.Long, Ordering.String)
        val pruned = graft.ops.TopN.partitionTopN(
            base.as[(Long, String)], maxPerKey)(_._2)
          .toDF("doc_id", keyCol)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCol).orderBy(col("doc_id"))
        pruned.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= maxPerKey)
          .select(col("doc_id"), lit(true).as("kept"))
      }
    base.join(keptIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col(keyCol),
        coalesce(col("kept"), lit(false)).as("kept"))
  }
}
