package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding similarity / approximate-nearest-neighbor operators.
 *
 * Dot products are computed in double precision, summed in array order via
 * `aggregate` (deterministic, matching the DuckDB oracle bit-for-bit).
 *
 * Scale path: brute-force top-k broadcasts the (small) query set so the
 * corpus is scanned exactly once with no shuffle until the final per-query
 * top-k; the LSH variant buckets by random-hyperplane signs so each query
 * only probes its bucket — the standard recall/cost dial at 100 TB.
 */
object Vectors {

  /**
   * Sum of elementwise products, double precision, array order. Uses the
   * native [[graft.expressions.DotProduct]] codegen expression (registered
   * lazily on the active session); value-identical to the zip_with +
   * aggregate formulation the DuckDB oracles mirror.
   */
  def dot(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.expressions.DotProduct.register)
    call_function("graft_dot", a, b)
  }

  /** The pure-builtin formulation (reference implementation for tests). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Contract bound for the ANN operators' query side. Every top-k
   * operator here broadcasts (or collects) the QUERY frame while the
   * corpus streams — correct only while the query side is genuinely
   * small. 65536 rows of 256-dim float embeddings is ~67 MB broadcast,
   * comfortably inside executor memory; beyond that the caller should
   * split the query frame or use a corpus-side operator
   * (bruteForceNearDups / embeddingNearDups).
   */
  val MaxQueryRows: Int = 65536

  /** Loud guard enforcing [[MaxQueryRows]]: counts AT MOST maxRows+1 rows
    * (a CollectLimit job, not a full scan) and refuses to proceed rather
    * than letting an oversized query frame OOM the driver mid-broadcast. */
  private[graft] def requireSmallQuerySide(
      queries: org.apache.spark.sql.DataFrame,
      op: String,
      maxRows: Int = MaxQueryRows): Unit = {
    val n = queries.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$op: query side exceeds the $maxRows-row broadcast contract — " +
        "split the query frame into batches or use a corpus-side operator " +
        "(bruteForceNearDups / embeddingNearDups)")
  }

  /**
   * Brute-force cosine top-k: for every query vector, the k nearest corpus
   * vectors (excluding itself). Query side is broadcast; ties broken by
   * candidate id. Output: (query_id, cand_id, cos, rank).
   */
  def bruteForceTopK(
      queries: DataFrame, // (vec_id, embedding)
      corpus: DataFrame, // (vec_id, embedding)
      k: Int): DataFrame = {
    requireSmallQuerySide(queries, "bruteForceTopK")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    // Two-phase rank (ops.TopN): a bare window here ships the WHOLE
    // corpus into one task per query — the brute-force scan must stay
    // distributed even though its compute is O(q x n) by definition.
    graft.ops.TopN.topKByQuery(scored, "query_id", "cand_id", "cos", k)
  }

  /**
   * Range (radius) search: every corpus vector whose cosine similarity to
   * a query is >= `minCos` (excluding the query itself) — the
   * fixed-quality complement of [[bruteForceTopK]]'s fixed-count
   * contract. A retrieval pipeline uses it where "all sufficiently
   * similar" is the semantics (duplicate-candidate pull, neighborhood
   * audits around a probe vector) and a top-k cut would either truncate a
   * dense neighborhood or pad a sparse one with junk.
   *
   * Exact form: the query frame broadcasts (bounded by the ANN query
   * contract) and the corpus streams once — no window at all, the
   * threshold filter runs inside the same codegen stage as the scan, so
   * unlike top-k there is no rank shuffle. Result size is data-dependent
   * by design; the per-query neighborhood is the caller's quality knob
   * (`minCos`), not a count cap. For the recurring-batch form over a
   * persisted index see [[graft.functions.IVF.rangeSearchIndexed]].
   *
   * Output: (query_id, cand_id, cos), one row per in-range pair.
   */
  def rangeSearch(
      queries: DataFrame, // (vec_id, embedding)
      corpus: DataFrame, // (vec_id, embedding)
      minCos: Double): DataFrame = {
    requireSmallQuerySide(queries, "rangeSearch")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .filter(col("cos") >= minCos)
      .select("query_id", "cand_id", "cos")
  }

  // Deterministic hyperplane coefficients: splitmix-style per (plane, dim).
  private[graft] def planeCoef(plane: Int, dim: Int): Double = {
    var z = (plane.toLong * 131 + dim + 1) * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /**
   * The hyperplane coefficients as DuckDB `VALUES (tbl, p, [c0, ...])`
   * rows — the planes are data-independent and deterministic, so the
   * ENTIRE multi-table LSH pipeline is SQL-mirrorable by embedding them
   * as literals in the oracle query.
   */
  private[graft] def planeCoefsSqlValues(numPlanes: Int, numTables: Int, dim: Int): String =
    (0 until numTables).flatMap { t =>
      (0 until numPlanes).map { p =>
        val cs = (0 until dim).map(d => planeCoef(t * 64 + p, d))
          .mkString("[", ", ", "]")
        s"($t, $p, $cs)"
      }
    }.mkString(", ")

  /** Sign-bit bucket key from `numPlanes` random hyperplanes (per table). */
  def lshBucket(embedding: Column, dim: Int, numPlanes: Int = 8, table: Int = 0): Column = {
    val bits = (0 until numPlanes).map { p =>
      val coefs = array((0 until dim).map(d => lit(planeCoef(table * 64 + p, d))): _*)
      when(dot(embedding, coefs) >= 0, shiftleft(lit(1), p)).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** (table, bucket) pairs for multi-table LSH, as an exploded column. */
  private def tableBuckets(embedding: Column, dim: Int, numPlanes: Int, numTables: Int): Column =
    explode(array((0 until numTables).map { t =>
      struct(lit(t).as("tbl"), lshBucket(embedding, dim, numPlanes, t).as("bucket"))
    }: _*))

  /**
   * Corpus-side bucket rows (tbl, bucket, vec_id) as ONE typed pass with
   * primitive dot loops. Value-identical to the [[tableBuckets]] Column
   * form (same plane coefficients, same array-order double dots, same
   * sign rule) but skips the numTables*numPlanes*dim literal expression
   * tree, which costs Catalyst a constant-folding/codegen pass on EVERY
   * query plan — per-row sketch work belongs in a typed pass (the same
   * rationale as Dedup.signatures).
   */
  private[graft] def bucketRows(
      vectors: DataFrame, dim: Int, numPlanes: Int, numTables: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val coefs: Array[Array[Double]] = Array.tabulate(numTables * numPlanes) { i =>
      Array.tabulate(dim)(d => planeCoef((i / numPlanes) * 64 + i % numPlanes, d))
    }
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.flatMap { case (id, e) =>
        val v = e.toArray.map(_.toDouble)
        (0 until numTables).map { t =>
          var bucket = 0
          var p = 0
          while (p < numPlanes) {
            val c = coefs(t * numPlanes + p)
            val n = math.min(v.length, c.length)
            var s = 0.0
            var d = 0
            while (d < n) { s += v(d) * c(d); d += 1 }
            if (s >= 0) bucket |= (1 << p)
            p += 1
          }
          (t, bucket, id)
        }
      }).toDF("tbl", "bucket", "vec_id")
  }

  /**
   * Multi-table LSH ANN: L independent hyperplane tables; a corpus vector is
   * a candidate if it shares a bucket with the query in ANY table, then
   * exact cosine + top-k over the (deduplicated) candidates. Recall/cost
   * dial: more planes = smaller buckets, more tables = higher recall. The
   * shuffle carries only (table, bucket, id); vectors join back by id.
   * Output: (query_id, cand_id, cos, rank).
   */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      dim: Int,
      k: Int,
      numPlanes: Int = 4,
      numTables: Int = 8): DataFrame = {
    // Id-only candidate generation: the bucket join carries (tbl, bucket,
    // id) rows and pairs are deduped across tables BEFORE vectors join
    // back by id — carrying the embedding arrays through the bucket
    // shuffle would move GBs where ids move MBs (same discipline as
    // embeddingNearDups). The query side is broadcast twice (bucket rows,
    // then vectors) — it is the small side by contract, enforced loudly.
    requireSmallQuerySide(queries, "lshTopK")
    val qb = bucketRows(queries, dim, numPlanes, numTables)
      .withColumnRenamed("vec_id", "query_id")
    val cb = bucketRows(corpus, dim, numPlanes, numTables)
      .withColumnRenamed("vec_id", "cand_id")
    val pairs = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      // Same exchange pin as embeddingNearDups (Dedup.spreadForVerify):
      // the exact-cosine scoring runs in this partitioning.
      .transform(Dedup.spreadForVerify(_, "query_id", "cand_id"))
      .distinct()
    val q = queries.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").as("cv"), norm(col("embedding")).as("cn"))
    val scored = pairs
      .join(broadcast(q), "query_id")
      .join(c, "cand_id")
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    // Two-phase rank: bucket candidates are usually bounded, but a hot
    // bucket (low-entropy plane split) can still concentrate a corpus
    // fraction on one query — the heap prune costs nothing when small.
    graft.ops.TopN.topKByQuery(scored, "query_id", "cand_id", "cos", k)
  }

  /**
   * Exact embedding near-dup pairs: all (a < b) pairs with cosine >=
   * threshold via a distributed block-pair join. O(n^2) compute — the
   * oracle-checkable baseline; use [[embeddingNearDups]] for the
   * sub-quadratic scale path.
   */
  def bruteForceNearDups(
      vectors: DataFrame,
      threshold: Double,
      numBlocks: Int = 16): DataFrame = {
    // Block-pair matrix form, fully DISTRIBUTED — no driver collect, no
    // full-corpus broadcast. Ids hash into `numBlocks` blocks; each block
    // aggregates its vectors (with precomputed norms) into one row; every
    // block pair (i <= j) becomes one task that streams block i against
    // block j in primitive double loops — no per-pair expression eval, no
    // row materialization for sub-threshold pairs. Shuffle volume is
    // ~numBlocks/2 copies of the corpus (each block joins ~B/2 partners),
    // the standard all-pairs trade; at 100 TB raise numBlocks so a block
    // (n/B vectors) fits a task's memory — compute stays O(n^2) dots
    // either way, just spread over B(B+1)/2 tasks.
    val spark = vectors.sparkSession
    import spark.implicits._
    val B = numBlocks
    require(B >= 1, s"numBlocks must be >= 1, got $B")
    val blocks = vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) =>
        val v = e.toArray.map(_.toDouble)
        (((id % B + B) % B).toInt, id, v.toSeq, math.sqrt(dotArr(v, v)))
      }
      .groupByKey(_._1)
      .mapGroups { (blk, rows) =>
        (blk, rows.map { case (_, id, v, n) => (id, v, n) }.toArray.sortBy(_._1))
      }
    // Block-pair keys (i <= j) drive two EQUI-joins against the block
    // frame — each block travels to its ~B/2 partner tasks via shuffle;
    // a non-equi self-join would nested-loop-broadcast the whole corpus.
    val keys = (for { i <- 0 until B; j <- i until B } yield (i, j))
      .toDF("ba", "bb")
    val bdf = blocks.toDF("blk", "rows")
    keys
      .join(bdf.select(col("blk").as("ba"), col("rows").as("ra")), "ba")
      .join(bdf.select(col("blk").as("bb"), col("rows").as("rb")), "bb")
      .select(col("ba"), col("ra"), col("bb"), col("rb"))
      .as[(Int, Array[(Long, Seq[Double], Double)], Int, Array[(Long, Seq[Double], Double)])]
      .flatMap { case (ba, rowsA, bb, rowsB) =>
        // Cheap raw-double screen with a margin wider than any possible
        // HALF_UP boundary shift at scale 4 (5e-5); only the rare
        // near-threshold survivors pay the exact BigDecimal rounding that
        // keeps bit-parity with the Column/oracle path. No per-pair
        // allocation below the screen.
        val screen = threshold - 6e-5
        val same = ba == bb
        val av = rowsA.map { case (id, v, n) => (id, v.toArray, n) }
        val bv = if (same) av else rowsB.map { case (id, v, n) => (id, v.toArray, n) }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < av.length) {
          val (ia, va, na) = av(i)
          var j = if (same) i + 1 else 0
          while (j < bv.length) {
            val (ib, vb, nb) = bv(j)
            val raw = dotArr(va, vb) / (na * nb)
            if (raw >= screen) {
              val cos = java.math.BigDecimal.valueOf(raw)
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
              if (cos >= threshold) {
                if (ia < ib) out += ((ia, ib, cos))
                else out += ((ib, ia, cos))
              }
            }
            j += 1
          }
          i += 1
        }
        out
      }.toDF("id_a", "id_b", "cos")
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /**
   * Scalar int8 quantization per vector (the standard 4x storage cut for
   * embedding stores): code_i = round((x_i - min) / scale) in [0, 255]
   * with scale = (max - min)/255; reconstruction x~_i = min + code_i *
   * scale, so |x - x~| <= scale/2. A typed mapPartitions pass (per-row
   * imperative sketch work — a Column HOF would re-evaluate the min/max
   * subtree per element). Output: (vec_id, codes, minv, scale).
   */
  def quantize8(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, emb) =>
        val v = emb.toArray.map(_.toDouble)
        var mn = Double.MaxValue
        var mx = Double.MinValue
        v.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
        if (v.isEmpty) { mn = 0.0; mx = 0.0 }
        val scale = (mx - mn) / 255.0
        val codes =
          if (scale == 0.0) v.map(_ => 0)
          else v.map(x => math.round((x - mn) / scale).toInt)
        (id, codes.toSeq, mn, scale)
      })
      .toDF("vec_id", "codes", "minv", "scale")
  }

  /** Reconstruction of [[quantize8]] output back to doubles. */
  def dequantize8(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      transform(col("codes"), c => col("minv") + c * col("scale")).as("embedding"))

  /**
   * Embedding near-dup pairs: all (a < b) pairs with cosine >= threshold.
   * Multi-table LSH candidate generation (a pair is a candidate if it
   * collides in ANY of `numTables` independent hyperplane tables) followed
   * by exact cosine verification — so precision is exact by construction
   * and recall is the usual 1-(1-p^planes)^tables dial. Candidate pairs are
   * deduplicated across tables BEFORE scoring so each pair's cosine is
   * computed once.
   */
  def embeddingNearDups(
      vectors: DataFrame, // (vec_id, embedding)
      dim: Int,
      threshold: Double,
      numPlanes: Int = 4,
      numTables: Int = 8): DataFrame = {
    // The bucket self-join is the quadratic part: keep it id-only (16
    // bytes/row) and dedup pairs across tables BEFORE touching vectors —
    // carrying the embedding arrays through the skewed-bucket pair
    // explosion shuffles GBs where ids shuffle MBs. Vectors join back onto
    // the deduped pair set by id.
    val buckets = bucketRows(vectors, dim, numPlanes, numTables)
    val pairs = buckets.join(
        buckets.withColumnRenamed("vec_id", "id_b"), Seq("tbl", "bucket"))
      .filter(col("vec_id") < col("id_b"))
      .select(col("vec_id").as("id_a"), col("id_b"))
      // Pin the dedup exchange at compute parallelism: the cosine
      // verification downstream runs in THIS partitioning, and the pair
      // frame is byte-light but dot-product-heavy per row — AQE's
      // byte-based coalescing funnels it into one task (the
      // Dedup.spreadForVerify rationale).
      .transform(Dedup.spreadForVerify(_, "id_a", "id_b"))
      .distinct()
    val v = vectors.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    pairs
      .join(v.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /**
   * k-nearest-neighbor label vote over the embedding space — the
   * annotation-propagation step a training pipeline uses to extend a
   * small labeled seed set across an unlabeled corpus (kNN classification
   * over the labeled slice). Neighbors come from [[bruteForceTopK]]
   * (exact; swap in the IVF/PQ indexed screens for the amortized
   * recurring form — the vote is rank-agnostic plumbing); each query's
   * top-k labels vote, ties broken by nearest supporting neighbor
   * (min rank) then smaller label, so the decision is deterministic.
   *
   * Scale shape: the vote join BROADCASTS the bounded top-k frame
   * (<= queries x k rows, query side capped by the ANN contract) into
   * the label scan; the argmax window partitions by query_id with at
   * most min(k, #labels) rows per partition — bounded, no funnel.
   *
   * Output: (query_id, predicted, votes, best_rank), one row per query.
   */
  def knnClassify(
      queries: DataFrame, // (vec_id, embedding)
      corpus: DataFrame, // (vec_id, embedding, <labelCol>)
      labelCol: String,
      k: Int): DataFrame =
    knnVote(bruteForceTopK(queries, corpus, k), corpus, labelCol)

  /**
   * The rank-agnostic label vote over ANY (query_id, cand_id, rank) top-k
   * frame — shared by [[knnClassify]] (exact neighbors) and
   * [[knnClassifyIndexed]] (persisted ANN screens). `labeled` supplies
   * (vec_id, <labelCol>); labels must be NON-NULL and castable to BIGINT
   * for every voting neighbor — a null or non-castable label fails LOUD
   * at vote time (raise_error) instead of silently winning the vote as
   * NULL. The guard evaluates only on the bounded joined frame
   * (<= queries x k rows), never over the whole corpus, so a labeled
   * slice with unused junk rows outside the top-k still votes.
   */
  def knnVote(
      top: DataFrame, // (query_id, cand_id, ..., rank)
      labeled: DataFrame, // (vec_id, <labelCol>)
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = labeled.select(col("vec_id").as("cand_id"),
      col(labelCol).as("label_raw"))
    val votes = labels
      .join(broadcast(top.select("query_id", "cand_id", "rank")),
        Seq("cand_id"))
      .withColumn("label",
        when(col("label_raw").isNotNull &&
            try_cast_long(col("label_raw")).isNotNull,
          try_cast_long(col("label_raw")))
          .otherwise(raise_error(concat(
            lit(s"knnVote: label column '$labelCol' holds a null or " +
              "non-BIGINT-castable value ('"),
            coalesce(col("label_raw").cast("string"), lit("NULL")),
            lit("') among the voting neighbors — labels must be " +
              "non-null integers")))))
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"), min("rank").cast("long").as("best_rank"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("best_rank"), col("label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("query_id", "label", "votes", "best_rank")
      .withColumnRenamed("label", "predicted")
  }

  /** ANSI-independent lenient long cast (null on failure, so the loud
    * guard above owns the failure mode in BOTH ANSI settings). */
  private def try_cast_long(c: Column): Column = c.try_cast("long")

  /**
   * [[knnClassify]] riding the PERSISTED IVF screen instead of the exact
   * brute-force scan — the recurring annotation-propagation form: each
   * batch pays its own cell assignment plus the probed-cells join
   * ([[IVF.ivfTopKIndexed]]), never O(queries x corpus) dot products, so
   * propagating labels over a 100 TB corpus batch-by-batch costs
   * batch-sized work per batch. Vote semantics are identical to
   * [[knnClassify]] (majority label, min-rank then smaller-label
   * tie-break) over the approximate neighbor set; at nprobe = nlist the
   * probed set IS the exact set and the two paths agree exactly (spec'd).
   *
   * `labeled` supplies (vec_id, <labelCol>) for the indexed corpus — the
   * index stores no labels (labels change independently of geometry;
   * re-labeling must not force an index rebuild).
   */
  def knnClassifyIndexed(
      queries: DataFrame, // (vec_id, embedding)
      index: IVF.IvfIndex,
      labeled: DataFrame, // (vec_id, <labelCol>)
      labelCol: String,
      k: Int,
      nprobe: Int = 0): DataFrame =
    knnVote(IVF.ivfTopKIndexed(queries, index, k, nprobe), labeled, labelCol)

  /**
   * The label vote riding the PERSISTED PQ index
   * ([[PQ.ivfpqTopKIndexed]]): stored coarse cells prune the candidate
   * scan to each query's probed cells and stored 32-bit ADC codes score
   * the survivors — the cheapest recurring form, reading ~4 B per corpus
   * vector and never the raw embeddings. Neighbor ranks are the ADC
   * approximation's (scores quantize through the codebooks), so votes
   * can differ from [[knnClassifyIndexed]] near cluster boundaries;
   * within well-separated label clusters the two agree (spec'd). Same
   * vote semantics and loud-label contract as [[knnVote]]; labels join
   * from `labeled`, never the index (re-labeling must not force a
   * re-encode).
   */
  def knnClassifyIndexedPq(
      queries: DataFrame, // (vec_id, embedding)
      index: PQ.PqIndex,
      labeled: DataFrame, // (vec_id, <labelCol>)
      labelCol: String,
      k: Int,
      nprobe: Int = 0): DataFrame =
    knnVote(PQ.ivfpqTopKIndexed(queries, index, k, nprobe), labeled, labelCol)

  /**
   * Per-DIMENSION embedding audit — the distribution check an ANN/dedup
   * pipeline runs BEFORE trusting an index build: a dead dimension
   * (min = max = 0), a clipped one (max pinned at a saturation value),
   * or a scale-drifted one (mean/extrema off the fleet's norm) silently
   * degrades every cosine/L2 structure built on top, and none of the
   * per-VECTOR audits ([[graft.functions.IVF.embedOutliers]], the
   * norm extrema in embed_stats) can see it.
   *
   * Exact-arithmetic discipline: each element quantizes to micro-unit
   * longs (the [[graft.functions.IVF.embedOutliers]] convention —
   * `round(1e6 * x)`), so count/sum/min/max are exact integers under
   * any aggregation order and the mean is ONE IEEE division. Scale
   * shape: one projection + posexplode streaming through a map-side
   * partially-aggregated groupBy("dim") — the only shuffle carries dim
   * rows per map partition, never the element stream.
   *
   * Output (dim 0-based, n_vecs, sum_micro, mean_micro DOUBLE,
   * min_micro, max_micro), one row per dimension. Ragged inputs are
   * VISIBLE, not masked: a dim present in only some vectors reports its
   * own smaller n_vecs (embedding-dim drift across a corpus is exactly
   * what this audit exists to surface; the hard dim-check on index
   * paths stays loud).
   */
  def embedDimStats(
      vectors: DataFrame, // (vec_id, embedding)
      vecCol: String = "embedding"): DataFrame =
    vectors
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(lit(1e6) * col("x")).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("q")).as("sum_micro"),
        min(col("q")).as("min_micro"),
        max(col("q")).as("max_micro"))
      .select(col("dim"), col("n_vecs"), col("sum_micro"),
        (col("sum_micro").cast("double") / col("n_vecs")).as("mean_micro"),
        col("min_micro"), col("max_micro"))

  final case class EnergyStats(
      vec_id: Long, dims: Long, head_micro: Long, total_micro: Long,
      head_frac: Double)

  /**
   * Matryoshka-truncation audit: per vector, the fraction of squared
   * mass (energy) carried by the FIRST `headDims` dimensions — the
   * number that decides whether a 64 -> 16 truncation is safe before a
   * cheaper index is built on the truncated vectors (MRL-style
   * embeddings front-load energy by construction; a flat profile says
   * truncation will cost recall). The per-DIMENSION complement of
   * [[embedDimStats]]' corpus view: this one is per VECTOR, so
   * truncation-hostile outlier vectors are visible individually.
   *
   * Exactness: each element's energy is round(1e6 * x * x) — the
   * multiply is LEFT-ASSOCIATED identically in the Scala loop and the
   * SQL mirror, squares are non-negative so round's tie behavior
   * agrees across engines, and head/total are exact integer sums;
   * head_frac is ONE IEEE division (0.0 for a zero vector). Ragged
   * dims stay VISIBLE (per-vector `dims`); headDims past a vector's
   * length simply captures the whole vector (head == total).
   *
   * ONE stateless typed pass — zero shuffle, embarrassingly parallel,
   * STREAM-NATIVE in append mode (the gopherStats argument).
   */
  def embedEnergyStats(
      vectors: DataFrame, // (vec_id, embedding)
      headDims: Int): org.apache.spark.sql.Dataset[EnergyStats] = {
    require(headDims > 0,
      s"embedEnergyStats: headDims must be positive, got $headDims")
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, emb) =>
        var head = 0L; var tot = 0L; var i = 0
        while (i < emb.length) {
          val d = emb(i).toDouble
          val q = math.round(1e6 * d * d)
          if (i < headDims) head += q
          tot += q
          i += 1
        }
        EnergyStats(id, emb.length.toLong, head, tot,
          if (tot > 0) head.toDouble / tot else 0.0)
      })
  }
}
