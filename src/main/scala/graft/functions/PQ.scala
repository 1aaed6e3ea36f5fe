package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the standard ANN memory compression at
 * 100 TB: the vector space factors into `m` subspaces, each with its own
 * small k-means codebook; a vector stores only its per-subspace centroid
 * ids (m * log2(k) bits — here 8 subspaces x 16 centroids = 32 bits per
 * 64-dim vector, a 64x cut vs float32). Queries score candidates by
 * asymmetric distance: the EXACT query subvectors against the candidate's
 * reconstructed centroids, so only the corpus side pays quantization
 * error.
 *
 * Training is deterministic end to end (hash-systematic sample + strided
 * init + fixed Lloyd iterations per subspace, no RNG), so codebooks
 * render as SQL literals and the whole encode + ADC-rank pipeline is
 * value-checkable in DuckDB — the same oracle move as the IVF centroids
 * and LSH planes. FP parity discipline: every sum is computed in a fixed
 * order (subspace-major, element order within a subspace) in BOTH
 * engines; per-subspace partials are accumulated in subspace order, never
 * flattened into one element loop (the grouping changes the rounding).
 */
object PQ {

  /** Per-subspace codebooks: [m][k][dim/m], trained on the shared
    * hash-systematic sample. */
  def trainCodebooks(
      vectors: DataFrame,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 10,
      sampleN: Int = 2048): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val sample = IVF.sampleVectors(vectors, sampleN)
    Array.tabulate(m) { j =>
      IVF.lloyd(sample.map(v => v.slice(j * sub, (j + 1) * sub)), k, iters)
    }
  }

  /** Codebooks as DuckDB `VALUES (j, c, [v...])` rows. */
  def codebooksSqlValues(cb: Array[Array[Array[Double]]]): String =
    cb.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (v, c) =>
        s"($j, $c, ${v.mkString("[", ", ", "]")})"
      }
    }.mkString(", ")

  private def l2sq(v: Array[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < c.length) { val x = v(off + d) - c(d); s += x * x; d += 1 }
    s
  }

  /** Encode each vector: per subspace, the nearest centroid id (argmin
    * L2, lowest id on ties). Output: (vec_id, j, code) exploded — the
    * scalar form the value-level oracle compares directly. */
  def encode(
      vectors: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebooks)
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.flatMap { case (id, e) =>
          val v = e.toArray.map(_.toDouble)
          (0 until m).map { j =>
            val book = cb(j)
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              val d = l2sq(v, j * sub, book(c))
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            (id, j.toLong, best.toLong)
          }
        }
      }.toDF("vec_id", "j", "code")
  }

  /**
   * PQ top-k by asymmetric distance, surfaced as a cosine-style score:
   * ip(q, recon(x)) / (|q| * |recon(x)|), rounded HALF_UP to 4 decimals
   * like the other similarity operators. The corpus is scanned once and
   * scored against the broadcast query set in primitive loops; only the
   * final per-query top-k window shuffles.
   */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // Query side is collected to the driver — small by contract. The limit
    // bounds what the collect can pull (CollectLimit, not a full fetch),
    // so an oversized query frame fails the require instead of OOMing,
    // without paying a separate guard job.
    val qRows = queries.select(col("vec_id").cast("long"), col("embedding"))
      .limit(Vectors.MaxQueryRows + 1)
      .as[(Long, Seq[Float])].collect()
    require(qRows.length <= Vectors.MaxQueryRows,
      s"pqTopK: query side exceeds the ${Vectors.MaxQueryRows}-row driver-collect " +
        "contract — split the query frame into batches")
    val qSide = qRows
      .sortBy(_._1)
      .map { case (id, e) =>
        val v = e.toArray.map(_.toDouble)
        var nsq = 0.0
        var d = 0
        while (d < v.length) { nsq += v(d) * v(d); d += 1 }
        (id, v, math.sqrt(nsq))
      }
    val bcQ = spark.sparkContext.broadcast(qSide)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val scored = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cb = bcCb.value
        val qs = bcQ.value
        // per-codebook-entry squared norms, j-major (tiny, computed once)
        val nsqs = cb.map(_.map { c =>
          var s = 0.0; var d = 0
          while (d < c.length) { s += c(d) * c(d); d += 1 }
          s
        })
        it.flatMap { case (candId, e) =>
          val v = e.toArray.map(_.toDouble)
          // encode the candidate
          val codes = new Array[Int](m)
          var j = 0
          while (j < m) {
            val book = cb(j)
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              val d = l2sq(v, j * sub, book(c))
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(j) = best
            j += 1
          }
          // |recon|^2: per-subspace partials summed in subspace order
          var rsq = 0.0
          j = 0
          while (j < m) { rsq += nsqs(j)(codes(j)); j += 1 }
          val rn = math.sqrt(rsq)
          qs.iterator.filter(_._1 != candId).map { case (qid, qv, qn) =>
            // ip: per-subspace dot (element order), summed in j order
            var ip = 0.0
            var j2 = 0
            while (j2 < m) {
              val cent = cb(j2)(codes(j2))
              var t = 0.0
              var d = 0
              while (d < sub) { t += qv(j2 * sub + d) * cent(d); d += 1 }
              ip += t
              j2 += 1
            }
            val raw = ip / (qn * rn)
            val score = java.math.BigDecimal.valueOf(raw)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            (qid, candId, score)
          }
        }
      }.toDF("query_id", "cand_id", "score")
    // Two-phase rank (ops.TopN): the ADC scan scores O(corpus) candidates
    // per query — a bare window would funnel them into one task per query.
    graft.ops.TopN.topKByQuery(scored, "query_id", "cand_id", "score", k)
  }

  /**
   * IVF-PQ — the production composite: the coarse quantizer prunes the
   * corpus to each query's `nprobe` nearest cells, PQ codes score the
   * survivors by asymmetric distance. One corpus scan computes cell +
   * codes; a candidate is scored only for queries probing its cell, so
   * compute per query drops from O(n) to O(n * nprobe / nlist) and
   * per-vector memory is the 32-bit code — the standard recall/latency/
   * memory dial at 100 TB (FAISS's IVFADC layout, re-expressed as a
   * Spark scan). Deterministic (both trainings are), so fully
   * SQL-replayable. Output: (query_id, cand_id, score, rank).
   */
  def ivfpqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      nprobe: Int = 0): DataFrame = { // 0 = auto: ~3/8 of cells (IVF.autoNprobe)
    val np = if (nprobe > 0) nprobe else IVF.autoNprobe(centroids.length)
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // Same limit-bounded driver-collect contract as pqTopK.
    val qRows = queries.select(col("vec_id").cast("long"), col("embedding"))
      .limit(Vectors.MaxQueryRows + 1)
      .as[(Long, Seq[Float])].collect()
    require(qRows.length <= Vectors.MaxQueryRows,
      s"ivfpqTopK: query side exceeds the ${Vectors.MaxQueryRows}-row driver-collect " +
        "contract — split the query frame into batches")
    val qSide = qRows
      .sortBy(_._1)
      .map { case (id, e) =>
        val v = e.toArray.map(_.toDouble)
        var nsq = 0.0
        var d = 0
        while (d < v.length) { nsq += v(d) * v(d); d += 1 }
        (id, v, math.sqrt(nsq), IVF.nearestK(v, centroids, np).toSet)
      }
    val bcQ = spark.sparkContext.broadcast(qSide)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val scored = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cb = bcCb.value
        val cents = bcCent.value
        val qs = bcQ.value
        val nsqs = cb.map(_.map { c =>
          var s = 0.0; var d = 0
          while (d < c.length) { s += c(d) * c(d); d += 1 }
          s
        })
        it.flatMap { case (candId, e) =>
          val v = e.toArray.map(_.toDouble)
          val cell = IVF.nearest(v, cents)
          val codes = new Array[Int](m)
          var j = 0
          while (j < m) {
            val book = cb(j)
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              val d = l2sq(v, j * sub, book(c))
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(j) = best
            j += 1
          }
          var rsq = 0.0
          j = 0
          while (j < m) { rsq += nsqs(j)(codes(j)); j += 1 }
          val rn = math.sqrt(rsq)
          qs.iterator
            .filter(q => q._1 != candId && q._4.contains(cell))
            .map { case (qid, qv, qn, _) =>
              var ip = 0.0
              var j2 = 0
              while (j2 < m) {
                val cent = cb(j2)(codes(j2))
                var t = 0.0
                var d = 0
                while (d < sub) { t += qv(j2 * sub + d) * cent(d); d += 1 }
                ip += t
                j2 += 1
              }
              val raw = ip / (qn * rn)
              val score = java.math.BigDecimal.valueOf(raw)
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
              (qid, candId, score)
            }
        }
      }.toDF("query_id", "cand_id", "score")
    // Two-phase rank (ops.TopN): the ADC scan scores O(corpus) candidates
    // per query — a bare window would funnel them into one task per query.
    graft.ops.TopN.topKByQuery(scored, "query_id", "cand_id", "score", k)
  }
}
