package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Hybrid retrieval fusion ([[Hybrid]]): exact integer RRF arithmetic vs
  * a naive driver mirror, candidate-set structure, recall floors against
  * each single ranker, and loud contracts. */
class HybridSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val queries = Seq(
    (1L, Seq("spark", "window", "vector")),
    (2L, Seq("customer", "merge")),
    (3L, Seq("merge", "window", "zzzunseen")))

  test("rrfFuse: exact micro arithmetic and ranking vs a naive mirror") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L), (2L, 21L, 1L), (2L, 20L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq(a, b), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def c(rank: Long) = 1000000L / (60L + rank)
    // Query 1: 11 in both (c1 + c2 = 16393 + 16129 = 32522) wins; then
    // 10 (c1 = 16393); then 13 (c2 = 16129) beats 12 (c3 = 15873).
    assert(got((1L, 11L)) == ((c(1) + c(2), 2L, 1L)), s"${got((1L, 11L))}")
    assert(got((1L, 10L)) == ((c(1), 1L, 2L)))
    assert(got((1L, 13L)) == ((c(2), 1L, 3L)))
    assert(!got.contains((1L, 12L)), "rank 4 must be cut at k = 3")
    // Query 2: both docs in both rankers at swapped ranks — identical
    // fused score, tie broken by doc_id.
    assert(got((2L, 20L)) == ((c(1) + c(2), 2L, 1L)))
    assert(got((2L, 21L)) == ((c(1) + c(2), 2L, 2L)))
    intercept[IllegalArgumentException] { Hybrid.rrfFuse(Seq(a), 3) }
    intercept[IllegalArgumentException] { Hybrid.rrfFuse(Seq(a, b), 0) }
  }

  test("hybridTopKIndexed: the stored-artifact form is value-identical to the live one") {
    val docs = GraftSession.table(spark, sf, "documents")
    val emb = GraftSession.table(spark, sf, "embeddings")
    val qdf = queries.toDF("query_id", "terms")
    val live = Hybrid.hybridTopK(docs, "doc_id", "text", emb, qdf).collect()
      .map(_.toSeq).toSet
    val model = TextFunctions.bm25BatchTrain(docs, "doc_id", "text", qdf)
    val idx = IVF.buildIvfIndex(emb)
    val stored = Hybrid.hybridTopKIndexed(docs, "doc_id", "text", model,
      idx, qdf).collect().map(_.toSeq).toSet
    assert(stored == live,
      "stored-artifact fusion diverged from the live rankers")
  }

  test("hybridTopK: fused list mirrors driver-side RRF over the two rankers; recall floors hold") {
    val docs = GraftSession.table(spark, sf, "documents")
    val emb = GraftSession.table(spark, sf, "embeddings")
    val qdf = queries.toDF("query_id", "terms")
    val kPer = 20
    val lex = TextFunctions.bm25TopKBatch(docs, "doc_id", "text", qdf, k = kPer)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vec = IVF.ivfTopK(
        emb.filter(col("vec_id").isin(queries.map(_._1): _*)), emb, k = kPer)
      .select(col("query_id"), col("cand_id"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Naive mirror: integer contributions, sum per (query, doc), sort.
    val mirror = (lex ++ vec)
      .groupBy(t => (t._1, t._2))
      .map { case ((q, d), rows) =>
        (q, d, rows.map(t => 1000000L / (60L + t._3)).sum, rows.size.toLong)
      }.toSeq
      .groupBy(_._1)
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex
          .map { case ((_, d, s, n), i) => (q, d) -> ((s, n, i + 1L)) }
      }
    val got = Hybrid.hybridTopK(docs, "doc_id", "text", emb, qdf,
        k = 10, kPer = kPer)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == mirror, s"fused list diverges from the driver mirror")
    // Recall floors vs each single ranker: the fused top-10 must keep a
    // real share of BOTH rankers' top-10 (RRF's point is that neither
    // modality is drowned out by the other).
    queries.map(_._1).foreach { q =>
      val fusedDocs = got.keys.filter(_._1 == q).map(_._2).toSet
      val lexTop = lex.filter(t => t._1 == q && t._3 <= 10).map(_._2).toSet
      val vecTop = vec.filter(t => t._1 == q && t._3 <= 10).map(_._2).toSet
      assert((fusedDocs & lexTop).size >= 3,
        s"query $q: lexical recall floor broken (${(fusedDocs & lexTop).size})")
      assert((fusedDocs & vecTop).size >= 3,
        s"query $q: vector recall floor broken (${(fusedDocs & vecTop).size})")
      // Candidate-set structure: fused docs come from the rankers only.
      val lexAll = lex.filter(_._1 == q).map(_._2).toSet
      val vecAll = vec.filter(_._1 == q).map(_._2).toSet
      assert(fusedDocs.subsetOf(lexAll ++ vecAll),
        s"query $q: a fused doc came from neither ranker")
    }
  }
}
