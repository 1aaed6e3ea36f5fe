package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural invariants for the relational coverage queries, independent of
 * the DuckDB oracle gate (which checks exact values at sf0.01): each query
 * here must hold properties that survive any scale factor.
 */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("set_ops: intersect and except partition the BUILDING customers") {
    val rows = run("set_ops").collect()
    val byTag = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    val both = byTag.getOrElse("both", Set.empty)
    val only = byTag.getOrElse("building_only", Set.empty)
    assert((both & only).isEmpty, "intersect and except must be disjoint")
    val building = GraftSession.table(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert((both ++ only) == building, "tags must cover exactly the segment")
  }

  test("pivot_events: per-bucket pivot counts sum to the table count") {
    val rows = run("pivot_events").collect()
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    val expected = GraftSession.table(spark, sf, "events").count()
    assert(total == expected, s"pivot cells $total != events $expected")
  }

  test("range_join: one row per purchase; counts bounded by user clicks") {
    val ev = GraftSession.table(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase").count()
    val rows = run("range_join").collect()
    assert(rows.length == purchases)
    val clicksPerUser = ev.filter(col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val bound = clicksPerUser.getOrElse(r.getLong(1), 0L)
      assert(r.getLong(3) <= bound, s"windowed count exceeds user total: $r")
    }
  }

  test("topn_per_group: ranks are 1..3 and prices descend within a segment") {
    val rows = run("topn_per_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"$seg ranks")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-(_: Double)).toSeq,
        s"$seg prices must descend with rank")
    }
  }

  test("sliding_window: 2h windows hopping 1h double-count every event") {
    val n = run("sliding_window").agg(sum("n")).collect().head.getLong(0)
    val events = GraftSession.table(spark, sf, "events").count()
    assert(n == 2 * events, s"each event must land in exactly 2 windows: $n")
  }

  test("term_freq: counts descend and tokens are normalized") {
    val rows = run("term_freq").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-(_: Long)).toSeq)
    rows.foreach { case (t, _) =>
      assert(t == t.toLowerCase && !t.contains(" "), s"unnormalized token $t")
    }
  }

  test("pipeline_clean: survivors are unique, gated on quality, and dedup'd") {
    val rows = run("pipeline_clean").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "doc_ids unique")
    assert(rows.forall(_.getDouble(2) >= 0.5), "quality gate")
    val total = GraftSession.table(spark, sf, "documents").count()
    assert(ids.length < total, "some documents must be filtered")
    val nearDropped = graft.functions.Dedup
      .nearDupPairs(GraftSession.table(spark, sf, "documents"),
        "doc_id", "text", 0.7)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(ids.toSet.intersect(nearDropped).isEmpty, "near-dups removed")
  }

  test("embed_stats: extrema bracket and groups partition the vectors") {
    val rows = run("embed_stats").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L))
    val total = rows.map(_.getLong(1)).sum
    assert(total == GraftSession.table(spark, sf, "embeddings").count())
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "min_x0 <= max_x0")
      assert(r.getDouble(4) <= r.getDouble(5), "min_norm <= max_norm")
      assert(r.getDouble(4) > 0.0, "norms positive")
    }
  }

  test("chunk_dedup_cdc: one row per document, dup counts bounded by chunk counts") {
    val rows = run("chunk_dedup_cdc").collect()
    assert(rows.length == GraftSession.table(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_dup <= n_chunks")
      assert(r.getString(3).length == 32, "md5 fingerprint")
    }
  }

  test("chunk_dedup_indexed: batch docs only, dup counts bounded") {
    val rows = run("chunk_dedup_indexed").collect()
    val ids = rows.map(_.getLong(0))
    assert(ids.forall(_ % 2 == 0), "even (batch) docs only")
    assert(ids.length * 2 >= GraftSession.table(spark, sf, "documents").count() - 1)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), "n_dup <= n_chunks"))
  }

  test("indexed ANN screens: 5 queries, ranks 1..10, scores descend per query") {
    Seq("ann_ivf_topk_indexed", "pq_topk_indexed", "ivfpq_topk_indexed").foreach { q =>
      val rows = run(q).collect()
      val byQuery = rows.groupBy(_.getLong(0))
      assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L), s"$q query set")
      byQuery.foreach { case (_, rs) =>
        val ranked = rs.sortBy(_.getLong(3))
        assert(ranked.map(_.getLong(3)).toSeq == (1L to ranked.length).toSeq,
          s"$q ranks dense from 1")
        val scores = ranked.map(_.getDouble(2)).toSeq
        assert(scores == scores.sorted.reverse, s"$q scores descend")
      }
    }
  }

  test("split_leakage: rollup conserves the pair set; leaks flag off-diagonal") {
    val rows = run("split_leakage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // Every verified near-dup pair lands in exactly one split-pair cell.
    val nPairs = run("neardup_pairs").count()
    assert(rows.map(_._3).sum == nPairs,
      s"rollup lost pairs: ${rows.map(_._3).sum} != $nPairs")
    rows.foreach { case (lo, hi, n, leak) =>
      assert(lo <= hi, s"($lo,$hi) not canonically ordered")
      assert(leak == (lo != hi), s"($lo,$hi) leak flag wrong")
      assert(n > 0)
    }
    // The fixture's near-dups must actually cross a boundary somewhere —
    // otherwise this audit asserts nothing.
    assert(rows.exists(_._4), "no leak rows: fixture degenerate")
  }
}
