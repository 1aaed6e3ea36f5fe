package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The lineage-cut strategy contract (round 18, the cluster escape
 * hatch): `spark.graft.lineageCut.mode` selects how
 * [[GraftCaches.checkpointCut]] materializes —
 *  - `local` (default): eager localCheckpoint, two-node LogicalRDD plan
 *    (fastest; blocks not recomputable on executor loss);
 *  - `reliable`: eager reliable checkpoint to the context's checkpoint
 *    dir (executor-loss tolerant; refused loud without a dir);
 *  - `persist`: plain registered persist — full lineage kept, plan NOT
 *    cut.
 * All three return the same rows; the screen operators that call
 * checkpointCut (screenBatch, chunkDedupIndexed, chunkNovelty) are
 * mode-agnostic by construction, which the decision-parity test pins.
 */
class GraftCachesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def isLogicalRdd(ds: org.apache.spark.sql.DataFrame): Boolean =
    ds.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  private def withMode[A](mode: Option[String])(f: => A): A = {
    val key = "spark.graft.lineageCut.mode"
    val prev = spark.conf.getOption(key)
    mode.foreach(spark.conf.set(key, _))
    if (mode.isEmpty) spark.conf.unset(key)
    try f
    finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      GraftCaches.clearAll()
      spark.sharedState.cacheManager.clearCache()
    }
  }

  private def frame() = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"t$i")).toDF("id", "t")
      .groupBy("id").count()
  }

  test("default mode cuts lineage to a LogicalRDD and drain reclaims it") {
    withMode(None) {
      val before = GraftCaches.registered
      val cut = GraftCaches.checkpointCut(frame())
      assert(isLogicalRdd(cut), "local mode must return a LogicalRDD plan")
      assert(cut.count() === 100L)
      assert(GraftCaches.registered === before + 1)
      GraftCaches.clearAll()
      assert(GraftCaches.registered === 0)
    }
  }

  test("persist mode keeps lineage (plan not cut) with identical rows") {
    withMode(Some("persist")) {
      val cut = GraftCaches.checkpointCut(frame())
      assert(!isLogicalRdd(cut), "persist mode must keep the full plan")
      assert(cut.count() === 100L)
      // Registered like every other persist, so clearAll reclaims it.
      assert(GraftCaches.registered >= 1)
    }
  }

  test("reliable mode refuses without a checkpoint dir, cuts with one") {
    withMode(Some("reliable")) {
      intercept[IllegalArgumentException] {
        GraftCaches.checkpointCut(frame())
      }
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
      try {
        val cut = GraftCaches.checkpointCut(frame())
        assert(isLogicalRdd(cut), "reliable mode must return a LogicalRDD")
        assert(cut.count() === 100L)
      } finally {
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p)) {
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
    }
  }

  test("unknown mode is refused loud") {
    withMode(Some("bogus")) {
      intercept[IllegalArgumentException] {
        GraftCaches.checkpointCut(frame())
      }
    }
  }

  test("screenBatch decisions are identical across cut modes") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def decisions(): Seq[(Long, String)] = {
      val d = GraftSession.table(spark, dir, "documents")
      val idx = d.filter(col("doc_id") % 4 === 0)
      import spark.implicits._
      functions.Ingest.screenBatch(
        d.filter(col("doc_id") % 2 === 0),
        functions.Dedup.nearDupIndex(idx, "doc_id", "text"),
        functions.Dedup.chunkIndex(idx, "doc_id", "text"),
        "doc_id", "text", threshold = 0.7)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    }
    val local = withMode(None) { decisions() }
    val persisted = withMode(Some("persist")) { decisions() }
    assert(local === persisted,
      "cut strategy must not change screen decisions")
  }
}
