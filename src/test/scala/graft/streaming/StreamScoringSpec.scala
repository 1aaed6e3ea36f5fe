package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * Stream-native scoring against the persisted model family: the stored
 * outlier yardstick ([[graft.functions.IVF.OutlierModel]]) is a FIXED
 * boundary, so scoring is a stateless enrich — typed assignment pass +
 * two stream-static broadcast joins — and runs unchanged on a streaming
 * frame in append mode (the `chunkScreenStream` posture: no state store,
 * no watermark, per-record decisions).
 *
 * The NB scorer is deliberately NOT given a streaming twin: its argmax
 * is a window over per-(doc, label) streaming aggregates — batch-only
 * shapes; score micro-batches via the batch path in foreachBatch
 * instead.
 */
class StreamScoringSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val ids = new AtomicInteger(0)

  private def runStream[I: Encoder, O: Encoder](batches: Seq[Seq[I]])(
      f: Dataset[I] => Dataset[O]): Seq[Seq[O]] = {
    implicit val sq = spark.sqlContext
    val qn = s"score${ids.incrementAndGet()}"
    val ms = MemoryStream[I]
    val q = f(ms.toDS()).writeStream
      .format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graftck").toString)
      .start()
    try {
      var seen = 0L
      batches.map { b =>
        if (b.nonEmpty) ms.addData(b)
        q.processAllAvailable()
        val all = spark.table(qn).as[O].collect().toSeq
        val fresh = all.drop(seen.toInt)
        seen = all.size
        fresh
      }
    } finally q.stop()
  }

  test("embedOutliersScore runs stream-native and matches the batch path per record") {
    import graft.functions.IVF
    // Yardstick from 20 identical vectors: p90 distance 0, so the
    // training vector passes and any deviation flags (deterministic).
    val v0 = Seq.tabulate(8)(d => math.sin(9 + d).toFloat)
    val far = Seq.fill(8)(9.0f)
    val dir = java.nio.file.Files.createTempDirectory("om-stream-")
      .toString + "/om"
    IVF.embedOutliersTrain(
        (0 until 20).map(i => (100L + i, v0)).toDF("vec_id", "embedding"),
        nlist = 1)
      .write(dir)
    val model = IVF.OutlierModel.read(spark, dir)
    val batches = Seq(
      Seq((1L, v0), (2L, far)),
      Seq.empty[(Long, Seq[Float])],
      Seq((3L, v0)))
    val got = runStream[(Long, Seq[Float]), (Long, Long, Long, Boolean)](
        batches) { ds =>
      IVF.embedOutliersScore(model, ds.toDF("vec_id", "embedding"))
        .as[(Long, Long, Long, Boolean)]
    }
    // Per-micro-batch decisions, append mode: each record scored exactly
    // once, in its batch, against the fixed stored boundary.
    assert(got(0).map(r => r._1 -> r._4).toMap == Map(1L -> false, 2L -> true),
      s"batch 1: ${got(0)}")
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    assert(got(2).map(r => r._1 -> r._4).toMap == Map(3L -> false),
      s"batch 3: ${got(2)}")
    // Value parity with the batch path, not just flag parity.
    val batch = IVF.embedOutliersScore(model,
        Seq((1L, v0), (2L, far), (3L, v0)).toDF("vec_id", "embedding"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch scoring diverged")
    graft.GraftCaches.clearAll()
  }

  test("fimSplit runs stream-native and matches the batch path per record") {
    import graft.ops.FimTransform
    val docs = Seq(
      (1L, "The Quick   Brown fox jumps"),
      (2L, "over the lazy dog tonight and then some more words here"),
      (3L, "a"),
      (4L, "short text"))
    val batches = Seq(docs.take(2), Seq.empty[(Long, String)], docs.drop(2))
    val got = runStream[(Long, String), (Long, Boolean, Long, Long, Long, String)](
        batches) { ds =>
      FimTransform.fimSplit(ds.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Boolean, Long, Long, Long, String)]
    }
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    val batch = FimTransform.fimSplit(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Boolean, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch FIM diverged")
  }

  test("bm25ScoreAll runs stream-native and matches the batch path per record") {
    import graft.functions.TextFunctions
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq(
      (100L, s"spark $filler"), (101L, s"merge merge $filler"),
      (102L, s"spark merge $filler"), (103L, filler))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25-stream-")
      .toString + "/bm25"
    TextFunctions.bm25Train(ref, "doc_id", "text", Seq("spark", "merge"))
      .write(dir)
    val model = TextFunctions.Bm25Model.read(spark, dir)
    // Scoring is ONE stateless typed pass (the bounded idf table rides
    // the closure), so the same call runs on a streaming frame in
    // append mode — per-record scores against the FIXED stored model,
    // no watermark, no state store.
    val batches = Seq(
      Seq((1L, s"spark spark $filler"), (2L, filler)),
      Seq.empty[(Long, String)],
      Seq((3L, s"merge $filler")))
    val got = runStream[(Long, String), (Long, Long, Long)](batches) { ds =>
      TextFunctions.bm25ScoreAll(model, ds.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Long)]
    }
    assert(got(0).map(_._1).toSet == Set(1L),
      s"doc 2 has no query terms and must not score: ${got(0)}")
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    assert(got(2).map(_._1).toSet == Set(3L))
    val batch = TextFunctions.bm25ScoreAll(model,
        Seq((1L, s"spark spark $filler"), (2L, filler),
          (3L, s"merge $filler")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch BM25 scoring diverged")
    graft.GraftCaches.clearAll()
  }

  test("bm25ScoreAllBatch runs stream-native and matches the batch path per record") {
    import graft.functions.TextFunctions
    // The multi-query routing/tagging shape: every arriving doc scored
    // against a FIXED stored query set per record — one stateless typed
    // pass (union idf + per-query term arrays in the closure), so the
    // same call runs in append mode with no state store.
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq(
      (100L, s"spark $filler"), (101L, s"merge merge $filler"),
      (102L, s"spark merge $filler"), (103L, filler))
      .toDF("doc_id", "text")
    val queries = Seq((10L, Seq("spark")), (11L, Seq("merge")))
      .toDF("query_id", "terms")
    val dir = java.nio.file.Files.createTempDirectory("bm25b-stream-")
      .toString + "/m"
    TextFunctions.bm25BatchTrain(ref, "doc_id", "text", queries).write(dir)
    val model = TextFunctions.Bm25BatchModel.read(spark, dir)
    val batches = Seq(
      Seq((1L, s"spark spark $filler"), (2L, filler)),
      Seq.empty[(Long, String)],
      Seq((3L, s"spark merge $filler")))
    val got = runStream[(Long, String), (Long, Long, Long, Long)](batches) { ds =>
      TextFunctions.bm25ScoreAllBatch(model, ds.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Long, Long)]
    }
    assert(got(0).map(r => (r._1, r._2)).toSet == Set((10L, 1L)),
      s"doc 1 matches only the spark query: ${got(0)}")
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    assert(got(2).map(r => (r._1, r._2)).toSet == Set((10L, 3L), (11L, 3L)),
      s"doc 3 routes to BOTH queries: ${got(2)}")
    val batch = TextFunctions.bm25ScoreAllBatch(model,
        Seq((1L, s"spark spark $filler"), (2L, filler),
          (3L, s"spark merge $filler")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.flatten.sortBy(r => (r._1, r._2)).toSeq == batch.toSeq,
      "stream and batch multi-query scoring diverged")
    graft.GraftCaches.clearAll()
  }

  test("gopherStats runs stream-native and matches the batch path per record") {
    import graft.functions.TextFunctions
    // The structural-quality rules are a pure per-doc function (one
    // typed pass, no corpus state at all), so the SAME operator body is
    // the streaming quality screen — what a stream-side ingest gate
    // would compute per record before foreachBatch runs the full loop.
    val clean = (1 to 60).map(i => Seq("the", "river", "of", "ancient",
      "stories")(i % 5)).mkString(" ")
    val batches = Seq(
      Seq((1L, clean), (2L, "too short ###")),
      Seq((3L, clean)))
    val got = runStream[(Long, String),
        (Long, Long, Double, Double, Double, Double, Double, Long, Boolean)](
        batches) { ds =>
      TextFunctions.gopherStats(ds.toDF("doc_id", "text"), "doc_id", "text")
        .map(s => (s.doc_id, s.n_tokens, s.mean_word_len, s.symbol_ratio,
          s.bullet_frac, s.ellipsis_frac, s.alpha_frac, s.n_stop_hits,
          s.passes))
    }
    assert(got(0).map(r => r._1 -> r._9).toMap ==
      Map(1L -> true, 2L -> false), s"batch 1: ${got(0)}")
    assert(got(1).map(r => r._1 -> r._9).toMap == Map(3L -> true))
    val batch = TextFunctions.gopherStats(
        (batches.flatten).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(s => (s.doc_id, s.n_tokens, s.mean_word_len,
        s.symbol_ratio, s.bullet_frac, s.ellipsis_frac, s.alpha_frac,
        s.n_stop_hits, s.passes)).sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch gopher stats diverged")
    graft.GraftCaches.clearAll()
  }

  test("importanceSample runs stream-native and matches the batch path per record") {
    import graft.ops.CorpusMix
    // The draw is a pure per-row function of (id, score) — no corpus
    // state, no aggregation — so the SAME operator body IS the streaming
    // quality downsampler (the stochastic-filter stage run per record
    // as documents arrive).
    val batches = Seq(
      Seq((1L, 10L), (2L, 255L), (3L, 0L)),
      Seq.empty[(Long, Long)],
      Seq((4L, 300L), (5L, 97L)))
    val got = runStream[(Long, Long), (Long, Long, Boolean)](batches) { ds =>
      CorpusMix.importanceSample(ds.toDF("doc_id", "score"),
          "doc_id", "score", maxScore = 256L)
        .as[(Long, Long, Boolean)]
    }
    assert(got(0).map(_._1).toSet == Set(1L, 2L, 3L),
      "append mode: each record decided in its own micro-batch")
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    assert(got.flatten.find(_._1 == 3L).get._3 == false,
      "zero score never kept, streaming too")
    assert(got.flatten.find(_._1 == 4L).get._3 == true,
      "score past maxScore always kept, streaming too")
    val batch = CorpusMix.importanceSample(
        batches.flatten.toDF("doc_id", "score"), "doc_id", "score", 256L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch draws diverged")
    graft.GraftCaches.clearAll()
  }

  test("splitAssign runs stream-native and matches the batch path per record") {
    import graft.ops.CorpusMix
    // The split is a pure per-row function of the draw key — the same
    // operator body tags records as they arrive (what ingestSink's
    // splitTag does per micro-batch), and a record's split can never
    // depend on which batch carried it.
    val splits = Seq(("train", 8L), ("val", 1L), ("test", 1L))
    val batches = Seq(
      Seq((1L, "domA"), (2L, "domA"), (3L, "domB")),
      Seq.empty[(Long, String)],
      Seq((4L, "domB"), (5L, "domC")))
    val got = runStream[(Long, String), (Long, String, String)](batches) { ds =>
      CorpusMix.splitAssign(ds.toDF("doc_id", "source"), "doc_id",
          splits, byCol = "source")
        .as[(Long, String, String)]
    }
    assert(got(0).map(_._1).toSet == Set(1L, 2L, 3L),
      "append mode: each record tagged in its own micro-batch")
    assert(got(1).isEmpty, "empty micro-batch must emit nothing")
    // Grouped draw: domA/domB members share splits ACROSS micro-batches
    // (3 and 4 arrived in different batches).
    val bySrc = got.flatten.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(bySrc.values.forall(_.size == 1),
      s"a domain straddled splits across batches: ${bySrc.toMap}")
    val batch = CorpusMix.splitAssign(
        batches.flatten.toDF("doc_id", "source"), "doc_id", splits,
        byCol = "source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch splits diverged")
    graft.GraftCaches.clearAll()
  }

  test("embedEnergyStats runs stream-native and matches the batch path per record") {
    import graft.functions.Vectors
    // A pure per-vector function — the same operator body audits
    // embeddings as they arrive (e.g. ahead of a truncated-index
    // ingestSink).
    val batches = Seq(
      Seq((1L, Seq(2.0f, 0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f, 1.0f))),
      Seq((3L, Seq(0.0f, 0.0f, 0.0f))))
    val got = runStream[(Long, Seq[Float]), (Long, Long, Long, Long, Double)](
        batches) { ds =>
      Vectors.embedEnergyStats(ds.toDF("vec_id", "embedding"), headDims = 1)
        .map(s => (s.vec_id, s.dims, s.head_micro, s.total_micro,
          s.head_frac))
    }
    assert(got(0).map(_._1).toSet == Set(1L, 2L) && got(1).map(_._1) == Seq(3L))
    val batch = Vectors.embedEnergyStats(
        batches.flatten.toDF("vec_id", "embedding"), headDims = 1)
      .collect().map(s => (s.vec_id, s.dims, s.head_micro, s.total_micro,
        s.head_frac)).sortBy(_._1)
    assert(got.flatten.sortBy(_._1).toSeq == batch.toSeq,
      "stream and batch energies diverged")
    graft.GraftCaches.clearAll()
  }
}
