package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Quality checks for the approximate operators that have no SQL oracle:
 * MinHash-LSH recall vs exhaustive Jaccard, SimHash hamming-vs-jaccard
 * correlation, hyperplane-LSH ANN recall vs brute force.
 */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Exhaustive jaccard pairs >= threshold, computed independently in Scala. */
  private def bruteJaccard(threshold: Double): Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id"),
        TextFunctions.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().map { case (id, s) => (id, s.toSet) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      j = if ((sa ++ sb).isEmpty) 0.0 else (sa & sb).size.toDouble / (sa ++ sb).size
      if j >= threshold
    } yield (ia, ib)).toSet
  }

  test("minhash LSH near-dup pairs: 100% recall and precision vs exhaustive at 0.7") {
    val got = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = bruteJaccard(0.7)
    assert(want.nonEmpty, "test data should contain near-dups")
    assert(got == want)
  }

  test("simhash: near-dup pairs have much smaller hamming distance than random pairs") {
    val sim = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupPairs = bruteJaccard(0.7).toSeq
    val dupAvg = dupPairs.map { case (a, b) => hamming(sim(a), sim(b)) }.sum.toDouble / dupPairs.size
    val ids = sim.keys.toSeq.sorted.take(60)
    val randPairs = for { a <- ids; b <- ids if a < b && !dupPairs.contains((a, b)) } yield (a, b)
    val randAvg = randPairs.map { case (a, b) => hamming(sim(a), sim(b)) }.sum.toDouble / randPairs.size
    assert(dupAvg < 8.0, s"near-dup avg hamming $dupAvg should be small")
    assert(randAvg > 20.0, s"random avg hamming $randAvg should be large")
  }

  test("LSH ANN: multi-table recall@10 vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Vectors.bruteForceTopK(queries, emb, 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val approx = Vectors.lshTopK(queries, emb, dim = 64, k = 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = brute.map { case (q, pairs) =>
      val b = pairs.map(_._2).toSet
      val a = approx.getOrElse(q, Array.empty).map(_._2).toSet
      (b & a).size.toDouble / b.size
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall > 0.4, s"avg recall $avgRecall too low — bucketing broken?")
    val bucketSizes = emb.select(Vectors.lshBucket(col("embedding"), 64, 4).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect()
    assert(bucketSizes.length == 16, "4-plane table should spread into 16 buckets")
  }

  test("native DotProduct is bit-identical to the zip_with+aggregate formulation") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
      .select(
        Vectors.dot(col("a.embedding"), col("b.embedding")).as("native"),
        Vectors.dotBuiltin(col("a.embedding"), col("b.embedding")).as("builtin"))
    assert(pairs.filter(col("native") =!= col("builtin")).count() == 0)
    // null input -> null, not a crash
    val withNull = emb.limit(1).select(
      Vectors.dot(lit(null).cast("array<float>"), col("embedding")).as("d"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("native SortedIntersectCount matches array_intersect on sorted distinct arrays") {
    graft.expressions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(100)).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(100)).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .select(
        call_function("graft_sorted_intersect", col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    // Empty and null inputs behave like the builtin (0 / null).
    val edge = Seq((Array.empty[Int], Array(1, 2))).toDF("a", "b")
      .select(call_function("graft_sorted_intersect", col("a"), col("b")).as("n"),
        call_function("graft_sorted_intersect",
          lit(null).cast("array<int>"), col("b")).as("nn"))
      .collect().head
    assert(edge.getLong(0) == 0L && edge.isNullAt(1))
  }

  test("multimodal: frames partition the payload losslessly; features are 8-dim") {
    import graft.multimodal.Multimodal
    val media = Multimodal.asMediaRecords(docs)
    val frames = Multimodal.sampleFrames(media, 4).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx))
    val original = media.filter(col("meta.modality") === "video")
      .select("doc_id", "content").as[(Long, Array[Byte])].collect().toMap
    assert(frames.nonEmpty)
    frames.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
      assert(fs.flatMap(_.frame_bytes).toSeq == original(id).toSeq, s"doc $id frames != payload")
    }
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(_.feature.length == 8))
  }

  test("range search: exact form equals an in-driver exhaustive threshold scan") {
    val minCos = 0.2
    val got = Vectors.rangeSearch(emb.filter(col("vec_id") < 5), emb, minCos)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (for {
      (qid, qv) <- vecs.filter(_._1 < 5); (cid, cv) <- vecs if cid != qid
      c = cos(qv, cv) if c >= minCos
    } yield (qid, cid, c)).toSet
    assert(want.nonEmpty, "threshold should capture some pairs")
    assert(got == want)
  }

  test("range search: full-probe indexed form equals the exact form; auto-probe is a subset") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Vectors.rangeSearch(queries, emb, 0.2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val idx = IVF.buildIvfIndex(emb, nlist = 16)
    val full = IVF.rangeSearchIndexed(queries, idx, 0.2, nprobe = 16)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(full == exact, "probing every cell must recover the exact result")
    val auto = IVF.rangeSearchIndexed(queries, idx, 0.2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(exact), "probed subset must never invent pairs")
    assert(auto.size.toDouble / exact.size > 0.5,
      s"auto-probe recall ${auto.size}/${exact.size} too low")
  }

  test("IVF ANN: recall@10 beats blind chance and buckets are balanced") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Vectors.bruteForceTopK(queries, emb, 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val approx = IVF.ivfTopK(queries, emb, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = brute.map { case (q, pairs) =>
      val b = pairs.map(_._2).toSet
      val a = approx.getOrElse(q, Array.empty).map(_._2).toSet
      (b & a).size.toDouble / b.size
    }
    val avgRecall = recalls.sum / recalls.size
    // nprobe/nlist = 1/4 of the corpus scanned; near neighbors concentrate
    // in probed cells so recall must clearly exceed the 25% scan fraction
    assert(avgRecall > 0.4, s"avg recall $avgRecall too low")
  }

  test("MaxNlist: explicit nlist past the ceiling fails loud at trainCentroids entry") {
    // The centroid table is collected to the driver and broadcast on
    // every train/search path; the auto path caps itself, but an
    // explicit caller nlist must hit the loud contract BEFORE any job
    // (a multi-GB "bounded collect" is the silent alternative).
    val e = intercept[IllegalArgumentException](
      IVF.trainCentroids(emb, IVF.MaxNlist + 1))
    assert(e.getMessage.contains("MaxNlist") &&
      e.getMessage.contains("sharded k-means"))
  }

  test("nearDupClusters: chained near-dups land in one cluster (transitivity)") {
    // a~b and b~c near-dup, a!~c directly: all three must share a cluster
    val docs3 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // ~1 (7/9 shingle-ish)
      (3L, "beta gamma delta epsilon zeta eta iota kappa"), // ~2, farther from 1
      (10L, "completely different text about something else entirely here")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs3, "doc_id", "text", threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.nearDupPairs(docs3, "doc_id", "text", threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"fixture must chain: $pairs")
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L,
      s"chain collapses to min id: $clusters")
    assert(clusters(10L) == 10L, "singleton keeps its own id")
  }

  test("clusterEdges: star rounds collapse a long chain in O(log n) rounds") {
    // A 512-node chain has graph diameter 511 — label propagation needs
    // 511 rounds; large-star/small-star must finish well under maxIters.
    val n = 512L
    val ids = spark.range(n).toDF("id")
    val chain = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    // smallGraphEdges = 0 forces the distributed star rounds — the point
    // of this test (the driver fast path would swallow a 511-edge chain).
    val labels = Dedup.clusterEdges(ids, chain, maxIters = 20, smallGraphEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "every chain node joins cluster 0")
  }

  test("winnowing: shared substring >= w+k-1 chars yields a shared fingerprint") {
    // k=8, w=16: guarantee threshold is 23 chars. The two docs share a
    // 40-char run embedded in otherwise unrelated text.
    val shared = "the quick brown fox jumps over lazy dogs"
    val d = Seq(
      (1L, s"completely unrelated preamble text $shared and some trailing words"),
      (2L, s"$shared different ending material follows here entirely"),
      (3L, "no overlap with anything else in this corpus at all whatsoever"),
      (4L, "tiny") // shorter than k: must emit nothing
    ).toDF("doc_id", "text")
    val fps = TextFunctions.winnowFingerprints(d, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared substring must fingerprint")
    assert((byDoc(1L) & byDoc.getOrElse(3L, Set.empty)).isEmpty ||
      (byDoc(1L) & byDoc(3L)).size < (byDoc(1L) & byDoc(2L)).size,
      "unrelated doc shares fewer fingerprints than the true overlap")
    assert(!byDoc.contains(4L), "doc shorter than k emits no fingerprints")
  }

  test("winnowing: deque selection equals the naive rightmost-min rescan") {
    // The O(len) monotonic-deque window selection must pick EXACTLY the
    // positions the textbook O(len*w) rescan picks (rightmost minimum
    // per window, duplicates collapsed) — seeded random strings over a
    // small alphabet to force hash ties and long equal runs.
    val k = 8
    val w = 16
    val rnd = new scala.util.Random(7)
    val texts = (0 until 40).map { i =>
      val len = rnd.nextInt(120) // includes < k and == k edges
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString)
    }
    def naive(text: String): Seq[(Long, Long)] = {
      val norm = TextFunctions.normalizeScala(text)
      val cps = norm.codePoints().toArray
      val m = cps.length - k + 1
      if (m <= 0) return Seq.empty
      val pw0 = TextFunctions.winnowPows(k)(0)
      val hs = new Array[Long](m)
      var h = 0L
      var i = 0
      while (i < k) {
        h = (h * TextFunctions.WinnowBase + cps(i)) % TextFunctions.WinnowMod
        i += 1
      }
      hs(0) = h
      i = 1
      while (i < m) {
        var t = (h - cps(i - 1) * pw0 % TextFunctions.WinnowMod) %
          TextFunctions.WinnowMod
        if (t < 0) t += TextFunctions.WinnowMod
        h = (t * TextFunctions.WinnowBase + cps(i + k - 1)) %
          TextFunctions.WinnowMod
        hs(i) = h
        i += 1
      }
      val selected = scala.collection.mutable.LinkedHashSet.empty[Int]
      val nWin = math.max(1, m - w + 1)
      var s = 0
      while (s < nWin) {
        val end = math.min(s + w, m)
        var best = s
        var j = s + 1
        while (j < end) { if (hs(j) <= hs(best)) best = j; j += 1 }
        selected += best
        s += 1
      }
      selected.iterator.map(p => ((p + 1).toLong, hs(p))).toSeq
    }
    val got = TextFunctions.winnowFingerprints(
        texts.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq.sorted)
      .toMap
    texts.foreach { case (id, text) =>
      val want = naive(text).sorted
      assert(got.getOrElse(id, Seq.empty) == want,
        s"doc $id: deque selection diverged from the naive rescan")
    }
  }

  test("clusterEdges matches a reference union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val n = 60
      val edges = Seq.fill(50 + round * 10) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // reference: union-find, then min id per root class
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map { i =>
        i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong
      }.toMap
      // BOTH paths must match the reference AND each other: the driver
      // union-find fast path (default threshold) and the distributed
      // star rounds (forced by smallGraphEdges = 0).
      val gotSmall = Dedup.clusterEdges(
        spark.range(n).toDF("id"), edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      val gotStars = Dedup.clusterEdges(
        spark.range(n).toDF("id"), edges.toDF("u", "v"), smallGraphEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(gotSmall == want, s"round $round small-graph path mismatch")
      assert(gotStars == want, s"round $round star-rounds path mismatch")
    }
  }

  test("clusterEdges: disjoint components keep distinct min labels") {
    val ids = Seq(1L, 2L, 3L, 7L, 8L, 9L, 42L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L)).toDF("u", "v")
    val labels = Dedup.clusterEdges(ids, edges).as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 42L -> 42L))
  }

  test("quantize8/dequantize8 roundtrip: error within scale/2, cosine preserved") {
    val q = Vectors.quantize8(emb)
    val dq = Vectors.dequantize8(q)
      .select(col("vec_id"), col("embedding").as("recon"))
    val joined = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .join(dq, "vec_id")
      .join(q.select(col("vec_id"), col("scale")), "vec_id")
    val rows = joined.select(
        aggregate(
          zip_with(col("embedding"), col("recon"),
            (x, r) => abs(x.cast("double") - r)),
          lit(0.0), (a, e) => greatest(a, e)).as("max_err"),
        col("scale"),
        (Vectors.dot(col("embedding").cast("array<double>"), col("recon")) /
          (Vectors.norm(col("embedding")) * Vectors.norm(col("recon")))).as("cos"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (err, scale, cos) =>
      assert(err <= scale / 2 + 1e-12, s"max err $err > scale/2 ${scale / 2}")
      assert(cos > 0.999, s"int8 quantization must preserve direction: cos=$cos")
    }
  }

  test("approx_count_distinct satisfies the 10% error-bound invariant") {
    val rows = graft.SparkEntry.queries("approx_distinct")(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, ok) =>
      assert(exact > 0, s"$t: exact=$exact")
      assert(ok, s"$t: approx outside 10% of $exact")
    }
  }

  test("typed docStats mirrors the Column functions bit-for-bit") {
    import TextFunctions._
    val typed = docStats(docs, "doc_id", "text").collect()
      .map(d => d.doc_id -> d).toMap
    val cols = docs.select(
      col("doc_id"),
      tokenCount(col("text")).cast("long"),
      subwordCount(col("text")).cast("long"),
      punctRatio(col("text")),
      stopwordRatio(col("text")),
      qualityScore(col("text")),
      langId(col("text")),
      fingerprint(col("text")))
      .as[(Long, Long, Long, Double, Double, Double, String, String)].collect()
    cols.foreach { case (id, nt, ns, pr, sr, q, lang, fp) =>
      val d = typed(id)
      assert((d.n_tokens, d.n_subwords, d.punct_raw, d.stop_raw, d.quality, d.lang_pred, d.fingerprint) ==
        ((nt, ns, pr, sr, q, lang, fp)), s"doc $id")
    }
  }

  test("shinglesOf mirrors the Column shingles exactly") {
    val colVersion = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val scalaVersion = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> TextFunctions.shinglesOf(t) }.toMap
    assert(colVersion == scalaVersion)
  }

  test("asOfJoin: strict backward semantics on a hand-built series") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "c1"), (1L, 150L, "c2"), (2L, 60L, "c3"))
      .toDF("k", "rts", "rtag")
    val strict = graft.ops.AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", strict = true)
      .select("tag", "rtag").as[(String, Option[String])].collect().toMap
    // p1@100: strict -> c1@100 NOT eligible; p2@200 -> c2@150; p3@50 -> none
    assert(strict == Map("p1" -> None, "p2" -> Some("c2"), "p3" -> None))
    val loose = graft.ops.AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", strict = false)
      .select("tag", "rtag").as[(String, Option[String])].collect().toMap
    assert(loose == Map("p1" -> Some("c1"), "p2" -> Some("c2"), "p3" -> None))
  }

  test("ANN query-side guard: oversized query frame is refused loudly, not OOMed") {
    // 65537 tiny query rows: one over the MaxQueryRows broadcast contract.
    val big = spark.range(Vectors.MaxQueryRows + 1L)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Vectors.bruteForceTopK(big, emb, 5)
    }
    assert(e.getMessage.contains("broadcast contract"))
    // The guard counts via CollectLimit — at most maxRows+1 rows touched —
    // and an in-contract query side still passes through untouched.
    assert(Vectors.bruteForceTopK(emb.limit(3), emb, 2).count() == 6)
  }

  test("containmentPairs: a shingle present in every doc is dropped by the df pre-count") {
    // 30 docs sharing one boilerplate sentence (df = 30 > maxDf) plus one
    // genuine containment pair. The boilerplate must produce no pairs and
    // the contained pair must survive.
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val boiler = " all rights reserved contact us for more details and terms"
    val rows = (1L to 30L).map { i =>
      val body = if (i == 1) base else if (i == 2) base + " plus extra trailing content words here" else s"unique document number $i with its own distinct content about topic $i"
      (i, body + boiler)
    }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"doc 1 is contained in doc 2: $got")
    // No pair rests on boilerplate evidence alone: docs 3..30 share ONLY
    // the boilerplate sentence, so none of them may pair with anything.
    assert(got.forall { case (a, b) => a <= 2 && b <= 2 }, s"boilerplate-only pairs leaked: $got")
  }

  test("exactDedup: identical texts collapse to one canonical id") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("nbClassify: separable vocab classifies correctly; scores match an exact integer mirror") {
    val df = Seq(
      (1L, "spark shuffle partition executor", "eng"),
      (2L, "partition executor spark spark", "eng"),
      (3L, "sonnet stanza verse meter", "poetry"),
      (4L, "verse meter sonnet sonnet", "poetry"),
      (5L, "spark executor shuffle shuffle", "eng"))
      .toDF("doc_id", "text", "source")
    val got = TextFunctions.nbClassify(df, "doc_id", "text", "source")
      .select("doc_id", "label", "predicted", "score_micro", "correct")
      .as[(Long, String, String, Long, Boolean)].collect().sortBy(_._1)
    assert(got.forall(_._5), s"separable corpus must classify clean: ${got.toSeq}")

    // Exact integer mirror (same HALF_UP rounding as Spark's round()).
    def lpMicro(x: Double): Long =
      java.math.BigDecimal.valueOf(1e6 * math.log(x))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val rows = Seq(
      1L -> ("eng", "spark shuffle partition executor"),
      2L -> ("eng", "partition executor spark spark"),
      3L -> ("poetry", "sonnet stanza verse meter"),
      4L -> ("poetry", "verse meter sonnet sonnet"),
      5L -> ("eng", "spark executor shuffle shuffle"))
    val toks = rows.map { case (id, (l, t)) => (id, l, t.split(' ').toSeq) }
    val vocab = toks.flatMap(_._3).distinct
    val labels = toks.map(_._2).distinct.sorted
    val nl = labels.map(l => l -> toks.filter(_._2 == l).map(_._3.size).sum).toMap
    def lp(l: String, w: String): Long = {
      val c = toks.filter(_._2 == l).flatMap(_._3).count(_ == w)
      lpMicro((c + 1).toDouble / (nl(l) + vocab.size))
    }
    val prior = labels.map(l =>
      l -> lpMicro(toks.count(_._2 == l).toDouble / toks.size)).toMap
    val expected = toks.map { case (id, trueL, ws) =>
      val scores = labels.map(l => l -> (prior(l) + ws.map(w => lp(l, w)).sum))
      val best = scores.minBy { case (l, s) => (-s, l) }
      (id, best._1, best._2)
    }
    got.zip(expected).foreach { case ((id, _, pred, score, _), (eid, epred, escore)) =>
      assert(id == eid && pred == epred && score == escore,
        s"doc $id: got ($pred, $score), expected ($epred, $escore)")
    }
  }

  test("nbClassify: doc with no separating tokens falls back deterministically") {
    // 'common' appears equally in both classes; priors tip the balance
    // (3 eng docs vs 2 poetry), and the integer argmax breaks any exact
    // tie by smaller label — either way the outcome is deterministic.
    val df = Seq(
      (1L, "spark spark common", "eng"),
      (2L, "spark executor common", "eng"),
      (3L, "spark shuffle", "eng"),
      (4L, "sonnet verse common", "poetry"),
      (5L, "sonnet meter common", "poetry"),
      (6L, "common", "eng"))
      .toDF("doc_id", "text", "source")
    val got = TextFunctions.nbClassify(df, "doc_id", "text", "source")
      .filter(col("doc_id") === 6L)
      .select("predicted").as[String].collect().head
    assert(got == "eng", s"prior-dominated doc must route to the majority class: $got")
  }

  test("embedOutliers: a planted far-away vector is flagged, cluster members are not") {
    val rnd = new scala.util.Random(11)
    // One tight cluster of 40 vectors + one vector 100x farther out.
    val cluster = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        (if (d == 0) 1.0f else 0.0f) + rnd.nextFloat() * 0.01f))
    }
    val planted = Seq((99L, Seq.tabulate(8)(d => 5.0f)))
    val df = (cluster ++ planted).toDF("vec_id", "embedding")
    val got = IVF.embedOutliers(df, nlist = 1)
      .select("vec_id", "outlier").as[(Long, Boolean)].collect().toMap
    assert(got(99L), "the planted far vector must be flagged")
    assert(got.count(_._2) <= 2,
      s"cluster members must not be mass-flagged: ${got.filter(_._2)}")
    assert(got.size == 41)
  }

  test("nbTrain/nbScore: stored model scores a batch bit-identically; OOV tokens ignored") {
    val corpus = Seq(
      (1L, "spark shuffle partition executor", "eng"),
      (2L, "partition executor spark spark", "eng"),
      (3L, "sonnet stanza verse meter", "poetry"),
      (4L, "verse meter sonnet sonnet", "poetry"))
      .toDF("doc_id", "text", "source")
    val model = TextFunctions.nbTrain(corpus, "doc_id", "text", "source")
    val batch = Seq(
      (10L, "spark executor"), // eng vocab
      (11L, "sonnet verse"), // poetry vocab
      (12L, "zebra quux")) // fully OOV -> priors alone (tie -> 'eng')
      .toDF("doc_id", "text")
    val live = TextFunctions.nbScore(model, batch, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(live.map(r => r._1 -> r._2).toSeq ==
      Seq(10L -> "eng", 11L -> "poetry", 12L -> "eng"), s"live: ${live.toSeq}")

    // Parquet round trip: stored-model scores are bit-identical.
    val dir = java.nio.file.Files.createTempDirectory("nb-model-").toString + "/m"
    model.write(dir)
    val stored = TextFunctions.nbScore(
      TextFunctions.NbModel.read(spark, dir), batch, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(stored.toSeq == live.toSeq, s"round trip drift: ${stored.toSeq}")

    // OOV doc scores exactly the winning prior (no token contribution).
    val engPrior = model.priors.filter(col("label") === "eng")
      .select("prior_micro").as[Long].collect().head
    assert(live.find(_._1 == 12L).get._3 == engPrior)
  }

  test("knnClassify: cluster labels propagate; vote ties break by nearest neighbor") {
    // Two tight clusters on orthogonal axes, labels 1 and 2; queries sit
    // inside each cluster. 4 labeled vectors per cluster, k = 3.
    def v(axis: Int, wiggle: Float): Seq[Float] =
      Seq.tabulate(4)(d => (if (d == axis) 1.0f else 0.0f) + (if (d == 3) wiggle else 0.0f))
    val corpus = (
      (0 until 4).map(i => (i.toLong, v(0, i * 0.01f), 1)) ++
      (4 until 8).map(i => (i.toLong, v(1, (i - 4) * 0.01f), 2))
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, v(0, 0.02f)), (101L, v(1, 0.02f))).toDF("vec_id", "embedding")
    val got = Vectors.knnClassify(queries, corpus, "label", k = 3)
      .select("query_id", "predicted", "votes")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((100L, 1L, 3L), (101L, 2L, 3L)), s"got: ${got.toSeq}")

    // Forced 50/50 vote at k = 4: query equidistant-ish with rank-1
    // neighbor in cluster 1 -> tie breaks to the nearer supporting label.
    val mixQ = Seq((200L, v(0, 0.0f))).toDF("vec_id", "embedding")
    val mixed = (
      Seq((0L, v(0, 0.0f), 1), (1L, v(0, 0.3f), 1)) ++
      Seq((2L, v(0, 0.31f), 2), (3L, v(0, 0.32f), 2))
    ).toDF("vec_id", "embedding", "label")
    val tie = Vectors.knnClassify(mixQ, mixed, "label", k = 4)
      .select("query_id", "predicted", "votes", "best_rank")
      .as[(Long, Long, Long, Long)].collect().head
    assert(tie == ((200L, 1L, 2L, 1L)),
      s"2-2 vote must break by best_rank: $tie")
  }

  test("knnClassify fails LOUD on null or non-castable voting labels") {
    // A null label among the top-k voters must throw, not win the vote
    // as NULL (string labels that do cast, e.g. "7", keep working).
    def v(x: Float): Seq[Float] = Seq(1.0f, x, 0.0f, 0.0f)
    val strCorpus = Seq(
      (0L, v(0.0f), "7"), (1L, v(0.01f), "7"), (2L, v(0.02f), "8")
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((100L, v(0.0f))).toDF("vec_id", "embedding")
    val ok = Vectors.knnClassify(q, strCorpus, "label", k = 3)
      .select("query_id", "predicted").as[(Long, Long)].collect().head
    assert(ok == ((100L, 7L)), s"castable string labels must vote: $ok")

    val nullCorpus = Seq(
      (0L, v(0.0f), Some(1L)), (1L, v(0.01f), None), (2L, v(0.02f), Some(1L))
    ).toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      Vectors.knnClassify(q, nullCorpus, "label", k = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("knnVote")),
      s"expected the knnVote label guard, got: $ex")

    val junkCorpus = Seq(
      (0L, v(0.0f), "cat"), (1L, v(0.01f), "cat"), (2L, v(0.02f), "dog")
    ).toDF("vec_id", "embedding", "label")
    val ex2 = intercept[Exception] {
      Vectors.knnClassify(q, junkCorpus, "label", k = 3).collect()
    }
    assert(messages(ex2).exists(_.contains("knnVote")),
      s"expected the knnVote label guard on non-castable labels, got: $ex2")
  }

  test("nbTrain maxVocab: identity when vocab fits; df-pruning cut when it doesn't") {
    val corpus = Seq(
      (1L, "spark shuffle partition executor", "eng"),
      (2L, "partition executor spark spark", "eng"),
      (3L, "sonnet stanza verse meter", "poetry"),
      (4L, "verse meter sonnet sonnet", "poetry"),
      (5L, "executor verse spark meter", "eng"))
      .toDF("doc_id", "text", "source")
    def modelRows(m: TextFunctions.NbModel) = (
      m.p.as[(String, String, Long)].collect().toSet,
      m.priors.as[(String, Long)].collect().toSet)
    val unbounded = modelRows(
      TextFunctions.nbTrain(corpus, "doc_id", "text", "source"))
    // Vocab here is 8 distinct words: any maxVocab >= 8 is the identity.
    val roomy = modelRows(
      TextFunctions.nbTrain(corpus, "doc_id", "text", "source", maxVocab = 8))
    assert(roomy == unbounded,
      "maxVocab >= vocab must reproduce the unbounded model bit-for-bit")

    // maxVocab 3 keeps the 3 highest-document-frequency words (ties by
    // word ascending): executor/meter/spark/verse all have df 3 — the
    // deterministic cut keeps {executor, meter, spark}.
    val bounded = TextFunctions.nbTrain(
      corpus, "doc_id", "text", "source", maxVocab = 3)
    val words = bounded.p.select("w").distinct().as[String].collect().toSet
    assert(words == Set("executor", "meter", "spark"), s"kept: $words")
    // The pruned model's |V| enters smoothing: scoring still works and
    // pruned words behave exactly like OOV (ignored at score time).
    val scored = TextFunctions.nbScore(bounded,
        Seq((10L, "spark executor stanza")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, String, Long)].collect().head
    assert(scored._2 == "eng", s"bounded model must still classify: $scored")
    // Priors never depend on the vocabulary cut.
    assert(modelRows(bounded)._2 == unbounded._2)
  }

  test("OutlierModel: stored-yardstick scoring is bit-identical through parquet") {
    val rnd = new scala.util.Random(7)
    val vecs = ((0 until 40).map { i =>
      (i.toLong, Seq.tabulate(4)(d => (if (d == i % 2) 1.0f else 0.0f)
        + rnd.nextFloat() * 0.01f))
    } :+ ((99L, Seq.tabulate(4)(_ => 9.0f))))
      .toDF("vec_id", "embedding")
    val live = IVF.embedOutliers(vecs, nlist = 2)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // Train-once + score == the live screen on the training corpus...
    val model = IVF.embedOutliersTrain(vecs, nlist = 2)
    val inMem = IVF.embedOutliersScore(model, vecs)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(inMem.toSeq == live.toSeq, "train/score drifted from the live screen")
    // ...and stays bit-identical through the parquet round trip.
    val dir = java.nio.file.Files.createTempDirectory("om-").toString + "/om"
    model.write(dir)
    val stored = IVF.embedOutliersScore(IVF.OutlierModel.read(spark, dir), vecs)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(stored.toSeq == live.toSeq, "parquet round trip drifted")
    assert(stored.find(_._1 == 99L).exists(_._4), "planted outlier flagged")
    // A batch vector landing in a cell with NO training mass (no
    // threshold row) is an outlier by definition — the left-join
    // contract, exercised with a hand-built model missing cell 1.
    val partial = IVF.OutlierModel(
      model.centroids,
      model.thresholds.filter(col("cell") === 0L))
    val scoredPartial = IVF.embedOutliersScore(partial, vecs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(scoredPartial.filter(_._2 == 1L).forall(_._4),
      "a cell without a stored threshold must flag everything in it")
    assert(scoredPartial.exists(_._2 == 1L), "fixture must hit cell 1")
  }

  test("ClusterModel: stored-quantizer cluster family is bit-identical through parquet") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(4)(d => (if (d == i % 2) 1.0f else 0.0f)
        + rnd.nextFloat() * 0.01f))
    }.toDF("vec_id", "embedding")
    val live = IVF.embedClusters(vecs, nlist = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // Train-once + score == the live call on the training corpus...
    val model = IVF.embedClustersTrain(vecs, nlist = 2)
    val inMem = IVF.embedClustersScore(model, vecs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(inMem.toSeq == live.toSeq, "train/score drifted from the live call")
    // ...and stays bit-identical through the parquet round trip (the
    // centroid doubles round-trip parquet exactly).
    val dir = java.nio.file.Files.createTempDirectory("cm-").toString + "/cm"
    model.write(dir)
    val storedModel = IVF.ClusterModel.read(spark, dir)
    val stored = IVF.embedClustersScore(storedModel, vecs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stored.toSeq == live.toSeq, "parquet round trip drifted")
    assert(stored.map(_._2).distinct.length == 2, "fixture must fill both cells")
    // The sampling twin rides the same stored quantizer: identical to
    // the live draw, and bounded per cell.
    val liveSample = IVF.clusterSample(vecs, perCluster = 3, nlist = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val storedSample = IVF.clusterSampleModel(storedModel, vecs, perCluster = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(storedSample.toSeq == liveSample.toSeq,
      "stored-quantizer sample drifted from the live draw")
    assert(storedSample.groupBy(_._2).values.forall(_.length <= 3),
      "perCluster bound violated")
    // Scoring a DIFFERENT batch against the stored model keeps cluster
    // ids comparable: a vector near cell 0's axis must land in the same
    // cluster as the training vectors on that axis.
    val probe = Seq((500L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val probeCell = IVF.embedClustersScore(storedModel, probe)
      .as[(Long, Long, Long, Long)].collect().head._2
    val axisCell = stored.find(_._1 == 0L).get._2
    assert(probeCell == axisCell,
      s"stored quantizer must assign a new batch consistently: $probeCell vs $axisCell")
  }

  test("knnClassifyIndexed at full probes agrees with the brute-force vote") {
    // Two clusters, ivf nlist = 2; probing EVERY cell makes the
    // candidate set exact, so the indexed vote must equal knnClassify
    // row-for-row (same majority, same tie-breaks).
    def v(axis: Int, wiggle: Float): Seq[Float] =
      Seq.tabulate(4)(d =>
        (if (d == axis) 1.0f else 0.0f) + (if (d == 3) wiggle else 0.0f))
    val corpus = (
      (0 until 4).map(i => (i.toLong, v(0, i * 0.01f), 1)) ++
      (4 until 8).map(i => (i.toLong, v(1, (i - 4) * 0.01f), 2))
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, v(0, 0.02f)), (101L, v(1, 0.02f))).toDF("vec_id", "embedding")
    val brute = Vectors.knnClassify(queries, corpus, "label", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // Through a parquet round trip of the index, like the recurring form.
    val dir = java.nio.file.Files.createTempDirectory("knn-ivf-").toString + "/ivf"
    IVF.buildIvfIndex(corpus.select("vec_id", "embedding"), nlist = 2).write(dir)
    val indexed = Vectors.knnClassifyIndexed(
        queries, IVF.IvfIndex.read(spark, dir),
        corpus.select("vec_id", "label"), "label", k = 3, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(indexed.toSeq == brute.toSeq,
      s"full-probe indexed vote drifted: ${indexed.toSeq} vs ${brute.toSeq}")
  }

  test("knnClassifyIndexedPq propagates cluster labels from the stored ADC codes") {
    // Same two well-separated clusters: the ADC approximation must not
    // change the majority vote inside a cluster (scores quantize through
    // the codebooks, so exact rank equality with the brute vote is NOT
    // the contract — label agreement on separated clusters is).
    def v(axis: Int, wiggle: Float): Seq[Float] =
      Seq.tabulate(4)(d =>
        (if (d == axis) 1.0f else 0.0f) + (if (d == 3) wiggle else 0.0f))
    val corpus = (
      (0 until 4).map(i => (i.toLong, v(0, i * 0.01f), 1)) ++
      (4 until 8).map(i => (i.toLong, v(1, (i - 4) * 0.01f), 2))
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, v(0, 0.02f)), (101L, v(1, 0.02f))).toDF("vec_id", "embedding")
    // Through a parquet round trip of the index, like the recurring form
    // (m = 2 subspaces of 2 dims, k = 8 codewords over 8 points).
    val dir = java.nio.file.Files.createTempDirectory("knn-pq-").toString + "/pq"
    PQ.buildPqIndex(corpus.select("vec_id", "embedding"),
      dim = 4, m = 2, k = 8, nlist = 2).write(dir)
    val got = Vectors.knnClassifyIndexedPq(
        queries, PQ.PqIndex.read(spark, dir),
        corpus.select("vec_id", "label"), "label", k = 3, nprobe = 2)
      .select("query_id", "predicted", "votes")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((100L, 1L, 3L), (101L, 2L, 3L)),
      s"ADC vote must propagate cluster labels: ${got.toSeq}")
    // The loud-label contract is knnVote's and rides along unchanged: a
    // null label among the ADC voters throws.
    val nulls = corpus.select(col("vec_id"),
      when(col("vec_id") === 1L, lit(null)).otherwise(col("label"))
        .as("label"))
    val ex = intercept[Exception] {
      Vectors.knnClassifyIndexedPq(
        queries, PQ.PqIndex.read(spark, dir), nulls, "label", k = 3,
        nprobe = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("knnVote")),
      s"expected the knnVote label guard, got: $ex")
  }

  test("corpusDrift: exact per-word total-variation, top-N cut, loud on empty side") {
    // a: x x y (T=3), b: x z (T=2). Numerators |cnt_a*T_b - cnt_b*T_a|
    // over denominator 2*3*2 = 12: z -> 3/12, y -> 2/12, x -> 1/12.
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x z")).toDF("doc_id", "text")
    val got = TextFunctions.corpusDrift(a, b, "text")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("z", 0L, 1L, 3.0 / 12), ("y", 1L, 0L, 2.0 / 12),
      ("x", 2L, 1L, 1.0 / 12)), s"got: $got")
    // The top-N cut keeps the drift-descending head.
    val top2 = TextFunctions.corpusDrift(a, b, "text", topN = 2)
      .select("word").as[String].collect().toSeq
    assert(top2 == Seq("z", "y"), s"top2: $top2")
    // A zero-token side has no distribution: loud, not NaN/Inf rows.
    val ex = intercept[Exception] {
      TextFunctions.corpusDrift(a, spark.emptyDataFrame
        .withColumn("text", lit("")).limit(0), "text")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("corpusDrift")),
      s"expected the non-empty guard, got: $ex")
  }

  test("candidatePairsSqlValues: sorted deterministic literals covering every verified pair") {
    val vals = Dedup.candidatePairsSqlValues(docs, "doc_id", "text")
    // Format: "(a, b), (c, d)" with numeric ids — parse it back.
    val pairRe = """\((\d+), (\d+)\)""".r
    val parsed = pairRe.findAllMatchIn(vals)
      .map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
    assert(parsed.nonEmpty, "fixture should band at least one candidate pair")
    assert(vals == parsed.map { case (a, b) => s"($a, $b)" }.mkString(", "),
      "rendered string must be exactly the parsed pairs re-joined (no stray text)")
    // Deterministic order: ascending (id_a, id_b), id_a < id_b, distinct.
    assert(parsed == parsed.sorted, "pairs must render in (id_a, id_b) order")
    assert(parsed.distinct == parsed, "pairs must be distinct")
    assert(parsed.forall { case (a, b) => a < b }, "pairs must be id_a < id_b")
    // Re-render is bit-identical (one deterministic plan, no sampling).
    assert(Dedup.candidatePairsSqlValues(docs, "doc_id", "text") == vals)
    // RECALL contract the literal-oracle form leans on: every
    // exhaustively-verified near-dup pair at the operating threshold is
    // among the banded candidates, so a DuckDB replay that re-verifies
    // Jaccard over only these pairs reaches the same drop/winner sets
    // as the all-pairs form.
    val verified = bruteJaccard(0.7)
    val cand = parsed.toSet
    assert(verified.subsetOf(cand),
      s"banded candidates missed verified pairs: ${verified -- cand}")
  }
}
