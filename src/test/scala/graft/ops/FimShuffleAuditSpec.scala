package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** FimTransform.fimSplit + TrainShuffle.shuffleAudit — properties vs
  * naive in-memory references over the real corpus. */
class FimShuffleAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("fimSplit: PSM decodes back to the normalized text; cuts in range") {
    val docs = GraftSession.table(spark, sf, "documents")
    val norms = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.normText(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = FimTransform.fimSplit(docs, "doc_id", "text").collect()
    assert(rows.length == norms.size)
    var applied = 0
    rows.foreach { r =>
      val (id, app, n, lo, hi, psm) = (r.getLong(0), r.getBoolean(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      val norm = norms(id)
      assert(n == norm.length.toLong, s"doc $id n_chars")
      if (app) {
        applied += 1
        assert(0 <= lo && lo <= hi && hi <= n, s"doc $id cuts out of range")
        // <PRE>prefix<SUF>suffix<MID>middle — reassemble prefix+middle+suffix.
        val body = psm.stripPrefix("<PRE>")
        val sufAt = body.indexOf("<SUF>")
        val midAt = body.indexOf("<MID>")
        assert(psm.startsWith("<PRE>") && sufAt >= 0 && midAt > sufAt,
          s"doc $id psm malformed")
        val prefix = body.substring(0, sufAt)
        val suffix = body.substring(sufAt + 5, midAt)
        val middle = body.substring(midAt + 5)
        assert(prefix + middle + suffix == norm,
          s"doc $id PSM does not decode to the normalized text")
        assert(prefix.length == lo && middle.length == hi - lo,
          s"doc $id cut arithmetic")
      } else {
        assert(lo == 0 && hi == 0 && psm == norm, s"doc $id pass-through")
      }
    }
    // The md5 selection at 5000 bp must land near half (not all/none).
    assert(applied > rows.length / 4 && applied < rows.length * 3 / 4,
      s"selection badly skewed: $applied of ${rows.length}")
  }

  test("fimSplit: deterministic; exact at the rate extremes; loud on bad rate") {
    val docs = GraftSession.table(spark, sf, "documents")
    val a = FimTransform.fimSplit(docs, "doc_id", "text").collect().toSet
    val b = FimTransform.fimSplit(docs.repartition(5), "doc_id", "text")
      .collect().toSet
    assert(a == b)
    assert(FimTransform.fimSplit(docs, "doc_id", "text", rateBp = 0)
      .filter(col("fim_applied")).count() == 0)
    assert(FimTransform.fimSplit(docs, "doc_id", "text", rateBp = 10000)
      .filter(!col("fim_applied")).count() == 0)
    intercept[IllegalArgumentException] {
      FimTransform.fimSplit(docs, "doc_id", "text", rateBp = 10001)
    }
  }

  test("fimSplit: NULL text is the empty document — no null output field") {
    import spark.implicits._
    val df = Seq((1L, "one doc"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    // rateBp = 10000 forces selection so the null doc exercises the
    // cut/psm arithmetic, not just the pass-through branch.
    val rows = FimTransform.fimSplit(df, "doc_id", "text", rateBp = 10000)
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      (0 until r.length).foreach(i =>
        assert(!r.isNullAt(i), s"doc ${r.getLong(0)} field $i is null"))
    }
    val nullDoc = rows(1)
    assert(nullDoc.getLong(2) == 0L && nullDoc.getLong(3) == 0L &&
      nullDoc.getLong(4) == 0L &&
      nullDoc.getString(5) == "<PRE><SUF><MID>",
      "null text must behave exactly like the empty document")
  }

  test("epochOrderAudit: adjacency sets match a naive reference; epochs are order-disjoint") {
    val docs = GraftSession.table(spark, sf, "documents")
    val salts = Seq("epoch0", "epoch1", "epoch2")
    def adjacency(salt: String): Set[(Long, Long)] = {
      val laid = TrainShuffle.shardAssign(docs, "doc_id", 16, salt)
        .select("doc_id", "shard", "sort_key").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      laid.groupBy(_._2).values.flatMap { rows =>
        val order = rows.sortBy(r => (r._3, r._1)).map(_._1)
        order.zip(order.drop(1))
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      }.toSet
    }
    val adj = salts.map(s => s -> adjacency(s)).toMap
    val want = (for {
      a <- salts; b <- salts if a < b
    } yield (a, b) -> ((adj(a).size.toLong, adj(b).size.toLong,
      (adj(a) & adj(b)).size.toLong))).toMap
    val got = TrainShuffle.epochOrderAudit(docs, "doc_id", 16, salts)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"$got vs $want")
    // Order-disjointness: independent epoch permutations must share
    // almost no adjacency (a repeated salt would share ALL of it).
    got.values.foreach { case (na, nb, rep) =>
      assert(rep * 10 < math.min(na, nb),
        s"epochs share $rep of $na/$nb adjacencies — salting broken?")
    }
    intercept[IllegalArgumentException] {
      TrainShuffle.epochOrderAudit(docs, "doc_id", 16, Seq("only"))
    }
    intercept[IllegalArgumentException] {
      TrainShuffle.epochOrderAudit(docs, "doc_id", 16, Seq("a", "a"))
    }
  }

  test("epochExport: per-epoch digests differ, masses match, each equals its own packDigest") {
    val docs = GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    val salts = Seq("epoch0", "epoch1")
    val got = TrainShuffle.epochExport(docs, "doc_id", "text", model,
        numShards = 4, budget = 64, epochSalts = salts)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == salts.size * 4, s"${got.size}")
    // Each epoch's rows ARE that salt's packDigest (the shared-encode
    // composition changes no values).
    salts.foreach { salt =>
      val want = TrainShuffle.packDigest(
          TrainShuffle.packIdSequences(docs, "doc_id", "text", model,
            numShards = 4, budget = 64, salt = salt),
          budget = 64)
        .collect().map(r => (salt, r.getLong(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(want.forall { case (k, v) => got(k) == v },
        s"epochExport drifted from packDigest at salt $salt")
    }
    // The invariant pair a consumer checks: id mass identical across
    // epochs up to the trailing-separator trim (doc token ids are
    // salt-independent; each shard trims its FINAL separator iff it
    // spills past the last doc token's sequence, so epochs may differ
    // by at most numShards ids)...
    val massBySalt = salts.map(s =>
      got.collect { case ((e, _), (_, n, _, _)) if e == s => n }.sum)
    assert(massBySalt.max - massBySalt.min <= 4L,
      s"id mass drifted past the separator-trim bound: $massBySalt")
    // ...while the digest SETS differ (independent permutations; a
    // repeated salt would collide them all).
    val digSets = salts.map(s => got.collect {
      case ((e, _), (_, _, sd, xd)) if e == s => (sd, xd) }.toSet)
    assert(digSets.distinct.size == salts.size,
      "epoch layouts must be distinct permutations")
    intercept[IllegalArgumentException] {
      TrainShuffle.epochExport(docs, "doc_id", "text", model, 4, 64,
        Seq("only"))
    }
    intercept[IllegalArgumentException] {
      TrainShuffle.epochExport(docs, "doc_id", "text", model, 4, 64,
        Seq("a", "a"))
    }
  }

  test("exportManifestSft carries the no-split digests + the agreement constants") {
    val docs = GraftSession.table(spark, sf, "documents")
    val model = graft.functions.Bpe.bpeTrain(docs, "text", numMerges = 16)
    val rows = TrainShuffle.exportManifestSft(docs, "doc_id", "text",
        model, numShards = 4, budget = 128).collect()
    assert(rows.length == 4)
    val want = TrainShuffle.packNoSplitDigest(
        TrainShuffle.packNoSplitIds(docs, "doc_id", "text", model,
          numShards = 4, budget = 128),
        budget = 128)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    rows.foreach { r =>
      assert(r.toSeq.take(7) == want(r.getLong(0)),
        s"manifest digest drifted at shard ${r.getLong(0)}")
      assert(r.getLong(7) == 128L && r.getLong(8) == 4L &&
        r.getLong(9) == model.vocab.length.toLong &&
        r.getString(10) == model.alphabet &&
        r.getString(11) == model.pretok,
        s"agreement constants drifted: ${r.toSeq}")
    }
  }

  test("shuffleAudit agrees with a naive run-length reference") {
    val docs = GraftSession.table(spark, sf, "documents")
    val laid = TrainShuffle.shardAssign(docs, "doc_id", 16)
      .select("doc_id", "source", "shard", "sort_key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val ref = laid.groupBy(_._3).map { case (shard, rows) =>
      val ordered = rows.sortBy { case (id, _, _, sk) => (sk, id) }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var prev: String = null
      ordered.foreach { case (_, src, _, _) =>
        if (src == prev) runs(runs.length - 1) += 1
        else { runs += 1L; prev = src }
      }
      shard -> ((rows.length.toLong, rows.map(_._2).distinct.length.toLong,
        runs.length.toLong, runs.max))
    }
    val got = TrainShuffle.shuffleAudit(docs, "doc_id", "source", 16)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (shard, (nDocs, nGroups, nRuns, maxRun)) =>
      val (gd, gg, gr, gm, gi) = got(shard)
      assert((gd, gg, gr, gm) == ((nDocs, nGroups, nRuns, maxRun)),
        s"shard $shard: got ($gd,$gg,$gr,$gm) want ($nDocs,$nGroups,$nRuns,$maxRun)")
      assert(gi == nRuns.toDouble / nDocs.toDouble)
    }
  }

  test("shuffleAudit: a sorted-by-source order scores WORSE than the md5 order") {
    // The audit's purpose: catch ingest order leaking through. Feed it a
    // pathological id assignment where ids cluster by source (so the md5
    // draw can't help within one shard? no — md5 still scrambles; instead
    // compare against a single-shard audit where the "shuffle" is the
    // identity: every doc of a source adjacent).
    val spark2 = spark
    import spark2.implicits._
    // 3 sources x 40 docs; single shard isolates the ordering effect.
    val df = (0L until 120L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val audit = TrainShuffle.shuffleAudit(df, "doc_id", "source", 1)
      .collect().head
    val interleave = audit.getDouble(5)
    // md5 order interleaves 3 balanced sources: runs ~ 2/3 of docs.
    assert(interleave > 0.4, s"md5 order should interleave, got $interleave")
    assert(audit.getLong(4) <= 6, s"max_run ${audit.getLong(4)} too long")
  }

  test("shuffleAudit: null group values fail loud") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Some("a")), (2L, None)).toDF("doc_id", "source")
    val e = intercept[Exception] {
      TrainShuffle.shuffleAudit(df, "doc_id", "source", 2).collect()
    }
    assert(e.getMessage != null)
  }
}
