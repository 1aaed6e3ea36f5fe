package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Cross-document duplicated-span detection/scrub: planted-passage
 * fixtures pin the keeper contract, overlap-union coverage, the
 * within-doc-only exclusion, and short-doc/empty edge behavior.
 */
class SpansSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Docs 1 and 2 share the verbatim 6-token passage "the quick brown fox
  // jumps high" (two overlapping 5-gram spans); doc 3 is unique prose;
  // doc 4 is shorter than k; doc 5 repeats a 5-gram only within itself.
  private def fixture = Seq(
    (1L, "The quick  brown fox jumps high over lazy dogs daily"),
    (2L, "Intro words then the QUICK brown fox jumps high and more trailing text"),
    (3L, "completely unrelated prose with no shared passages at all here"),
    (4L, "too short"),
    (5L, "alpha beta gamma delta epsilon filler alpha beta gamma delta epsilon")
  ).toDF("doc_id", "text")

  test("spanDupes: shared passage counted in both docs, within-doc repeat excluded") {
    val got = Spans.spanDupes(fixture, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // Doc 1: 10 tokens -> 6 spans; the shared 6-token passage sits at
    // positions 1-2 -> 2 duplicated spans. Doc 2: 13 tokens -> 9 spans,
    // passage at positions 4-5.
    assert(byId(1L) == ((1L, 6L, 2L, 2.0 / 6)))
    assert(byId(2L) == ((2L, 9L, 2L, 2.0 / 9)))
    assert(byId(3L)._3 == 0L)
    // Shorter than k: zero spans, 0.0 frac (not null, not missing).
    assert(byId(4L) == ((4L, 0L, 0L, 0.0)))
    // "alpha beta gamma delta epsilon" occurs twice in doc 5 ONLY ->
    // df counts distinct docs, so it is not duplicated.
    assert(byId(5L)._3 == 0L)
  }

  test("spanScrub: keeper keeps the passage, the other doc loses the token union") {
    val got = Spans.spanScrub(fixture, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // Doc 1 is the keeper (smallest id containing the spans): untouched,
    // clean_text = normalized original.
    assert(byId(1L) ==
      ((1L, "the quick brown fox jumps high over lazy dogs daily", 0L)))
    // Doc 2 loses the union of the two overlapping spans (6 tokens).
    assert(byId(2L) ==
      ((2L, "intro words then and more trailing text", 6L)))
    assert(byId(3L)._3 == 0L)
    assert(byId(4L) == ((4L, "too short", 0L)))
    assert(byId(5L)._3 == 0L)
  }

  test("spanScrub: a doc that is entirely duplicated passage scrubs to empty") {
    val docs = Seq(
      (10L, "one two three four five"),
      (20L, "one two three four five")
    ).toDF("doc_id", "text")
    val got = Spans.spanScrub(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(got(0) == ((10L, "one two three four five", 0L)))
    assert(got(1) == ((20L, "", 5L)))
  }

  test("spanOccurrences: positions are 1-based over normalized tokens; short docs empty") {
    val docs = Seq((7L, "  A  b c d  "), (8L, "x y")).toDF("doc_id", "text")
    val occ = Spans.spanOccurrences(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, String)].collect().toSet
    assert(occ == Set((7L, 1L, "a b c"), (7L, 2L, "b c d")))
  }

  test("spanScrubAgainst: one reference occurrence scrubs the batch, reference untouched") {
    val ref = Seq(
      (100L, "canonical corpus carries the quick brown fox jumps high passage")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "new doc embedding the quick brown fox jumps high inside it"),
      (2L, "a wholly original contribution with fresh content only"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val got = Spans.spanScrubAgainst(batch, ref, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // Batch doc 1 shares the 6-token passage "the quick brown fox jumps
    // high" (two overlapping ref spans) — the union is scrubbed even
    // though no OTHER batch doc shares it (minDf does not apply here).
    assert(byId(1L) == ((1L, "new doc embedding inside it", 6L)))
    assert(byId(2L)._3 == 0L)
    assert(byId(3L) == ((3L, "tiny", 0L)))
    // Only batch rows come back — the reference is never rewritten.
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("spanDupes/spanScrub honor minDf = 3: a two-doc passage stays; a three-doc one scrubs") {
    val docs = Seq(
      (1L, "twice shared passage lives here only padding beyond"),
      (2L, "prefix twice shared passage lives here suffix words"),
      (3L, "thrice shared common passage sits here and extra one"),
      (4L, "pad thrice shared common passage sits here trailing"),
      (5L, "more thrice shared common passage sits here closing")
    ).toDF("doc_id", "text")
    val dup = Spans.spanDupes(docs, "doc_id", "text", k = 5, minDf = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // "twice shared passage lives here" spans 2 docs only -> below the cut.
    assert(dup(1L) == 0L && dup(2L) == 0L, s"$dup")
    assert(dup(3L) > 0L && dup(4L) > 0L && dup(5L) > 0L, s"$dup")
    val scrub = Spans.spanScrub(docs, "doc_id", "text", k = 5, minDf = 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(scrub(1L) == 0L && scrub(2L) == 0L, s"$scrub")
    // Doc 3 is the keeper of the three-doc passage; 4 and 5 shed it.
    assert(scrub(3L) == 0L && scrub(4L) > 0L && scrub(5L) > 0L, s"$scrub")
  }

  test("span index: epoch append/read round trip, retry no-op, compaction keeps counts") {
    val base = java.nio.file.Files.createTempDirectory("span-idx-").toString
    val b1 = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "the quick brown fox jumps high today")).toDF("doc_id", "text")
    val n1 = Spans.spanIndexAppend(b1, "doc_id", "text", base, "e1", 5)
    // 7 tokens -> 3 spans per doc, both docs identical -> 3 distinct.
    assert(n1 == 3L, s"distinct spans written: $n1")
    // Occurrence counts, not doc counts: each span seen twice.
    val idx1 = Spans.spanIndexRead(spark, base)
      .as[(String, Long)].collect().toMap
    assert(idx1.size == 3 && idx1.values.forall(_ == 2L), s"$idx1")
    // Re-appending the committed epoch is a retry no-op.
    assert(Spans.spanIndexAppend(b1, "doc_id", "text", base, "e1", 5) == -1L)
    // A second epoch sums into the merge; compaction folds both epochs
    // into one and preserves every count.
    Spans.spanIndexAppend(
      Seq((3L, "the quick brown fox jumps low instead")).toDF("doc_id", "text"),
      "doc_id", "text", base, "e2", 5)
    val before = Spans.spanIndexRead(spark, base)
      .as[(String, Long)].collect().toMap
    assert(before("the quick brown fox jumps") == 3L, s"$before")
    Spans.spanIndexCompact(spark, base, base + "-compact")
    val after = Spans.spanIndexRead(spark, base + "-compact")
      .as[(String, Long)].collect().toMap
    assert(after == before, s"fold must preserve counts: $after vs $before")
    // In-place compaction is refused loudly.
    val err = intercept[IllegalArgumentException] {
      Spans.spanIndexCompact(spark, base, base)
    }
    assert(err.getMessage.contains("in-place"))
    // k drift fails LOUD: the store records k on first append, and a
    // later append (or an ingest loop's screen) with a different k is a
    // silent-recall-hole bug, not a tunable.
    val kerr = intercept[IllegalArgumentException] {
      Spans.spanIndexAppend(b1, "doc_id", "text", base, "e9", 6)
    }
    assert(kerr.getMessage.contains("k=5") &&
      kerr.getMessage.contains("k=6"), kerr.getMessage)
    // The marker travels with compaction (a raw store's successor keeps
    // the guard), and the check-only read-path form fails the same way.
    assert(Spans.storedK(spark, base + "-compact").contains(5))
    val rerr = intercept[IllegalArgumentException] {
      graft.functions.Ingest.spanIndexAt(spark, base + "-compact", 6)
    }
    assert(rerr.getMessage.contains("k=5"), rerr.getMessage)
    // No marker (hand-built store): the check-only form passes — the
    // reader cannot know the store's k, so it must not invent one.
    Spans.spanIndex(b1, "doc_id", "text", 5)
      .write.parquet(base + "-raw/batch_id=m1")
    assert(graft.functions.Ingest.spanIndexAt(
      spark, base + "-raw", 7).count() == 3L)
  }

  test("spanScrubAgainst over spanIndexRead membership equals the direct two-corpus form") {
    // The screen/scrub pair ride the same span definition: coverage
    // counted by spanScreenIndexed against a stored index must match
    // what spanScrubAgainst removes against the live reference.
    val ref = Seq(
      (100L, "canonical corpus carries the quick brown fox jumps high passage")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "new doc embedding the quick brown fox jumps high inside it"),
      (2L, "a wholly original contribution with fresh content only")
    ).toDF("doc_id", "text")
    val idx = Spans.spanIndex(ref, "doc_id", "text", 5)
    val screened = Spans.spanScreenIndexed(batch, idx, "doc_id", "text", 5)
      .as[(Long, Long, Long)].collect()
      .map { case (id, ns, nr) => id -> ((ns, nr)) }.toMap
    // Doc 1: 11 tokens -> 7 spans, 2 of them (the overlapping passage
    // 5-grams) are reference spans; doc 2 clean.
    assert(screened(1L) == ((7L, 2L)), s"$screened")
    assert(screened(2L)._2 == 0L, s"$screened")
    val scrubbed = Spans.spanScrubAgainst(batch, ref, "doc_id", "text", 5)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // The 2 hit spans cover a 6-token union - the scrub agrees with the
    // screen about WHICH spans hit.
    assert(scrubbed(1L) == 6L && scrubbed(2L) == 0L, s"$scrubbed")
    // And the stored-index scrub form is row-identical to the live
    // two-corpus one: same spans, same coverage, reference never
    // re-tokenized.
    val viaIndex = Spans.spanScrubIndexed(batch, idx, "doc_id", "text", 5)
      .as[(Long, String, Long)].collect().toSet
    val viaRef = Spans.spanScrubAgainst(batch, ref, "doc_id", "text", 5)
      .as[(Long, String, Long)].collect().toSet
    assert(viaIndex == viaRef, s"$viaIndex vs $viaRef")
  }

  test("span property: scrub equals an in-driver oracle on random repetitive corpora") {
    import org.scalacheck.{Gen, Prop}
    val vocab = Vector("a", "b", "c", "d", "e")
    val genDoc = for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val genCorpus = for {
      nd <- Gen.choose(2, 8)
      ds <- Gen.listOfN(nd, genDoc)
      k <- Gen.choose(2, 4)
    } yield (ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    def oracle(rows: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
      val toks = rows.map { case (id, t) =>
        id -> TextFunctions.normalizeScala(t).split(" ", -1).toSeq
      }.toMap
      val occ = for {
        (id, ws) <- toks.toSeq; i <- 0 to ws.length - k
      } yield (id, i, ws.slice(i, i + k).mkString(" "))
      val keeper = occ.groupBy(_._3)
        .filter { case (_, os) => os.map(_._1).distinct.size >= 2 }
        .map { case (s, os) => s -> os.map(_._1).min }
      rows.map { case (id, _) =>
        val ws = toks(id)
        val covered = occ.collect {
          case (d, i, s) if d == id && keeper.get(s).exists(_ != id) =>
            (i until math.min(ws.length, i + k))
        }.flatten.toSet
        val kept = ws.indices.filterNot(covered).map(ws)
        id -> ((kept.mkString(" "), covered.size.toLong))
      }.toMap
    }
    val prop = Prop.forAll(genCorpus) { case (rows, k) =>
      val got = Spans.spanScrub(
          rows.toDF("doc_id", "text").repartition(4), "doc_id", "text", k)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      got == oracle(rows, k)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("spanScrub is deterministic across runs") {
    val a = Spans.spanScrub(fixture, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    val b = Spans.spanScrub(fixture, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("_SPAN_K marker: atomic record, and a corrupt marker fails self-describing") {
    val dir = java.nio.file.Files.createTempDirectory("spank-").toString
    Spans.recordOrCheckK(spark, dir, 5)
    assert(Spans.storedK(spark, dir).contains(5))
    assert(!new java.io.File(dir, "_SPAN_K.tmp").exists(),
      "the temp file must not outlive the rename")
    // Crash debris: an EMPTY marker (the pre-atomic-write failure mode,
    // or a hand edit). Every read/append path must fail with a message
    // naming the store and the repair, never a bare ''.toInt
    // NumberFormatException that wedges the store opaquely.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_SPAN_K"), "")
    val e1 = intercept[IllegalStateException](Spans.storedK(spark, dir))
    assert(e1.getMessage.contains(dir) && e1.getMessage.contains("_SPAN_K"))
    val e2 = intercept[IllegalStateException](
      Spans.recordOrCheckK(spark, dir, 5))
    assert(e2.getMessage.contains("delete the marker"))
    intercept[IllegalStateException](Spans.checkK(spark, dir, 5))
    // Repair path stated in the message: delete the marker, re-record.
    new java.io.File(dir, "_SPAN_K").delete()
    Spans.recordOrCheckK(spark, dir, 7)
    assert(Spans.storedK(spark, dir).contains(7))
  }
}
