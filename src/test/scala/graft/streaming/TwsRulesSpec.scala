package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/**
 * T1–T4 on the transformWithState path (state v2 + RocksDB): the same
 * TopologyTestDriver-shaped scenarios StreamRulesSpec runs against the
 * FMGWS forms, proving the two state APIs produce identical rule output
 * (they share the pure state machines, so a divergence here would mean a
 * state-plumbing bug, not a semantic one).
 */
class TwsRulesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  import spark.implicits._

  private val ids = new AtomicInteger(0)

  /** Run a streaming transform over batches of input, synchronously. */
  private def runStream[I: Encoder, O: Encoder](batches: Seq[Seq[I]])(
      f: Dataset[I] => Dataset[O]): Seq[Seq[O]] = {
    implicit val sq = spark.sqlContext
    val qn = s"tws_rules${ids.incrementAndGet()}"
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

  private val active = Some(Activation(ActivationKind.Active))
  private val noAct = Some(Activation(ActivationKind.NoActivation))
  private def mono(name: String, act: Option[Activation]): Monolog =
    Monolog(name, notification = EffectiveNotification(activation = act))

  test("tws transitionDetect: active/active/normal sequence sets flags once each way") {
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(mono("a", active)))),
      Seq(MonologRecord(2, "a", Some(mono("a", active)))),
      Seq(MonologRecord(3, "a", Some(mono("a", noAct)))),
      Seq(MonologRecord(4, "a", Some(mono("a", noAct)))))
    val out = runStream(recs)(StreamRules.transitionDetectTws).map(_.head.value.get.transitions)
    assert(out(0).transitionToActive && !out(0).transitionToNormal)
    assert(!out(1).transitionToActive && !out(1).transitionToNormal)
    assert(!out(2).transitionToActive && out(2).transitionToNormal)
    assert(!out(3).transitionToActive && !out(3).transitionToNormal)
  }

  test("tws transitionDetect: in-batch ordering by seq (flap within one micro-batch)") {
    val batch = Seq(
      MonologRecord(2, "a", Some(mono("a", noAct))),
      MonologRecord(1, "a", Some(mono("a", active))))
    val out = runStream(Seq(batch))(StreamRules.transitionDetectTws).head
      .sortBy(_.seq).map(_.value.get.transitions)
    assert(out(0).transitionToActive)
    assert(out(1).transitionToNormal)
  }

  test("tws transitionDetect: tombstone-protection yields empty monolog + transitionToNormal") {
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(mono("a", active)))),
      Seq(MonologRecord(2, "a", None)))
    val out = runStream(recs)(StreamRules.transitionDetectTws)
    val last = out(1).head.value.get
    assert(last.registration == EffectiveRegistration())
    assert(last.transitions.transitionToNormal)
  }

  private def latchableMono(name: String, tta: Boolean = false, latched: Boolean = false): Monolog =
    Monolog(name,
      registration = EffectiveRegistration(action = Some(AlarmAction(latchable = true))),
      notification = EffectiveNotification(overrides =
        if (latched) AlarmOverrideSet(latched = Some(AlarmOverride(OverrideType.Latched)))
        else AlarmOverrideSet()),
      transitions = ProcessorTransitions(transitionToActive = tta))

  test("tws latchRule: emits Latched override + latching flag, cleared when override lands") {
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(latchableMono("a", tta = true)))),
      Seq(MonologRecord(2, "a", Some(latchableMono("a")))),
      Seq(MonologRecord(3, "a", Some(latchableMono("a", latched = true)))))
    val out = runStream(recs)(StreamRules.latchRuleTws)
    assert(out(0).head.monolog.transitions.latching)
    assert(out(0).head.emission.exists(e =>
      e.overrideType == OverrideType.Latched && e.value.isDefined))
    assert(out(1).head.monolog.transitions.latching)
    assert(out(1).head.emission.isEmpty)
    assert(!out(2).head.monolog.transitions.latching)
  }

  test("tws onDelayRule: emits OnDelayed override with future expiration; cleared by override") {
    def m(tta: Boolean, ondelayed: Boolean) = Monolog("a",
      registration = EffectiveRegistration(action = Some(AlarmAction(ondelayseconds = Some(5L)))),
      notification = EffectiveNotification(overrides =
        if (ondelayed) AlarmOverrideSet(ondelayed = Some(AlarmOverride(OverrideType.OnDelayed)))
        else AlarmOverrideSet()),
      transitions = ProcessorTransitions(transitionToActive = tta))
    val before = System.currentTimeMillis()
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(m(tta = true, ondelayed = false)))),
      Seq(MonologRecord(2, "a", Some(m(tta = false, ondelayed = true)))))
    val out = runStream(recs)(StreamRules.onDelayRuleTws)
    assert(out(0).head.monolog.transitions.ondelaying)
    val em = out(0).head.emission.get
    assert(em.overrideType == OverrideType.OnDelayed)
    val exp = em.value.flatMap(_.expiration).get
    assert(exp >= before + 5000 && exp <= System.currentTimeMillis() + 5000)
    assert(!out(1).head.monolog.transitions.ondelaying)
    assert(out(1).head.emission.isEmpty)
  }

  private def shelvedMono(name: String, oneshot: Boolean, ttn: Boolean): Monolog =
    Monolog(name,
      notification = EffectiveNotification(overrides =
        AlarmOverrideSet(shelved = Some(
          AlarmOverride(OverrideType.Shelved, oneshot = Some(oneshot), expiration = Some(99999L))))),
      transitions = ProcessorTransitions(transitionToNormal = ttn))

  test("tws oneShotRule: unshelve tombstone on transitionToNormal, idempotent across records") {
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(shelvedMono("a", oneshot = true, ttn = true)))),
      Seq(MonologRecord(2, "a", Some(shelvedMono("a", oneshot = true, ttn = false)))),
      Seq(MonologRecord(3, "a", Some(mono("a", noAct)))))
    val out = runStream(recs)(StreamRules.oneShotRuleTws)
    assert(out(0).head.monolog.transitions.unshelving)
    assert(out(0).head.emission.exists(e => e.overrideType == OverrideType.Shelved && e.value.isEmpty))
    assert(out(1).head.monolog.transitions.unshelving)
    assert(out(1).head.emission.isEmpty)
    assert(!out(2).head.monolog.transitions.unshelving)
  }

  test("tws unified chain: run and runTws agree on a multi-key register/flap/override scenario") {
    import graft.app.UnifiedAlarmRule
    import graft.app.UnifiedAlarmRule.{AlarmInput, Kind}
    def instance(seq: Long, name: String, latchable: Boolean) =
      AlarmInput(seq, name, Kind.Instance,
        alarm = Some(Alarm(action = Some("cls"))),
        action = Some(AlarmAction(latchable = latchable)))
    def act(seq: Long, name: String, union: String) =
      AlarmInput(seq, name, Kind.ActivationK, activation = Some(Activation(union)))
    def ovr(seq: Long, name: String, t: String, tomb: Boolean) =
      AlarmInput(seq, name, Kind.Override, overrideType = Some(t),
        overrideValue = if (tomb) None else Some(AlarmOverride(t, expiration = Some(0L))),
        tombstone = tomb)
    // No ondelay inputs: its emission stamps wall-clock expirations, which
    // would differ between the two (separately timed) runs.
    val batches = Seq(
      Seq(instance(1, "a", latchable = true), instance(2, "b", latchable = false)),
      Seq(act(3, "a", ActivationKind.Active), act(4, "b", ActivationKind.Active)),
      Seq(ovr(5, "a", OverrideType.Latched, tomb = false),
        act(6, "b", ActivationKind.NoActivation)),
      Seq(ovr(7, "a", OverrideType.Latched, tomb = true)))
    def norm(outs: Seq[Seq[UnifiedAlarmRule.ChainOutput]]): Seq[Seq[String]] =
      outs.map(_.map(_.toString).sorted)
    val fm = norm(runStream(batches)(UnifiedAlarmRule.run))
    val tw = norm(runStream(batches)(UnifiedAlarmRule.runTws))
    assert(fm == tw)
    assert(fm.flatten.nonEmpty)
  }

  test("tws rules: FMGWS and TWS forms agree record-for-record on a mixed scenario") {
    // One multi-key, multi-batch scenario pushed through BOTH state APIs;
    // outputs must match exactly (sorted by seq).
    val recs = Seq(
      Seq(MonologRecord(1, "a", Some(latchableMono("a", tta = true))),
        MonologRecord(2, "b", Some(latchableMono("b")))),
      Seq(MonologRecord(3, "a", Some(latchableMono("a"))),
        MonologRecord(4, "b", Some(latchableMono("b", tta = true)))),
      Seq(MonologRecord(5, "a", Some(latchableMono("a", latched = true)))))
    val fm = runStream(recs)(StreamRules.latchRule).map(_.sortBy(_.seq))
    val tw = runStream(recs)(StreamRules.latchRuleTws).map(_.sortBy(_.seq))
    assert(fm == tw)
  }

  test("streaming near-dup on transformWithState matches the FMGWS form") {
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val batches = Seq(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", ts(1)),
        (3L, "completely different text about unrelated material here", ts(1))),
      Seq((2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda", ts(2))))
    def run(form: (org.apache.spark.sql.DataFrame, String, String, String,
        String, Double, Int) => org.apache.spark.sql.DataFrame,
        name: String): Set[(Long, Long, Double)] = {
      val ms = MemoryStream[(Long, String, Timestamp)]
      val q = form(ms.toDS().toDF("doc_id", "text", "ts"),
          "doc_id", "text", "ts", "10 minutes", 0.5, 64)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(name).toString)
        .start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).select("id_a", "id_b", "est_jaccard")
          .as[(Long, Long, Double)].collect().toSet
      } finally q.stop()
    }
    val fm = run(graft.functions.Dedup.nearDupStream, s"nd_fm${ids.incrementAndGet()}")
    val tw = run(graft.functions.Dedup.nearDupStreamTws, s"nd_tw${ids.incrementAndGet()}")
    assert(fm == tw, s"fm=$fm tw=$tw")
    assert(fm.map(t => (t._1, t._2)).contains((1L, 2L)))
    assert(!fm.exists(t => t._1 == 3L || t._2 == 3L))
  }

  test("tws near-dup: bucket survives the watermark passing maxTs (evicts at maxTs + delay)") {
    // The eviction-gap probe: doc 1 lands at t=1min; an unrelated doc at
    // t=12min advances the watermark to 2min (delay 10min) — PAST doc 1's
    // bucket maxTs but BEFORE maxTs + delay. A near-dup of doc 1 then
    // arrives at t=5min: non-late (5 > watermark 2), inside the
    // (maxTs, maxTs + delay] window. FMGWS's setTimeoutTimestamp(maxTs,
    // watermark) keeps the bucket until 11min, so it emits (1, 2); a TWS
    // timer armed at bare maxTs would have evicted at 2min and silently
    // missed the pair. Both APIs must emit it.
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val sim1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val sim2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val other = "completely different text about unrelated material here"
    val batches = Seq(
      Seq((1L, sim1, ts(1))),
      Seq((99L, other, ts(12))),
      Seq((2L, sim2, ts(5))))
    def run(form: (org.apache.spark.sql.DataFrame, String, String, String,
        String, Double, Int) => org.apache.spark.sql.DataFrame,
        name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[(Long, String, Timestamp)]
      val q = form(ms.toDS().toDF("doc_id", "text", "ts"),
          "doc_id", "text", "ts", "10 minutes", 0.5, 64)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(name).toString)
        .start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    val fm = run(graft.functions.Dedup.nearDupStream, s"ndg_fm${ids.incrementAndGet()}")
    val tw = run(graft.functions.Dedup.nearDupStreamTws, s"ndg_tw${ids.incrementAndGet()}")
    assert(fm.contains((1L, 2L)), s"FMGWS missed the gap-window pair: $fm")
    assert(tw.contains((1L, 2L)), s"TWS evicted early and missed the pair: $tw")
    assert(fm == tw, s"fm=$fm tw=$tw")
  }

  test("near-dup eviction anchor survives an out-of-order batch (both APIs)") {
    // A later batch delivering an OLDER (non-late) row into the same
    // bucket must not pull the eviction time backward: doc 1 lands at
    // t=12min (anchor 12, evicts at 22); doc 98, a near-dup at t=5min,
    // arrives in the NEXT batch — a batch-max-only setTimeoutTimestamp
    // would regress the timeout to 15min. An unrelated doc at t=26min
    // then pushes the watermark to 16min (past the regressed timeout,
    // before the true one), and doc 2 arrives at t=18min: with the
    // running-max anchor both APIs still hold the bucket and emit
    // (1, 2); the regressed form would have evicted and missed it.
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val sim1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val sim2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val other = "completely different text about unrelated material here"
    val batches = Seq(
      Seq((1L, sim1, ts(12))),
      Seq((98L, sim1 + " mu", ts(5))), // older non-late near-dup, same buckets
      Seq((99L, other, ts(26))),       // watermark -> 16min
      Seq((2L, sim2, ts(18))))
    def run(form: (org.apache.spark.sql.DataFrame, String, String, String,
        String, Double, Int) => org.apache.spark.sql.DataFrame,
        name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[(Long, String, Timestamp)]
      val q = form(ms.toDS().toDF("doc_id", "text", "ts"),
          "doc_id", "text", "ts", "10 minutes", 0.5, 64)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(name).toString)
        .start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    val fm = run(graft.functions.Dedup.nearDupStream, s"ndo_fm${ids.incrementAndGet()}")
    val tw = run(graft.functions.Dedup.nearDupStreamTws, s"ndo_tw${ids.incrementAndGet()}")
    assert(fm.contains((1L, 2L)),
      s"FMGWS regressed its eviction anchor on the out-of-order batch: $fm")
    assert(tw.contains((1L, 2L)), s"TWS lost its anchor: $tw")
    assert(fm == tw, s"fm=$fm tw=$tw")
  }

  test("spanScreenStream counts reference-span hits per streamed doc") {
    // The span family's streaming audit: a doc sharing a verbatim
    // passage with the static reference reports its covered spans; a
    // novel doc reports zero hits; a short doc reports zero spans.
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val ref = graft.functions.Spans.spanOccurrences(
        Seq(1L -> "the quick brown fox jumps high over lazy dogs")
          .toDF("doc_id", "text"),
        "doc_id", "text", 5)
      .select("span")
    val qn = s"span_screen${ids.incrementAndGet()}"
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = graft.functions.Spans.spanScreenStream(
        ms.toDS().toDF("doc_id", "text", "ts"), ref,
        "doc_id", "text", "ts", "10 minutes", k = 5)
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graftck").toString)
      .start()
    try {
      ms.addData(Seq(
        // Shares the passage: 2 of its 3 spans are reference spans.
        (5L, "prefix the QUICK brown fox jumps high", ts(1)),
        (6L, "an entirely novel report about the weather today", ts(1)),
        (7L, "too short", ts(1))))
      q.processAllAvailable()
      assert(spark.table(qn).isEmpty, "append mode must hold until watermark")
      ms.addData(Seq((99L, "watermark advancer content", ts(30))))
      q.processAllAvailable()
      val rows = spark.table(qn).select("doc_id", "n_spans", "n_ref_spans")
        .as[(Long, Long, Long)].collect()
        .map { case (id, ns, nr) => id -> ((ns, nr)) }.toMap
      assert(rows.keySet == Set(5L, 6L, 7L), s"emitted: $rows")
      // Doc 5: 7 tokens -> 3 spans; spans at pos 2 ("the quick brown
      // fox jumps") and pos 3 ("quick brown fox jumps high") are both
      // reference spans.
      assert(rows(5L) == ((3L, 2L)), s"shared passage must flag: $rows")
      assert(rows(6L)._1 > 0 && rows(6L)._2 == 0, s"novel doc clean: $rows")
      assert(rows(7L) == ((0L, 0L)), s"short doc zero spans: $rows")
    } finally q.stop()
  }

  test("chunkScreenStream flags stored-boilerplate chunks against the static index") {
    // The streaming read path over the persisted chunk index: the
    // SHIFTED boilerplate copy (the case fixed windows miss) is flagged
    // from stored counts alone; a novel doc is clean; a whitespace doc
    // reports zero chunks. Results emit in append mode once the
    // watermark passes each doc's event time.
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val boiler = "all rights reserved corpus contact us for terms boundary"
    val index = graft.functions.Dedup.chunkIndex(
      Seq(1L -> s"intro words $boiler").toDF("doc_id", "text"),
      "doc_id", "text")
    val qn = s"chunk_screen${ids.incrementAndGet()}"
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = graft.functions.Dedup.chunkScreenStream(
        ms.toDS().toDF("doc_id", "text", "ts"), index,
        "doc_id", "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graftck").toString)
      .start()
    try {
      ms.addData(Seq(
        (5L, s"zzz zz $boiler", ts(1)), // boilerplate shifted 2 tokens
        (6L, "an entirely novel report about the weather", ts(1)),
        (7L, "   ", ts(1))))
      q.processAllAvailable()
      // Nothing emits until the watermark passes ts(1).
      assert(spark.table(qn).isEmpty, "append mode must hold until watermark")
      ms.addData(Seq((99L, "watermark advancer content", ts(30))))
      q.processAllAvailable()
      val rows = spark.table(qn).select("doc_id", "n_chunks", "n_dup")
        .as[(Long, Long, Long)].collect()
        .map { case (id, nc, nd) => id -> ((nc, nd)) }.toMap
      assert(rows.keySet == Set(5L, 6L, 7L), s"emitted: $rows")
      assert(rows(5L)._2 >= 1, s"shifted boilerplate must flag: $rows")
      assert(rows(6L)._1 > 0 && rows(6L)._2 == 0, s"novel doc clean: $rows")
      assert(rows(7L) == ((0L, 0L)), s"whitespace doc zero chunks: $rows")
    } finally q.stop()
  }
}
