package graft.app

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model._

/**
 * The whole monolog chain (J2/J3/A1/T1/T2/T3/T4/T6 — SURVEY.md §3.2) as ONE
 * keyed state processor.
 *
 * The reference runs six Kafka Streams apps connected by intermediate
 * topics; every hop is a serialization + durability boundary. On Spark the
 * idiomatic equivalent is a single `flatMapGroupsWithState` over the union
 * of the input changelogs: one shuffle by alarm name, one state row per
 * alarm, the pure state machines applied in sequence per record. Durability
 * comes from checkpointed state instead of intermediate topics.
 *
 * The FK side (class defaults) arrives pre-joined on instance records:
 * [[RegistrationStage]] performs the KTable-style FK join upstream and
 * re-emits member instances whenever their class changes, so a class
 * update retriggers retroactively exactly like the reference's FK join
 * (`RegistrationRule.java:91-97`).
 */
object UnifiedAlarmRule {

  /** Union-typed input record (exactly one payload depending on kind). */
  final case class AlarmInput(
      seq: Long,
      name: String,
      kind: String, // instance | activation | override
      alarm: Option[Alarm] = None,
      action: Option[AlarmAction] = None, // enriched class defaults (instance kind)
      activation: Option[Activation] = None,
      overrideType: Option[String] = None,
      overrideValue: Option[AlarmOverride] = None,
      tombstone: Boolean = false,
      // Structural tie-break for equal-seq records of the same alarm: 0 for
      // direct emissions; a class-retrigger re-emission carries the CLASS
      // record's seq here (monotonic across class updates), so it sorts
      // after the original registration it re-states without depending on
      // shuffle arrival order between stages.
      subSeq: Long = 0L)

  object Kind {
    val Instance = "instance"
    val ActivationK = "activation"
    val Override = "override"
  }

  /** Everything the chain's six state stores held, in one row per alarm. */
  final case class AlarmKeyState(
      alarm: Option[Alarm] = None,
      action: Option[AlarmAction] = None,
      activation: Option[Activation] = None,
      prevReal: Option[Activation] = None, // T1 store (normalized)
      overrides: Seq[AlarmOverride] = Nil, // A1 aggregate (by type, latest wins)
      latchInProgress: Boolean = false, // T2 store
      ondelayInProgress: Boolean = false, // T3 store
      oneshotInProgress: Boolean = false) // T4 store

  /** Tagged output: settled effective alarms + override emissions (feedback). */
  final case class ChainOutput(
      effective: Option[EffectiveAlarm],
      emission: Option[graft.streaming.OverrideEmission])

  private def applyInput(st: AlarmKeyState, in: AlarmInput): AlarmKeyState = in.kind match {
    case Kind.Instance =>
      if (in.tombstone) st.copy(alarm = None, action = None)
      else st.copy(alarm = in.alarm, action = in.action)
    case Kind.ActivationK =>
      st.copy(activation = if (in.tombstone) None else in.activation)
    case Kind.Override =>
      val t = in.overrideType.getOrElse("")
      val without = st.overrides.filterNot(_.overrideType == t)
      st.copy(overrides =
        if (in.tombstone) without else without ++ in.overrideValue.toSeq)
    case _ => st
  }

  /**
   * One record through the full chain: fold the input into state, then run
   * T1 -> T2 -> T3 -> T4 -> T6 over the resulting monolog exactly as the
   * reference's per-record processors do.
   */
  def step(
      st0: AlarmKeyState,
      in: AlarmInput,
      nowMillis: Long): (AlarmKeyState, Seq[ChainOutput]) = {
    val st1 = applyInput(st0, in)
    val name = in.name

    // J1/J2/J3 materialized from state
    val base = Monolog(
      name,
      registration = EffectiveRegistration(st1.alarm, st1.action),
      notification = EffectiveNotification(
        activation = st1.activation,
        overrides = AlarmOverrideSet.fromList(st1.overrides)))

    // T1
    val (m1, nextPrev) = StateMachines.detectTransitions(st1.prevReal, base)
    // T2/T3/T4
    val (m2, latchIp) = StateMachines.latchStep(m1, st1.latchInProgress)
    val (m3, ondelayIp) = StateMachines.onDelayStep(m2, st1.ondelayInProgress)
    val (m4, oneshotIp) = StateMachines.oneShotStep(m3, st1.oneshotInProgress)

    val emissions = Seq.newBuilder[ChainOutput]
    if (StateMachines.latchEmits(m4))
      emissions += ChainOutput(None, Some(graft.streaming.OverrideEmission(
        name, OverrideType.Latched, Some(AlarmOverride(OverrideType.Latched)))))
    StateMachines.onDelayEmits(m4, nowMillis).foreach { o =>
      emissions += ChainOutput(None, Some(
        graft.streaming.OverrideEmission(name, OverrideType.OnDelayed, Some(o))))
    }
    if (StateMachines.oneShotEmitsTombstone(m4))
      emissions += ChainOutput(None, Some(
        graft.streaming.OverrideEmission(name, OverrideType.Shelved, None)))

    // T6
    StateMachines.effectiveStateStep(m4).foreach { settled =>
      emissions += ChainOutput(
        Some(EffectiveAlarm(name, settled.registration, settled.notification)), None)
    }

    val st2 = st1.copy(
      prevReal = nextPrev,
      latchInProgress = latchIp,
      ondelayInProgress = ondelayIp,
      oneshotInProgress = oneshotIp)
    (st2, emissions.result())
  }

  /**
   * [[run]] on the `transformWithState` API (state v2, RocksDB): the whole
   * per-alarm chain state in one named ValueState, the same seq-ordered
   * [[step]] fold — selected in the app via `GRAFT_STATE_API=tws`.
   */
  def runTws(inputs: Dataset[AlarmInput]): Dataset[ChainOutput] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs.groupByKey(_.name)
      .transformWithState(
        new ChainProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  private final class ChainProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, AlarmInput, ChainOutput] {

    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[AlarmKeyState] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[AlarmKeyState]("chain",
        org.apache.spark.sql.Encoders.product[AlarmKeyState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[AlarmInput],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ChainOutput] = {
      var cur = if (st.exists()) st.get() else AlarmKeyState()
      val out = Seq.newBuilder[ChainOutput]
      rows.toSeq.sortBy(r => (r.seq, r.subSeq)).foreach { in =>
        val (st2, o) = step(cur, in, System.currentTimeMillis())
        cur = st2
        out ++= o
      }
      st.update(cur)
      out.result().iterator
    }
  }

  /** The streaming operator: union of changelogs in, tagged outputs out. */
  def run(inputs: Dataset[AlarmInput]): Dataset[ChainOutput] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs.groupByKey(_.name)
      .flatMapGroupsWithState[AlarmKeyState, ChainOutput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, records, state: GroupState[AlarmKeyState]) =>
          var st = state.getOption.getOrElse(AlarmKeyState())
          val out = Seq.newBuilder[ChainOutput]
          records.toSeq.sortBy(r => (r.seq, r.subSeq)).foreach { in =>
            val (st2, o) = step(st, in, System.currentTimeMillis())
            st = st2
            out ++= o
          }
          state.update(st)
          out.result().iterator
      }
  }
}
