package graft.app

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.app.UnifiedAlarmRule._

/**
 * Pure scenario tests of the unified chain step — ports of the reference's
 * per-rule TopologyTestDriver scenarios (SURVEY §5) run through the single
 * composed processor: registration join null-sides, activation outer join,
 * override add/remove, transition sequences, suppression, and the settled
 * states after each feedback hop.
 */
class UnifiedAlarmRuleSpec extends AnyFunSuite {

  private val now = 1000000L

  private def instance(seq: Long, name: String, latchable: Boolean = false,
      ondelay: Option[Long] = None): AlarmInput =
    AlarmInput(seq, name, Kind.Instance,
      alarm = Some(Alarm(action = Some("cls"))),
      action = Some(AlarmAction(latchable = latchable, ondelayseconds = ondelay)))

  private def activation(seq: Long, name: String, union: String): AlarmInput =
    AlarmInput(seq, name, Kind.ActivationK, activation = Some(Activation(union)))

  private def overrideIn(seq: Long, name: String, t: String,
      oneshot: Boolean = false, tomb: Boolean = false): AlarmInput =
    AlarmInput(seq, name, Kind.Override, overrideType = Some(t),
      overrideValue = if (tomb) None
        else Some(AlarmOverride(t, oneshot = Some(oneshot), expiration = Some(0L))),
      tombstone = tomb)

  private def drive(inputs: AlarmInput*): (AlarmKeyState, Seq[Seq[ChainOutput]]) =
    inputs.foldLeft((AlarmKeyState(), Seq.empty[Seq[ChainOutput]])) {
      case ((st, outs), in) =>
        val (st2, o) = step(st, in, now)
        (st2, outs :+ o)
    }

  private def states(outs: Seq[Seq[ChainOutput]]): Seq[String] =
    outs.flatten.flatMap(_.effective).map(_.notification.state)

  private def emissions(outs: Seq[Seq[ChainOutput]]): Seq[(String, Boolean)] =
    outs.flatten.flatMap(_.emission).map(e => (e.overrideType, e.value.isEmpty))

  // RegistrationRuleTest: count/content/tombstone
  test("registration: instance lands with class defaults; tombstone empties it") {
    val (st, outs) = drive(
      instance(1, "a", latchable = true),
      AlarmInput(2, "a", Kind.Instance, tombstone = true))
    assert(states(outs) == Seq(AlarmState.Normal, AlarmState.Normal))
    assert(st.alarm.isEmpty && st.action.isEmpty)
    val first = outs.head.head.effective.get
    assert(first.registration.action.exists(_.latchable))
  }

  // ActivationRuleTest: outer-join null sides — activation without registration
  test("unregistered activation still produces an effective alarm") {
    val (_, outs) = drive(activation(1, "x", ActivationKind.Active))
    assert(states(outs) == Seq(AlarmState.Active))
    assert(outs.head.head.effective.get.registration.alarm.isEmpty)
  }

  // ActivationRuleTest transitions sequence (:222-275)
  test("transition flags: active once, not twice; normal once") {
    val (_, outs) = drive(
      activation(1, "a", ActivationKind.Active),
      activation(2, "a", ActivationKind.Active),
      activation(3, "a", ActivationKind.NoActivation),
      activation(4, "a", ActivationKind.NoActivation))
    assert(states(outs) == Seq(
      AlarmState.Active, AlarmState.Active, AlarmState.Normal, AlarmState.Normal))
  }

  // ActivationRuleTest override agg add/remove
  test("override add then tombstone: disabled appears and disappears") {
    val (_, outs) = drive(
      activation(1, "a", ActivationKind.Active),
      overrideIn(2, "a", OverrideType.Disabled),
      overrideIn(3, "a", OverrideType.Disabled, tomb = true))
    assert(states(outs) == Seq(
      AlarmState.Active, AlarmState.NormalDisabled, AlarmState.Active))
  }

  // LatchRuleTest: latchable alarm activates -> suppressed + emission; settled on override
  test("latch: suppression while latching, settled ActiveLatched after feedback") {
    val (_, outs) = drive(
      instance(1, "a", latchable = true),
      activation(2, "a", ActivationKind.Active), // latching -> suppressed + emit
      overrideIn(3, "a", OverrideType.Latched)) // feedback landed
    assert(states(outs) == Seq(AlarmState.Normal, AlarmState.ActiveLatched))
    assert(emissions(outs) == Seq((OverrideType.Latched, false)))
  }

  // OnDelayRuleTest: ondelay emission with expiration = now + secs*1000
  test("ondelay: emission carries computed expiration; settled NormalOnDelayed") {
    val (_, outs) = drive(
      instance(1, "a", ondelay = Some(5L)),
      activation(2, "a", ActivationKind.Active),
      overrideIn(3, "a", OverrideType.OnDelayed))
    assert(states(outs) == Seq(AlarmState.Normal, AlarmState.NormalOnDelayed))
    val em = outs(1).flatMap(_.emission)
    assert(em.map(_.overrideType) == Seq(OverrideType.OnDelayed))
    assert(em.head.value.flatMap(_.expiration).contains(now + 5000L))
  }

  // OneShotRuleTest incl. idempotence (:148-168)
  test("oneshot: unshelve tombstone on normal transition; idempotent") {
    val (_, outs) = drive(
      activation(1, "a", ActivationKind.Active),
      overrideIn(2, "a", OverrideType.Shelved, oneshot = true),
      activation(3, "a", ActivationKind.NoActivation), // ttn while oneshot-shelved
      overrideIn(4, "a", OverrideType.Shelved, tomb = true)) // tombstone feedback
    assert(states(outs) == Seq(
      AlarmState.Active, AlarmState.NormalOneShotShelved, AlarmState.Normal))
    assert(emissions(outs) == Seq((OverrideType.Shelved, true)))
    // the suppressed record (step 3) emitted no effective state
    assert(outs(2).flatMap(_.effective).isEmpty)
  }

  // EffectiveStateRuleTest: NormalContinuousShelved
  test("continuous shelve: settles shelved and stays through normal transition") {
    val (_, outs) = drive(
      activation(1, "a", ActivationKind.Active),
      overrideIn(2, "a", OverrideType.Shelved, oneshot = false),
      activation(3, "a", ActivationKind.NoActivation))
    assert(states(outs) == Seq(
      AlarmState.Active, AlarmState.NormalContinuousShelved,
      AlarmState.NormalContinuousShelved))
    assert(emissions(outs).isEmpty)
  }

  test("precedence: disabled beats shelved beats latched within the chain") {
    val (_, outs) = drive(
      activation(1, "a", ActivationKind.Active),
      overrideIn(2, "a", OverrideType.Latched),
      overrideIn(3, "a", OverrideType.Shelved, oneshot = false),
      overrideIn(4, "a", OverrideType.Disabled))
    assert(states(outs) == Seq(
      AlarmState.Active, AlarmState.ActiveLatched,
      AlarmState.NormalContinuousShelved, AlarmState.NormalDisabled))
  }

  test("re-activation after latch clear does not re-latch a non-latchable alarm") {
    val (_, outs) = drive(
      instance(1, "a"),
      activation(2, "a", ActivationKind.Active))
    assert(states(outs) == Seq(AlarmState.Normal, AlarmState.Active))
    assert(emissions(outs).isEmpty)
  }
}
