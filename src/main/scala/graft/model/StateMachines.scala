package graft.model

/**
 * Pure per-alarm state machines — the semantic core of the engine.
 *
 * Every rule in the reference boils down to one of these pure functions plus
 * a tiny bit of per-key state; keeping them pure means the exact same logic
 * backs both the batch (DataFrame) and streaming (flatMapGroupsWithState)
 * paths, and is trivially unit/property-testable with no Spark session.
 *
 * Reference semantics ported (behavior only, not code):
 *  - effective state ladder: `EffectiveStateRule.java:150-223`
 *  - activation transition detect: `ActivationRule.java:323-429`
 *  - latch / ondelay in-progress machines: `LatchRule.java:160-208`,
 *    `OnDelayRule.java:168-216`
 *  - oneshot unshelve machine: `OneShotRule.java:160-195`
 *  - shelve/ondelay expiration: `ShelveExpirationRule.java:121-169`
 */
object StateMachines {

  /**
   * True when the monolog is mid-transition and must be suppressed from the
   * effective outputs (reference drops these records so downstream only sees
   * settled states, `EffectiveStateRule.java:150-170`).
   */
  def isTransitioning(t: ProcessorTransitions): Boolean =
    t.latching || t.offdelaying || t.ondelaying || t.unshelving || t.masking || t.unmasking

  /**
   * The override precedence ladder. A straight sequence of condition checks
   * where the LAST matching rung wins (increasing precedence; Disabled is
   * highest) — exactly the if-chain at `EffectiveStateRule.java:176-221`.
   */
  def effectiveState(
      activation: Option[Activation],
      overrides: AlarmOverrideSet,
      transitions: ProcessorTransitions): String = {
    var state = AlarmState.Normal
    if (ActivationKind.isReal(activation)) state = AlarmState.Active
    if (overrides.offdelayed.isDefined) state = AlarmState.ActiveOffDelayed
    if (transitions.latching || overrides.latched.isDefined) state = AlarmState.ActiveLatched
    if (overrides.ondelayed.isDefined) state = AlarmState.NormalOnDelayed
    if (overrides.shelved.isDefined && !transitions.unshelving) {
      state =
        if (overrides.shelved.exists(_.oneshot.contains(true))) AlarmState.NormalOneShotShelved
        else AlarmState.NormalContinuousShelved
    }
    if (overrides.masked.isDefined) state = AlarmState.NormalMasked
    if (overrides.filtered.isDefined) state = AlarmState.NormalFiltered
    if (overrides.disabled.isDefined) state = AlarmState.NormalDisabled
    state
  }

  /**
   * T6 end-to-end: drop transitioning records, else stamp the computed state.
   * Returns None for suppressed (intermediate) records.
   */
  def effectiveStateStep(m: Monolog): Option[Monolog] =
    if (isTransitioning(m.transitions)) None
    else {
      val st = effectiveState(m.notification.activation, m.notification.overrides, m.transitions)
      Some(m.copy(notification = m.notification.copy(state = st)))
    }

  /**
   * T1 activation transition detect. `previous` is the per-key stored
   * activation; returns (flags-patched monolog, next stored value).
   * NoActivation is normalized to None so "defined" always means truly active
   * (`ActivationRule.java:392-414`).
   */
  def detectTransitions(
      previous: Option[Activation],
      m: Monolog): (Monolog, Option[Activation]) = {
    val next = m.notification.activation.filter(_.union != ActivationKind.NoActivation)
    val toActive = previous.isEmpty && next.isDefined
    val toNormal = previous.isDefined && next.isEmpty
    val out = m.copy(transitions = m.transitions.copy(
      transitionToActive = toActive, transitionToNormal = toNormal))
    (out, next)
  }

  /**
   * T2/T3 shared in-progress machine (latching and ondelaying are the same
   * automaton over different guard fields, `LatchRule.java:178-196` /
   * `OnDelayRule.java:186-205`):
   *   guarded?   -> untouched (state preserved, no flag)
   *   overridden -> in-progress cleared
   *   needTo     -> in-progress set
   * Returns (flagOn, newInProgress). Callers persist newInProgress and set
   * the corresponding transitions flag when flagOn.
   */
  def inProgressStep(
      guard: Boolean,
      inProgress: Boolean,
      overridden: Boolean,
      needTo: Boolean): (Boolean, Boolean) =
    if (!guard) (false, inProgress)
    else {
      val next =
        if (overridden) false
        else if (needTo) true
        else inProgress
      (next, next)
    }

  /** T2 latch machine: guard = action.latchable (`LatchRule.java:160-208`). */
  def latchStep(m: Monolog, inProgress: Boolean): (Monolog, Boolean) = {
    val guard = m.registration.action.exists(_.latchable)
    val (flag, next) = inProgressStep(
      guard,
      inProgress,
      overridden = m.notification.overrides.latched.isDefined,
      needTo = m.transitions.transitionToActive)
    (if (flag) m.copy(transitions = m.transitions.copy(latching = true)) else m, next)
  }

  /** Should the latch rule emit a Latched override for this record (`LatchRule.java:79-102`)? */
  def latchEmits(m: Monolog): Boolean =
    m.registration.action.exists(_.latchable) && m.transitions.transitionToActive

  /** T3 ondelay machine: guard = ondelayseconds > 0 (`OnDelayRule.java:168-216`). */
  def onDelayStep(m: Monolog, inProgress: Boolean): (Monolog, Boolean) = {
    val guard = m.registration.action.exists(_.ondelayseconds.exists(_ > 0))
    val (flag, next) = inProgressStep(
      guard,
      inProgress,
      overridden = m.notification.overrides.ondelayed.isDefined,
      needTo = m.transitions.transitionToActive)
    (if (flag) m.copy(transitions = m.transitions.copy(ondelaying = true)) else m, next)
  }

  /**
   * Should the ondelay rule emit an OnDelayed override, and with what
   * expiration, given wall-clock `nowMillis` (`OnDelayRule.java:79-106`)?
   */
  def onDelayEmits(m: Monolog, nowMillis: Long): Option[AlarmOverride] =
    m.registration.action.flatMap(_.ondelayseconds).filter(_ > 0) match {
      case Some(secs) if m.transitions.transitionToActive =>
        Some(AlarmOverride(OverrideType.OnDelayed, expiration = Some(nowMillis + secs * 1000)))
      case _ => None
    }

  /**
   * T4 oneshot unshelve machine (`OneShotRule.java:160-195`). Unlike
   * latch/ondelay, the store is ALWAYS written (cleared when the guard does
   * not hold). Returns (flagged monolog, newInProgress).
   */
  def oneShotStep(m: Monolog, inProgress: Boolean): (Monolog, Boolean) = {
    val shelvedOneshot =
      m.notification.overrides.shelved.exists(_.oneshot.contains(true))
    val unshelving =
      shelvedOneshot && (inProgress || m.transitions.transitionToNormal)
    val out =
      if (unshelving) m.copy(transitions = m.transitions.copy(unshelving = true)) else m
    (out, unshelving)
  }

  /**
   * Should the oneshot rule emit a Shelved TOMBSTONE (unshelve) for this
   * record (`OneShotRule.java:79-100`)?
   */
  def oneShotEmitsTombstone(m: Monolog): Boolean =
    m.notification.overrides.shelved.exists(_.oneshot.contains(true)) &&
      m.transitions.transitionToNormal

  /**
   * T8/T9 expiration timer decision for a Shelved/OnDelayed/OffDelayed
   * override record. Returns the delay in MILLIS until the tombstone should
   * fire, or None when no timer is needed (tombstone input, no expiration).
   * Past-due expirations fire after a minimum 1s delay
   * (`ShelveExpirationRule.java:137-149`).
   */
  def expirationDelayMillis(
      value: Option[AlarmOverride],
      nowMillis: Long): Option[Long] =
    value.flatMap(_.expiration).filter(_ > 0).map { exp =>
      if (exp <= nowMillis) 1000L else exp - nowMillis
    }

  /**
   * J1 class-defaults join result: initial monolog from instance + optional
   * class (`RegistrationRule.java:135-161`). Notification defaulted to
   * state=Normal / no activation / empty overrides.
   */
  def registrationMonolog(name: String, alarm: Alarm, action: Option[AlarmAction]): Monolog =
    Monolog(
      name,
      registration = EffectiveRegistration(alarm = Some(alarm), action = action),
      notification = EffectiveNotification(),
      transitions = ProcessorTransitions())

  /**
   * J2 outer-join merge of registered monolog and activation
   * (`ActivationRule.java:166-197`): registration kept from the left (when
   * present), activation from the right, everything else re-defaulted.
   */
  def registeredAndActive(
      name: String,
      registered: Option[Monolog],
      active: Option[Activation]): Monolog =
    Monolog(
      name,
      registration = registered.map(_.registration).getOrElse(EffectiveRegistration()),
      notification = EffectiveNotification(activation = active),
      transitions = ProcessorTransitions())

  /**
   * J3 outer-join merge of (registered+active) with the aggregated override
   * list (`ActivationRule.java:199-275`): left preserved when present, with
   * overrides replaced by the pivoted set; otherwise a fresh empty monolog
   * carrying only the overrides.
   */
  def withOverrides(
      name: String,
      registeredAndActive: Option[Monolog],
      overrides: Option[Seq[AlarmOverride]]): Monolog = {
    val set = AlarmOverrideSet.fromList(overrides.getOrElse(Nil))
    registeredAndActive match {
      case Some(m) => m.copy(notification = m.notification.copy(overrides = set))
      case None =>
        Monolog(name, notification = EffectiveNotification(overrides = set))
    }
  }

  /**
   * T1 tombstone protection: a deleted monolog becomes an empty non-null
   * monolog rather than disappearing (`ActivationRule.java:360-385`).
   */
  def emptyMonolog(name: String): Monolog = Monolog(name)
}
