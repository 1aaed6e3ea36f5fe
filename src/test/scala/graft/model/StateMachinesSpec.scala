package graft.model

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure-logic tests mirroring the reference unit-test scenarios (SURVEY.md §5):
 * precedence ladder (EffectiveStateRuleTest), transition detect
 * (ActivationRuleTest transitions sequence), latch idempotence
 * (LatchRuleTest/OneShotRuleTest), expiration decisions
 * (ShelveExpirationRuleTest), plus ScalaCheck properties the reference never
 * had.
 */
class StateMachinesSpec extends AnyFunSuite {
  import StateMachines._

  private val active = Some(Activation(ActivationKind.Active))
  private val noAct = Some(Activation(ActivationKind.NoActivation))
  private def ov(t: String, oneshot: Boolean = false): AlarmOverride =
    AlarmOverride(t, oneshot = Some(oneshot), expiration = Some(12345L))
  private val noTrans = ProcessorTransitions()

  // --- precedence ladder -------------------------------------------------

  test("ladder: no activation, no overrides -> Normal") {
    assert(effectiveState(None, AlarmOverrideSet(), noTrans) == AlarmState.Normal)
  }

  test("ladder: NoActivation union counts as not active") {
    assert(effectiveState(noAct, AlarmOverrideSet(), noTrans) == AlarmState.Normal)
  }

  test("ladder: activation -> Active") {
    assert(effectiveState(active, AlarmOverrideSet(), noTrans) == AlarmState.Active)
  }

  test("ladder: Disabled beats everything") {
    val o = AlarmOverrideSet(
      disabled = Some(ov(OverrideType.Disabled)),
      filtered = Some(ov(OverrideType.Filtered)),
      latched = Some(ov(OverrideType.Latched)),
      masked = Some(ov(OverrideType.Masked)),
      offdelayed = Some(ov(OverrideType.OffDelayed)),
      ondelayed = Some(ov(OverrideType.OnDelayed)),
      shelved = Some(ov(OverrideType.Shelved)))
    assert(effectiveState(active, o, noTrans) == AlarmState.NormalDisabled)
  }

  test("ladder: precedence order Filtered > Masked > Shelved > OnDelayed > Latched > OffDelayed") {
    def st(o: AlarmOverrideSet) = effectiveState(active, o, noTrans)
    assert(st(AlarmOverrideSet(offdelayed = Some(ov(OverrideType.OffDelayed)))) == AlarmState.ActiveOffDelayed)
    assert(st(AlarmOverrideSet(
      offdelayed = Some(ov(OverrideType.OffDelayed)),
      latched = Some(ov(OverrideType.Latched)))) == AlarmState.ActiveLatched)
    assert(st(AlarmOverrideSet(
      latched = Some(ov(OverrideType.Latched)),
      ondelayed = Some(ov(OverrideType.OnDelayed)))) == AlarmState.NormalOnDelayed)
    assert(st(AlarmOverrideSet(
      ondelayed = Some(ov(OverrideType.OnDelayed)),
      shelved = Some(ov(OverrideType.Shelved)))) == AlarmState.NormalContinuousShelved)
    assert(st(AlarmOverrideSet(
      shelved = Some(ov(OverrideType.Shelved, oneshot = true)))) == AlarmState.NormalOneShotShelved)
    assert(st(AlarmOverrideSet(
      shelved = Some(ov(OverrideType.Shelved)),
      masked = Some(ov(OverrideType.Masked)))) == AlarmState.NormalMasked)
    assert(st(AlarmOverrideSet(
      masked = Some(ov(OverrideType.Masked)),
      filtered = Some(ov(OverrideType.Filtered)))) == AlarmState.NormalFiltered)
  }

  test("ladder: unshelving suppresses the shelved rung") {
    val o = AlarmOverrideSet(shelved = Some(ov(OverrideType.Shelved, oneshot = true)))
    val t = noTrans.copy(unshelving = true)
    assert(effectiveState(active, o, t) == AlarmState.Active)
  }

  test("ladder: latching flag forces ActiveLatched even without Latched override") {
    assert(effectiveState(active, AlarmOverrideSet(), noTrans.copy(latching = true)) ==
      AlarmState.ActiveLatched)
  }

  test("effectiveStateStep drops transitioning records") {
    val m = Monolog("a", transitions = noTrans.copy(latching = true))
    assert(effectiveStateStep(m).isEmpty)
    val settled = Monolog("a")
    assert(effectiveStateStep(settled).exists(_.notification.state == AlarmState.Normal))
  }

  test("ladder: exhaustive — every (activation, override-subset, flags) combo yields a documented state") {
    // 3 activations x 2^7 override subsets x 2 oneshot x 4 flag combos = 3072 cases
    for {
      act <- Seq(None, active, noAct)
      mask <- 0 until 128
      oneshot <- Seq(true, false)
      latching <- Seq(true, false)
      unshelving <- Seq(true, false)
    } {
      val present = OverrideType.all.zipWithIndex.collect {
        case (t, i) if (mask & (1 << i)) != 0 => ov(t, oneshot)
      }
      val set = AlarmOverrideSet.fromList(present)
      val st = effectiveState(act, set, noTrans.copy(latching = latching, unshelving = unshelving))
      assert(AlarmState.all.contains(st))
      // highest-precedence sanity: disabled present always wins
      if (set.disabled.isDefined) assert(st == AlarmState.NormalDisabled)
    }
  }

  // --- transition detect (T1) --------------------------------------------

  test("transition detect: none -> active -> active -> normal sequence") {
    val m0 = Monolog("a", notification = EffectiveNotification(activation = active))
    val (r1, s1) = detectTransitions(None, m0)
    assert(r1.transitions.transitionToActive && !r1.transitions.transitionToNormal)
    assert(s1 == active)
    val (r2, s2) = detectTransitions(s1, m0)
    assert(!r2.transitions.transitionToActive && !r2.transitions.transitionToNormal)
    assert(s2 == active)
    val mOff = Monolog("a", notification = EffectiveNotification(activation = noAct))
    val (r3, s3) = detectTransitions(s2, mOff)
    assert(!r3.transitions.transitionToActive && r3.transitions.transitionToNormal)
    assert(s3.isEmpty)
    val (r4, _) = detectTransitions(s3, mOff)
    assert(!r4.transitions.transitionToActive && !r4.transitions.transitionToNormal)
  }

  test("transition detect: NoActivation is normalized to empty state") {
    val m = Monolog("a", notification = EffectiveNotification(activation = noAct))
    val (r, s) = detectTransitions(None, m)
    assert(!r.transitions.transitionToActive && s.isEmpty)
  }

  // --- latch machine (T2) ------------------------------------------------

  private def latchable(m: Monolog): Monolog =
    m.copy(registration = EffectiveRegistration(action = Some(AlarmAction(latchable = true))))

  test("latch: transitionToActive starts latching; latched override clears it") {
    val m = latchable(Monolog("a", transitions = noTrans.copy(transitionToActive = true)))
    val (r1, s1) = latchStep(m, inProgress = false)
    assert(r1.transitions.latching && s1)
    // next record: latched override arrived
    val m2 = latchable(Monolog("a",
      notification = EffectiveNotification(overrides =
        AlarmOverrideSet(latched = Some(ov(OverrideType.Latched))))))
    val (r2, s2) = latchStep(m2, inProgress = s1)
    assert(!r2.transitions.latching && !s2)
  }

  test("latch: not latchable -> state untouched, no flag") {
    val m = Monolog("a", transitions = noTrans.copy(transitionToActive = true))
    val (r, s) = latchStep(m, inProgress = true)
    assert(!r.transitions.latching && s) // store preserved
  }

  test("latch: in-progress persists across unrelated records") {
    val m = latchable(Monolog("a"))
    val (r, s) = latchStep(m, inProgress = true)
    assert(r.transitions.latching && s)
  }

  test("latchEmits only for latchable + transitionToActive") {
    assert(latchEmits(latchable(Monolog("a", transitions = noTrans.copy(transitionToActive = true)))))
    assert(!latchEmits(Monolog("a", transitions = noTrans.copy(transitionToActive = true))))
    assert(!latchEmits(latchable(Monolog("a"))))
  }

  // --- ondelay machine (T3) ----------------------------------------------

  private def delayed(m: Monolog, secs: Long = 5L): Monolog =
    m.copy(registration =
      EffectiveRegistration(action = Some(AlarmAction(ondelayseconds = Some(secs)))))

  test("ondelay: emits override with expiration = now + seconds*1000") {
    val m = delayed(Monolog("a", transitions = noTrans.copy(transitionToActive = true)), 7L)
    val e = onDelayEmits(m, nowMillis = 1000L)
    assert(e.contains(AlarmOverride(OverrideType.OnDelayed, expiration = Some(8000L))))
    assert(onDelayEmits(delayed(Monolog("a"), 7L), 1000L).isEmpty)
    assert(onDelayEmits(Monolog("a", transitions = noTrans.copy(transitionToActive = true)), 1000L).isEmpty)
  }

  test("ondelay machine mirrors latch machine on its own guard") {
    val m = delayed(Monolog("a", transitions = noTrans.copy(transitionToActive = true)))
    val (r1, s1) = onDelayStep(m, inProgress = false)
    assert(r1.transitions.ondelaying && s1)
    val m2 = delayed(Monolog("a",
      notification = EffectiveNotification(overrides =
        AlarmOverrideSet(ondelayed = Some(ov(OverrideType.OnDelayed))))))
    val (r2, s2) = onDelayStep(m2, inProgress = s1)
    assert(!r2.transitions.ondelaying && !s2)
  }

  // --- oneshot machine (T4) ----------------------------------------------

  private def shelvedOneshot(m: Monolog): Monolog =
    m.copy(notification = EffectiveNotification(overrides =
      AlarmOverrideSet(shelved = Some(ov(OverrideType.Shelved, oneshot = true)))))

  test("oneshot: transitionToNormal while oneshot-shelved starts unshelving") {
    val m = shelvedOneshot(Monolog("a", transitions = noTrans.copy(transitionToNormal = true)))
    val (r, s) = oneShotStep(m, inProgress = false)
    assert(r.transitions.unshelving && s)
    assert(oneShotEmitsTombstone(m))
  }

  test("oneshot: store cleared when guard no longer holds (idempotence)") {
    // shelve removed -> even with in-progress true, flag off and store cleared
    val m = Monolog("a")
    val (r, s) = oneShotStep(m, inProgress = true)
    assert(!r.transitions.unshelving && !s)
  }

  test("oneshot: continuous shelve never unshelves") {
    val m = Monolog("a",
      notification = EffectiveNotification(overrides =
        AlarmOverrideSet(shelved = Some(ov(OverrideType.Shelved, oneshot = false)))),
      transitions = noTrans.copy(transitionToNormal = true))
    val (r, s) = oneShotStep(m, inProgress = false)
    assert(!r.transitions.unshelving && !s)
    assert(!oneShotEmitsTombstone(m))
  }

  // --- expiration (T8/T9) ------------------------------------------------

  test("expiration: future fires at expiration, past fires at +1s, tombstone/none never") {
    assert(expirationDelayMillis(Some(ov(OverrideType.Shelved)), 10000L).contains(2345L))
    assert(expirationDelayMillis(Some(ov(OverrideType.Shelved)), 99999L).contains(1000L))
    assert(expirationDelayMillis(Some(AlarmOverride(OverrideType.Shelved)), 0L).isEmpty)
    assert(expirationDelayMillis(None, 0L).isEmpty)
  }

  // --- joiners ------------------------------------------------------------

  test("override pivot: later override of same type wins") {
    val a = AlarmOverride(OverrideType.Shelved, comments = Some("first"))
    val b = AlarmOverride(OverrideType.Shelved, comments = Some("second"))
    val set = AlarmOverrideSet.fromList(Seq(a, b))
    assert(set.shelved.flatMap(_.comments).contains("second"))
  }

  test("J2 merge: registration kept from left, activation from right, rest defaulted") {
    val reg = registrationMonolog("a", Alarm(action = Some("cls")), Some(AlarmAction(latchable = true)))
    val dirty = reg.copy(transitions = noTrans.copy(latching = true))
    val merged = registeredAndActive("a", Some(dirty), active)
    assert(merged.registration.alarm.exists(_.action.contains("cls")))
    assert(merged.notification.activation == active)
    assert(merged.transitions == noTrans) // re-defaulted
    val unregistered = registeredAndActive("a", None, active)
    assert(unregistered.registration == EffectiveRegistration())
  }

  test("J3 merge: overrides pivoted in, left preserved else fresh") {
    val base = registrationMonolog("a", Alarm(), None)
    val merged = withOverrides("a", Some(base), Some(Seq(ov(OverrideType.Disabled))))
    assert(merged.notification.overrides.disabled.isDefined)
    val orphan = withOverrides("a", None, Some(Seq(ov(OverrideType.Masked))))
    assert(orphan.notification.overrides.masked.isDefined)
    assert(orphan.registration == EffectiveRegistration())
  }
}
