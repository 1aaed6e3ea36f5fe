package graft.model

import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/**
 * ScalaCheck property tests for the pure state machines (the SURVEY §5
 * "strictly more coverage" promise): invariants that must hold for EVERY
 * input, complementing the exhaustive fixed-point enumeration in
 * StateMachinesSpec. Uses raw ScalaCheck (no scalatest bridge on the
 * classpath): each property is checked for 300 cases.
 */
class StateMachinePropsSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val genOverride: Gen[Option[AlarmOverride]] = Gen.oneOf(
    Gen.const(None),
    Gen.oneOf(true, false).map(os =>
      Some(AlarmOverride(OverrideType.Shelved, None, Some(os), Some(1000L), None))))

  private val genOverrideSet: Gen[AlarmOverrideSet] = for {
    d <- genOverride; f <- genOverride; l <- genOverride; m <- genOverride
    off <- genOverride; on <- genOverride; sh <- genOverride
  } yield AlarmOverrideSet(d, f, l, m, off, on, sh)

  private val genActivation: Gen[Option[Activation]] = Gen.oneOf(
    None, Some(Activation(ActivationKind.Active)),
    Some(Activation(ActivationKind.NoActivation)),
    Some(Activation(ActivationKind.Epics)),
    Some(Activation(ActivationKind.Note)))

  private val genTransitions: Gen[ProcessorTransitions] = for {
    ta <- Arbitrary.arbBool.arbitrary; tn <- Arbitrary.arbBool.arbitrary
    la <- Arbitrary.arbBool.arbitrary; us <- Arbitrary.arbBool.arbitrary
  } yield ProcessorTransitions(ta, tn, latching = la, unshelving = us)

  test("effectiveState is total and always one of the 10 states") {
    val all = Set(AlarmState.Normal, AlarmState.Active, AlarmState.ActiveOffDelayed,
      AlarmState.ActiveLatched, AlarmState.NormalOnDelayed,
      AlarmState.NormalOneShotShelved, AlarmState.NormalContinuousShelved,
      AlarmState.NormalMasked, AlarmState.NormalFiltered, AlarmState.NormalDisabled)
    checkProp(Prop.forAll(genActivation, genOverrideSet, genTransitions) { (a, o, t) =>
      all.contains(StateMachines.effectiveState(a, o, t))
    })
  }

  test("precedence: disabled dominates everything; filtered dominates all but disabled") {
    checkProp(Prop.forAll(genActivation, genOverrideSet, genTransitions) { (a, o, t) =>
      val s = StateMachines.effectiveState(a, o, t)
      if (o.disabled.isDefined) s == AlarmState.NormalDisabled
      else if (o.filtered.isDefined) s == AlarmState.NormalFiltered
      else true
    })
  }

  test("no overrides and no transitions: state is exactly Active/Normal by activation") {
    checkProp(Prop.forAll(genActivation) { a =>
      val s = StateMachines.effectiveState(a, AlarmOverrideSet(), ProcessorTransitions())
      s == (if (ActivationKind.isReal(a)) AlarmState.Active else AlarmState.Normal)
    })
  }

  test("detectTransitions over any activation sequence: flags alternate, never co-fire") {
    checkProp(Prop.forAll(Gen.listOf(genActivation)) { seq =>
      var prev: Option[Activation] = None
      var lastFlag = 0 // +1 = toActive, -1 = toNormal
      var ok = true
      seq.foreach { a =>
        val m = Monolog("x", notification = EffectiveNotification(activation = a))
        val (out, next) = StateMachines.detectTransitions(prev, m)
        val ta = out.transitions.transitionToActive
        val tn = out.transitions.transitionToNormal
        if (ta && tn) ok = false // never co-fire
        if (ta) { if (lastFlag == 1) ok = false; lastFlag = 1 }
        if (tn) { if (lastFlag == -1) ok = false; lastFlag = -1 }
        prev = next
      }
      ok
    })
  }

  test("latch automaton: guard gates, override clears, needTo sets, else sticky") {
    val genStep = for {
      guard <- Arbitrary.arbBool.arbitrary
      overridden <- Arbitrary.arbBool.arbitrary
      needTo <- Arbitrary.arbBool.arbitrary
    } yield (guard, overridden, needTo)
    checkProp(Prop.forAll(Gen.listOf(genStep)) { steps =>
      var inProgress = false
      var ok = true
      steps.foreach { case (guard, overridden, needTo) =>
        val was = inProgress
        val (flag, next) = StateMachines.inProgressStep(guard, inProgress, overridden, needTo)
        if (!guard) { if (next != was || flag) ok = false }
        else if (overridden) { if (next) ok = false }
        else if (needTo) { if (!next || !flag) ok = false }
        else if (next != was) ok = false
        inProgress = next
      }
      ok
    })
  }

  test("inProgressStep is idempotent: re-applying the same input is a no-op") {
    checkProp(Prop.forAll { (g: Boolean, ip: Boolean, ov: Boolean, need: Boolean) =>
      val (f1, s1) = StateMachines.inProgressStep(g, ip, ov, need)
      val (f2, s2) = StateMachines.inProgressStep(g, s1, ov, need)
      s2 == s1 && (!g || f2 == f1)
    })
  }

  test("effectiveStateStep: suppresses exactly the transitioning records") {
    checkProp(Prop.forAll(genActivation, genOverrideSet, genTransitions) { (a, o, t) =>
      val m = Monolog("x",
        notification = EffectiveNotification(activation = a, overrides = o),
        transitions = t)
      val out = StateMachines.effectiveStateStep(m)
      out.isEmpty == StateMachines.isTransitioning(t) &&
        out.forall(_.notification.state == StateMachines.effectiveState(a, o, t))
    })
  }
}
