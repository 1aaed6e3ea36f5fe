package graft.app

import org.scalatest.funsuite.AnyFunSuite

import graft.app.RegistrationStage._
import graft.app.UnifiedAlarmRule.Kind

/**
 * FK-join semantics at the pure-step level (reference
 * `RegistrationRule.java:91-97`): class updates retrigger members, FK
 * re-points migrate membership without racing tombstones, class deletes
 * degrade members to default-constructed actions.
 */
class RegistrationStageSpec extends AnyFunSuite {

  private def inst(seq: Long, name: String, action: Option[String]) =
    InstanceRec(seq, name, action, Some(Seq("hallA")), tombstone = false)

  private def cls(seq: Long, key: String, latchable: Boolean) =
    RegInput(seq, key, isClass = true, latchable = Some(latchable),
      filterable = Some(true), priority = Some("P3"))

  test("fkStep: first registration routes to the action's class") {
    val (st, out) = fkStep(None, inst(1, "a1", Some("base")))
    assert(st.contains(FkState("base")))
    assert(out.map(o => (o.key, o.instTombstone, o.emitDownstream)) ==
      Seq(("base", false, true)))
  }

  test("fkStep: FK re-point removes old membership WITHOUT downstream emit") {
    val (st, out) = fkStep(Some(FkState("base")), inst(5, "a1", Some("critical")))
    assert(st.contains(FkState("critical")))
    assert(out.map(o => (o.key, o.instTombstone, o.emitDownstream)) ==
      Seq(("base", true, false), ("critical", false, true)))
  }

  test("fkStep: instance tombstone removes from the CURRENT class, downstream-visible") {
    val (st, out) = fkStep(Some(FkState("critical")),
      InstanceRec(9, "a1", Some("base"), None, tombstone = true))
    assert(st.isEmpty)
    assert(out.map(o => (o.key, o.instTombstone, o.emitDownstream)) ==
      Seq(("critical", true, true)))
  }

  test("fkStep: classless instance routes to the reserved empty key") {
    val (st, out) = fkStep(None, inst(1, "a1", None))
    assert(st.contains(FkState("")))
    assert(out.head.key == "")
  }

  test("enrichStep: instance before class gets default-constructed action") {
    val (st, out) = enrichStep(RegState(),
      RegInput(1, "base", isClass = false, instName = Some("a1"),
        location = Some(Seq("hallA"))))
    assert(st.members == Map("a1" -> Member(1, Seq("hallA"))))
    val in = out.head
    assert(in.kind == Kind.Instance && in.name == "a1")
    assert(in.action.exists(a => !a.latchable && a.filterable && a.priority.isEmpty))
    assert(in.alarm.exists(_.action.contains("base")))
  }

  test("enrichStep: class update RE-EMITS every member with new defaults") {
    val st0 = RegState(
      cls = Some(ClsDefaults(latchable = false, filterable = true, None, Some("P3"))),
      members = Map("a1" -> Member(3, Seq("hallA")), "a2" -> Member(4, Nil)))
    val (st1, out) = enrichStep(st0, cls(40, "base", latchable = true))
    assert(st1.cls.exists(_.latchable))
    assert(out.map(_.name).sorted == Seq("a1", "a2"))
    // retriggers carry each MEMBER's registration seq: a pending FK
    // re-point of the same instance (higher instance seq) must outrank
    // this re-emission downstream
    assert(out.map(o => (o.name, o.seq)).sorted == Seq(("a1", 3L), ("a2", 4L)))
    assert(out.forall(_.action.exists(_.latchable)))
    assert(out.find(_.name == "a1").flatMap(_.alarm).exists(_.location == Seq("hallA")))
  }

  test("enrichStep: stale-member retrigger cannot outrank a pending FK re-point") {
    // instance a1 re-pointed base->critical at seq 5 (still in stage-1
    // flight when class base updates at seq 6): the retrigger must emit
    // with a1's old seq (3), losing to the seq-5 upsert downstream
    val st0 = RegState(cls = None, members = Map("a1" -> Member(3, Nil)))
    val (_, out) = enrichStep(st0, cls(6, "base", latchable = true))
    assert(out.map(_.seq) == Seq(3L))
  }

  test("enrichStep: class tombstone degrades members to defaults") {
    val st0 = RegState(
      cls = Some(ClsDefaults(latchable = true, filterable = false, Some(5), Some("P1"))),
      members = Map("a1" -> Member(1, Nil)))
    val (st1, out) = enrichStep(st0, RegInput(50, "crit", isClass = true,
      classTombstone = true))
    assert(st1.cls.isEmpty)
    assert(out.head.action.exists(a =>
      !a.latchable && a.filterable && a.ondelayseconds.isEmpty))
  }

  test("enrichStep: re-point removal maintains membership silently") {
    val st0 = RegState(members = Map("a1" -> Member(1, Nil), "a2" -> Member(2, Nil)))
    val (st1, out) = enrichStep(st0, RegInput(7, "base", isClass = false,
      instName = Some("a1"), instTombstone = true, emitDownstream = false))
    assert(st1.members.keySet == Set("a2"))
    assert(out.isEmpty)
  }

  test("enrichStep: real tombstone emits downstream delete") {
    val st0 = RegState(members = Map("a1" -> Member(1, Nil)))
    val (st1, out) = enrichStep(st0, RegInput(8, "base", isClass = false,
      instName = Some("a1"), instTombstone = true))
    assert(st1.members.isEmpty)
    assert(out.map(o => (o.name, o.tombstone)) == Seq(("a1", true)))
  }

  test("full sequence: register, class-update, verify latchable flows through") {
    // stage 1
    val (fk1, routed1) = fkStep(None, inst(1, "a1", Some("base")))
    // stage 2: instance first, then class v1, then class v2 (retrigger)
    val (r1, out1) = enrichStep(RegState(), routed1.head)
    assert(out1.head.action.exists(!_.latchable))
    val (r2, out2) = enrichStep(r1, cls(2, "base", latchable = false))
    assert(out2.map(_.name) == Seq("a1") && out2.head.action.exists(!_.latchable))
    val (r3, out3) = enrichStep(r2, cls(3, "base", latchable = true))
    assert(out3.map(_.name) == Seq("a1"))
    assert(out3.head.action.exists(_.latchable), "retrigger applies new defaults")
    assert(fk1.nonEmpty && r3.members.size == 1)
  }
}
