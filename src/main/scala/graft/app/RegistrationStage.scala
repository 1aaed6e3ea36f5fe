package graft.app

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Alarm, AlarmAction}

/**
 * Streaming foreign-key join instances⋈classes with RETRIGGER semantics
 * (reference `RegistrationRule.java:91-97`): a class update re-emits every
 * member instance with the new defaults, exactly like the KTable FK join.
 *
 * Two keyed stages, mirroring Kafka Streams' FK-join subscription/response
 * topics:
 *
 *  - [[fkRoute]] (keyed by instance name) tracks each instance's current
 *    class and, when the FK re-points, emits a membership REMOVE for the
 *    old class alongside the upsert to the new one — otherwise a later
 *    update of the old class would re-emit a stale member.
 *  - [[enrich]] (keyed by class name) holds the latest class defaults plus
 *    the member set; instance arrivals emit one enriched registration,
 *    class arrivals re-emit ALL members (the retrigger).
 *
 * Records flow between stages (and into the main chain) through file
 * "topic" hops — the same durability-boundary architecture as the
 * reference's intermediate topics (`EffectiveProcessor.java:31-47`).
 * Instances without an action route to the reserved "" key and carry no
 * class defaults; instances of an unknown or tombstoned class carry
 * default-constructed [[AlarmAction]] (null-side of the reference's left
 * join).
 */
object RegistrationStage {

  import UnifiedAlarmRule.{AlarmInput, Kind}

  /** Raw instance changelog record (pre-FK-routing). */
  final case class InstanceRec(
      seq: Long, name: String, action: Option[String],
      location: Option[Seq[String]], tombstone: Boolean)

  /** Stage-2 input: class payload or routed instance membership record. */
  final case class RegInput(
      seq: Long,
      key: String, // class name; "" = classless instances
      isClass: Boolean,
      // class payload (isClass)
      latchable: Option[Boolean] = None,
      filterable: Option[Boolean] = None,
      ondelayseconds: Option[Long] = None,
      priority: Option[String] = None,
      classTombstone: Boolean = false,
      // instance payload (!isClass)
      instName: Option[String] = None,
      location: Option[Seq[String]] = None,
      instTombstone: Boolean = false,
      // false for FK re-point removals: maintain membership only, the new
      // class's upsert (same seq) supersedes downstream — emitting a
      // tombstone too would race it.
      emitDownstream: Boolean = true)

  /** Stage-1 state: where this instance's membership currently lives. */
  final case class FkState(key: String)

  /** Pure stage-1 step. */
  def fkStep(st: Option[FkState], in: InstanceRec): (Option[FkState], Seq[RegInput]) = {
    val newKey = in.action.getOrElse("")
    if (in.tombstone) {
      val key = st.map(_.key).getOrElse(newKey)
      (None, Seq(RegInput(in.seq, key, isClass = false,
        instName = Some(in.name), instTombstone = true)))
    } else {
      val removal = st.filter(_.key != newKey).map(old =>
        RegInput(in.seq, old.key, isClass = false,
          instName = Some(in.name), instTombstone = true, emitDownstream = false))
      (Some(FkState(newKey)),
        removal.toSeq :+ RegInput(in.seq, newKey, isClass = false,
          instName = Some(in.name), location = in.location))
    }
  }

  def fkRoute(instances: Dataset[InstanceRec]): Dataset[RegInput] = {
    val spark = instances.sparkSession
    import spark.implicits._
    instances.groupByKey(_.name)
      .flatMapGroupsWithState[FkState, RegInput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, records, state: GroupState[FkState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[RegInput]
          records.toSeq.sortBy(_.seq).foreach { in =>
            val (st2, o) = fkStep(st, in)
            st = st2
            out ++= o
          }
          st match {
            case Some(s) => state.update(s)
            case None => if (state.exists) state.remove()
          }
          out.result().iterator
      }
  }

  final case class ClsDefaults(
      latchable: Boolean, filterable: Boolean,
      ondelayseconds: Option[Long], priority: Option[String])

  /** A member instance as the class-keyed stage remembers it. */
  final case class Member(seq: Long, location: Seq[String])

  /** Stage-2 state: latest class defaults + member instances. */
  final case class RegState(
      cls: Option[ClsDefaults] = None,
      members: Map[String, Member] = Map.empty)

  private def enriched(seq: Long, key: String, name: String,
      location: Seq[String], cls: Option[ClsDefaults],
      subSeq: Long = 0L): AlarmInput =
    AlarmInput(seq, name, Kind.Instance,
      alarm = Some(Alarm(
        action = if (key.isEmpty) None else Some(key), location = location)),
      action =
        if (key.isEmpty) None
        else Some(cls.fold(AlarmAction())(c => AlarmAction(
          priority = c.priority, latchable = c.latchable,
          filterable = c.filterable, ondelayseconds = c.ondelayseconds))),
      subSeq = subSeq)

  /** Pure stage-2 step. */
  def enrichStep(st: RegState, in: RegInput): (RegState, Seq[AlarmInput]) =
    if (in.isClass) {
      val cls =
        if (in.classTombstone) None
        else Some(ClsDefaults(in.latchable.getOrElse(false),
          in.filterable.getOrElse(true), in.ondelayseconds, in.priority))
      val st2 = st.copy(cls = cls)
      // The retrigger: every member re-registers under the new defaults.
      // Emissions carry the MEMBER's registration seq, not the class seq:
      // instance identity dominates FK payload, so a pending FK re-point
      // (same instance, higher seq, still in stage-1 flight) must outrank
      // this re-emission — Kafka Streams' FK join gets the same guarantee
      // by validating subscription responses against the current instance.
      // Equal-seq ties (original vs retrigger of the same registration)
      // are disambiguated STRUCTURALLY: the re-emission carries the class
      // record's seq as subSeq (direct emissions carry 0), so the
      // downstream (seq, subSeq) sort orders it after the original without
      // relying on shuffle arrival order between stages — which holds
      // today only because both emissions leave the same stage-2 group,
      // and would silently break under an intermediate repartition.
      (st2, st.members.toSeq.sortBy(_._1).map { case (name, m) =>
        enriched(m.seq, in.key, name, m.location, cls, subSeq = in.seq)
      })
    } else {
      val name = in.instName.getOrElse("")
      if (in.instTombstone) {
        val st2 = st.copy(members = st.members - name)
        (st2,
          if (in.emitDownstream)
            Seq(AlarmInput(in.seq, name, Kind.Instance, tombstone = true))
          else Nil)
      } else {
        val loc = in.location.getOrElse(Nil)
        (st.copy(members = st.members + (name -> Member(in.seq, loc))),
          Seq(enriched(in.seq, in.key, name, loc, st.cls)))
      }
    }

  def enrich(inputs: Dataset[RegInput]): Dataset[AlarmInput] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs.groupByKey(_.key)
      .flatMapGroupsWithState[RegState, AlarmInput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, records, state: GroupState[RegState]) =>
          var st = state.getOption.getOrElse(RegState())
          val out = Seq.newBuilder[AlarmInput]
          records.toSeq.sortBy(_.seq).foreach { in =>
            val (st2, o) = enrichStep(st, in)
            st = st2
            out ++= o
          }
          state.update(st)
          out.result().iterator
      }
  }
}
