package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.OverrideType
import graft.ops.{EffectiveStateOp, KTableOps}

/**
 * Batch form of the full effective-alarm dataflow (SURVEY.md §3.2): the
 * answer to "what is the effective state of every alarm right now" given
 * changelog tables. The streaming path reuses the same per-key semantics via
 * graft.streaming; this relational form lets Catalyst plan the whole thing
 * (pushdown, broadcast, partial agg) and is what the bench runs at scale.
 *
 * Expected input schemas:
 *  - activations changelog: (seq: long, name: long, union: string)
 *  - instances (compacted):  (name: long, class_key: int/long, ...)
 *  - classes (dimension):    (class_key, latchable: bool, filterable: bool,
 *                             ondelayseconds: long?, priority: string)
 *  - overrides changelog:    (seq: long, name: long, override_type: string,
 *                             oneshot: bool?, expiration: long?, tombstone: bool)
 *
 * Scale design: every stage keys on `name`; the classes dim is broadcast
 * (J1); the override pivot is a single conditional aggregation (no
 * `pivot()` round trip, no second scan); the only window is the activation
 * lag, whose shuffle partitioning (`name`) is reused by the following
 * aggregate, so the whole pipeline is ~2 shuffles of the big inputs.
 */
object AlarmPipeline {

  /**
   * T1 batch form: per alarm, the latest activation plus transition flags
   * computed against the previous changelog record (reference
   * `ActivationRule.java:400-414`; NoActivation normalized to inactive).
   * Output: (name, is_active, transition_to_active, transition_to_normal).
   */
  def currentActivations(activations: DataFrame): DataFrame = {
    val w = Window.partitionBy("name").orderBy("seq")
    val withPrev = activations
      // Any non-NoActivation variant (Activation, EPICSActivation,
      // NoteActivation, ...) counts as active, matching the reference's
      // isReal check (`ActivationRule.java:392-395`) and
      // StateMachines.detectTransitions; null-safe so a null union row
      // (tombstone) stays inactive.
      .withColumn("is_active",
        col("union").isNotNull && col("union") =!= "NoActivation")
      .withColumn("prev_active", coalesce(lag(col("is_active"), 1).over(w), lit(false)))
    KTableOps.latestByKey(withPrev, Seq("name"), Seq("seq"))
      .select(
        col("name"),
        col("is_active"),
        (!col("prev_active") && col("is_active")).as("transition_to_active"),
        (col("prev_active") && !col("is_active")).as("transition_to_normal"))
  }

  /**
   * J1: instance registrations enriched with class defaults via broadcast
   * left join (reference FK-leftJoin `RegistrationRule.java:91-97`). Class
   * tables are small dimensions — never shuffle the fact side for them.
   */
  def registrations(instances: DataFrame, classes: DataFrame): DataFrame =
    instances.join(broadcast(classes), Seq("class_key"), "left")
      .select(
        col("name"),
        col("class_key"),
        coalesce(col("latchable"), lit(false)).as("latchable"),
        coalesce(col("filterable"), lit(true)).as("filterable"),
        col("ondelayseconds"),
        col("priority"))

  /**
   * A1 + J3 pivot: compact the overrides changelog per (name, type), drop
   * tombstones, then pivot the surviving overrides into the 7-slot set as
   * one conditional aggregation (reference list-aggregate + instanceof
   * fan-out, `ActivationRule.java:277-314` / `:199-275`).
   * Output: name + is_<type> booleans + shelved payload columns.
   */
  def overrideSet(overrides: DataFrame): DataFrame = {
    // ONE shuffle: per-type latest is max_by over rows of that type (null
    // ordering keys are ignored by max_by), so the (name, type) compaction
    // and the per-name pivot collapse into a single hash aggregate with
    // map-side partial aggregation — no separate (name, type) shuffle.
    def latestOfType(t: String, payload: org.apache.spark.sql.Column) =
      max_by(payload, when(col("override_type") === t, col("seq")))
    val slots = OverrideType.all.map { t =>
      (latestOfType(t, !col("tombstone")).as(s"has_${t.toLowerCase}"))
    }
    val payload = Seq(
      latestOfType(OverrideType.Shelved,
        when(!col("tombstone"), col("oneshot"))).as("shelved_oneshot"),
      latestOfType(OverrideType.Shelved,
        when(!col("tombstone"), col("expiration"))).as("shelved_expiration"))
    val agg = overrides.groupBy("name").agg((slots ++ payload).head, (slots ++ payload).tail: _*)
    val withBools = OverrideType.all.foldLeft(agg) { (df, t) =>
      val c = s"has_${t.toLowerCase}"
      df.withColumn(c, coalesce(col(c), lit(false)))
    }
    // names whose every override is currently tombstoned still appear here
    // (with all-false slots); the previous two-stage form dropped them.
    // Downstream coalesces defaults, so keep only names with >= 1 override
    // in force for parity with changelog-compaction semantics.
    withBools.filter(
      OverrideType.all.map(t => col(s"has_${t.toLowerCase}")).reduce(_ || _))
  }

  /**
   * The full composed dataflow: J1 -> J2 (full outer with activations) ->
   * J3 (full outer with override set) -> T2/T3/T4 flag derivation -> T6
   * ladder, with mid-transition records suppressed.
   *
   * Batch flag semantics: at snapshot time the in-progress stores (latch /
   * ondelay / oneshot) hold exactly "this record started the transition and
   * no override has landed yet", i.e.:
   *   latching   = latchable          && transition_to_active && !latched
   *   ondelaying = ondelayseconds > 0 && transition_to_active && !ondelayed
   *   unshelving = shelved && oneshot && transition_to_normal
   */
  def effectiveAlarms(
      instances: DataFrame,
      classes: DataFrame,
      activations: DataFrame,
      overrides: DataFrame): DataFrame =
    effectiveAlarmsFull(instances, classes, activations, overrides)
      .select("name", "class_key", "priority", "is_active", "state")

  /** Same dataflow, full column set (flags + override payloads + state). */
  def effectiveAlarmsFull(
      instances: DataFrame,
      classes: DataFrame,
      activations: DataFrame,
      overrides: DataFrame): DataFrame = {
    val reg = registrations(instances, classes)
    val act = currentActivations(activations)
    val ovs = overrideSet(overrides)

    val joined = reg
      .join(act, Seq("name"), "full_outer")
      .join(ovs, Seq("name"), "full_outer")
      .select(
        col("name"),
        col("class_key"),
        coalesce(col("latchable"), lit(false)).as("latchable"),
        coalesce(col("filterable"), lit(true)).as("filterable"),
        col("ondelayseconds"),
        col("priority"),
        coalesce(col("is_active"), lit(false)).as("is_active"),
        coalesce(col("transition_to_active"), lit(false)).as("transition_to_active"),
        coalesce(col("transition_to_normal"), lit(false)).as("transition_to_normal"),
        coalesce(col("has_disabled"), lit(false)).as("has_disabled"),
        coalesce(col("has_filtered"), lit(false)).as("has_filtered"),
        coalesce(col("has_latched"), lit(false)).as("has_latched"),
        coalesce(col("has_masked"), lit(false)).as("has_masked"),
        coalesce(col("has_offdelayed"), lit(false)).as("has_offdelayed"),
        coalesce(col("has_ondelayed"), lit(false)).as("has_ondelayed"),
        coalesce(col("has_shelved"), lit(false)).as("has_shelved"),
        coalesce(col("shelved_oneshot"), lit(false)).as("shelved_oneshot"),
        col("shelved_expiration"))

    val flagged = joined
      .withColumn("latching",
        col("latchable") && col("transition_to_active") && !col("has_latched"))
      .withColumn("ondelaying",
        coalesce(col("ondelayseconds") > 0, lit(false)) &&
          col("transition_to_active") && !col("has_ondelayed"))
      .withColumn("unshelving",
        col("has_shelved") && col("shelved_oneshot") && col("transition_to_normal"))

    flagged
      .filter(!EffectiveStateOp.isTransitioningCol(
        col("latching"), col("ondelaying"), lit(false),
        col("unshelving"), lit(false), lit(false)))
      .withColumn("state", EffectiveStateOp.effectiveStateCol(
        isActive = col("is_active"),
        offdelayed = col("has_offdelayed"),
        latchedOrLatching = col("has_latched") || col("latching"),
        ondelayed = col("has_ondelayed"),
        shelved = col("has_shelved"),
        shelvedOneshot = col("shelved_oneshot"),
        unshelving = col("unshelving"),
        masked = col("has_masked"),
        filtered = col("has_filtered"),
        disabled = col("has_disabled")))
  }
}
