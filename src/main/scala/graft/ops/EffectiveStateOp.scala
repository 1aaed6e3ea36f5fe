package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.AlarmState

/**
 * The effective-state precedence ladder as a pure Column expression (T6,
 * reference `EffectiveStateRule.java:176-221`) — fully codegen'd, no UDF.
 *
 * The reference evaluates rungs bottom-up with last-match-wins; expressed as
 * a CASE it becomes first-match-wins in REVERSE precedence order (Disabled
 * highest). The shelved rung is skipped while `unshelving` is in flight, and
 * `latching` in flight counts as latched, exactly as in the reference.
 */
object EffectiveStateOp {

  def effectiveStateCol(
      isActive: Column,
      offdelayed: Column,
      latchedOrLatching: Column,
      ondelayed: Column,
      shelved: Column,
      shelvedOneshot: Column,
      unshelving: Column,
      masked: Column,
      filtered: Column,
      disabled: Column): Column =
    when(disabled, AlarmState.NormalDisabled)
      .when(filtered, AlarmState.NormalFiltered)
      .when(masked, AlarmState.NormalMasked)
      .when(shelved && !unshelving,
        when(shelvedOneshot, AlarmState.NormalOneShotShelved)
          .otherwise(AlarmState.NormalContinuousShelved))
      .when(ondelayed, AlarmState.NormalOnDelayed)
      .when(latchedOrLatching, AlarmState.ActiveLatched)
      .when(offdelayed, AlarmState.ActiveOffDelayed)
      .when(isActive, AlarmState.Active)
      .otherwise(AlarmState.Normal)

  /**
   * Mid-transition suppression (reference `EffectiveStateRule.java:150-170`):
   * true when any in-flight transition flag is set.
   */
  def isTransitioningCol(
      latching: Column,
      ondelaying: Column,
      offdelaying: Column,
      unshelving: Column,
      masking: Column,
      unmasking: Column): Column =
    latching || ondelaying || offdelaying || unshelving || masking || unmasking
}
