package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.OverrideType

/**
 * T5 mask rule — EXPERIMENTAL. The reference ships this rule unwired and
 * untested with TODOs (`MaskRule.java:82-84,195,215`); we implement the
 * documented intent: an alarm whose `maskedby` parent is active gets a
 * Masked override; when the parent returns to normal while the child is
 * masked, an unmask tombstone is emitted (`MaskRule.java:85-94,113-122`).
 *
 * Batch form: registrations carrying maskedby joined to the parent's
 * effective activation state. The parent side is the (small) distinct-alarm
 * table — broadcast; no shuffle of the child side.
 */
object MaskRule {

  /**
   * @param children (name, maskedby) registrations with a maskedby parent
   * @param effective (name, is_active, has_masked) current per-alarm state
   * @return (name, override_type, tombstone): Masked upserts for children of
   *         active parents; unmask tombstones for masked children of
   *         now-normal parents; others emit nothing
   */
  def maskEmissions(children: DataFrame, effective: DataFrame): DataFrame = {
    val parents = effective.select(
      col("name").as("parent_name"), col("is_active").as("parent_active"))
    val childState = effective.select(
      col("name"), col("has_masked"))
    children.filter(col("maskedby").isNotNull)
      .join(broadcast(parents), col("maskedby") === col("parent_name"), "left")
      .join(childState, Seq("name"), "left")
      .select(
        col("name"),
        lit(OverrideType.Masked).as("override_type"),
        coalesce(col("parent_active"), lit(false)).as("parent_active"),
        coalesce(col("has_masked"), lit(false)).as("has_masked"))
      .filter((col("parent_active") && !col("has_masked")) ||
        (!col("parent_active") && col("has_masked")))
      .select(
        col("name"),
        col("override_type"),
        (!col("parent_active")).as("tombstone"))
  }
}
