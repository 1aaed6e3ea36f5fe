package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.EventsAlarmAdapter

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventsAlarmAdapter.effectiveAlarms(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- alarm dataflow (SURVEY §2 operators over the events adapter) ----
    "jaws_effective_alarms" -> ((s, dir) =>
      EventsAlarmAdapter.effectiveAlarms(s, dir)
        .orderBy("name")),
    "jaws_latest_activation" -> ((s, dir) =>
      graft.rules.AlarmPipeline.currentActivations(
        EventsAlarmAdapter.activations(GraftSession.table(s, dir, "events")))
        .orderBy("name")),
    "jaws_override_set" -> ((s, dir) =>
      graft.rules.AlarmPipeline.overrideSet(
        EventsAlarmAdapter.overrides(GraftSession.table(s, dir, "events")))
        .orderBy("name")),
    "jaws_registrations" -> ((s, dir) =>
      graft.rules.AlarmPipeline.registrations(
        EventsAlarmAdapter.instances(GraftSession.table(s, dir, "events")),
        EventsAlarmAdapter.classes(GraftSession.table(s, dir, "region")))
        .orderBy("name")),

    // --- relational / bench surface --------------------------------------
    "tpch_q1" -> ((s, dir) => {
      val li = GraftSession.table(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("decimal(38,6)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("decimal(38,6)").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .cast("decimal(38,6)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "jaws_effective_alarms" ->
      s"""${Oracle.alarmCtes}
         |SELECT name, class_key, priority, is_active, state
         |FROM effective
         |ORDER BY name""".stripMargin,
    "jaws_latest_activation" ->
      s"""${Oracle.alarmCtes}
         |SELECT name, is_active, transition_to_active, transition_to_normal
         |FROM act_latest ORDER BY name""".stripMargin,
    "jaws_override_set" ->
      s"""${Oracle.alarmCtes}
         |SELECT name, has_disabled, has_filtered, has_latched, has_masked,
         |       has_ondelayed, has_offdelayed, has_shelved,
         |       shelved_oneshot, shelved_expiration
         |FROM ovr_set ORDER BY name""".stripMargin,
    "jaws_registrations" ->
      s"""${Oracle.alarmCtes}
         |SELECT name, class_key, latchable, filterable,
         |       CAST(ondelayseconds AS BIGINT) AS ondelayseconds, priority
         |FROM reg ORDER BY name""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}

/**
 * Shared DuckDB CTE text mirroring EventsAlarmAdapter + AlarmPipeline
 * stage-for-stage (the oracle for the alarm dataflow queries).
 */
object Oracle {
  val alarmCtes: String =
    """WITH act AS (
      |  SELECT user_id AS name, event_id AS seq,
      |         (event_type = 'error') AS is_active
      |  FROM events
      |), act_prev AS (
      |  SELECT name, seq, is_active,
      |         coalesce(lag(is_active) OVER (PARTITION BY name ORDER BY seq), false) AS prev_active
      |  FROM act
      |), act_latest AS (
      |  SELECT name,
      |         max_by(is_active, seq) AS is_active,
      |         max_by((NOT prev_active) AND is_active, seq) AS transition_to_active,
      |         max_by(prev_active AND NOT is_active, seq) AS transition_to_normal
      |  FROM act_prev GROUP BY name
      |), ovr AS (
      |  SELECT event_id AS seq, user_id AS name,
      |    CASE WHEN event_type IN ('signup', 'purchase') THEN 'Shelved'
      |         WHEN event_type = 'click' THEN 'Disabled'
      |         WHEN event_type = 'view' THEN 'Masked' END AS override_type,
      |    CASE WHEN event_type = 'signup' THEN value > 100 END AS oneshot,
      |    CASE WHEN event_type = 'signup' THEN epoch_ms(ts) + 60000 END AS expiration,
      |    CASE WHEN event_type = 'purchase' THEN true
      |         WHEN event_type = 'click' THEN value <= 150
      |         WHEN event_type = 'view' THEN value < 50
      |         ELSE false END AS tombstone
      |  FROM events
      |  WHERE event_type IN ('signup', 'purchase', 'click')
      |     OR (event_type = 'view' AND (value > 150 OR value < 50))
      |), ovr_latest AS (
      |  SELECT name, override_type,
      |         max_by(oneshot, seq) AS oneshot,
      |         max_by(expiration, seq) AS expiration,
      |         max_by(tombstone, seq) AS tombstone
      |  FROM ovr GROUP BY name, override_type
      |), ovr_current AS (
      |  SELECT * FROM ovr_latest WHERE NOT tombstone
      |), ovr_set AS (
      |  SELECT name,
      |    coalesce(max(override_type = 'Disabled'), false) AS has_disabled,
      |    coalesce(max(override_type = 'Filtered'), false) AS has_filtered,
      |    coalesce(max(override_type = 'Latched'), false) AS has_latched,
      |    coalesce(max(override_type = 'Masked'), false) AS has_masked,
      |    coalesce(max(override_type = 'OnDelayed'), false) AS has_ondelayed,
      |    coalesce(max(override_type = 'OffDelayed'), false) AS has_offdelayed,
      |    coalesce(max(override_type = 'Shelved'), false) AS has_shelved,
      |    max(CASE WHEN override_type = 'Shelved' THEN oneshot END) AS shelved_oneshot,
      |    max(CASE WHEN override_type = 'Shelved' THEN expiration END) AS shelved_expiration
      |  FROM ovr_current GROUP BY name
      |), inst AS (
      |  SELECT DISTINCT user_id AS name, CAST(user_id % 5 AS INTEGER) AS class_key
      |  FROM events WHERE user_id % 10 != 7
      |), cls AS (
      |  SELECT CAST(r_regionkey AS INTEGER) AS class_key,
      |         r_regionkey IN (0, 2) AS latchable,
      |         r_regionkey != 4 AS filterable,
      |         CASE WHEN r_regionkey = 1 THEN 5
      |              WHEN r_regionkey = 3 THEN 10 END AS ondelayseconds,
      |         'P' || r_regionkey AS priority
      |  FROM region
      |), reg AS (
      |  SELECT i.name, i.class_key,
      |         coalesce(c.latchable, false) AS latchable,
      |         coalesce(c.filterable, true) AS filterable,
      |         c.ondelayseconds, c.priority
      |  FROM inst i LEFT JOIN cls c ON i.class_key = c.class_key
      |), joined AS (
      |  SELECT coalesce(r.name, a.name, o.name) AS name,
      |         r.class_key,
      |         coalesce(r.latchable, false) AS latchable,
      |         coalesce(r.filterable, true) AS filterable,
      |         r.ondelayseconds, r.priority,
      |         coalesce(a.is_active, false) AS is_active,
      |         coalesce(a.transition_to_active, false) AS transition_to_active,
      |         coalesce(a.transition_to_normal, false) AS transition_to_normal,
      |         coalesce(o.has_disabled, false) AS has_disabled,
      |         coalesce(o.has_filtered, false) AS has_filtered,
      |         coalesce(o.has_latched, false) AS has_latched,
      |         coalesce(o.has_masked, false) AS has_masked,
      |         coalesce(o.has_offdelayed, false) AS has_offdelayed,
      |         coalesce(o.has_ondelayed, false) AS has_ondelayed,
      |         coalesce(o.has_shelved, false) AS has_shelved,
      |         coalesce(o.shelved_oneshot, false) AS shelved_oneshot,
      |         o.shelved_expiration
      |  FROM reg r
      |  FULL OUTER JOIN act_latest a ON r.name = a.name
      |  FULL OUTER JOIN ovr_set o ON coalesce(r.name, a.name) = o.name
      |), flagged AS (
      |  SELECT *,
      |    (latchable AND transition_to_active AND NOT has_latched) AS latching,
      |    (coalesce(ondelayseconds > 0, false) AND transition_to_active
      |       AND NOT has_ondelayed) AS ondelaying,
      |    (has_shelved AND shelved_oneshot AND transition_to_normal) AS unshelving
      |  FROM joined
      |), effective AS (
      |  SELECT name, class_key, priority, is_active,
      |    CASE WHEN has_disabled THEN 'NormalDisabled'
      |         WHEN has_filtered THEN 'NormalFiltered'
      |         WHEN has_masked THEN 'NormalMasked'
      |         WHEN has_shelved AND NOT unshelving THEN
      |           CASE WHEN shelved_oneshot THEN 'NormalOneShotShelved'
      |                ELSE 'NormalContinuousShelved' END
      |         WHEN has_ondelayed THEN 'NormalOnDelayed'
      |         WHEN has_latched OR latching THEN 'ActiveLatched'
      |         WHEN has_offdelayed THEN 'ActiveOffDelayed'
      |         WHEN is_active THEN 'Active'
      |         ELSE 'Normal' END AS state
      |  FROM flagged
      |  WHERE NOT (latching OR ondelaying OR unshelving)
      |)""".stripMargin
}
