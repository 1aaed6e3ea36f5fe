package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning applied. */
object GraftSession {

  /**
   * Local-mode session. `cores` threads stand in for executors; shuffle
   * partition count follows the parallelism (NOT the 200 default, which at
   * local scale just manufactures tiny tasks). On a real cluster the same
   * settings scale by letting AQE coalesce/split at runtime.
   */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Respect the advisory partition size instead of maximizing
      // parallelism when coalescing (the Spark tuning guide's
      // production recommendation): with parallelismFirst=true (the
      // default) AQE coalesces only down to tiny
      // minPartitionSize-bounded partitions "to maximize parallelism",
      // which manufactures per-task overhead at every scale — the
      // advisory size (64 MB default) is the scale-adaptive target.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /**
   * Read one of the driver-generated testdata tables.
   *
   * The `events.ts` column has shipped as both TIMESTAMP(NANOS) (surfaced as
   * nanos-since-epoch LongType via `nanosAsLong` — runtime-settable, so it
   * also works on an externally created session) and as plain
   * TIMESTAMP_NTZ/TIMESTAMP micros. The engine's internal contract is
   * nanos-since-epoch LongType, so a timestamp-typed `ts` is normalized back
   * to it here — the session timezone is pinned UTC, making the NTZ cast
   * instant-preserving and the values identical to what DuckDB's
   * `epoch_ms`/`epoch_us` see on the same file. Use [[tsMillis]]/[[tsMicros]]
   * to interpret it.
   */
  def table(spark: SparkSession, sfDir: String, name: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ->nanos normalization below is instant-preserving only under
    // a UTC session zone (unix_micros interprets the cast TIMESTAMP in the
    // session zone). Pinned HERE, not just in GraftSession.local's builder,
    // so the helper also holds on externally created sessions — both confs
    // are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
      case _ => df
    }
  }

  // Nanos->millis/micros must use integral DIV: Column./ is double division
  // and doubles cannot represent ~1.7e18 exactly.

  /** Nanos-since-epoch long column named `name` -> epoch millis (floor; equals DuckDB epoch_ms). */
  def tsMillis(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"CAST($name DIV 1000000 AS BIGINT)")

  /** Nanos-since-epoch long column named `name` -> TimestampType (floor to micros like DuckDB). */
  def tsMicros(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr(s"CAST($name DIV 1000 AS BIGINT)"))
}
