package org.apache.spark.sql

/**
 * Test-only bridge: `SparkSessionExtensions.registerFunctions` is
 * `private[sql]`, so applying an extensions instance to an EXISTING
 * session's registry (the only way to test injection deterministically
 * when the JVM-wide session was created by an earlier suite without the
 * extension config) needs a shim in this package.
 */
object GraftExtensionsBridge {
  def applyTo(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
