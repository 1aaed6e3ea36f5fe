package org.apache.spark.sql

/**
 * Test-only bridge: `SparkSessionExtensions.registerFunctions` /
 * `registerTableFunctions` are `private[sql]`, so applying an extensions
 * instance to an EXISTING session's registries (the only way to test
 * injection deterministically when the JVM-wide session was created by an
 * earlier suite without the extension config) needs a shim in this
 * package.
 */
object GraftExtensionsBridge {
  def applyTo(ext: SparkSessionExtensions, spark: SparkSession): Unit = {
    ext.registerFunctions(spark.sessionState.functionRegistry)
    ext.registerTableFunctions(spark.sessionState.tableFunctionRegistry)
  }
}
