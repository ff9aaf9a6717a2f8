package org.apache.spark.graftbridge

import org.apache.spark.internal.Logging

/** Compile-checked bridge to Spark's `private[spark]` structured-
  * logging switch (org.apache.spark.internal.Logging object). Spark 4
  * flips this itself from `spark.log.structuredLogging.enabled` at
  * SparkContext startup; a daemon that wants JSON logs from its very
  * first line (before any context exists) needs the switch directly —
  * hence this one-object package bridge, the conventional mechanism
  * for extensions that need a `private[spark]` API.
  */
object LoggingBridge {
  def enableJsonLogs(): Unit = Logging.enableStructuredLogging()
  def disableJsonLogs(): Unit = Logging.disableStructuredLogging()
  def jsonLogsEnabled: Boolean = Logging.isStructuredLoggingEnabled
}
