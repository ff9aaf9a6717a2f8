package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The k8s core/v1 Event surface (the reference's actual input,
  * kube-rs watcher over `Api<Event>` — /root/reference/src/tasks.rs:150).
  *
  * In Spark the watch feed arrives as JSON lines (Kafka value, file
  * stream, or a custom source); this module owns the Event schema and
  * the parse step for both batch (`readJsonLines`) and streaming
  * (`streamJsonLines`) — everything downstream (KubeEventOps) is
  * source-agnostic.
  */
object KubeEventSource {

  /** k8s core/v1 Event, the fields the reference touches + the usual
    * identifying set. Timestamps are RFC3339 strings in the wire form;
    * parsed to TimestampType here.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("name", StringType),
      StructField("namespace", StringType),
      StructField("uid", StringType),
      StructField("resourceVersion", StringType),
      StructField("creationTimestamp", TimestampType)))),
    StructField("involvedObject", StructType(Seq(
      StructField("kind", StringType),
      StructField("namespace", StringType),
      StructField("name", StringType),
      StructField("uid", StringType)))),
    StructField("reason", StringType),
    StructField("message", StringType),
    StructField("type", StringType),
    StructField("count", LongType),
    StructField("firstTimestamp", TimestampType),
    StructField("lastTimestamp", TimestampType),
    StructField("source", StructType(Seq(
      StructField("component", StringType),
      StructField("host", StringType))))))

  /** Parse a column of JSON lines into a `kubernetes_event` struct. */
  def parsed(lines: DataFrame, jsonCol: String = "value"): DataFrame =
    lines.select(from_json(col(jsonCol), eventSchema).as("kubernetes_event"))

  /** Batch: read a directory/file of JSON-line events. */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path))

  /** Streaming: watch a directory for new JSON-line files — the
    * list-then-watch ingestion shape (new files ≈ watch notifications).
    */
  def streamJsonLines(spark: SparkSession, path: String): DataFrame =
    parsed(spark.readStream.text(path))
}
