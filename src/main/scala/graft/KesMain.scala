package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.KubeEventOps
import graft.sources.KubeEventSource

/** The reference binary, re-expressed: tail a directory of k8s Event
  * JSON lines (the watch feed), derive time + cache key, dedup within
  * the cache TTL, emit one JSON line per new event
  * (`{"time":…,"kubernetes_event":…}`) — cisco-open/event-stream-
  * for-k8s's main loop as one Structured Streaming query.
  *
  *   runMain graft.KesMain <inDir> <outDir> <checkpointDir> [ttl] [--once]
  *
  * `CACHE_TTL` ⇔ the watermark delay (state expiry, tasks.rs:184);
  * `--once` processes the backlog and exits (Trigger.AvailableNow),
  * otherwise it runs as the daemon the reference is.
  */
object KesMain {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val checkpoint = args(2)
    val ttl = args.lift(3).filterNot(_ == "--once").getOrElse("1 hour")
    val once = args.contains("--once")

    val spark = GraftSession.local()
    val lines = KubeEventOps
      .streamPipeline(KubeEventSource.streamJsonLines(spark, in), cacheTtl = ttl)
      .select(col("line").as("value"))

    val writer = lines.writeStream
      .format("text")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

    val q = (if (once) writer.trigger(Trigger.AvailableNow()) else writer).start()
    q.awaitTermination()
    if (once) spark.stop()
  }
}
