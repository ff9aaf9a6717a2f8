package graft.streaming

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{EmittedEv, Ev}

/** Structured-Streaming re-expression of the reference pipeline
  * (SURVEY §2.A12–A15): watch stream → TTL-cache dedup → JSON to sink,
  * plus windowed label counts (the Prometheus side).
  *
  * All transforms are source-agnostic (take the event stream as a
  * Dataset/DataFrame) so they compose over any readStream source — the
  * k8s watch feed would arrive via a custom source or Kafka in
  * production; tests drive them with MemoryStream, which is exactly the
  * list-then-watch shape of the reference's watcher (tasks.rs:150).
  */
object EventStreamJob {

  /** Composite key, as in the batch ops (types.rs:21 analog). */
  private def evKey = concat(col("user_id").cast("string"), lit(":"), col("event_type"))

  /** A13: streaming exact dedup — dropDuplicatesWithinWatermark on the
    * composite key: state is bounded by the watermark delay (the
    * CACHE_TTL analog), exactly the reference's bounded sled cache.
    */
  def streamDedupWatermark(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("key", evKey)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("key")

  /** A14: streaming windowed label counts (Prometheus events_count as a
    * time series) — tumbling 1h windows, append once the watermark
    * closes a window.
    */
  def streamWindowedCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** A19: streaming session windows — the engine-native form of the
    * batch sessionization (EventOps.evSessionize): sessions close when
    * the watermark passes start + gap.
    */
  def streamSessionWindows(events: DataFrame, gap: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** A20: stream-stream interval join — attach each purchase to the
    * same user's click within the preceding hour. Both sides
    * watermarked; the time-bound condition lets the engine expire join
    * state (bounded memory at 100 TB/day rates).
    */
  def streamClickToPurchase(events: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
  }

  final case class TtlState(lastEmitMicros: Long)

  /** A12: the reference's TTL cache as streaming state
    * (flatMapGroupsWithState): emit iff no same-key event was emitted
    * within the TTL (tasks.rs:98); idle state evicted via event-time
    * timeout (the clean_cache loop, tasks.rs:184). State per key is a
    * single long — O(keys) memory, watermark-bounded.
    */
  def streamTtlCache(events: Dataset[Ev], ttlHours: Long = 24,
      watermarkDelay: String = "1 hour"): Dataset[EmittedEv] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMicros = ttlHours * 3600L * 1000000L

    def micros(i: Instant): Long = ChronoUnit.MICROS.between(Instant.EPOCH, i)

    def fn(key: String, it: Iterator[Ev], state: GroupState[TtlState]): Iterator[EmittedEv] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var last = state.getOption.map(_.lastEmitMicros)
        val out = sorted.flatMap { e =>
          val m = micros(e.ts)
          if (last.forall(l => m >= l + ttlMicros)) {
            last = Some(m)
            Some(EmittedEv(key, e.ts, e.event_id))
          } else None
        }
        last.foreach { l =>
          state.update(TtlState(l))
          // evict once the watermark passes lastEmit + TTL — after that
          // point the cache entry can never suppress again (tasks.rs:196)
          state.setTimeoutTimestamp((l + ttlMicros) / 1000L)
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => s"${e.user_id}:${e.event_type}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** A25: idempotent keyed upsert sink — the ELK-indexing pattern: the
    * windowed counts stream in update mode, each micro-batch MERGEd
    * into a keyed store with a batch-id high-watermark so re-delivered
    * batches (restart replay) apply exactly once. `upsert` abstracts
    * the store (tests use a map; production an index/JDBC MERGE).
    */
  def streamUpsertCounts(events: DataFrame, watermarkDelay: String = "30 minutes")(
      upsert: (Seq[((java.sql.Timestamp, String), Long)], Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    @volatile var committed = -1L
    streamWindowedCounts(events, watermarkDelay)
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > committed) { // replay guard → effectively-once
          val rows = batch.collect().map(r =>
            ((r.getTimestamp(0), r.getString(1)), r.getLong(2))).toSeq
          upsert(rows, batchId)
          committed = batchId
        }
      }
      .start()
  }

  /** A15: the stdout-JSON sink (tasks.rs:105) — each emitted event as
    * one JSON line, delivered per micro-batch via foreachBatch to any
    * downstream (ELK-style) store; `collector` abstracts the store so
    * tests can capture lines.
    */
  def streamJsonSink(emitted: Dataset[EmittedEv], queryName: String)(
      collector: Seq[String] => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    emitted.toDF()
      .select(to_json(struct(col("key"), col("ts"), col("event_id"))).as("line"))
      .writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        collector(batch.collect().map(_.getString(0)).toSeq)
      }
      .start()
}
