package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's Prometheus surface (tasks.rs:26-64) re-expressed as
  * a StreamingQueryListener: per-batch processed-row counters and state
  * size gauges, fed by the engine's own progress events instead of
  * hand-maintained counters.
  *
  *   kube_event_stream_cachedb_events_processed{total} → rowsProcessed
  *   kube_event_stream_cachedb_size{items}             → stateRows
  *   (cache_hits/misses are first-class query outputs here —
  *    EventOps.evCacheStats — rather than side-channel metrics.)
  */
final class GraftMetricsListener extends StreamingQueryListener {
  val rowsProcessed = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val stateRows = new AtomicLong(0)
  val rowsOutput = new AtomicLong(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rowsProcessed.addAndGet(e.progress.numInputRows)
    val st = e.progress.stateOperators
    if (st != null && st.nonEmpty) {
      stateRows.set(st.map(_.numRowsTotal).sum)
      rowsOutput.addAndGet(st.map(_.numRowsUpdated).sum)
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Prometheus-exposition-style snapshot (one line per metric). */
  def snapshot: Seq[String] = Seq(
    s"graft_events_processed_total ${rowsProcessed.get}",
    s"graft_batches_total ${batches.get}",
    s"graft_state_rows ${stateRows.get}")
}
