package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's Prometheus surface (tasks.rs:26-64) re-expressed as
  * a StreamingQueryListener: per-batch processed-row counters and state
  * size gauges, fed by the engine's own progress events instead of
  * hand-maintained counters.
  *
  *   kube_event_stream_cachedb_events_processed{total} → rowsProcessed
  *   kube_event_stream_cachedb_size{items}             → stateRows
  *   kube_event_stream_cachedb_size{bytes}             → stateBytes
  *   (cache_hits/misses are first-class query outputs here —
  *    EventOps.evCacheStats — rather than side-channel metrics.)
  *
  * `serve(port)` exposes the snapshot over HTTP exactly as the
  * reference serves 0.0.0.0:9000 (reference src/main.rs:63) — GET
  * /metrics, Prometheus text exposition format.
  */
final class GraftMetricsListener extends StreamingQueryListener {
  val rowsProcessed = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val stateRows = new AtomicLong(0)
  val stateBytes = new AtomicLong(0)
  val rowsOutput = new AtomicLong(0)
  // ingest-buffer gauges from ReportsSourceMetrics sources (the
  // reference's bounded-channel backpressure, observable like its
  // channel gauges): KubeWatchStream reports bufferedEvents +
  // backpressureStalls per progress
  val sourceBuffered = new AtomicLong(0)
  val sourceStalls = new AtomicLong(0)
  // dedup-cache counters (reference cachedb_events_processed{
  // cache_hits|cache_misses}, tasks.rs:92-100), fed by the pipeline's
  // own kes_cache_in/kes_cache_out observed metrics (CollectMetrics
  // nodes in KubeEventOps.streamPipeline): rows entering minus rows
  // leaving the dedup are the suppressed duplicates. Observed metrics
  // ride the plan, so they work with the deployed V1 text sink (whose
  // progress reports numOutputRows = -1) and only fire for queries
  // that actually carry the dedup observation — a windowed-aggregate
  // query on the same session contributes nothing.
  val cacheHits = new AtomicLong(0)
  val cacheMisses = new AtomicLong(0)
  // rows discarded because they arrived behind the watermark — dropped
  // by the dedup operator too, but NOT same-key suppressions, so they
  // are counted separately rather than inflating cacheHits (the
  // reference's cache_hits is strictly same-key, tasks.rs:92-100)
  val lateDropped = new AtomicLong(0)
  // state rows evicted by timeout/watermark (reference clean_cache's
  // "purged entries", tasks.rs:184-210)
  val stateEvictions = new AtomicLong(0)
  // events whose three timestamps were ALL missing (the reference's
  // now()-fallback warning, types.rs:38, as a counter): dropped without
  // the processing-time fallback, substituted with it — either way this
  // is their trace (fed by streamPipeline's kes_time_null observation)
  val timeMissing = new AtomicLong(0)
  // online-ANN serving counters (AnnStreamJob.streamAnnServePruned
  // reports per micro-batch): queries served, distinct probe cells,
  // and static-side code rows actually scanned — the runtime witness
  // that the serving join reads ∝ probed cells, not ∝ corpus (the r12
  // verdict's weak). A capacity review divides scanned by batches.
  val annServeBatches = new AtomicLong(0)
  val annServeQueries = new AtomicLong(0)
  val annServeProbedCells = new AtomicLong(0)
  val annServeStaticRowsScanned = new AtomicLong(0)

  /** Fed by the pruned ANN server after each micro-batch (a batch
    * foreachBatch execution never reaches onQueryProgress's
    * stream-side metrics, so the server reports directly). */
  def recordAnnServe(nQueries: Long, nProbedCells: Long,
      staticRowsScanned: Long): Unit = {
    annServeBatches.incrementAndGet()
    annServeQueries.addAndGet(nQueries)
    annServeProbedCells.addAndGet(nProbedCells)
    annServeStaticRowsScanned.addAndGet(staticRowsScanned)
    ()
  }

  // curation-stream counters (DocStreamJob.streamDocCurate's observed
  // metrics): kept survivors plus per-reason drops, using the same
  // reason flags as the batch docCurate verdict
  val docsIn = new AtomicLong(0)
  val docsKept = new AtomicLong(0)
  val docsDuplicate = new AtomicLong(0)
  val docsLowQuality = new AtomicLong(0)
  val docsLangMismatch = new AtomicLong(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rowsProcessed.addAndGet(e.progress.numInputRows)
    val st = e.progress.stateOperators
    if (st != null && st.nonEmpty) {
      stateRows.set(st.map(_.numRowsTotal).sum)
      stateBytes.set(st.map(_.memoryUsedBytes).sum)
      rowsOutput.addAndGet(st.map(_.numRowsUpdated).sum)
      stateEvictions.addAndGet(st.map(_.numRowsRemoved).sum)
    }
    val om = e.progress.observedMetrics
    if (om != null && om.containsKey("kes_cache_in") && om.containsKey("kes_cache_out")) {
      val in = om.get("kes_cache_in").getAs[Long]("n")
      val out = om.get("kes_cache_out").getAs[Long]("n")
      // in - out counts everything the dedup discarded, which is
      // same-key hits PLUS late arrivals behind the watermark; the
      // engine reports the late share per state operator, so subtract
      // it to keep hit semantics aligned with the reference. The
      // reported sum spans ALL state operators, so a drop attributed to
      // some OTHER operator could exceed in - out — clamp rather than
      // skip, so hits/misses/late never silently undercount a batch
      if (in >= out) {
        val lateAll =
          if (st != null && st.nonEmpty) st.map(_.numRowsDroppedByWatermark).sum else 0L
        val late = math.min(lateAll, in - out)
        cacheMisses.addAndGet(out)
        lateDropped.addAndGet(late)
        cacheHits.addAndGet(in - out - late)
      }
    }
    if (om != null && om.containsKey("kes_time_null"))
      timeMissing.addAndGet(om.get("kes_time_null").getAs[Long]("n"))
    if (om != null && om.containsKey("doc_curate_in") && om.containsKey("doc_curate_unique")) {
      val in = om.get("doc_curate_in").getAs[Long]("n")
      val u = om.get("doc_curate_unique")
      val uniq = u.getAs[Long]("n")
      docsIn.addAndGet(in)
      docsDuplicate.addAndGet(math.max(0L, in - uniq))
      docsLowQuality.addAndGet(u.getAs[Long]("low_quality"))
      docsLangMismatch.addAndGet(u.getAs[Long]("lang_mismatch"))
      if (om.containsKey("doc_curate_kept"))
        docsKept.addAndGet(om.get("doc_curate_kept").getAs[Long]("n"))
    }
    val srcs = e.progress.sources
    if (srcs != null && srcs.nonEmpty) {
      def sumOf(key: String): Option[Long] = {
        val vs = srcs.toSeq.flatMap(s => Option(s.metrics))
          .flatMap(m => Option(m.get(key))).map(_.toLong)
        if (vs.nonEmpty) Some(vs.sum) else None
      }
      sumOf("bufferedEvents").foreach(sourceBuffered.set)
      sumOf("backpressureStalls").foreach(sourceStalls.set)
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Prometheus-exposition-style snapshot (TYPE line + sample per
    * metric — the text format a scraper parses).
    */
  def snapshot: Seq[String] = Seq(
    "# TYPE graft_events_processed_total counter",
    s"graft_events_processed_total ${rowsProcessed.get}",
    "# TYPE graft_batches_total counter",
    s"graft_batches_total ${batches.get}",
    "# TYPE graft_state_rows gauge",
    s"graft_state_rows ${stateRows.get}",
    "# TYPE graft_state_bytes gauge",
    s"graft_state_bytes ${stateBytes.get}",
    "# TYPE graft_cache_hits_total counter",
    s"graft_cache_hits_total ${cacheHits.get}",
    "# TYPE graft_cache_misses_total counter",
    s"graft_cache_misses_total ${cacheMisses.get}",
    "# TYPE graft_late_dropped_total counter",
    s"graft_late_dropped_total ${lateDropped.get}",
    "# TYPE graft_state_evictions_total counter",
    s"graft_state_evictions_total ${stateEvictions.get}",
    "# TYPE graft_time_missing_total counter",
    s"graft_time_missing_total ${timeMissing.get}",
    "# TYPE graft_docs_in_total counter",
    s"graft_docs_in_total ${docsIn.get}",
    "# TYPE graft_docs_kept_total counter",
    s"graft_docs_kept_total ${docsKept.get}",
    "# TYPE graft_docs_dropped_duplicate_total counter",
    s"graft_docs_dropped_duplicate_total ${docsDuplicate.get}",
    "# TYPE graft_docs_dropped_low_quality_total counter",
    s"graft_docs_dropped_low_quality_total ${docsLowQuality.get}",
    "# TYPE graft_docs_dropped_lang_mismatch_total counter",
    s"graft_docs_dropped_lang_mismatch_total ${docsLangMismatch.get}",
    "# TYPE graft_ann_serve_batches_total counter",
    s"graft_ann_serve_batches_total ${annServeBatches.get}",
    "# TYPE graft_ann_serve_queries_total counter",
    s"graft_ann_serve_queries_total ${annServeQueries.get}",
    "# TYPE graft_ann_serve_probed_cells_total counter",
    s"graft_ann_serve_probed_cells_total ${annServeProbedCells.get}",
    "# TYPE graft_ann_serve_static_rows_scanned_total counter",
    s"graft_ann_serve_static_rows_scanned_total ${annServeStaticRowsScanned.get}",
    "# TYPE graft_source_buffered_events gauge",
    s"graft_source_buffered_events ${sourceBuffered.get}",
    // gauge, not counter: the underlying count restarts at 0 with each
    // (re)started query's fresh source client, and a Prometheus counter
    // must never decrease — scrapers should read this as "stalls of the
    // currently running query"
    "# TYPE graft_source_backpressure_stalls gauge",
    s"graft_source_backpressure_stalls ${sourceStalls.get}")

  /** Serve GET /metrics on the given port (0 = ephemeral; read the
    * bound port off the returned server). Single-threaded — a scrape
    * endpoint, not a web server.
    */
  def serve(port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", exchange => {
      val body = (snapshot.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
    server.start()
    server
  }
}
