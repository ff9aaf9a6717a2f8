package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Ev
import graft.streaming.{EventStreamJob, GraftMetricsListener}

class MetricsListenerSpec extends SparkSpec {

  test("listener observes processed rows and state size from engine progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamTtlCache(input.toDS(), ttlHours = 1)
    val q = out.writeStream.outputMode("append").format("memory").queryName("m_out").start()
    try {
      input.addData((1 to 50).map(i => Ev(i, base.plusSeconds(i), i % 5, "click")))
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.rowsProcessed.get() < 50 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.rowsProcessed.get() >= 50, listener.snapshot.mkString("; "))
      assert(listener.batches.get() >= 1)
      assert(listener.stateRows.get() == 5, "one state row per key")
      assert(listener.stateBytes.get() > 0,
        "state bytes gauge (the reference's cachedb_size{bytes}) must be fed")
      assert(listener.snapshot.exists(_.startsWith("graft_events_processed_total")))
      // reference cachedb_events_processed{cache_hits|cache_misses}:
      // 5 keys → 5 first-seen emissions (misses), 45 suppressed (hits)
      assert(listener.cacheMisses.get() == 5, listener.snapshot.mkString("; "))
      assert(listener.cacheHits.get() == 45, listener.snapshot.mkString("; "))

      // served endpoint: the reference's 0.0.0.0:9000 exposition scrape
      val server = listener.serve(0)
      try {
        val url = s"http://localhost:${server.getAddress.getPort}/metrics"
        val body = scala.io.Source.fromURL(url).mkString
        assert(body.contains("# TYPE graft_state_bytes gauge"), body)
        val bytes = body.linesIterator
          .find(_.startsWith("graft_state_bytes ")).get.split(" ")(1).toLong
        assert(bytes > 0, body)
        assert(body.linesIterator
          .find(_.startsWith("graft_events_processed_total ")).get.split(" ")(1).toLong >= 50)
      } finally server.stop(0)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
