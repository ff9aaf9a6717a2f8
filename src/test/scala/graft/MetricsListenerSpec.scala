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
      // this query carries no kes_cache observation → the cache
      // counters must NOT be polluted by an unrelated stateful query
      assert(listener.cacheMisses.get() == 0 && listener.cacheHits.get() == 0,
        listener.snapshot.mkString("; "))

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

  test("cache hit/miss counters derive from the pipeline's observed metrics (any sink, incl. V1)") {
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val in = java.nio.file.Files.createTempDirectory("ml_in").toFile
    val out = java.nio.file.Files.createTempDirectory("ml_out").toFile.getAbsolutePath + "/data"
    val ckpt = java.nio.file.Files.createTempDirectory("ml_ckpt").toFile.getAbsolutePath
    val e1 =
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}"""
    val e2 =
      """{"metadata":{"name":"e2","uid":"u2","resourceVersion":"2","creationTimestamp":"2024-01-01T00:00:05Z"},"involvedObject":{"kind":"Pod"},"reason":"Pulled","type":"Normal"}"""
    // 3 rows, 1 duplicate key → 2 misses, 1 hit — through the DEPLOYED
    // sink shape (text FileStreamSink, a V1 sink with numOutputRows=-1,
    // which is exactly why the counters ride observed metrics)
    java.nio.file.Files.writeString(new java.io.File(in, "b.json").toPath,
      Seq(e1, e1, e2).mkString("\n"))
    val q = graft.operators.KubeEventOps
      .streamPipeline(graft.sources.KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
      .select(org.apache.spark.sql.functions.col("line").as("value"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      // listener events arrive asynchronously — poll the counters
      // themselves (polling a different field of the same callback
      // races its later lines)
      val deadline = System.currentTimeMillis() + 10000
      while (listener.cacheMisses.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.cacheMisses.get() == 2, listener.snapshot.mkString("; "))
      assert(listener.cacheHits.get() == 1, listener.snapshot.mkString("; "))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("curation-stream counters: kept plus per-reason drops from the observed metrics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    // 4 docs: a good keeper, its exact duplicate, a too-short doc
    // (correct language, so low_quality is its only reason), and a
    // fluent German doc labeled en (lang_mismatch only)
    val good = ("the and of to in " * 30).trim
    val german = ("der die das und ist " * 30).trim
    val base = java.sql.Timestamp.from(Instant.parse("2024-01-01T00:00:00Z"))
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "lang", "ingest_ts")
    val q = graft.streaming.DocStreamJob.streamDocCurate(docs)
      .writeStream.format("memory").queryName("cur_out").outputMode("append").start()
    try {
      input.addData(Seq(
        (1L, good, "en", base), (2L, good, "en", base),
        (3L, "the cat", "en", base), (4L, german, "en", base)))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (listener.docsKept.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(spark.table("cur_out").collect().map(_.getLong(0)).toSet == Set(1L))
      assert(listener.docsIn.get() == 4, listener.snapshot.mkString("; "))
      assert(listener.docsDuplicate.get() == 1, "the exact copy is the duplicate drop")
      assert(listener.docsLowQuality.get() == 1, "the short doc is the low-quality drop")
      assert(listener.docsLangMismatch.get() == 1, "the mislabeled German doc is the mismatch")
      assert(listener.docsKept.get() == 1)
      assert(listener.snapshot.exists(_.startsWith("graft_docs_kept_total 1")),
        listener.snapshot.mkString("; "))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
