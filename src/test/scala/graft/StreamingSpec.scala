package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Ev
import graft.operators.EventOps
import graft.streaming.EventStreamJob

/** Streaming twins (SURVEY §2.A12–A15) driven by MemoryStream — the
  * list-then-watch shape of the reference's watcher. The load-bearing
  * test: the streaming TTL cache must equal the batch TTL cache (which
  * the DuckDB oracle checks exactly) on the same data.
  */
class StreamingSpec extends SparkSpec {

  private def eventsData: Seq[Ev] = {
    import spark.implicits._
    tables.events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev].collect().toSeq.sortBy(e => (e.ts.toEpochMilli, e.event_id))
  }

  test("streaming TTL cache == batch TTL cache (reference emission semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamTtlCache(input.toDS(), ttlHours = 24)
    val q = out.writeStream.outputMode("append").format("memory").queryName("ttl_out").start()
    try {
      // feed chronologically in 4 micro-batches (watch-stream order)
      eventsData.grouped((eventsData.size + 3) / 4).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table("ttl_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
      val batch = EventOps.evTtlCache(tables, 24).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
      assert(streamed == batch,
        s"streaming≠batch: only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("stream-internal near-dup candidates == batch band-candidate relation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2), base))
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocNearDupWithin(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("neardup_within_out").start()
    try {
      docs.grouped((docs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("neardup_within_out")
        .select($"doc_a", $"doc_b", $"agree").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Dedup.docMinhashJaccardEst(tables).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming ANN serving off the persisted IVFPQ index == batch searchIvfPqIndex row-for-row; tombstones hold online") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_serve").toString
    graft.sources.Sinks.writeIvfPqIndex(tables, dir, nCells = 16)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1),
        java.sql.Timestamp.from(base)))
      .sortBy(_._1).toSeq
    def serveAll(): Seq[(Long, Long, Long, Double)] = {
      val input = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
      val out = graft.streaming.AnnStreamJob.streamAnnServe(
        input.toDS().toDF("q_id", "v", "ingest_ts"), dir)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("ann_serve_out").start()
      try {
        qvecs.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
        // close the watermark with a far-future sentinel query
        input.addData(Seq((999999L, qvecs.head._2,
          java.sql.Timestamp.from(base.plusSeconds(864000)))))
        q.processAllAvailable()
        spark.table("ann_serve_out").filter($"q_id" =!= 999999L).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sortBy(x => (x._1, x._2)).toSeq
      } finally {
        q.stop(); spark.sql("DROP TABLE IF EXISTS ann_serve_out"); ()
      }
    }
    def batchRows() = graft.sources.Sinks.searchIvfPqIndex(tables, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val streamed = serveAll()
    assert(streamed.nonEmpty && streamed == batchRows(),
      "watermark-closed stream results must equal the batch index search row-for-row")
    // G32 custody online: tombstone served vectors, re-serve — they
    // vanish from the stream results exactly as from the batch path
    val doomed = streamed.map(_._3).distinct.take(3)
    graft.sources.Sinks.deleteFromIvfPqIndex(spark, dir, doomed.toDF("vec_id"))
    val after = serveAll()
    assert(!after.exists(r => doomed.contains(r._3)),
      "a tombstoned vector must never serve online")
    assert(after == batchRows(),
      "post-delete stream results must still equal the batch path")
  }

  test("cell-pruned ANN serving: per-batch re-plan == batch searchIvfPqIndex; static side prunes to probed cells (plan + runtime witness); tombstones hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_serve_pruned").toString
    graft.sources.Sinks.writeIvfPqIndex(tables, dir, nCells = 16)
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val metrics = new graft.streaming.GraftMetricsListener
    def serveAll(): (Seq[(Long, Long, Long, Double)],
        Seq[graft.streaming.AnnStreamJob.AnnServeBatchStat]) = {
      val audit = new graft.streaming.AnnStreamJob.AnnServeAudit
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      val input = MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.AnnStreamJob.streamAnnServePruned(
        input.toDS().toDF("q_id", "v"), dir,
        audit = Some(audit), metrics = Some(metrics)) { (_, rows) =>
        buf.synchronized { buf ++= rows; () }
      }
      try {
        qvecs.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      (buf.sortBy(x => (x._1, x._2)).toSeq, audit.batches)
    }
    def batchRows() = graft.sources.Sinks.searchIvfPqIndex(tables, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val (streamed, stats) = serveAll()
    assert(streamed.nonEmpty && streamed == batchRows(),
      "pruned per-batch serving must equal the batch index search row-for-row")
    // plan law (the G12 shape, per batch): the static-side scan node
    // carries a non-empty PartitionFilters on the cell column — the
    // planning-time prune, not a post-scan filter
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.scanPlans.nonEmpty, s"batch ${s.batchId}: no static-side scan recorded")
      assert(s.scanPlans.exists(p =>
        p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []")
          && p.contains("cell")),
        s"batch ${s.batchId}: static scan must prune on the cell partition column:\n${s.scanPlans.mkString("\n")}")
    }
    // runtime witness: static-side rows scanned per batch == the probed
    // cells' code population, NOT the corpus
    val allCodes = spark.read.parquet(s"$dir/codes")
      .select(col("cell").cast("long").as("cell"))
    val corpusRows = allCodes.count()
    stats.foreach { s =>
      val popn = allCodes.filter(col("cell").isin(s.probedCells: _*)).count()
      assert(s.staticRowsScanned == popn,
        s"batch ${s.batchId}: scanned ${s.staticRowsScanned} != probed-cell population $popn")
      assert(s.staticRowsScanned < corpusRows,
        s"batch ${s.batchId}: scan must be a strict subset of the corpus")
    }
    // A17 surface: the serving counters export on /metrics
    assert(metrics.annServeBatches.get >= stats.size.toLong)
    assert(metrics.annServeStaticRowsScanned.get ==
      stats.map(_.staticRowsScanned).sum)
    assert(metrics.snapshot.exists(_.startsWith(
      "graft_ann_serve_static_rows_scanned_total ")))
    // G32 custody online: tombstoned vectors vanish here too
    val doomed = streamed.map(_._3).distinct.take(3)
    graft.sources.Sinks.deleteFromIvfPqIndex(spark, dir, doomed.toDF("vec_id"))
    val (after, _) = serveAll()
    assert(!after.exists(r => doomed.contains(r._3)),
      "a tombstoned vector must never serve from the pruned path")
    assert(after == batchRows(),
      "post-delete pruned stream results must still equal the batch path")
  }

  test("streaming Gopher rule card == batch verdict per document (stateless twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2), base))
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocGopherRules(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("gopher_out").start()
    try {
      docs.grouped((docs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      def keyOf(r: org.apache.spark.sql.Row, idx: Map[String, Int]) =
        r.getLong(idx("doc_id")) ->
          ((r.getLong(idx("n_words")), r.getDouble(idx("mean_word_len_r")),
            r.getDouble(idx("symbol_word_ratio_r")),
            r.getDouble(idx("alpha_word_ratio_r")),
            r.getLong(idx("stop_hits")), r.getInt(idx("keep"))))
      val sDf = spark.table("gopher_out")
      val sIdx = sDf.columns.zipWithIndex.toMap
      val streamed = sDf.collect().map(keyOf(_, sIdx)).toMap
      val bDf = graft.operators.TextOps.docGopherRules(tables)
      val bIdx = bDf.columns.zipWithIndex.toMap
      val batch = bDf.collect().map(keyOf(_, bIdx)).toMap
      assert(streamed == batch,
        s"stream≠batch: ${(streamed.toSet -- batch.toSet).take(2)} vs ${(batch.toSet -- streamed.toSet).take(2)}")
    } finally q.stop()
  }

  test("online graph-ANN serving: per-batch results == batch searchGraphIndex row-for-row; deletes take effect between batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graphidx_serve").toString
    graft.sources.Sinks.writeGraphIndex(tables, dir)
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    def serveAll(): Seq[(Long, Long, Long, Double)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      val input = MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.AnnStreamJob.streamGraphAnnServe(
        input.toDS().toDF("q_id", "v"), dir) { (_, rows) =>
        buf.synchronized { buf ++= rows; () }
      }
      try {
        qvecs.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      buf.sortBy(x => (x._1, x._2)).toSeq
    }
    def batchRows() = graft.sources.Sinks.searchGraphIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val streamed = serveAll()
    assert(streamed.nonEmpty && streamed == batchRows(),
      "graph serving must equal the batch index search row-for-row")
    // deletes take effect between batches (tombstones re-read per batch)
    val doomed = streamed.map(_._3).distinct.filter(_ >= 8).take(3)
    assert(doomed.nonEmpty)
    graft.sources.Sinks.deleteFromGraphIndex(spark, dir, doomed.toDF("vec_id"))
    val after = serveAll()
    assert(!after.exists(r => doomed.contains(r._3)),
      "a tombstoned vector must never serve from the graph stream")
    assert(after == batchRows(),
      "post-delete graph stream results must still equal the batch path")
  }

  test("G41 swap under a live graph server: compact+swap serves the new version from the next batch, zero dropped queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sinks = graft.sources.Sinks
    val root = java.nio.file.Files.createTempDirectory("graphidx_versioned").toString
    sinks.writeGraphIndex(tables, sinks.versionPath(root, 1))
    sinks.swapIndexVersion(spark, root, 1)
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Long, Double)]]
    def batchRows(path: String) = sinks.searchGraphIndex(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.AnnStreamJob.streamGraphAnnServe(
      input.toDS().toDF("q_id", "v"), root) { (_, rows) =>
      perBatch.synchronized { if (rows.nonEmpty) perBatch += rows; () }
    }
    try {
      // batch A serves version 1
      input.addData(qvecs); q.processAllAvailable()
      val rowsA = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      val expectedA = batchRows(root)
      assert(rowsA.nonEmpty && rowsA == expectedA,
        "pre-swap serving must equal the live version's batch search")
      // takedown arc WHILE THE SERVER RUNS: tombstone → compact into
      // versions/2 → plant a findable duplicate only v2 has → swap
      val doomed = rowsA.map(_._3).distinct.filter(_ >= 8).take(2)
      assert(doomed.nonEmpty)
      sinks.deleteFromGraphIndex(spark, root, doomed.toDF("vec_id"))
      sinks.compactGraphIndex(spark, root, sinks.versionPath(root, 2))
      val dupId = tables.embeddings.agg(max(col("vec_id"))).head.getLong(0) + 1000L
      sinks.appendToGraphIndex(spark, sinks.versionPath(root, 2),
        Seq((dupId, qvecs.head._2)).toDF("vec_id", "embedding"))
      sinks.swapIndexVersion(spark, root, 2)
      perBatch.synchronized(perBatch.clear())
      // batch B must serve version 2: the compacted graph + the planted
      // duplicate — which exists in NO other version, so its appearance
      // proves the live server moved
      input.addData(qvecs); q.processAllAvailable()
      val rowsB = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      assert(rowsB == batchRows(sinks.versionPath(root, 2)),
        "post-swap serving must equal the new version's batch search row-for-row")
      assert(!rowsB.exists(r => doomed.contains(r._3)),
        "compaction purged the tombstoned vectors — they must not serve")
      assert(rowsB.exists(r => r._1 == 0L && r._3 == dupId && r._4 == 1.0),
        s"the v2-only planted duplicate must serve at cosine 1.0 post-swap: ${rowsB.filter(_._1 == 0L)}")
      // zero dropped queries: every arriving q_id answered in both eras
      assert(rowsA.map(_._1).distinct.sorted == qvecs.map(_._1) &&
        rowsB.map(_._1).distinct.sorted == qvecs.map(_._1),
        "every query of every batch must be answered across the swap")
    } finally q.stop()
  }

  test("online Matryoshka serving off the prefix-sliced artifact: per-batch results == batch searchPrefixSliced; a version swap serves the re-sliced corpus from the next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sinks = graft.sources.Sinks
    val root = java.nio.file.Files.createTempDirectory("prefix_sliced_live").toString
    sinks.writeEmbeddingsPrefixSliced(tables, sinks.versionPath(root, 1))
    sinks.swapIndexVersion(spark, root, 1)
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Long, Double)]]
    def batchRows(path: String) = sinks.searchPrefixSliced(spark, path)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.AnnStreamJob.streamPrefixAnnServe(
      input.toDS().toDF("q_id", "v"), root) { (_, rows) =>
      perBatch.synchronized { if (rows.nonEmpty) perBatch += rows; () }
    }
    try {
      // several micro-batches against version 1: stream ≡ batch (the
      // QRel core is shared, so this pins the whole serving path —
      // prefix-group retrieval + pushed-down full-dim rerank)
      qvecs.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
      val rowsA = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      assert(rowsA.nonEmpty && rowsA == batchRows(root),
        "pre-swap prefix serving must equal the live version's batch search")
      // version 2 WHILE THE SERVER RUNS: re-slice the corpus at a
      // WIDER prefix with a planted duplicate only v2 has, then swap —
      // the dup's appearance proves the live server moved artifacts
      val dupId = tables.embeddings.agg(max(col("vec_id"))).head.getLong(0) + 1000L
      val planted = tables.embeddings.filter(col("vec_id") === 0L)
        .select(lit(dupId).as("vec_id"), col("embedding"))
      val t2 = tables.copy(embOverride = Some(
        tables.embeddings.select(col("vec_id"), col("embedding"))
          .unionByName(planted)))
      sinks.writeEmbeddingsPrefixSliced(t2, sinks.versionPath(root, 2), p = 32)
      sinks.swapIndexVersion(spark, root, 2)
      perBatch.synchronized(perBatch.clear())
      input.addData(qvecs); q.processAllAvailable()
      val rowsB = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      assert(rowsB == batchRows(sinks.versionPath(root, 2)),
        "post-swap serving must equal the new version's batch search row-for-row")
      assert(rowsB.exists(r => r._1 == 0L && r._3 == dupId && r._4 == 1.0),
        s"the v2-only planted duplicate must serve at cosine 1.0 post-swap: ${rowsB.filter(_._1 == 0L)}")
      assert(rowsA.map(_._1).distinct.sorted == qvecs.map(_._1) &&
        rowsB.map(_._1).distinct.sorted == qvecs.map(_._1),
        "every query of every batch must be answered across the swap")
    } finally q.stop()
  }

  test("G41 swap under a live pruned-IVFPQ server: the next batch serves the new version's quantizers and codes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sinks = graft.sources.Sinks
    val root = java.nio.file.Files.createTempDirectory("ivfpq_serve_versioned").toString
    sinks.writeIvfPqIndex(tables, sinks.versionPath(root, 1), nCells = 16)
    sinks.swapIndexVersion(spark, root, 1)
    def batchRows(path: String) = sinks.searchIvfPqIndex(tables, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // v1 carries tombstones; v2 is the rebuild without them — the swap
    // visibly changes what serves (the doomed ids return)
    val doomed = batchRows(root).map(_._3).distinct.filter(_ >= 8).take(2)
    assert(doomed.nonEmpty)
    sinks.deleteFromIvfPqIndex(spark, root, doomed.toDF("vec_id"))
    sinks.writeIvfPqIndex(tables, sinks.versionPath(root, 2), nCells = 16)
    val qvecs = tables.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Long, Double)]]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.AnnStreamJob.streamAnnServePruned(
      input.toDS().toDF("q_id", "v"), root) { (_, rows) =>
      perBatch.synchronized { if (rows.nonEmpty) perBatch += rows; () }
    }
    try {
      input.addData(qvecs); q.processAllAvailable()
      val rowsA = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      assert(rowsA == batchRows(sinks.versionPath(root, 1)),
        "pre-swap pruned serving must equal version 1's batch search")
      assert(!rowsA.exists(r => doomed.contains(r._3)))
      sinks.swapIndexVersion(spark, root, 2)
      perBatch.synchronized(perBatch.clear())
      input.addData(qvecs); q.processAllAvailable()
      val rowsB = perBatch.synchronized(perBatch.flatten.toSeq)
        .sortBy(x => (x._1, x._2))
      assert(rowsB == batchRows(sinks.versionPath(root, 2)),
        "post-swap pruned serving must equal version 2's batch search")
      assert(rowsB.exists(r => doomed.contains(r._3)),
        "the rebuilt version has no tombstones — the swap visibly moved serving")
    } finally q.stop()
  }

  test("streaming day-final type shares == batch day-share relation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamTypeShares(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("shares_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("shares_out").filter($"event_type" =!= "sentinel")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      // batch twin: the (day, type, n, share) columns of A55
      val batch = EventOps.evTypeShareDrift(tables)
        .select(col("day"), col("event_type"), col("n"), col("share_r"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed.keySet == batch.keySet,
        s"day/type sets differ: only-stream=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"only-batch=${(batch.keySet -- streamed.keySet).take(3)}")
      streamed.foreach { case (k, (n, tot, share)) =>
        assert(batch(k)._1 == n && batch(k)._2 == share, s"$k: stream=($n,$tot,$share) batch=${batch(k)}")
        assert(tot > 0 && n <= tot)
      }
    } finally q.stop()
  }

  test("streaming funnel == batch cascade (watermark-final stage emission)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvFunnel(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("funnel_out").filter($"user_id" =!= -1L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // independent driver recompute of the batch cascade
      val us = (i: Instant) => i.getEpochSecond * 1000000L + i.getNano / 1000L
      val expected = eventsData.groupBy(_.user_id).flatMap { case (u, evs) =>
        val t1 = evs.filter(_.event_type == "signup").map(e => us(e.ts))
          .minOption
        val t2 = t1.flatMap(a => evs.filter(e => e.event_type == "click" && us(e.ts) > a)
          .map(e => us(e.ts)).minOption)
        val t3 = t2.flatMap(b => evs.filter(e => e.event_type == "purchase" && us(e.ts) > b)
          .map(e => us(e.ts)).minOption)
        t1.map((u, 1, _)) ++ t2.map((u, 2, _)) ++ t3.map((u, 3, _))
      }.toSet
      assert(streamed == expected,
        s"stream≠batch: only-stream=${(streamed -- expected).take(3)} " +
          s"only-batch=${(expected -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming state transitions == batch transition matrix (watermark-final emission)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvStateTransitions(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("trans_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // sentinel far in the future closes every buffered tail
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("trans_out").filter($"user_id" =!= -1L)
        .groupBy($"from_type", $"to_type")
        .agg(count(lit(1)).as("n"), sum($"gap_us").as("gap_us_total"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val batch = graft.operators.EventOps.evStateTransitions(tables).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"only-batch=${(batch.keySet -- streamed.keySet).take(3)} " +
          s"diff=${batch.collect { case (k, v) if streamed.get(k).exists(_ != v) => (k, v, streamed(k)) }.take(3)}")
    } finally q.stop()
  }

  test("streaming cusum == batch cusum once every hour is watermark-closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvCusum(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cusum_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // sentinel far past the last event closes every open hour
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("cusum_out").filter($"event_type" =!= "sentinel")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      val batch = EventOps.evCusumChangepoint(tables).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      // the stream can only score types whose baseline window (48
      // finalized hours) filled — on this corpus every real type does
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming Holt forecast == batch Holt recursion replayed online") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvHoltForecast(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("holt_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // sentinel far past the last event closes every open hour
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      def cell(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))
      val streamed = spark.table("holt_out")
        .filter($"event_type" =!= "sentinel").collect().map(cell).toSet
      val batch = EventOps.evHoltForecast(tables).collect().map(cell).toSet
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming attribution credits roll up to the exact batch attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamAttribution(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .groupBy($"touch_type")
        .agg(count(lit(1)).as("n_touches"), sum($"credit_micro").as("credit_total_micro"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val batch = EventOps.evAttribution(tables).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed == batch,
        s"stream≠batch: streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming daily active users == batch DAU for every watermark-closed day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamDailyActive(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dau_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("dau_out").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      val batchDau = EventOps.evActiveUsers(tables).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1))
        .filter(_._2 > 0L).toMap
      // the sentinel's own day appears in the stream; restrict to real days
      val streamedReal = streamed.filter { case (d, _) => batchDau.contains(d) }
      assert(streamedReal == batchDau,
        s"stream≠batch: only-stream=${(streamedReal.toSet -- batchDau.toSet).take(3)} " +
          s"only-batch=${(batchDau.toSet -- streamedReal.toSet).take(3)}")
      // and nothing real was dropped: every batch day with activity closed
      assert(batchDau.keySet.subsetOf(streamed.keySet))
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamDedupWatermark(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData(Seq(
        Ev(1, base, 1, "click"), Ev(2, base.plusSeconds(60), 1, "click"),
        Ev(3, base.plusSeconds(120), 2, "view")))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select("key").collect().map(_.getString(0))
      assert(rows.sorted.toSeq == Seq("1:click", "2:view"))
    } finally q.stop()
  }

  test("streaming windowed counts close with the watermark and match batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamWindowedCounts(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("win_out").start()
    try {
      input.addData(Seq(
        Ev(1, base.plusSeconds(60), 1, "click"), Ev(2, base.plusSeconds(120), 2, "click"),
        Ev(3, base.plusSeconds(3660), 1, "view")))
      q.processAllAvailable()
      // sentinel far in the future closes the earlier windows
      input.addData(Seq(Ev(99, base.plusSeconds(864000), 9, "noise")))
      q.processAllAvailable()
      input.addData(Seq(Ev(100, base.plusSeconds(864060), 9, "noise")))
      q.processAllAvailable()
      val got = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0).toInstant, r.getString(1), r.getLong(2))).toSet
      assert(got.contains((base, "click", 2L)), s"got=$got")
      assert(got.contains((base.plusSeconds(3600), "view", 1L)), s"got=$got")
    } finally q.stop()
  }

  test("streaming sliding counts: every closed window matches the batch sliding rate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T01:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamSlidingCounts(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("slide_out").start()
    try {
      // one event at 01:05 → 4 windows (00:15..01:00 starts); a second
      // at 01:20 shares 3 of them
      input.addData(Seq(
        Ev(1, base.plusSeconds(300), 1, "click"), Ev(2, base.plusSeconds(1200), 2, "click")))
      q.processAllAvailable()
      input.addData(Seq(Ev(99, base.plusSeconds(864000), 9, "noise")))
      q.processAllAvailable()
      input.addData(Seq(Ev(100, base.plusSeconds(864060), 9, "noise")))
      q.processAllAvailable()
      val got = spark.table("slide_out").collect()
        .map(r => (r.getTimestamp(0).toInstant, r.getString(1), r.getLong(2)))
        .filter(_._2 == "click").toSet
      // batch twin over the same two click events
      val batch = Seq(
        (1L, java.sql.Timestamp.from(base.plusSeconds(300)), 1L, "click", 1.0, "{}"),
        (2L, java.sql.Timestamp.from(base.plusSeconds(1200)), 2L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = java.nio.file.Files.createTempDirectory("graft-slide").toString
      batch.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val expected = EventOps.evSlidingRate(graft.sources.Tables(spark, tmp)).collect()
        .map(r => (r.getTimestamp(0).toInstant, r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"stream=$got batch=$expected")
    } finally q.stop()
  }

  test("streaming SLO burn == batch ev_slo_burn for every watermark-closed frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvSloBurn(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("slo_out").start()
    try {
      eventsData.grouped((eventsData.size + 3) / 4).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // close every real frame: the 7 h delay = explosion horizon +
      // 45 min lateness, so the closer must sit far past the corpus.
      val far = eventsData.last.ts.plusSeconds(30L * 24 * 3600)
      input.addData(Seq(Ev(999991, far, 999L, "noise")))
      q.processAllAvailable()
      input.addData(Seq(Ev(999992, far.plusSeconds(60), 999L, "noise")))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))
      val streamed = spark.table("slo_out").collect().map(key).toSet
      val closedBound = far.toEpochMilli - 45L * 60 * 1000
      val batchRel = EventOps.evSloBurn(tables).collect().map(key)
        .filter(_._1 <= closedBound).toSet
      assert(streamed == batchRel,
        s"stream≠batch: only-stream=${(streamed -- batchRel).take(3)} only-batch=${(batchRel -- streamed).take(3)}")
    } finally q.stop()
  }

  test("source drift monitor: balanced batch clean, flooded batch flags all three shifts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq(("srcA", 0.4), ("srcB", 0.4), ("srcC", 0.2))
      .toDF("source", "expected_share")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "source")
    val reports = scala.collection.mutable.ArrayBuffer[(Long, String, Boolean)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val q = graft.streaming.DocStreamJob.streamSourceDrift(
      docs, baseline, tolRatio = 2.0, "drift_q", ckpt) { (report, batchId) =>
      report.collect().foreach(r =>
        reports += ((batchId, r.getString(0), r.getBoolean(4))))
    }
    try {
      // batch 0: exactly the baseline mix — nothing drifts
      input.addData((1L to 4L).map(i => (i, "srcA")) ++
        (5L to 8L).map(i => (i, "srcB")) ++ (9L to 10L).map(i => (i, "srcC")))
      q.processAllAvailable()
      // batch 1: srcA floods to 90%, srcB starves to 10%, srcC vanishes
      input.addData((11L to 19L).map(i => (i, "srcA")) :+ ((20L, "srcB")))
      q.processAllAvailable()
      val byBatch = reports.groupBy(_._1)
      assert(byBatch(0L).forall(!_._3), s"balanced batch must be clean: ${byBatch(0L)}")
      val b1 = byBatch(1L).map(r => r._2 -> r._3).toMap
      assert(b1 == Map("srcA" -> true, "srcB" -> true, "srcC" -> true),
        s"all three shifts flagged: $b1")
    } finally q.stop()
  }

  test("streaming session windows close on gap and match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamSessionWindows(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // user 1: two events 10 min apart (one session), then 2h silence → new session
      input.addData(Seq(
        Ev(1, base, 1, "click"), Ev(2, base.plusSeconds(600), 1, "click"),
        Ev(3, base.plusSeconds(7800), 1, "view")))
      q.processAllAvailable()
      input.addData(Seq(Ev(99, base.plusSeconds(864000), 9, "noise")))
      q.processAllAvailable()
      input.addData(Seq(Ev(100, base.plusSeconds(864060), 9, "noise")))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter($"user_id" === 1).collect()
        .map(r => (r.getTimestamp(0).toInstant, r.getLong(3))).toSet
      assert(got == Set((base, 2L), (base.plusSeconds(7800), 1L)), s"got=$got")
    } finally q.stop()
  }

  test("stream-stream interval join binds purchases to preceding clicks within 1h") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamClickToPurchase(input.toDS().toDF()
      .withColumn("value", col("event_id") * 1.0))
    val q = out.writeStream.outputMode("append").format("memory").queryName("join_out").start()
    try {
      input.addData(Seq(
        Ev(1, base, 1, "click"),
        Ev(2, base.plusSeconds(600), 1, "purchase"),   // 10 min after click → joins
        Ev(3, base.plusSeconds(7200), 2, "purchase"))) // no click for user 2 → dropped
      q.processAllAvailable()
      val got = spark.table("join_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == Seq((2L, 1L)), s"got=${got.toSeq}")
    } finally q.stop()
  }

  test("idempotent upsert sink: updates replace, replay guard lives in the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    EventStreamJob.InMemoryUpsertStore.reset("upsert_spec")
    val store = new EventStreamJob.InMemoryUpsertStore("upsert_spec")
    val q = EventStreamJob.streamUpsertCounts(input.toDS().toDF(), store)
    try {
      input.addData(Seq(Ev(1, base.plusSeconds(10), 1, "click"), Ev(2, base.plusSeconds(20), 2, "click")))
      q.processAllAvailable()
      input.addData(Seq(Ev(3, base.plusSeconds(30), 3, "click")))
      q.processAllAvailable()
      val snap = store.snapshot
      assert(snap.size == 1, s"one (window, type) key: $snap")
      assert(snap.values.head == 3L, s"update replaced the count: $snap")
      // restart replay: re-deliver an already-applied (batch, partition)
      // with stale data — the store-side transactional guard must no-op
      val key = snap.keys.head
      val (b, p) = store.appliedKeys.head
      store.merge(b, p, Iterator((key, 999L)))
      assert(store.snapshot(key) == 3L, "replayed partition must not re-apply")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamWindowedCounts(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("late_out").start()
    try {
      // advance the watermark far past the first window
      input.addData(Seq(Ev(1, base.plusSeconds(7200), 1, "view")))
      q.processAllAvailable()
      // this event's window [base, base+1h) closed long ago → dropped
      input.addData(Seq(Ev(2, base, 1, "click")))
      q.processAllAvailable()
      input.addData(Seq(Ev(3, base.plusSeconds(864000), 9, "noise")))
      q.processAllAvailable()
      input.addData(Seq(Ev(4, base.plusSeconds(864060), 9, "noise")))
      q.processAllAvailable()
      val types = spark.table("late_out").collect().map(_.getString(1)).toSet
      assert(!types.contains("click"), s"late event must be dropped: $types")
      assert(types.contains("view"))
    } finally q.stop()
  }

  test("json sink delivers one line per emitted event (pushed per-partition, not via the driver)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    JsonSinkCapture.lines.clear()
    val emitted = EventStreamJob.streamTtlCache(input.toDS(), ttlHours = 1)
    // the capture object is a singleton: the executor-side partition
    // tasks (deserialized closure copies) still reach the same queue
    val q = EventStreamJob.streamJsonSink(emitted, "json_out") { (batchId, pid, it) =>
      assert(batchId >= 0 && pid >= 0, "replay-guard handles must be present")
      it.foreach(JsonSinkCapture.lines.add)
    }
    try {
      input.addData(Seq(Ev(1, base, 1, "click"), Ev(2, base.plusSeconds(10), 1, "click")))
      q.processAllAvailable()
      val lines = JsonSinkCapture.lines.toArray(Array.empty[String]).toSeq
      assert(lines.size == 1, s"TTL suppresses the second event: $lines")
      assert(lines.head.contains("\"key\":\"1:click\""), lines.head)
    } finally q.stop()
  }

  test("json file sink lands one JSON line per emitted event via the engine's text writer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val input = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("json_sink").toFile.getAbsolutePath + "/data"
    val ckpt = java.nio.file.Files.createTempDirectory("json_ckpt").toFile.getAbsolutePath
    val emitted = EventStreamJob.streamTtlCache(input.toDS(), ttlHours = 1)
    val q = EventStreamJob.streamJsonFileSink(emitted, out, ckpt)
    try {
      input.addData(Seq(Ev(1, base, 1, "click"), Ev(2, base.plusSeconds(10), 1, "click")))
      q.processAllAvailable()
      val lines = spark.read.text(out).collect().map(_.getString(0)).toSeq
      assert(lines.size == 1, s"TTL suppresses the second event: $lines")
      assert(lines.head.contains("\"key\":\"1:click\""), lines.head)
    } finally q.stop()
  }

  test("streaming doc curation drops late arrivals behind the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    def doc(id: Long, text: String, ts: Instant) =
      graft.model.IngestDoc(id, text, "en", ts)
    // quality-passing text: ≥100 tokens (full length factor), all
    // stopwords (stop_ratio 1), lang=en
    val good = ("the and of to in " * 25).trim
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocCurate(
      input.toDS().toDF(), watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("curate_late_out").start()
    try {
      input.addData(Seq(doc(1, good, base.plusSeconds(3600))))
      q.processAllAvailable() // watermark advances to ~base+50min
      // late: an hour behind the max event time, beyond the 10 min delay
      input.addData(Seq(doc(2, good + " extra", base)))
      q.processAllAvailable()
      val ids = spark.table("curate_late_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L))
      assert(!ids.contains(2L), s"late doc must be dropped by the watermark: $ids")
    } finally q.stop()
  }

  test("streaming doc curation == batch docCurate keep-set when arrival order is doc_id order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    // ingest in doc_id order, one second apart: first arrival per
    // content hash == min doc_id per hash == the batch canonical pick
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0))))
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocCurate(input.toDS().toDF())
    val q = out.writeStream.outputMode("append").format("memory").queryName("curate_out").start()
    try {
      docs.grouped((docs.size + 2) / 3).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("curate_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val batch = graft.operators.TextOps.docCurate(tables).filter(col("keep") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("JSONL landing-dir ingest streams into curation; corrupt lines flagged, not fatal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl_ingest").toFile.getAbsolutePath
    val good = ("the and of to in " * 25).trim
    def line(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"t","n_chars":${text.length}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "batch1.json"),
      Seq(line(1, good), line(2, good + " extra"), "{ corrupt line").mkString("\n").getBytes)
    val ingest = graft.streaming.DocStreamJob.jsonlDocStream(
      spark, dir, TrainingDataJob.JsonlDocSchema)
    // clean rows continue into the curation stream
    val curated = graft.streaming.DocStreamJob.streamDocCurate(
      ingest.filter(!col("is_corrupt"))
        .select(col("doc_id"), col("text"), col("lang"), col("ingest_ts")))
    val q = curated.writeStream.outputMode("append").format("memory")
      .queryName("jsonl_curated").start()
    // corrupt rows go to a quarantine sink as a second query on the source
    val q2 = ingest.filter(col("is_corrupt")).select(col("raw_line"))
      .writeStream.outputMode("append").format("memory")
      .queryName("jsonl_quarantine").start()
    try {
      q.processAllAvailable(); q2.processAllAvailable()
      val kept = spark.table("jsonl_curated").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L), s"kept=$kept")
      val quarantined = spark.table("jsonl_quarantine").collect().map(_.getString(0)).toSeq
      assert(quarantined == Seq("{ corrupt line"), quarantined.toString)
      // a second landing file streams incrementally; a duplicate text
      // is suppressed by the curation dedup state
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "batch2.json"),
        Seq(line(3, good), line(4, good + " fresh")).mkString("\n").getBytes)
      q.processAllAvailable()
      val kept2 = spark.table("jsonl_curated").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(1L, 2L, 4L), s"duplicate text must be suppressed: $kept2")
    } finally { q.stop(); q2.stop() }
  }

  test("doc curation stream killed mid-corpus resumes from checkpoint: keep-set identical, dedup state recovered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0))))
      .sortBy(_.doc_id).toSeq
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    val ckpt = java.nio.file.Files.createTempDirectory("curate_ckpt").toFile.getAbsolutePath
    val outDir = java.nio.file.Files.createTempDirectory("curate_sink").toFile.getAbsolutePath
    val input = MemoryStream[graft.model.IngestDoc]
    // parquet sink, not memory: the memory sink refuses checkpoint
    // recovery; the file sink's _spark_metadata transaction log is the
    // fault-tolerant exactly-once shape a production run uses
    def startQuery() =
      graft.streaming.DocStreamJob.streamDocCurate(input.toDS().toDF())
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    // phase 1: first batch, then KILL the query
    val q1 = startQuery()
    val phase1 = try {
      input.addData(batches.head); q1.processAllAvailable()
      spark.read.parquet(outDir).select("doc_id").collect().map(_.getLong(0)).toSet
    } finally q1.stop()
    // phase 2: remaining batches + a planted exact duplicate of a
    // PHASE-1 doc (new id, later ts). Its suppression proves the
    // content-hash dedup state crossed the restart, not just offsets.
    val plantedId = 999999L
    input.addData(batches(1))
    input.addData(batches(2) :+ graft.model.IngestDoc(
      plantedId, docs.head.text, docs.head.lang,
      base.plusSeconds(docs.last.doc_id + 1)))
    val q2 = startQuery()
    val all = try {
      q2.processAllAvailable()
      spark.read.parquet(outDir).select("doc_id").collect().map(_.getLong(0)).toSeq
    } finally q2.stop()
    assert(!all.contains(plantedId),
      "duplicate of a pre-kill doc must stay suppressed after restart (recovered state)")
    assert(all.size == all.toSet.size,
      s"restart must not re-emit committed docs: ${all.groupBy(identity).filter(_._2.size > 1).keys.take(5)}")
    assert(phase1.subsetOf(all.toSet), "pre-kill emissions must survive the restart")
    val batch = graft.operators.TextOps.docCurate(tables).filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all.toSet == batch,
      s"interrupted∪resumed ≠ batch: only-stream=${(all.toSet -- batch).take(5)} " +
        s"only-batch=${(batch -- all.toSet).take(5)}")
  }

  test("near-dup probe stream killed mid-corpus resumes from checkpoint with the full report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val mod = 5
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0))))
      .filter(_.doc_id % mod == 0).sortBy(_.doc_id).toSeq
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toFile.getAbsolutePath
    val outDir = java.nio.file.Files.createTempDirectory("neardup_sink").toFile.getAbsolutePath
    val input = MemoryStream[graft.model.IngestDoc]
    def startQuery() = graft.streaming.DocStreamJob.streamDocNearDup(
        input.toDS().toDF(), graft.operators.Dedup.baseBandIndex(tables, mod))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    val halves = docs.grouped((docs.size + 1) / 2).toSeq
    val q1 = startQuery()
    try { input.addData(halves.head); q1.processAllAvailable() } finally q1.stop()
    input.addData(halves(1))
    input.addData(Seq(graft.model.IngestDoc(999999L, "watermark sentinel", "en",
      base.plusSeconds(864000))))
    val q2 = startQuery()
    val got = try {
      q2.processAllAvailable()
      spark.read.parquet(outDir).filter($"doc_id" =!= 999999L).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
    } finally q2.stop()
    assert(got.map(_._1).distinct.length == got.length,
      "restart must not duplicate near-dup reports")
    // expected: same construction as the uninterrupted A32 case
    val pairsJ = graft.operators.Dedup.docMinhashLshPairs(tables).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val partners = pairsJ.keys.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = docs.map(_.doc_id).flatMap { d =>
      val basePs = partners.getOrElse(d, Set.empty[Long]).filter(_ % mod != 0)
      if (basePs.isEmpty) None
      else {
        val p = basePs.min
        Some(d -> (p, pairsJ((math.min(d, p), math.max(d, p)))))
      }
    }.toMap
    assert(expected.nonEmpty)
    assert(got.toMap == expected,
      s"interrupted∪resumed ≠ batch: only-stream=${(got.toMap.keySet -- expected.keySet).take(5)} " +
        s"only-batch=${(expected.keySet -- got.toMap.keySet).take(5)}")
  }

  test("streaming near-dup probe == batch C8b restricted to base partners") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val mod = 5
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2), base))
      .filter(_.doc_id % mod == 0).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocNearDup(
      input.toDS().toDF(), graft.operators.Dedup.baseBandIndex(tables, mod))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    try {
      input.addData(docs); q.processAllAvailable()
      // far-future sentinel advances the watermark past every real row
      input.addData(Seq(graft.model.IngestDoc(999999L, "watermark sentinel", "en",
        base.plusSeconds(864000))))
      q.processAllAvailable()
      val got = spark.table("neardup_out").filter($"doc_id" =!= 999999L).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // expected: the symmetric LSH pair set at the same threshold,
      // partners restricted to BASE docs (the static index), min id
      val pairsJ = graft.operators.Dedup.docMinhashLshPairs(tables).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val partners = pairsJ.keys.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = docs.map(_.doc_id).flatMap { d =>
        val basePs = partners.getOrElse(d, Set.empty[Long]).filter(_ % mod != 0)
        if (basePs.isEmpty) None
        else {
          val p = basePs.min
          Some(d -> (p, pairsJ((math.min(d, p), math.max(d, p)))))
        }
      }.toMap
      assert(expected.nonEmpty, "planted near-dups must produce base partners")
      assert(got == expected,
        s"stream≠batch: only-stream=${(got.keySet -- expected.keySet).take(5)} " +
          s"only-batch=${(expected.keySet -- got.keySet).take(5)}")
    } finally q.stop()
  }

  test("streaming anomaly flags: offline MAD thresholds flag a live spike hour, not the baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val thresholds = Seq(("click", 2.0, 1.0)).toDF("event_type", "med", "mad")
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamAnomalyFlags(input.toDS().toDF(), thresholds)
    val q = out.writeStream.outputMode("append").format("memory").queryName("anom_out").start()
    try {
      // hour 0: baseline rate 2; hour 1: spike of 8 (> med + 3·mad = 5)
      val baseline = (0 until 2).map(i => Ev(i, base.plusSeconds(60L * i + 1), 1, "click"))
      val spike = (0 until 8).map(i => Ev(100 + i, base.plusSeconds(3600L + 60L * i + 1), 1, "click"))
      input.addData(baseline ++ spike)
      q.processAllAvailable()
      input.addData(Seq(Ev(999, base.plusSeconds(864000), 9, "click"))) // watermark sentinel
      q.processAllAvailable()
      input.addData(Seq(Ev(1000, base.plusSeconds(864060), 9, "click")))
      q.processAllAvailable()
      val got = spark.table("anom_out").collect()
        .map(r => (r.getTimestamp(1).toInstant, r.getLong(2), r.getInt(5))).toSet
      assert(got.contains((base, 2L, 0)), s"baseline hour must stay unflagged: $got")
      assert(got.contains((base.plusSeconds(3600), 8L, 1)), s"spike hour must flag: $got")
    } finally q.stop()
  }

  test("streaming count-min: micro-batched sketch == batch sketch; estimates never undercount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamCountMin(input.toDS().toDF())
    val q = out.writeStream.outputMode("complete").format("memory").queryName("cms_stream").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("cms_stream").collect().head.getSeq[Long](0)
      // the sketch merge is exact integer math, so micro-batching must
      // be invisible: the streamed sketch equals the one-shot batch
      // sketch over the same rows, cell for cell
      val batch = EventStreamJob.streamCountMin(eventsData.toDF())
        .collect().head.getSeq[Long](0)
      assert(streamed == batch, "streamed sketch must equal the batch sketch cell-for-cell")
      // never-undercount law via driver-side bucket replication
      import graft.functions.{CountMin, Hashing}
      def h60(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
      }
      val exact = eventsData.groupBy(_.user_id).view.mapValues(_.size.toLong)
      exact.foreach { case (uid, n) =>
        val base = math.floorMod(h60(uid.toString), Hashing.M30)
        val est = (0 until CountMin.D).map { r =>
          val (a, b) = Hashing.Perms(r)
          val pos = math.floorMod(math.floorMod(a * base + b, Hashing.P), CountMin.W.toLong)
          streamed((r * CountMin.W + pos).toInt)
        }.min
        assert(est >= n, s"user $uid: sketch estimate $est < exact $n")
      }
    } finally q.stop()
  }

  test("streaming quality-model with TRAINED weights == batch docQualityModelTrained per doc") {
    // the train-offline/apply-online shape with the E30t artifact: the
    // trained weight relation plugs into the same online scorer
    // unchanged, and the stream reproduces the batch scores bit-exactly
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0))))
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocQualityModel(
      input.toDS().toDF(), graft.operators.TextOps.qualityModelTrainedWeights(tables))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qm_trained_stream").start()
    try {
      input.addData(docs); q.processAllAvailable()
      input.addData(Seq(graft.model.IngestDoc(999999L, "sentinel", "en",
        base.plusSeconds(864000))))
      q.processAllAvailable()
      val got = spark.table("qm_trained_stream").filter($"doc_id" =!= 999999L)
        .select($"doc_id", $"n_tokens",
          (floor($"score" * 1e6 + 0.5) / 1e6).as("score_r"), $"keep")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
      val batch = graft.operators.TextOps.docQualityModelTrained(tables).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getInt(4))).toMap
      assert(got.keySet == batch.keySet,
        s"doc sets differ: ${(got.keySet diff batch.keySet).take(3)}")
      got.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id: stream $v != batch ${batch(id)}")
      }
    } finally q.stop()
  }

  test("streaming quality-model scores == batch docQualityModel per doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val docs = tables.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0))))
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.model.IngestDoc]
    val out = graft.streaming.DocStreamJob.streamDocQualityModel(
      input.toDS().toDF(), graft.operators.TextOps.qualityModelWeights(tables))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qm_stream").start()
    try {
      docs.grouped((docs.size + 1) / 2).foreach { b => input.addData(b); q.processAllAvailable() }
      // sentinel advances the watermark so every real group closes
      input.addData(Seq(graft.model.IngestDoc(999999L, "sentinel", "en",
        base.plusSeconds(864000))))
      q.processAllAvailable()
      val got = spark.table("qm_stream").filter($"doc_id" =!= 999999L)
        .select($"doc_id", $"n_tokens",
          (floor($"score" * 1e6 + 0.5) / 1e6).as("score_r"), $"keep")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
      val batch = graft.operators.TextOps.docQualityModel(tables).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getInt(4))).toMap
      assert(got.keySet == batch.keySet,
        s"doc sets differ: ${(got.keySet diff batch.keySet).take(3)}")
      got.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id: stream $v != batch ${batch(id)}")
      }
    } finally q.stop()
  }

  test("streaming KMV distinct estimate: final emission == batch B47 bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvDistinctKmv(input.toDS())
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("kmv_out").start()
    try {
      // 3 micro-batches in REVERSE time order: the sketch is a set
      // property, so batching and order must not matter
      val revs = eventsData.reverse
      revs.grouped((revs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      // last emission per type (Update mode re-emits per batch)
      val streamed = spark.table("kmv_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1).toMap
        .map { case (ty, (_, kept, est)) => ty -> (kept, est) }
      val batch = graft.operators.Analytics.qDistinctKmv(tables).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (ty, v) =>
        assert(v == batch(ty), s"$ty: stream $v != batch ${batch(ty)}")
      }
    } finally q.stop()
  }
  test("streaming bottom-k quantile sample == batch aggregator bit-for-bit under reverse-order batching") {
    import spark.implicits._
    import graft.model.EvVal
    implicit val sqlCtx = spark.sqlContext
    val k = 64 // small enough that the sample actually churns per batch
    val input = MemoryStream[EvVal]
    val out = EventStreamJob.streamEvQuantileSample(input.toDS(), k)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("qsample_out").start()
    try {
      val evs = tables.events
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EvVal].collect().toSeq.sortBy(e => (e.ts.toEpochMilli, e.event_id))
      // reverse-time micro-batches: the sample is a set property, so
      // batching and arrival order must not matter
      evs.reverse.grouped((evs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("qsample_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1._2).toMap
      // batch side: the SAME aggregator over the events table
      val bks = org.apache.spark.sql.functions.udaf(
        graft.functions.BottomKSample(k),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble))
      val batch = tables.events
        .select(col("event_type"),
          graft.functions.Hashing.md5_60(
            concat(lit("qsample:"), col("event_id").cast("string"))).as("hv"),
          col("value").as("x"))
        .groupBy(col("event_type")).agg(bks(col("hv"), col("x")).as("sample"))
        .select(col("event_type"), sort_array(col("sample")).as("sv"))
        .collect().map { r =>
          val sv = r.getSeq[Double](1)
          def pick(p: Double) =
            sv(math.floor(p * (sv.length - 1).toDouble + 0.5).toInt)
          r.getString(0) -> ((sv.length.toLong, pick(0.25), pick(0.50),
            pick(0.75), pick(0.90)))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (ty, v) =>
        assert(v == batch(ty),
          s"$ty: stream $v != batch ${batch(ty)} — bottom-k must be order-free")
      }
    } finally q.stop()
  }

  test("streaming top-k == batch aggregator bit-for-bit under reverse-order batching") {
    import spark.implicits._
    import graft.model.EvVal
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val input = MemoryStream[EvVal]
    val out = EventStreamJob.streamEvTopK(input.toDS(), k)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("topk_out").start()
    try {
      val evs = tables.events
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EvVal].collect().toSeq.sortBy(e => (e.ts.toEpochMilli, e.event_id))
      evs.reverse.grouped((evs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("topk_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .zipWithIndex.groupBy(x => (x._1._1, x._1._2)).view
        .mapValues(_.maxBy(_._2)._1).toMap.values
        .groupBy(_._1).map { case (ty, rs) =>
          ty -> rs.toSeq.sortBy(_._2).map(r => (r._3, r._4))
        }
      val agg = graft.functions.TopKRows(k)
      val batch = tables.events
        .select(col("event_type"), col("value"), col("event_id")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1).map { case (ty, rows) =>
          ty -> agg.finish(rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, (r._2, r._3))))
            .map { case (v, id) => (id, v) }
        }
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (ty, got) =>
        assert(got == batch(ty),
          s"$ty: stream $got != batch ${batch(ty)} — top-k must be order-free")
      }
    } finally q.stop()
  }

  test("streaming HLL registers == batch card bit-for-bit under reverse-order batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvHllDistinct(input.toDS())
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("hll_out").start()
    try {
      val revs = eventsData.reverse
      revs.grouped((revs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("hll_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1).toMap
        .map { case (ty, (_, nz, est)) => ty -> (nz, est) }
      val batch = graft.operators.Analytics.qHllPortable(tables).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (ty, v) =>
        assert(v == batch(ty),
          s"$ty: stream (n_zero, est) $v != batch ${batch(ty)} — max-merge must be order-free")
      }
    } finally q.stop()
  }

  test("streaming token bucket decisions roll up to the batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamTokenBucket(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("tb_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("tb_out").filter($"user_id" =!= -1L)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"allowed", 1L).otherwise(0L)).as("n_allowed"),
          sum(when($"allowed", 0L).otherwise(1L)).as("n_dropped"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = EventOps.evTokenBucket(tables).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"stream≠batch: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
      // every event got exactly one decision
      val nDecisions = spark.table("tb_out").filter($"user_id" =!= -1L).count()
      assert(nDecisions == eventsData.size, s"decisions=$nDecisions events=${eventsData.size}")
    } finally q.stop()
  }

  test("streaming cdc novelty: empty base == batch chunking; full base == zero novelty") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2024-01-01T00:00:00Z")
    // multi-byte-planted corpus: stream ≡ batch must hold where byte
    // and char offsets diverge, not just on ASCII
    val tCdc = graft.operators.TextOps.plantUtf8Docs(tables)
    val docs = tCdc.documents.select("doc_id", "text", "lang").collect()
      .map(r => graft.model.IngestDoc(r.getLong(0), r.getString(1), r.getString(2),
        base.plusSeconds(r.getLong(0) % 100000)))
      .sortBy(_.doc_id).toSeq
    assert(docs.exists(d => d.text.getBytes("UTF-8").length != d.text.length),
      "planted corpus must contain multi-byte docs")
    val batchChunks = graft.operators.TextOps.docCdcChunks(tCdc).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    val perDoc = batchChunks.groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
    val allHashes: scala.collection.Set[String] = batchChunks.map(_._3).toSet

    def run(baseH: scala.collection.Set[String], name: String) = {
      val input = MemoryStream[graft.model.IngestDoc]
      val out = graft.streaming.DocStreamJob.streamDocCdcNovelty(input.toDS(), baseH)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        docs.grouped((docs.size + 2) / 3).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        spark.table(name).collect()
          .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getDouble(6)))).toMap
      } finally q.stop()
    }
    // empty base: everything is novel, and chunk counts/bytes must
    // equal the oracle-gated batch relation's
    val fresh = run(Set.empty[String], "cdc_nov_empty")
    perDoc.foreach { case (id, (nc, bytes)) =>
      val (snc, nk, sb, nb, nov) = fresh(id)
      assert(snc == nc && nk == 0L && sb == 0L && nb == bytes && nov == 1.0,
        s"doc $id empty-base mismatch: got ($snc,$nk,$sb,$nb,$nov) want ($nc,0,0,$bytes,1.0)")
    }
    // full base: nothing is novel
    val known = run(allHashes, "cdc_nov_full")
    perDoc.foreach { case (id, (nc, bytes)) =>
      val (snc, nk, sb, nb, nov) = known(id)
      assert(snc == nc && nk == nc && sb == bytes && nb == 0L && nov == 0.0,
        s"doc $id full-base mismatch: got ($snc,$nk,$sb,$nb,$nov)")
    }
  }

  test("streaming burst windows == driver-recomputed prefix-baseline incidents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreamJob.streamEvBurstWindows(input.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("burst_out").start()
    try {
      eventsData.grouped((eventsData.size + 2) / 3).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      val lastTs = eventsData.map(_.ts).max
      input.addData(Seq(Ev(999999L, lastTs.plusSeconds(864000), -1L, "sentinel")))
      q.processAllAvailable()
      val streamed = spark.table("burst_out").filter($"event_type" =!= "sentinel")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      // driver reference: per type, hourly counts; baseline = first 48
      // present hours (integer moments); runs of CONSECUTIVE epoch
      // hours above mu + 2 sigma, trailing run closed at end of data.
      val hourUs = 3600L * 1000000L
      val reference = eventsData.groupBy(_.event_type).flatMap { case (ty, evs) =>
        val hours = evs.groupBy { e =>
          java.time.temporal.ChronoUnit.MICROS.between(Instant.EPOCH, e.ts) / hourUs * hourUs
        }.view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        if (hours.length < 48) Nil
        else {
          val base = hours.take(48).map(_._2)
          val mu = base.sum.toDouble / base.length
          val sumsq = base.map(n => n * n).sum.toDouble
          val sigma = math.sqrt(math.max(sumsq / base.length - mu * mu, 0.0))
          val thr = mu + 2.0 * sigma
          val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
          var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          hours.foreach { case (h, n) =>
            if (cur.nonEmpty && h > cur.last._1 + hourUs) {
              runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
            }
            if (n.toDouble > thr) cur += ((h, n))
            else if (cur.nonEmpty) {
              runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
            }
          }
          if (cur.nonEmpty) runs += cur.toSeq
          runs.map { r =>
            (ty, r.head._1 / 1000, r.last._1 / 1000, r.length.toLong,
              r.map(_._2).max, r.map(_._2).sum)
          }
        }
      }.toSet
      assert(streamed == reference,
        s"stream≠reference: only-stream=${(streamed -- reference).take(3)} " +
          s"only-ref=${(reference -- streamed).take(3)}")
      assert(streamed.nonEmpty, "corpus must produce at least one burst incident")
    } finally q.stop()
  }

  test("streaming HTML extract twin (E64b): stream ≡ batch extraction per document") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = tables.documents.select(col("doc_id")).as[Long].collect().sorted.toSeq
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = ids.map(id => (id, t0,
      if (id % 17 == 0) s"plain text payload $id without any markup"
      else graft.operators.TextOps.htmlPayload(id)))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.DocStreamJob.streamDocHtmlExtract(
      input.toDS().toDF("doc_id", "ingest_ts", "payload"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("html_twin").start()
    try {
      rows.grouped((rows.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("html_twin").drop("ingest_ts")
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.TextOps.docHtmlExtract(tables)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream≠batch: ${(streamed -- batch).take(2)} vs ${(batch -- streamed).take(2)}")
    } finally q.stop()
  }

  test("streaming host throttle twin (E70b): stream ≡ batch verdicts; windows close incrementally under the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = tables.documents.select(col("doc_id")).as[Long].collect().sorted.toSeq
    def tsS(id: Long): Long = (id * 37) % 600
    // feed at a +1 h offset: an event time of exactly epoch 0 equals
    // the INITIAL watermark and Spark drops it as late before the
    // stateful operator ever sees it (observed: doc 0 vanished); the
    // offset is a multiple of windowSec, so windows map back exactly
    val off = 3600L
    val rows = ids.map(id => (id,
      new java.sql.Timestamp((off + tsS(id)) * 1000L), graft.operators.UrlOps.linkBase(id)))
    // feed in event-time order bands so the watermark closes windows
    // INCREMENTALLY (the mid-stream path), then a far-future flusher
    // closes the tail; the flusher's own window stays open and must
    // never emit
    val bands = Seq(
      rows.filter(r => tsS(r._1) < 200),
      rows.filter(r => tsS(r._1) >= 200 && tsS(r._1) < 400),
      rows.filter(r => tsS(r._1) >= 400))
    val flusher = Seq((999999L,
      new java.sql.Timestamp((off + 2000L) * 1000L), "https://site0.example.com/f"))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.DocStreamJob.streamHostThrottle(
      input.toDS().toDF("doc_id", "ingest_ts", "url"),
      maxPerWindow = 1, windowSec = 300, watermarkDelay = "30 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("throttle_twin").start()
    try {
      bands.foreach { b => input.addData(b); q.processAllAvailable() }
      val midCount = spark.table("throttle_twin").count()
      assert(midCount > 0, "no window closed before the flusher — incremental path untested")
      input.addData(flusher); q.processAllAvailable()
      val streamed = spark.table("throttle_twin").collect()
        .map { r => // undo the feed offset on the two time columns
          val s = r.toSeq
          s.updated(2, s(2).asInstanceOf[Long] - off)
            .updated(3, s(3).asInstanceOf[Long] - off)
        }.toSet
      assert(!streamed.exists(_.head == 999999L), "the flusher's open window must not emit")
      val batch = graft.operators.UrlOps.docHostThrottle(
        tables, maxPerWindow = 1, windowSec = 300).collect()
        .map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream≠batch: ${(streamed -- batch).take(2)} vs ${(batch -- streamed).take(2)}")
      assert(batch.exists(r => r.last == 0), "plant too sparse: no defer verdicts")
    } finally q.stop()
  }

  test("streaming URL canon twin (E66b): stream ≡ batch canon per document") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = tables.documents.select(col("doc_id")).as[Long].collect().sorted.toSeq
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = ids.map(id => (id, t0, graft.operators.UrlOps.urlPayload(id)))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.DocStreamJob.streamDocUrlCanon(
      input.toDS().toDF("doc_id", "ingest_ts", "url"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("url_twin").start()
    try {
      rows.grouped((rows.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("url_twin").drop("ingest_ts")
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.UrlOps.docUrlCanon(tables)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream≠batch: ${(streamed -- batch).take(2)} vs ${(batch -- streamed).take(2)}")
    } finally q.stop()
  }
}

/** Executor-reachable capture for the per-partition JSON sink test. */
object JsonSinkCapture {
  val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
