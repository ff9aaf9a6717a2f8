package graft

import org.apache.spark.sql.functions._

/** Online-ANN serving probe — the measurement behind closing the
  * "static side scans the corpus per micro-batch" weak: build the
  * IVFPQ index at the probe SF (auto-sized cells, the deploy default),
  * then drive the SAME query stream through both serving forms and
  * report per-batch wall latency plus the static-side scan volume the
  * audit records. The pruned server's scan is ∝ probed cells; the
  * composable server's is the whole codes relation — the ratio is the
  * number that scales with corpus size while the probed set does not.
  * `runMain graft.AnnServeProbe [sfDir]`.
  */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("annserve_probe").toString
    graft.sources.Sinks.writeIvfPqIndex(t, idx) // autoNCells sizing
    val vecs = t.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](1))
    val codesRows = spark.read.parquet(s"$idx/codes").count()
    val nBatches = 12
    val warm = 3

    // pruned (deploy form): foreachBatch re-plan, cell-pruned scan
    val audit = new graft.streaming.AnnStreamJob.AnnServeAudit
    val inP = MemoryStream[(Long, Seq[Double])]
    val qP = graft.streaming.AnnStreamJob.streamAnnServePruned(
      inP.toDS().toDF("q_id", "v"), idx, audit = Some(audit)) { (_, _) => () }
    val prunedMs = try {
      (0 until warm + nBatches).map { b =>
        val t0 = System.nanoTime()
        inP.addData(vecs.indices.map(i => ((b * 8 + i + 1000L), vecs(i))))
        qP.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }.drop(warm)
    } finally qP.stop()

    // composable form: watermark pipeline, full static scan per batch
    val inU = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val outU = graft.streaming.AnnStreamJob.streamAnnServe(
      inU.toDS().toDF("q_id", "v", "ingest_ts"), idx)
    val qU = outU.writeStream.outputMode("append").format("noop").start()
    val unprunedMs = try {
      (0 until warm + nBatches).map { b =>
        val ts = java.sql.Timestamp.from(base.plusSeconds(b * 3600L))
        val t0 = System.nanoTime()
        inU.addData(vecs.indices.map(i => ((b * 8 + i + 1000L), vecs(i), ts)))
        qU.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }.drop(warm)
    } finally qU.stop()

    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      (s.head, s(s.size / 2))
    }
    val (pMin, pMed) = stats(prunedMs)
    val (uMin, uMed) = stats(unprunedMs)
    val scanned = audit.batches.drop(warm).map(_.staticRowsScanned)
    println(f"ANNSERVEPROBE $dir codes_rows=$codesRows " +
      f"pruned_scan_rows=${scanned.max} " +
      f"scan_fraction=${scanned.max.toDouble / codesRows}%.4f " +
      f"pruned_batch_ms_min=$pMin%.0f pruned_batch_ms_med=$pMed%.0f " +
      f"unpruned_batch_ms_min=$uMin%.0f unpruned_batch_ms_med=$uMed%.0f")
    spark.stop()
  }
}
