package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-volume probe for the G26 persisted-IVFPQ claim, per serving
  * shape. Round-10 history: at the then-default nCells=16 with the
  * row-per-(vector, subspace) code layout, the 8-query batch probed
  * 15/16 cells and the index scanned MORE rows than brute force
  * (19 024 vs 4 000) — an honestly negative verdict. Round 11 changes
  * both knobs the arithmetic said were at fault: the code layout packs
  * the m codes into ONE row per vector, and nCells defaults to the
  * FAISS sizing rule 4·√N ([[graft.sources.Sinks.autoNCells]]). This
  * probe measures the result at per-query (batch=1) and 8-query batch
  * serving: probe-union cells, scanned code rows vs brute-force corpus
  * rows, and scanned BYTES (probed cell dirs' parquet files vs the
  * embeddings parquet) — the number production serving actually pays.
  *
  * `runMain graft.IvfPqProbe [sfDir] [nCells]` (nCells defaults to
  * the autoNCells rule). Results recorded in SURVEY §7n.
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.ensureRegistered(spark)
    val t = graft.sources.Tables(spark, sfDir)
    val nCorpus = t.embeddings.count()
    val nCells = if (args.length > 1) args(1).toInt
                 else graft.sources.Sinks.autoNCells(nCorpus)
    val nProbe = 4
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_probe").toString
    graft.sources.Sinks.writeIvfPqIndex(t, dir, nCells = nCells)

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(c => dirBytes(c.getPath)).sum
    }
    val embBytes = dirBytes(s"$sfDir/embeddings.parquet")

    // each phase gets its own audit; a phase's bill is the SUM over
    // all its actions (the index path legitimately runs several
    // bounded artifact collects before the search itself)
    def measure(label: String)(body: => Unit): (Long, Long) = {
      val audit = new graft.sources.GraftQueryAudit
      spark.listenerManager.register(audit)
      body
      // listener delivery is async; N consecutive stable polls before
      // trusting the totals (a single quiet 500 ms window can undercount
      // when the bus drains late — r10 ADVICE)
      var last = -1
      var stable = 0
      while (stable < 3) {
        if (audit.size == last) stable += 1 else { stable = 0; last = audit.size }
        Thread.sleep(500)
      }
      spark.listenerManager.unregister(audit)
      val rows = audit.snapshot(spark).collect()
      val scan = rows.map(_.getLong(2)).sum
      val ms = rows.map(_.getLong(1)).sum
      println(s"PROBE $label actions=${rows.length} scan_rows_total=$scan " +
        s"duration_ms_total=$ms corpus_rows=$nCorpus")
      (scan, ms)
    }

    val coarse = graft.sources.Sinks.readQuantizer(spark, s"$dir/coarse")
    for (batch <- Seq(1, 8)) {
      val probed = graft.operators.Similarity.probeCells(t, coarse, batch, nProbe)
        .select(col("pcell")).distinct().collect().map(_.getLong(0)).sorted
      val codeBytes = probed.map(c => dirBytes(s"$dir/codes/cell=$c")).sum
      val (bruteScan, _) = measure(s"brute_force_batch$batch") {
        graft.operators.Similarity.annTopkBruteforce(t, nQueries = batch)
          .write.mode("overwrite").format("noop").save()
      }
      val (idxScan, _) = measure(s"ivfpq_index_batch$batch") {
        graft.sources.Sinks.searchIvfPqIndex(t, dir, nQueries = batch)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE shape batch=$batch nCells=$nCells nProbe=$nProbe " +
        f"probe_union_cells=${probed.length} " +
        f"cell_fraction=${probed.length.toDouble / nCells}%.4f " +
        f"scan_rows index=$idxScan brute=$bruteScan " +
        f"scan_bytes code_partitions=$codeBytes embeddings=$embBytes " +
        f"bytes_ratio=${codeBytes.toDouble / embBytes}%.4f")
    }
    spark.stop()
  }
}
