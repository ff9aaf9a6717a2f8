package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-volume probe for the G26 persisted-IVFPQ claim — whose
  * measured verdict at test SF is HONESTLY NEGATIVE and is recorded
  * as such (SURVEY §7m): at 2 000 vectors × 16 cells the default
  * 8-query BATCH probes the UNION of per-query probe sets — measured
  * 15 of 16 cells — so partition pruning buys nothing, and the code
  * relation's m rows/vector makes the index side scan MORE rows than
  * brute force (19 024 vs 4 000). The claim the card actually
  * supports is the per-query / large-nCells regime: pruning scales as
  * (batch·nProbe)/nCells unioned, so at production shape (thousands
  * of cells, per-query or small-batch serving) the scan fraction is
  * nProbe/nCells, and each code row is 3 small ints vs a 64-float
  * embedding (~20× bytes/row the row count understates). `runMain
  * graft.IvfPqProbe [sfDir]` prints both phases' summed scan_rows via
  * GraftQueryAudit plus the measured probe-union fraction.
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
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_probe").toString
    graft.sources.Sinks.writeIvfPqIndex(t, dir)
    val nCorpus = t.embeddings.count()

    // each phase gets its own audit; a phase's bill is the SUM over
    // all its actions (the index path legitimately runs several
    // bounded artifact collects before the search itself)
    def measure(label: String)(body: => Unit): Unit = {
      val audit = new graft.sources.GraftQueryAudit
      spark.listenerManager.register(audit)
      body
      // listener delivery is async; settle until the count is stable
      var last = -1
      while (audit.size != last) { last = audit.size; Thread.sleep(500) }
      spark.listenerManager.unregister(audit)
      val rows = audit.snapshot(spark).collect()
      val scan = rows.map(_.getLong(2)).sum
      val ms = rows.map(_.getLong(1)).sum
      println(s"PROBE $label actions=${rows.length} scan_rows_total=$scan " +
        s"duration_ms_total=$ms corpus_rows=$nCorpus")
    }
    measure("brute_force") {
      graft.operators.Similarity.annTopkBruteforce(t)
        .write.mode("overwrite").format("noop").save()
    }
    measure("ivfpq_index") {
      graft.sources.Sinks.searchIvfPqIndex(t, dir)
        .write.mode("overwrite").format("noop").save()
    }
    // how much pruning the default 8-query BATCH actually buys: the
    // scan reads the UNION of all queries' probe sets
    val coarse = graft.sources.Sinks.readQuantizer(spark, s"$dir/coarse")
    val union = graft.operators.Similarity.probeCells(t, coarse, 8, 4)
      .select(col("pcell")).distinct().count()
    println(s"PROBE probe_union_cells=$union of ${coarse.length} " +
      s"(per query: 4 of ${coarse.length})")
    spark.stop()
  }
}
