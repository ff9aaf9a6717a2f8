package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** The document-side daemon, KesMain's shape applied to corpus
  * curation: watch a JSONL landing directory (the batch-drop ingest
  * pattern crawled corpora use), parse with the ENFORCED document
  * schema, stream the clean rows through the curation pipeline
  * (quality + langid + watermark-bounded content-hash dedup), and
  * materialize the keep-set as parquet — while corrupt lines land raw
  * and replayable in a quarantine sink instead of killing the job.
  *
  *   runMain graft.CurateMain <inDir> <outDir> [checkpointDir] [--once]
  *
  * Layout: `<outDir>/docs` (curated parquet, exactly-once via the file
  * sink's transaction log), `<outDir>/_quarantine` (raw corrupt
  * lines), checkpoints under `<checkpointDir>/{docs,quarantine}` (two
  * queries over one source → two independent checkpoints; both resume
  * across restarts — the curation dedup state included,
  * StreamingSpec's kill+restart case).
  *
  * Env config mirrors KesMain: METRICS_PORT serves the same
  * Prometheus listener (doc_curate_in/unique/kept observed counters),
  * default 9000, 0 disables. `--once` drains the backlog
  * (Trigger.AvailableNow) and exits — the batch-sweep mode; without
  * it the daemon keeps watching for new landing files.
  */
object CurateMain {

  private[graft] def resolve(args: Array[String])
      : (String, String, String, Boolean) = {
    val pos = args.filterNot(_.startsWith("--"))
    (pos(0), pos(1), pos.lift(2).getOrElse("curate-ckpt"), args.contains("--once"))
  }

  /** The daemon's two queries (curated parquet + raw quarantine) over
    * one landing-dir source, started. Factored out so specs drive the
    * exact production composition with a test session.
    */
  private[graft] def startQueries(spark: org.apache.spark.sql.SparkSession,
      in: String, out: String, checkpoint: String, once: Boolean)
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    val ingest = streaming.DocStreamJob.jsonlDocStream(
      spark, in, TrainingDataJob.JsonlDocSchema)
    val curated = streaming.DocStreamJob.streamDocCurate(
      ingest.filter(!col("is_corrupt"))
        .select(col("doc_id"), col("text"), col("lang"), col("ingest_ts")))
    val wDocs = curated.writeStream
      .format("parquet").option("path", s"$out/docs")
      .option("checkpointLocation", s"$checkpoint/docs")
      .outputMode("append")
    val wQuar = ingest.filter(col("is_corrupt")).select(col("raw_line").as("value"))
      .writeStream
      .format("text").option("path", s"$out/_quarantine")
      .option("checkpointLocation", s"$checkpoint/quarantine")
      .outputMode("append")
    Seq(wDocs, wQuar).map { w =>
      (if (once) w.trigger(Trigger.AvailableNow()) else w).start()
    }
  }

  private[graft] def run(args: Array[String], env: Map[String, String]): Unit = {
    val (in, out, checkpoint, once) = resolve(args)
    KesMain.configureLogging(env)
    val spark = GraftSession.local()
    System.err.println(s"[curate] ${KesMain.versionStamp} starting")
    val metrics = new graft.streaming.GraftMetricsListener
    spark.streams.addListener(metrics)
    val server = KesMain.startMetrics(env, metrics)
    try {
      val qs = startQueries(spark, in, out, checkpoint, once)
      val hook = new Thread(() => {
        qs.foreach(q => scala.util.Try(if (q.isActive) q.stop()))
        scala.util.Try(server.foreach(_.stop(0)))
        scala.util.Try(spark.stop())
      }, "graft-curate-shutdown")
      Runtime.getRuntime.addShutdownHook(hook)
      try qs.foreach(_.awaitTermination())
      finally scala.util.Try(Runtime.getRuntime.removeShutdownHook(hook))
    } finally {
      scala.util.Try(server.foreach(_.stop(0)))
      spark.streams.removeListener(metrics)
    }
  }

  def main(args: Array[String]): Unit = {
    run(args, sys.env)
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(_.stop())
  }
}
