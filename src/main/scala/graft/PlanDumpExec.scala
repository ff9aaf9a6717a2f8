package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Executed-plan evidence dumper — the [[PlanDump]] sibling for queries
  * that eagerly checkpoint during construction (withShared /
  * stableCheckpoint): their final frame is a bare `Scan ExistingRDD`,
  * so the honest plan evidence is EVERY plan the query executes, not
  * the one it returns. `runMain graft.PlanDumpExec <sfDir> <key[,key…]>
  * <outDir> [suffix]` registers a QueryExecutionListener, runs each
  * named registry entry through the noop sink, drains the listener
  * bus, and writes all executed plans (numbered, with a per-file
  * Exchange/Join tally) to `<outDir>/<key>_<suffix>.txt`.
  */
object PlanDumpExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pats = args(1).split(',').filter(_.nonEmpty)
    val outDir = args(2)
    val suffix = if (args.length > 3) args(3) else "exec"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(8, Runtime.getRuntime.availableProcessors).toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // training_data_job is benched outside the registry (Bench's
    // composed-pipeline entry) — plan-auditable here under its bench name
    val extra: Map[String, (SparkSession, String) => Unit] = Map(
      "training_data_job" -> ((s: SparkSession, dir: String) =>
        TrainingDataJob.run(graft.sources.Tables(s, dir), "target/plandump-tdj")))
    val names = (SparkEntry.queries.keys ++ extra.keys)
      .filter(n => pats.exists(n.contains)).toSeq.sorted
    names.foreach { name =>
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          plans.add(qe.executedPlan.toString)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        extra.get(name) match {
          case Some(run) => run(spark, sfDir)
          case None =>
            SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
        // QueryExecutionListener delivery is async on the listener bus
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      } finally spark.listenerManager.unregister(listener)
      import scala.jdk.CollectionConverters._
      val all = plans.asScala.toSeq
      val body = all.zipWithIndex.map { case (p, i) =>
        s"=== execution ${i + 1} of ${all.size} ===\n$p"
      }.mkString("\n")
      def tally(token: String): Int =
        all.map(p => token.r.findAllIn(p).size).sum
      val header =
        s"""query: $name
           |executions: ${all.size}
           |exchanges: ${tally("Exchange (hash|range|Single|Round)")}
           |sort_merge_joins: ${tally("SortMergeJoin")}
           |broadcast_hash_joins: ${tally("BroadcastHashJoin")}
           |shuffled_hash_joins: ${tally("ShuffledHashJoin")}
           |cartesian: ${tally("CartesianProduct")}
           |""".stripMargin
      val pw = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try { pw.println(header); pw.println(body) } finally pw.close()
      println(s"PLANDUMPEXEC $name executions=${all.size} -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
