package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.util.QueryExecutionListener

/** G21: batch-query audit log — the engine's own telemetry as a
  * relation. GraftMetricsListener covers the streaming side; this is
  * its batch complement: a QueryExecutionListener recording, per
  * completed action, wall duration plus the two numbers that matter
  * for a 100 TB capacity review — rows scanned off storage (Σ parquet
  * scan output) and rows pushed through shuffles (Σ exchange write
  * records). Reading the audit after a pipeline run answers "which
  * job re-scans the corpus" and "where did the shuffle volume go"
  * without a UI — the same scan-count discipline the PlanSpec laws
  * enforce statically, observed at runtime. `snapshot` serves the
  * accumulated log as a DataFrame (bounded: one row per action);
  * `failures` count keeps errored actions visible.
  */
final class GraftQueryAudit extends QueryExecutionListener {
  final case class Entry(action: String, durationMs: Long,
      scanRows: Long, shuffleWriteRows: Long)

  private val entries = new ConcurrentLinkedQueue[Entry]()
  private val failureCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Errored-action count (atomic: listener callbacks are single-
    * threaded today, but a lost increment on the one number that
    * flags failures is not a race worth leaving latent). */
  def failures: Long = failureCount.get()

  // AQE wraps materialized stages in QueryStageExec (childless — the
  // real subtree hangs off .plan), so a plain children-walk sees no
  // scans or exchanges under adaptive execution.
  // ReusedExchangeExec is a STOP: its child is the original exchange
  // subtree, already reached (and its metrics already summed) through
  // that subtree's normal parent path — descending again would count
  // every scan/shuffle under a reused exchange twice, inflating
  // exactly the two numbers the audit exists to report.
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
    case s: QueryStageExec => s +: walk(s.plan)
    case r: ReusedExchangeExec => Seq(r)
    case other => other +: other.children.flatMap(walk)
  }

  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
    val nodes = walk(qe.executedPlan)
    def metric(sel: PartialFunction[SparkPlan, Option[Long]]): Long =
      nodes.collect(sel).flatten.sum
    val scan = metric { case s: FileSourceScanExec =>
      s.metrics.get("numOutputRows").map(_.value) }
    val shuffle = metric { case e: ShuffleExchangeLike =>
      e.metrics.get("shuffleRecordsWritten").map(_.value) }
    entries.add(Entry(funcName, durationNs / 1000000L, scan, shuffle))
  }

  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      exception: Exception): Unit = failureCount.incrementAndGet()

  /** The audit as a relation (one row per completed action so far). */
  def snapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    entries.asScala.toSeq
      .map(e => (e.action, e.durationMs, e.scanRows, e.shuffleWriteRows))
      .toDF("action", "duration_ms", "scan_rows", "shuffle_write_rows")
  }

  def size: Int = entries.size()
}
