package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-volume probe for the portable-sketch claim (B59/B51/B47):
  * `runMain graft.SketchProbe [nRows]` builds an in-memory corpus of
  * `nRows` events over nRows/5 distinct users × 5 types, then runs
  *
  *   1. the B59 HLL register build  (claim: shuffles ≤ 256·#groups
  *      rows — CONSTANT in the user count),
  *   2. the exact two-phase `countDistinct` (shuffles one row per
  *      DISTINCT (group, user) pair — linear in the user count),
  *
  * through GraftQueryAudit and prints each action's measured
  * shuffle_write_rows. This turns the "bytes travel, never the key
  * universe" Scaladoc argument into a number: at the default 1M rows
  * the exact path shuffles ~1M records while the register path
  * shuffles ~1.3k, and the gap GROWS linearly with users while the
  * register side stays flat — the whole case for shipping sketches
  * at 100 TB.
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.ensureRegistered(spark) // graft_md5_60
    val audit = new graft.sources.GraftQueryAudit
    spark.listenerManager.register(audit)

    val ev = spark.range(n).select(
      concat(lit("type"), (col("id") % 5).cast("string")).as("event_type"),
      expr("id DIV 5").as("user_id"))

    graft.operators.Analytics.hllRegisters(ev)
      .write.mode("overwrite").format("noop").save()
    ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .write.mode("overwrite").format("noop").save()

    // listener delivery is async; poll the audit until both actions land
    val deadline = System.nanoTime() + 10000000000L
    while (audit.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    val rows = audit.snapshot(spark).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val label = if (i == 0) "hll_registers" else "exact_count_distinct"
      println(s"PROBE $label shuffle_write_rows=${r.getLong(3)} duration_ms=${r.getLong(1)}")
    }
    spark.stop()
  }
}
