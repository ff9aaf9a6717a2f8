package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-volume probe for the B63 claim — which it partly REFUTED
  * (the finding is recorded in TopKRows' doc and SURVEY): Spark
  * ≥3.5's InferWindowGroupLimit already pushes a `row_number() <= k`
  * rank window below the shuffle (WindowGroupLimitExec), so at 4M
  * rows × 5 groups the window shuffles 120 rows, not 4M. The
  * aggregator still measures 40 shuffled rows (one buffer per
  * group×partition vs k rows each) and ~4× less wall (no
  * per-partition sort). `runMain graft.TopKProbe [nRows]` prints both
  * actions' measured shuffle_write_rows via GraftQueryAudit.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val k = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val audit = new graft.sources.GraftQueryAudit
    spark.listenerManager.register(audit)

    val rows = spark.range(n).select(
      concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
      ((col("id") * 2654435761L) % 1000003L).cast("double").as("v"),
      col("id").as("key"))

    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("key").asc)
    rows.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .write.mode("overwrite").format("noop").save()

    val topk = udaf(graft.functions.TopKRows(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    rows.groupBy(col("g")).agg(topk(col("v"), col("key")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .write.mode("overwrite").format("noop").save()

    val deadline = System.nanoTime() + 10000000000L
    while (audit.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    val snap = audit.snapshot(spark).collect()
    snap.zipWithIndex.foreach { case (r, i) =>
      val label = if (i == 0) "rank_window" else "topk_aggregator"
      println(s"PROBE $label shuffle_write_rows=${r.getLong(3)} duration_ms=${r.getLong(1)}")
    }
    spark.stop()
  }
}
