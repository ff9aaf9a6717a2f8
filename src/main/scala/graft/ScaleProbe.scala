package graft

import org.apache.spark.sql.SparkSession

/** One-query timing probe: `runMain graft.ScaleProbe <query> <dir>
  * [iters]` times SparkEntry.queries(query) against the given table
  * dir through the noop sink (same evaluation discipline as Bench)
  * and prints per-iteration seconds. For chasing a single query's
  * scaling behavior without paying a full bench sweep.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"PROBE $name iter=$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
