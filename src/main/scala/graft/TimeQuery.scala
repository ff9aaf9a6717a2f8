package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing probe — the surgical sibling of [[Bench]] for
  * iterating on ONE plan without paying a 300 s full sweep:
  * `runMain graft.TimeQuery <sfDir> <key[,key…]> [iters]` runs each
  * named registry entry through the same noop sink as Bench and
  * prints per-iteration seconds plus min/median. Substring match on
  * keys, like Verify's filter.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pats = (if (args.length > 1) args(1) else "q1_pricing_summary")
      .split(',').filter(_.nonEmpty)
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(8, Runtime.getRuntime.availableProcessors).toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.filter(n => pats.exists(n.contains)).toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"TIMEQUERY $name iters=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"min=${s.head}%.2f median=${s(s.size / 2)}%.2f")
    }
    spark.stop()
  }
}
