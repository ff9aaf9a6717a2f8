package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan evidence dumper — the optimization-round sibling of
  * [[TimeQuery]]: `runMain graft.PlanDump <sfDir> <key[,key…]> <outDir>
  * [suffix]` writes each named registry entry's
  * `.explain("formatted")` text to `<outDir>/<key>_<suffix>.txt`
  * (suffix defaults to `plan`). Substring match on keys, like Verify's
  * filter. The dump is the PRE-execution plan (AQE initial), which is
  * the shape the code pins — per-run AQE rewrites ride the SQL tab,
  * not a file.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pats = args(1).split(',').filter(_.nonEmpty)
    val outDir = args(2)
    val suffix = if (args.length > 3) args(3) else "plan"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(8, Runtime.getRuntime.availableProcessors).toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.filter(n => pats.exists(n.contains)).toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val pw = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try pw.println(txt) finally pw.close()
      println(s"PLANDUMP $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
