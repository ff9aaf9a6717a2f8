package graft
import org.apache.spark.sql.SparkSession
/** Throwaway repeat-runner (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("doc_ngram_jaccard_capped")
    val iters = sys.env.getOrElse("SCRATCH_ITERS", "3").toInt
    for (name <- names; i <- 1 to iters) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"SCRATCH $name%s iter=$i dt=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
