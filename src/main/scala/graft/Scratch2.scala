package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
/** Throwaway capped-pipeline stage profiler (deleted before round end). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name dt=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    for (round <- 1 to 3) {
      println(s"== ROUND $round ==")
      val sets = timed("sets") {
        val s = t.documents
          .select(col("doc_id"), call_function("graft_gram3_hashes", col("text")).as("gs"))
          .select(col("doc_id"), col("gs"), size(col("gs")).as("n_grams"))
          .repartition(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
        s.count(); s
      }
      val g = sets.select(col("doc_id"), explode(col("gs")).as("gram"), col("n_grams"))
      val rare = timed("rare") {
        val r = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 100).select(col("gram")).persist(StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }
      val capped = g.join(rare, "gram").select(col("doc_id"), col("gram"))
      val rawN = timed("raw_pair_join") {
        capped.select(col("doc_id").as("da"), col("gram"))
          .join(capped.select(col("doc_id").as("db"), col("gram").as("gram2")),
            col("gram") === col("gram2") && col("da") < col("db"))
          .select(col("da"), col("db")).count()
      }
      println(s"ROWS raw=$rawN")
      val cands = timed("distinct") {
        val c = capped.select(col("doc_id").as("da"), col("gram"))
          .join(capped.select(col("doc_id").as("db"), col("gram").as("gram2")),
            col("gram") === col("gram2") && col("da") < col("db"))
          .select(col("da"), col("db")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      println(s"ROWS cands=${cands.count()}")
      timed("verify") {
        val sa = sets.select(col("doc_id").as("da"), col("gs").as("gsa"), col("n_grams").as("na"))
        val sb = sets.select(col("doc_id").as("db2"), col("gs").as("gsb"), col("n_grams").as("nb"))
        val n = cands.join(sa, "da").join(sb, col("db") === col("db2"))
          .withColumn("c", call_function("graft_intersect_count", col("gsa"), col("gsb")))
          .select((col("c") / (col("na") + col("nb") - col("c"))).as("j"))
          .filter(col("j") >= 0.2).count()
        println(s"ROWS result=$n")
      }
      Seq(sets, rare, cands).foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
