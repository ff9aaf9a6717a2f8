package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-first surface: register every table as a temp view (plus the
  * graft native functions) so `spark.sql("...")` users get the whole
  * engine — the same queries SparkEntry exposes programmatically.
  */
object GraftCatalog {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir) // also registers graft_* functions
    TableNames.foreach {
      case "events" => t.events.createOrReplaceTempView("events")
      case n => spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
  }
}
