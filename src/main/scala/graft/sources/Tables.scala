package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * All operators read through here so that scans stay column-pruning /
  * predicate-pushdown friendly (callers `.select` immediately; parquet
  * `ReadSchema` then only contains what the query needs).
  */
final case class Tables(spark: SparkSession, dir: String) {
  // every operator path enters through here → native graft functions
  // (DotProduct, Md5Prefix60) are always registered on the session
  graft.functions.VectorExprs.ensureRegistered(spark)

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * infer natively; an *explicit* LongType schema reads the raw nanos
    * without touching any session conf (the legacy `nanosAsLong` flag
    * would silently change every other nanos read in the session), then
    * truncate to µs — exactly what DuckDB does when it loads the same
    * file, so oracle parity holds.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(schema).parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
