package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * All operators read through here so that scans stay column-pruning /
  * predicate-pushdown friendly (callers `.select` immediately; parquet
  * `ReadSchema` then only contains what the query needs).
  *
  * `docsOverride` swaps the documents relation for a caller-supplied
  * DataFrame (same schema) — real corpora arrive as JSONL, not this
  * parquet layout, and every doc-family operator takes `Tables`, so the
  * override is what lets TrainingDataJob.runFromJsonl (and specs with
  * planted corpora) drive the full operator family over arbitrary
  * input without re-plumbing each operator's signature.
  */
final case class Tables(spark: SparkSession, dir: String,
    docsOverride: Option[DataFrame] = None,
    embOverride: Option[DataFrame] = None) {
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
  /** `events.ts` has shipped as both TIMESTAMP(MICROS) and
    * TIMESTAMP(NANOS) parquet across testdata generations, so this read
    * must not hardcode a unit. Native-first: Spark 4 infers µs/ms
    * TIMESTAMP fine and `ts` arrives as TimestampType — use that path
    * whenever it works. Only when the footer carries TIMESTAMP(NANOS)
    * (which Spark refuses to infer without a session-wide legacy flag we
    * don't want) fall back to an *explicit* LongType schema that reads
    * the raw nanos and truncates to µs — exactly what DuckDB does when
    * it loads the same file, so oracle parity holds either way.
    * TablesSpec pins a sanity tripwire (loaded min/max year must be
    * plausible) so a future unit drift fails in the suite, not at the
    * gate.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.types._
    val path = s"$dir/events.parquet"
    val native = scala.util.Try {
      val df = spark.read.parquet(path)
      df.schema("ts").dataType match {
        case TimestampType => df
        case TimestampNTZType =>
          // isAdjustedToUTC=false files infer as NTZ; the session tz is
          // pinned to UTC so this cast is wall-clock preserving and all
          // downstream operators keep seeing TimestampType
          df.withColumn("ts", df("ts").cast(TimestampType))
        case other =>
          // unexpected logical type: let the nanos fallback try, and the
          // TablesSpec tripwire catch it if that also misreads
          throw new IllegalStateException(s"events.ts inferred as $other")
      }
    }
    native.getOrElse {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(schema).parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    }
  }
  def documents: DataFrame  = docsOverride.getOrElse(t("documents"))
  /** `embOverride` is the embeddings-side sibling of `docsOverride` —
    * index builds over arbitrary vector relations (partial corpora,
    * external deliveries) reuse every Tables-taking operator unchanged.
    */
  def embeddings: DataFrame = embOverride.getOrElse(t("embeddings"))
}
