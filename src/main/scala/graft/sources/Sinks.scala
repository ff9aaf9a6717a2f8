package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side surface (SURVEY §5): the layouts a 100 TB deployment
  * needs from day one — date-partitioned event storage (partition
  * pruning for time-range queries) and bucketed fact tables
  * (shuffle-free co-located joins on the bucket key).
  */
object Sinks {

  /** Date-partitioned parquet: `dt=YYYY-MM-DD/` directories. Readers
    * filtering on `dt` prune partitions at planning time; at 100 TB
    * this is the difference between scanning a day and scanning years.
    */
  def writeEventsPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("dt")) // one task-group per partition dir, no tiny files
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(path)

  /** Bucketed + sorted table: joins/aggregations on the bucket key
    * skip the shuffle entirely (both sides bucket-aligned). Bucketing
    * requires a table catalog → saveAsTable.
    */
  def writeEventsBucketed(events: DataFrame, table: String, buckets: Int = 8): Unit =
    events
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "user_id")
      .sortBy("user_id", "ts")
      .format("parquet")
      .saveAsTable(table)

  /** JSON-lines export of the emitted event stream (the ELK-bound
    * stdout form, as files).
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Small-files compaction — streaming sinks and frequent batches
    * leave thousands of tiny files; at 100 TB the NameNode/listing cost
    * and per-file open overhead dominate reads. Rewrites to
    * `targetFiles` right-sized files at a new path (never in place).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFiles: Int): Unit =
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** Range-clustered layout: repartitionByRange + in-file sort on the
    * clustering keys → parquet row-group min/max stats become selective
    * for range predicates on those keys (the poor man's Z-order; at
    * 100 TB this is what makes time-range scans skip most files).
    */
  def writeClustered(df: DataFrame, path: String, files: Int, cols: String*): Unit = {
    val cs = cols.map(col)
    df.repartitionByRange(files, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
