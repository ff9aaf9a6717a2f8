package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Mirrors the settings a 1000-executor cluster deploy would use where
  * they make sense locally: AQE on (runtime coalescing + skew-join
  * splitting), shuffle partitions sized to cores (not the 200 default),
  * UTC session time zone for oracle parity.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The conf a 1000-executor 100 TB deployment starts from (master/
    * resources come from the submitter). Notes per knob:
    *  - shuffle.partitions ≈ 2–3× total cores; AQE coalesces down.
    *  - skewJoin on: runtime-splits hot partitions in fact-fact joins.
    *  - 128 MB scan partitions keep tasks memory-bounded at any SF.
    *  - autoBroadcastJoinThreshold raised: our dims (region…customer)
    *    stay broadcast even at SF where stats are conservative.
    *  - STREAMING state partitions are a separate knob from batch
    *    shuffle width: each micro-batch pays a fixed get/commit cost
    *    per state store, so size them to the keyspace, not the core
    *    count (measured 2× on the TTL-cache pipeline — see
    *    Bench.StreamStateParts) by setting shuffle.partitions in the
    *    session that STARTS the streaming query; the checkpoint pins
    *    it thereafter.
    */
  def clusterBuilder(totalCores: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions", (totalCores * 3).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
}
