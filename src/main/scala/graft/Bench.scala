package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full evaluation of every output column (count() would
      // let Catalyst prune computed columns and under-measure projection
      // queries), zero sink cost.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // streaming throughput: the reference daemon's full loop (TTL-cache
    // dedup) over the whole events table via MemoryStream, 4 batches.
    val streamSec = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val evs = graft.sources.Tables(spark, sfDir).events
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[graft.model.Ev].collect().toSeq.sortBy(e => (e.ts.toEpochMilli, e.event_id))
      val input = MemoryStream[graft.model.Ev]
      val q = graft.streaming.EventStreamJob.streamTtlCache(input.toDS())
        .writeStream.outputMode("append").format("noop").start()
      val t0 = System.nanoTime()
      try {
        evs.grouped((evs.size + 3) / 4).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    val all = results + ("stream_ttl_cache" -> streamSec)
    val qs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = all.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
