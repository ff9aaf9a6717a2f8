package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.KubeEventOps
import graft.sources.KubeEventSource

/** End-to-end drive of the KesMain pipeline shape (same query, test
  * dirs, AvailableNow): JSON-lines in → deduped JSON-lines out.
  */
class KesMainSpec extends SparkSpec {

  test("directory-to-directory pipeline dedups and writes JSON lines") {
    val in = Files.createTempDirectory("kes_in").toFile
    val out = Files.createTempDirectory("kes_out").toFile.getAbsolutePath + "/data"
    val ckpt = Files.createTempDirectory("kes_ckpt").toFile.getAbsolutePath
    val lines = Seq(
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}""",
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}""",
      """{"metadata":{"name":"e2","uid":"u2","resourceVersion":"2","creationTimestamp":"2024-01-01T00:00:05Z"},"involvedObject":{"kind":"Pod"},"reason":"Pulled","type":"Normal"}""")
    Files.writeString(new java.io.File(in, "events.json").toPath, lines.mkString("\n"))

    val q = KubeEventOps
      .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
      .select(col("line").as("value"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = spark.read.text(out).collect().map(_.getString(0))
    assert(got.length == 2, s"3 lines, 1 dup → 2: ${got.toSeq}")
    assert(got.forall(_.startsWith("""{"time":""")), got.head)
  }

  test("restart recovers dedup state from the checkpoint (the reference's persistent CACHE_DB)") {
    val in = Files.createTempDirectory("kes_in2").toFile
    val out = Files.createTempDirectory("kes_out2").toFile.getAbsolutePath + "/data"
    val ckpt = Files.createTempDirectory("kes_ckpt2").toFile.getAbsolutePath
    def run(): Unit = {
      val q = KubeEventOps
        .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
        .select(col("line").as("value"))
        .writeStream.format("text")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    val e1 =
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}"""
    val e3 =
      """{"metadata":{"name":"e3","uid":"u3","resourceVersion":"3","creationTimestamp":"2024-01-01T00:00:30Z"},"involvedObject":{"kind":"Pod"},"reason":"Killing","type":"Normal"}"""
    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    run()
    // second process lifetime: the duplicate of e1 arrives again + a new event
    Files.writeString(new java.io.File(in, "b2.json").toPath, Seq(e1, e3).mkString("\n"))
    run()
    val got = spark.read.text(out).collect().map(_.getString(0))
    assert(got.length == 2, s"dup across restart must be suppressed by recovered state: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u1\"")) && got.exists(_.contains("\"uid\":\"u3\"")))
  }
}
