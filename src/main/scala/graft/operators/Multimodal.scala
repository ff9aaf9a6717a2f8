package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY §2.F): treat payloads as opaque
  * `binary` columns with typed metadata. The container has no
  * image/audio codecs, so the *decode step* is a clearly-marked
  * deterministic stub — the Spark-side plumbing (schema, batched
  * per-partition processing, partitioning behavior) is real and tested.
  */
object Multimodal {

  /** F1: binary column + typed metadata — byte length, md5 checksum,
    * 8-byte hex prefix. Pure codegen'd expressions over the binary.
    */
  def mmBinaryMeta(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum"),
        lower(hex(substring(col("payload"), 1, 8))).as("prefix_hex"))
      .orderBy(col("doc_id"))

  final case class MmFeature(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_byte: Double, n_bytes: Int)

  /** The stubbed decoder: a real pipeline would decode image/audio here
    * (batch-shaped: one library call per batch of payloads). This fake
    * derives deterministic "features" from the first bytes so the
    * batching/partitioning plumbing is exercised end-to-end.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MmFeature] =
    batch.map { case (id, bytes) =>
      // STUB: stands in for e.g. an image decode; deterministic fake.
      val w = 1 + (bytes.headOption.map(_ & 0xff).getOrElse(0) % 64)
      val h = 1 + (bytes.drop(1).headOption.map(_ & 0xff).getOrElse(0) % 64)
      val mean =
        if (bytes.isEmpty) 0.0
        else math.round(bytes.map(_ & 0xff).sum.toDouble / bytes.length * 1e6) / 1e6
      MmFeature(id, w, h, 3, mean, bytes.length)
    }

  /** F2: batched decode → feature-extract over binary payloads.
    * `mapPartitions` + `grouped(64)` is the Scala analog of
    * `mapInPandas` batches: the (stub) codec is invoked once per batch,
    * rows stream through without materializing a partition.
    */
  def mmFeatureExtract(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = t.documents
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.grouped(64).flatMap(b => decodeBatch(b)))
      .toDF()
      .orderBy(col("doc_id"))
  }
}
