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
  def mmBinaryMeta(t: Tables, ordered: Boolean = false): DataFrame = maybeSort(
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum"),
        lower(hex(substring(col("payload"), 1, 8))).as("prefix_hex")),
    ordered)(col("doc_id"))

  /** F5: exact asset dedup by content checksum — the first pass every
    * multimodal corpus runs (identical images/audio re-crawled under
    * different ids): group by the payload's md5, keep the lowest id,
    * count copies. One narrow hash pass + one checksum-keyed shuffle
    * (the md5 rides the map side; payload bytes never shuffle).
    */
  def mmExactDedup(t: Tables, ordered: Boolean = false): DataFrame = maybeSort(
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), md5(col("payload")).as("checksum"))
      .groupBy(col("checksum"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
    ordered)(col("keep_id"))

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
  def mmFeatureExtract(t: Tables, ordered: Boolean = false): DataFrame = maybeSort({
    val spark = t.spark
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = t.documents
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.grouped(64).flatMap(b => decodeBatch(b)))
      .toDF()
  }, ordered)(col("doc_id"))

  final case class MmResized(doc_id: Long, width: Int, height: Int,
      target_w: Int, target_h: Int, scale: Double)

  /** F3: resize plumbing — decode (stub) → target-dimension compute.
    * A real pipeline swaps `decodeBatch` + the scale math for the
    * imaging library call; the batch shape and schema are what Spark
    * sees either way.
    */
  def mmResize(t: Tables, targetMax: Int = 32, ordered: Boolean = false): DataFrame = maybeSort({
    val spark = t.spark
    import spark.implicits._
    val ds = t.documents
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.grouped(64).flatMap(b => decodeBatch(b).map { f =>
        val scale = targetMax.toDouble / math.max(f.width, f.height)
        val s = math.min(1.0, scale)
        MmResized(f.doc_id, f.width, f.height,
          math.max(1, math.round(f.width * s).toInt),
          math.max(1, math.round(f.height * s).toInt),
          math.round(s * 1e6) / 1e6)
      }))
      .toDF()
  }, ordered)(col("doc_id"))

  final case class MmFrame(doc_id: Long, frame_idx: Int, offset: Int, frame_md5: String)

  /** F4: frame sampling — treat the payload as a "video" of fixed-size
    * frames, emit every `stride`-th frame (one row per sampled frame,
    * the explode-shaped output a frame pipeline feeds downstream).
    */
  def mmFrameSample(t: Tables, frameBytes: Int = 64, stride: Int = 4, ordered: Boolean = false): DataFrame = maybeSort({
    val spark = t.spark
    import spark.implicits._
    val ds = t.documents
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) =>
        // STUB: a real pipeline decodes container frames here
        // one digest per document, reused across frames (digest()
        // resets it) — a per-frame getInstance pays a JCA provider
        // lookup per 64-byte hash
        val md = java.security.MessageDigest.getInstance("MD5")
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map { i =>
          val frame = bytes.slice(i * frameBytes, (i + 1) * frameBytes)
          val hex = md.digest(frame).map(b => f"$b%02x").mkString
          MmFrame(id, i, i * frameBytes, hex)
        }
      }
      .toDF()
  }, ordered)(col("doc_id"), col("frame_idx"))
}
