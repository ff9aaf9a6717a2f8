package graft

import graft.operators.Multimodal

/** F2 has no SQL oracle (stubbed decoder) — its contract is checked
  * here: full coverage, deterministic features, plumbed metadata.
  */
class MultimodalSpec extends SparkSpec {

  test("feature extract covers every document with deterministic features") {
    val feats = Multimodal.mmFeatureExtract(tables).collect()
    assert(feats.length == tables.documents.count())
    val again = Multimodal.mmFeatureExtract(tables).collect()
    assert(feats.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "decode stub must be deterministic")
    feats.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 64)  // width
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 64)  // height
      assert(r.getInt(3) == 3)                        // channels
      assert(r.getDouble(4) > 0.0)                    // mean byte of ASCII text
      assert(r.getInt(5) > 0)                         // n_bytes
    }
  }

  test("binary metadata byte length equals text length for ASCII corpus") {
    val rows = Multimodal.mmBinaryMeta(tables).collect()
    val nchars = tables.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == nchars(r.getLong(0))))
  }

  test("asset dedup: copy counts conserve the corpus; keep_id is the group minimum") {
    val rows = Multimodal.mmExactDedup(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == tables.documents.count(), "copies must sum to the corpus")
    val byChecksum = tables.documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text").cast("binary")).as("c"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (c, keep, n) =>
      assert(keep == byChecksum(c).min, s"checksum $c keep_id")
      assert(n == byChecksum(c).length, s"checksum $c copies")
    }
  }
}
