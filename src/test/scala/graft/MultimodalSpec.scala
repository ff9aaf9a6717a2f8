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

  test("phash: identical payloads collide; light edits stay near; pigeonhole finds hamming<=3") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = tables.documents.select("doc_id", "text").as[(Long, String)].collect()
    // identical-payload law: same bytes -> same signature (trivially
    // hamming 0), checked via the operator itself
    val ph = Multimodal.mmPhash(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byText = texts.groupBy(_._2).values.filter(_.length > 1)
    byText.foreach(g => assert(g.map(p => ph(p._1)).distinct.length == 1,
      "identical payloads must share a phash"))
    // light-edit law: flipping one byte moves at most 2 gradient bits
    // (the byte participates in one block; that block has 2 neighbors)
    val (id0, t0) = texts.head
    val edited = t0.updated(t0.length / 2, '~')
    val two = Seq((0L, t0), (1L, edited)).toDF("doc_id", "text")
    val hs = two.select(call_function("graft_dhash60", col("text").cast("binary")).as("h"))
      .collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) <= 2,
      s"one-byte edit moved ${java.lang.Long.bitCount(hs(0) ^ hs(1))} bits")
    // pigeonhole law: every pair at hamming <= 3 appears in the banded
    // pairs output (4 x 15-bit chunks cannot all differ)
    val close = for {
      (a, ha) <- ph.toSeq; (b, hb) <- ph.toSeq
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)
    val got = Multimodal.mmPhashPairs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    close.foreach(p => assert(got.contains(p), s"hamming<=3 pair $p missed by banding"))
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
