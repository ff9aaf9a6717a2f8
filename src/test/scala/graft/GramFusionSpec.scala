package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** The fused native expressions must equal the composed built-in
  * formulations they replaced, evaluated by Spark itself on real
  * corpus data (not a hand reimplementation).
  */
class GramFusionSpec extends SparkSpec {

  test("GramHashes == array_distinct(shingles3) + md5_60 composition") {
    val toks = Hashing.tokens(col("text"))
    val composed = tables.documents
      .select(col("doc_id"),
        array_distinct(transform(
          Hashing.shingles3(toks, col("text")), g => Hashing.md5_60(g))).as("hs"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val fused = tables.documents
      .select(col("doc_id"), call_function("graft_gram3_hashes", col("text")).as("hs"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fused.keySet == composed.keySet)
    fused.foreach { case (id, hs) => assert(hs == composed(id), s"doc $id") }
  }

  test("SimHash60-of-GramHashes == per-bit sum over the composed hashes") {
    val toks = Hashing.tokens(col("text"))
    val composed = tables.documents.limit(50)
      .select(col("doc_id"),
        array_distinct(transform(
          Hashing.shingles3(toks, col("text")), g => Hashing.md5_60(g))).as("hs"))
      .select(col("doc_id"), call_function("graft_simhash60", col("hs")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = graft.operators.Dedup.docSimhash(tables)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    composed.foreach { case (id, s) => assert(fused(id) == s, s"doc $id") }
  }
}
