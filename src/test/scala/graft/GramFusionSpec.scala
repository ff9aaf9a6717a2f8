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

  test("MinHashSig == per-permutation groupBy-min composition") {
    import graft.functions.Hashing
    import org.apache.spark.sql.functions._
    val sig = tables.documents
      .select(col("doc_id"),
        call_function("graft_minhash_sig",
          call_function("graft_gram3_hashes", col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val aggs = Hashing.Perms.indices.map(i =>
      min(Hashing.perm(col("gram"), i)).as(s"m$i"))
    val ref = graft.operators.Dedup.grams(tables)
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    assert(sig == ref, "per-row signature must equal the batch aggregate form")
  }

  test("WinnowMins == array_distinct(transform(sequence, array_min(slice))) composition") {
    val w = 8
    val gh = call_function("graft_gram4_hashes", col("text"))
    val composedWins = array_distinct(
      when(size(gh) >= w,
        transform(sequence(lit(0), size(gh) - w),
          i => array_min(slice(gh, i + lit(1), lit(w)))))
        .otherwise(array(array_min(gh))))
    val rows = tables.documents
      .select(col("doc_id"),
        call_function("graft_winnow8_mins", gh).as("fused"),
        composedWins.as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: fused ≠ composed winnow minima")
    }
  }
}
