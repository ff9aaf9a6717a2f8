package graft

import graft.operators.Dedup

/** Laws of the near-dup family: LSH candidates verify against the same
  * threshold as exhaustive search, so LSH results ⊆ exhaustive results,
  * with high recall on the planted near-dups.
  */
class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH pairs are a subset of exhaustive ngram-jaccard pairs, recall is high") {
    val truth = pairs(Dedup.docNgramJaccard(tables))
    val lsh = pairs(Dedup.docMinhashLshPairs(tables))
    assert(truth.nonEmpty, "generator plants near-dups; truth must be non-empty")
    assert(lsh.subsetOf(truth), s"LSH found pairs not in truth: ${lsh -- truth}")
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("simhash pairs overlap the jaccard near-dups") {
    val truth = pairs(Dedup.docNgramJaccard(tables))
    val sim = pairs(Dedup.docSimhashPairs(tables))
    assert(sim.nonEmpty)
    assert((sim intersect truth).nonEmpty, "simhash should find some planted near-dups")
  }

  test("exact dedup: keep_id is the minimum doc_id, copies sum to corpus size") {
    val rows = Dedup.docExactDedup(tables).collect()
    val total = tables.documents.count()
    assert(rows.map(_.getLong(2)).sum == total)
  }
}
