package graft

import graft.operators.Similarity

/** Structural + recall laws for the ANN family (brute force is the
  * exact baseline; LSH and IVF are the scale paths).
  */
class SimilaritySpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("ivf: valid ranks, no self-matches, positive recall vs brute force") {
    val exact = topk(Similarity.annTopkBruteforce(tables, k = 3))
    val ivf = topk(Similarity.annIvf(tables, k = 3))
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, ns) =>
      assert(ns.size <= 3)
      assert(!ns.contains(q), "no self-match")
    }
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      val i = ivf.getOrElse(q, Seq.empty).toSet
      (e intersect i).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.2, s"IVF mean recall@3 too low: $mean (nProbe=4/16 cells)")
  }

  test("lsh buckets: every neighbor shares the query's sign bucket") {
    val rows = Similarity.annLshBucketed(tables).collect()
    assert(rows.nonEmpty)
    val bucketOf = Similarity.withNorm(tables.embeddings)
      .withColumn("b", Similarity.signBucket(org.apache.spark.sql.functions.col("v"), 8))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (q, n, b) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(bucketOf(q) == b && bucketOf(n) == b)
    }
  }
}
