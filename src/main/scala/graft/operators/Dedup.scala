package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing._
import graft.sources.Tables

/** Dedup family (SURVEY §2.C) over `documents` — the operators a
  * training-data pipeline runs at 100 TB.
  *
  * Scale shape (see SURVEY §5): signatures/shingles are one narrow
  * map-side pass (explode → hash → partial-agg); candidate generation is
  * always index- or band-based (never all-pairs); exact verification
  * runs only on candidates.
  */
object Dedup {

  /** Exploded distinct word-3-gram shingle HASHES: (doc_id, gram: long,
    * n_grams). The fused GramHashes expression replaces three
    * interpreted higher-order functions per row, and every downstream
    * join/aggregate shuffles 8-byte longs instead of gram strings.
    * The set size rides along with every row so Jaccard denominators
    * need no separate aggregate + join-back.
    */
  def grams(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), call_function("graft_gram3_hashes", col("text")).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("gram"), size(col("gs")).as("n_grams"))

  /** (doc_id, h0): the gram hash IS the 60-bit base hash. */
  private def hashedGrams(t: Tables): DataFrame =
    grams(t).select(col("doc_id"), col("gram").as("h0"))

  /** C1: exact dedup via content hash — keep lowest doc_id per hash.
    * One hash-partitioned aggregation; no sort, no all-pairs.
    */
  def docExactDedup(t: Tables): DataFrame =
    t.documents
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash"))

  /** MinHash signatures as 16 columns m0..m15 (internal shape). */
  private def minhashSigCols(t: Tables): DataFrame = {
    val aggs = Perms.indices.map(i => min(perm(col("h0"), i)).as(s"m$i"))
    hashedGrams(t).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** C2: MinHash signature per document (16 permutations, csv-rendered
    * so the result is hashable by the driver).
    */
  def docMinhashSig(t: Tables): DataFrame =
    minhashSigCols(t)
      .select(col("doc_id"),
        concat_ws(",", Perms.indices.map(i => col(s"m$i")): _*).as("sig"))
      .orderBy(col("doc_id"))

  /** C3: MinHash-LSH near-dup pairs: band signatures (4 bands × 4 rows)
    * → candidates share a band bucket → exact Jaccard verification on
    * candidates only → threshold. The only shuffles are the band
    * self-join and the per-candidate gram intersection — never n².
    */
  def docMinhashLshPairs(t: Tables, threshold: Double = 0.2): DataFrame = {
    val bands = minhashSigCols(t).select(col("doc_id"),
      expr("""stack(4,
        0, concat_ws(',', m0, m1, m2, m3),
        1, concat_ws(',', m4, m5, m6, m7),
        2, concat_ws(',', m8, m9, m10, m11),
        3, concat_ws(',', m12, m13, m14, m15)) AS (band, band_val)"""))
    val b2 = bands.select(col("doc_id").as("db"), col("band").as("band2"), col("band_val").as("band_val2"))
    val cands = bands.join(b2,
        col("band") === col("band2") && col("band_val") === col("band_val2") &&
          col("doc_id") < col("db"))
      .select(col("doc_id").as("da"), col("db")).distinct()
    verifiedJaccard(t, cands, threshold)
  }

  /** C5: all-pairs n-gram Jaccard via inverted index on the shingle —
    * candidates are docs sharing ≥1 shingle (at scale: cap shingle df to
    * bound bucket fan-out), then the same exact verification.
    */
  def docNgramJaccard(t: Tables, threshold: Double = 0.2): DataFrame = {
    val g = grams(t)
    // All-pairs mode: the self-join on the shingle already yields one
    // row per (pair, common shingle) — count directly, no distinct
    // candidate stage + re-verification pass (those exist for the LSH
    // path, where candidates ≪ pairs).
    val ga = g.select(col("doc_id").as("da"), col("gram"), col("n_grams").as("na"))
    val gb = g.select(col("doc_id").as("db"), col("gram").as("gram2"), col("n_grams").as("nb"))
    ga.join(gb, col("gram") === col("gram2") && col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("c"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact Jaccard on candidate pairs: per-candidate gram intersection
    * (two key-joins, work proportional to candidates, not pairs²).
    */
  private def verifiedJaccard(t: Tables, cands: DataFrame, threshold: Double): DataFrame = {
    val g = grams(t)
    val ga = g.select(col("doc_id").as("da"), col("gram"), col("n_grams").as("na"))
    val gb = g.select(col("doc_id").as("db2"), col("gram").as("gramb"), col("n_grams").as("nb"))
    cands
      .join(ga, "da")
      .join(gb, col("db") === col("db2") && col("gram") === col("gramb"))
      .groupBy(col("da"), col("db"), col("na"), col("nb")).agg(count(lit(1)).as("c"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Unsorted simhash relation (internal: consumers add their own
    * ordering; a mid-pipeline global sort would be a wasted exchange).
    */
  private def simhashes(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"),
        call_function("graft_simhash60",
          call_function("graft_gram3_hashes", col("text"))).as("simhash"))

  /** C4a: 60-bit SimHash per document over distinct 3-gram shingles —
    * one narrow pass: fused GramHashes → native SimHash60 (no explode,
    * no shuffle, no interpreted higher-order transform; the oracle's
    * unnest+SUM formulation is value-identical).
    */
  def docSimhash(t: Tables): DataFrame =
    simhashes(t).orderBy(col("doc_id"))

  /** C4b: SimHash near-dup pairs — pigeonhole banding (4 × 15-bit
    * chunks: hamming ≤ 3 guarantees ≥1 identical chunk), candidates
    * share a chunk, verified by exact hamming distance.
    */
  def docSimhashPairs(t: Tables, maxHamming: Int = 12): DataFrame = {
    val sh = simhashes(t)
    val chunks = sh.select(col("doc_id"), col("simhash"),
      expr("""stack(4,
        0, (simhash >> 0)  & 32767,
        1, (simhash >> 15) & 32767,
        2, (simhash >> 30) & 32767,
        3, (simhash >> 45) & 32767) AS (chunk, chunk_val)"""))
    val c2 = chunks.select(col("doc_id").as("db"), col("simhash").as("sim2"),
      col("chunk").as("chunk2"), col("chunk_val").as("chunk_val2"))
    chunks.join(c2,
        col("chunk") === col("chunk2") && col("chunk_val") === col("chunk_val2") &&
          col("doc_id") < col("db"))
      .select(col("doc_id").as("doc_a"), col("db").as("doc_b"),
        bit_count(col("simhash").bitwiseXOR(col("sim2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C7: near-dup clustering — connected components over the Jaccard
    * pair graph (pairs alone don't dedupe; transitive groups do), then
    * canonical selection (min doc_id per cluster). Iterative min-label
    * propagation: each round is one join + one aggregate, O(diameter)
    * rounds (the standard large-scale CC shape); `localCheckpoint`
    * truncates lineage per round so the plan stays flat.
    */
  def docDedupClusters(t: Tables, threshold: Double = 0.2, maxIter: Int = 20): DataFrame = {
    val edges = docNgramJaccard(t, threshold).select(col("doc_a"), col("doc_b"))
    val sym = edges
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val next = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("nmin") < col("label")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    t.documents.select(col("doc_id"))
      .join(labels, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"),
        (coalesce(col("label"), col("doc_id")) === col("doc_id")).cast("int").as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** C6: embedding-cosine near-dup pairs (exact all-pairs at this
    * scale; the bucketed scale path is Similarity.annLshBucketed).
    */
  def docEmbedCosineDup(t: Tables, threshold: Double = 0.45): DataFrame = {
    val e = Similarity.withNorm(t.embeddings)
    val a = e.select(col("vec_id").as("va"), col("v").as("xa"), col("n2").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("xb"), col("n2").as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        Similarity.cosineR(col("xa"), col("xb"), col("na"), col("nb")).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
