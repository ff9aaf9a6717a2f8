package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** The composed end-to-end training-data pipeline — what a user of the
  * library actually runs over a crawled corpus: curate (E14's quality +
  * langid + exact-dedup verdict) → near-dup cluster filter (C15 by
  * default: keep each cluster's BEST-quality member; C7's min-id
  * keeper via keepBest=false) → stable train/valid/test split (E21)
  * → deterministic shard + in-shard order (E17) → one materialized
  * parquet layout partitioned by (split, shard).
  *
  * Every stage is one of the library's own oracle-gated operators;
  * the composition is doc_id equi-joins of their verdict columns onto
  * the surviving set, so the whole job inherits each stage's scale
  * shape (no new wide operations beyond the verdict joins, which AQE
  * broadcasts while the verdict sets fit and shuffle-joins beyond).
  * The output layout prunes: a trainer reading split=train/shard=3
  * opens exactly one directory (SinksSpec-style PartitionFilters).
  */
object TrainingDataJob {

  /** The surviving, labeled, shard-ordered corpus as a DataFrame
    * (columns: doc_id, text, source, split, shard, pos).
    */
  def materialize(t: Tables, nShards: Int = 16,
      trainPermille: Int = 990, validPermille: Int = 5,
      keepBest: Boolean = true): DataFrame = {
    val kept = TextOps.docCurate(t)
      .filter(col("keep") === 1).select(col("doc_id"))
    val canonical =
      (if (keepBest) Dedup.docDedupKeepBest(t).filter(col("keep") === 1)
       else Dedup.docDedupClusters(t).filter(col("is_canonical") === 1))
        .select(col("doc_id"))
    val split = TextOps.docSplit(t, trainPermille, validPermille)
      .select(col("doc_id"), col("split"))
    val survivors = t.documents.select(col("doc_id"), col("text"), col("source"))
      .join(kept, "doc_id")
      .join(canonical, "doc_id")
      .join(split, "doc_id")
    // E17's shard + position, computed over the SURVIVING set so pos is
    // dense per shard in the final layout. The position is TextOps'
    // two-phase withShardPos — parallelism is the shuffle-partition
    // count, not nShards, so the default shard count never routes
    // corpus/nShards through one task's sort.
    TextOps.withShardPos(survivors, nShards, "graft")
      .select(col("doc_id"), col("text"), col("source"),
        col("split"), col("shard"), col("pos"))
  }

  /** Materialize to `outPath` as split=…/shard=…/ parquet partitions. */
  def run(t: Tables, outPath: String, nShards: Int = 16): Unit =
    materialize(t, nShards)
      .repartition(col("split"), col("shard")) // one task-group per dir
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard")
      .parquet(outPath)
}
