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
      keepBest: Boolean = true, scrub: Boolean = false): DataFrame = {
    // ONE verdict pass instead of four separate corpus scans (the r8
    // composed-bench audit measured 9 scan-rows/doc): curate's verdict
    // relation carries the quality score keep-best needs, so the
    // cluster keeper (argmax quality, min-id ties — exactly
    // docDedupKeepBest's window) rides the same relation instead of a
    // second withQuality scan; the E21 split is a pure hash of doc_id,
    // stamped as a COLUMN on the surviving rows instead of a separate
    // documents scan + join. Semantics are unchanged row-for-row
    // (TrainingDataJobSpec's composition laws pin this).
    val curated = TextOps.docCurate(t)
      .select(col("doc_id"), col("quality_score"), col("keep"))
    val clusters = Dedup.docDedupClusters(t)
      .select(col("doc_id"), col("cluster"), col("is_canonical"))
    val verdict = curated.join(clusters, "doc_id")
    val surviving =
      if (keepBest) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)
        verdict.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("keep") === 1 && col("rn") === 1)
          .select(col("doc_id"))
      } else
        verdict.filter(col("keep") === 1 && col("is_canonical") === 1)
          .select(col("doc_id"))
    val survivors = t.documents.select(col("doc_id"), col("text"), col("source"))
      .join(surviving, "doc_id")
      .withColumn("split", TextOps.splitColumn(trainPermille, validPermille))
    // E17's shard + position, computed over the SURVIVING set so pos is
    // dense per shard in the final layout. The position is TextOps'
    // two-phase withShardPos — parallelism is the shuffle-partition
    // count, not nShards, so the default shard count never routes
    // corpus/nShards through one task's sort.
    // optional E18 PII scrub of the SURVIVING text (scrubbing before
    // curation would judge masked text; scrubbing after keeps the
    // verdict on the original while the materialized corpus ships
    // masked): one narrow regexp pass, audit counts carried through
    val sharded = TextOps.withShardPos(survivors, nShards, "graft")
    if (!scrub)
      sharded.select(col("doc_id"), col("text"), col("source"),
        col("split"), col("shard"), col("pos"))
    else
      TextOps.withScrub(sharded)
        .select(col("doc_id"), col("text_masked").as("text"), col("source"),
          col("split"), col("shard"), col("pos"),
          col("n_emails"), col("n_digit_runs"))
  }

  /** Materialize to `outPath` as split=…/shard=…/ parquet partitions. */
  def run(t: Tables, outPath: String, nShards: Int = 16): Unit =
    materialize(t, nShards)
      .repartition(col("split"), col("shard")) // one task-group per dir
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard")
      .parquet(outPath)

  /** The schema a JSONL corpus must carry — identical to the parquet
    * documents table, ENFORCED not inferred (see readJsonLines).
    */
  val JsonlDocSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
  }

  /** The pipeline from RAW INPUT: real corpora arrive as JSONL, not the
    * typed parquet layout, so this composes G16's audited reader in
    * front of the full job — readJsonLinesAudited → curate → near-dup
    * keep-best → split → shard — and accounts for every input line:
    * corrupt lines land in `outPath/_quarantine` (raw, replayable after
    * a parser fix) and the returned metrics carry the clean /
    * quarantined / materialized counts a production run alerts on.
    *
    * Scale shape: the quarantine split is one codegen'd from_json pass
    * (no caching, no second scan — see readJsonLinesAudited), and
    * everything downstream inherits the operators' own shapes. The
    * three counts cost one aggregate each over relations the job
    * already computes.
    */
  def runFromJsonl(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, nShards: Int = 16): Map[String, Long] = {
    val (clean, quarantined) =
      graft.sources.Sinks.readJsonLinesAudited(spark, inPath, JsonlDocSchema)
    val t = Tables(spark, dir = inPath, docsOverride = Some(clean))
    val out = materialize(t, nShards)
      .repartition(col("split"), col("shard"))
    out.write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard")
      .parquet(outPath)
    quarantined.write.mode(SaveMode.Overwrite).text(s"$outPath/_quarantine")
    // per-file ops ledger next to the data (G18): the training-side
    // loader reads shard sizes/row counts from the manifest, never by
    // listing + footer-probing the 100 TB output itself
    val manifest = graft.sources.Sinks.writeManifest(spark, outPath)
    // E50's mergeable corpus-card moments, persisted per run
    // (underscore-prefixed: data readers skip it): the cross-run
    // incremental card — union any set of runs' _moments and finalize
    // (mergedCorpusCard) to get the EXACT combined E19 card, exact
    // percentiles included, without rescanning any run's corpus.
    val moments = graft.operators.TextOps.corpusStatsMoments(clean)
    moments.write.mode(SaveMode.Overwrite).parquet(s"$outPath/_moments")
    Map(
      "input_clean"    -> clean.count(),
      "quarantined"    -> spark.read.text(s"$outPath/_quarantine").count(),
      "materialized"   -> spark.read.parquet(outPath).count(),
      "manifest_files" -> manifest.count(),
      "moment_rows"    -> spark.read.parquet(s"$outPath/_moments").count())
  }

  /** The incremental corpus card: merge the persisted `_moments` of any
    * set of runs (TrainingDataJobSpec pins merged ≡ the direct E19
    * card of the union corpus).
    */
  def mergedCorpusCard(spark: org.apache.spark.sql.SparkSession,
      outPaths: Seq[String]): org.apache.spark.sql.DataFrame =
    graft.operators.TextOps.corpusStatsFromMoments(
      outPaths.map(p => spark.read.parquet(s"$p/_moments")).reduce(_ unionByName _))
}
