package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end invariants of the composed pipeline: the materialized
  * corpus is exactly the intersection of the stage verdicts, labels
  * agree with the standalone operators, and the written layout prunes.
  */
class TrainingDataJobSpec extends SparkSpec {

  test("materialized corpus == curate-kept ∩ keep-best winners, with operator-consistent labels") {
    val out = TrainingDataJob.materialize(tables, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val kept = graft.operators.TextOps.docCurate(tables)
      .filter(col("keep") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val best = graft.operators.Dedup.docDedupKeepBest(tables)
      .filter(col("keep") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == (kept intersect best),
      "output docs must be exactly the stage-verdict intersection")
    // the C7 min-id keeper mode still composes identically
    val canonical = graft.operators.Dedup.docDedupClusters(tables)
      .filter(col("is_canonical") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val outC7 = TrainingDataJob.materialize(tables, nShards = 4, keepBest = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outC7 == (kept intersect canonical), "keepBest=false must reproduce the C7 keeper")
    // split labels match the standalone E21 assignment
    val split = graft.operators.TextOps.docSplit(tables).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out.foreach { case (id, s, _, _) => assert(s == split(id), s"doc $id split") }
    // positions are dense 1..n within each shard
    out.groupBy(_._3).foreach { case (shard, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, s"shard $shard pos density")
    }
  }

  test("written layout: split=/shard= directories, pruning scan, row conservation") {
    val dir = Files.createTempDirectory("graft-tdj").toFile
    TrainingDataJob.run(tables, dir.getAbsolutePath, nShards = 4)
    val splits = dir.listFiles().filter(_.getName.startsWith("split=")).map(_.getName)
    assert(splits.contains("split=train"), s"expected a train partition, got ${splits.toSeq}")
    val all = spark.read.parquet(dir.getAbsolutePath)
    assert(all.count() == TrainingDataJob.materialize(tables, nShards = 4).count())
    val probe = all.filter(col("split") === "train" && col("shard") === 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"), plan.take(600))
    assert(probe.count() > 0)
  }

  test("runFromJsonl: end-to-end from a JSONL dir with planted corrupt lines") {
    val in = Files.createTempDirectory("graft-tdj-jsonl-in").toFile
    val out = Files.createTempDirectory("graft-tdj-jsonl-out").toFile
    // the sf0.001 corpus exported as JSONL, with corrupt lines planted
    graft.sources.Sinks.writeJsonLines(
      tables.documents, in.getAbsolutePath + "/docs")
    val planted = Seq("{ not json at all", "\"just a string\"", "{\"doc_id\": \"zzz\"")
    Files.write(java.nio.file.Paths.get(in.getAbsolutePath, "docs", "part-corrupt.json"),
      planted.mkString("\n").getBytes)
    val metrics = TrainingDataJob.runFromJsonl(
      spark, in.getAbsolutePath + "/docs", out.getAbsolutePath, nShards = 4)
    // every planted line quarantined, none killed the job
    assert(metrics("quarantined") == planted.size.toLong, metrics.toString)
    val nDocs = tables.documents.count()
    assert(metrics("input_clean") == nDocs, s"clean lines must be the full corpus: $metrics")
    // the JSONL path materializes the same corpus as the parquet path
    val fromParquet = TrainingDataJob.materialize(tables, nShards = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fromJsonl = spark.read.parquet(out.getAbsolutePath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromJsonl == fromParquet, "JSONL-fed pipeline must keep the same doc set")
    assert(metrics("materialized") == fromParquet.size.toLong)
    // quarantined lines are replayable raw
    val qLines = spark.read.text(out.getAbsolutePath + "/_quarantine")
      .collect().map(_.getString(0)).toSet
    assert(qLines == planted.toSet)
    // the G18 manifest ships with the corpus: its row total reconciles
    // with the materialized count and every entry carries the
    // split=/shard= partition path
    val manifest = graft.sources.Sinks.readManifest(spark, out.getAbsolutePath).collect()
    assert(metrics("manifest_files") == manifest.length.toLong)
    assert(manifest.map(_.getLong(3)).sum == metrics("materialized"))
    assert(manifest.forall(_.getString(1).startsWith("split=")),
      "manifest partition paths must carry split=/shard=")
  }

  test("two runs' persisted _moments merge into the exact union corpus card") {
    import org.apache.spark.sql.functions._
    val docs = tables.documents
    val halves = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
    val outs = halves.zipWithIndex.map { case (half, i) =>
      val in = Files.createTempDirectory(s"graft-mom-in$i").toFile
      val out = Files.createTempDirectory(s"graft-mom-out$i").toFile
      graft.sources.Sinks.writeJsonLines(half, in.getAbsolutePath + "/docs")
      val m = TrainingDataJob.runFromJsonl(
        spark, in.getAbsolutePath + "/docs", out.getAbsolutePath, nShards = 2)
      assert(m("moment_rows") > 0L)
      out.getAbsolutePath
    }
    val merged = TrainingDataJob.mergedCorpusCard(spark, outs).collect().map(_.toSeq)
    val direct = graft.operators.TextOps.corpusStats(tables).collect().map(_.toSeq)
    assert(merged.sameElements(direct),
      s"cross-run merge≠direct: ${merged.zip(direct).filter(p => p._1 != p._2).take(3).toSeq}")
  }

  test("scrub stage: masked corpus ships no digits/emails, same doc set, audit counts consistent") {
    import org.apache.spark.sql.functions._
    val plain = TrainingDataJob.materialize(tables, nShards = 4)
    val scrubbed = TrainingDataJob.materialize(tables, nShards = 4, scrub = true)
    // same survivors, same layout labels — scrub only rewrites text
    val pk = plain.select("doc_id").collect().map(_.getLong(0)).toSet
    val sk = scrubbed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sk == pk, "scrub must not change the surviving doc set")
    val rows = scrubbed.select(col("text"), col("n_emails"), col("n_digit_runs")).collect()
    for (r <- rows) {
      val text = r.getString(0)
      assert(!text.exists(_.isDigit), s"digits survive scrub: ${text.take(80)}")
      assert(!text.matches(".*[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}.*"),
        s"email survives scrub: ${text.take(80)}")
      // a doc with zero findings must ship byte-identical text
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
    val untouched = scrubbed.filter(col("n_emails") === 0 && col("n_digit_runs") === 0)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = plain.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    untouched.foreach { case (id, txt) =>
      assert(orig(id) == txt, s"clean doc $id must be unmodified")
    }
  }
}
