package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming form of the curation pipeline (SURVEY §2.E15): documents
  * arriving on an incremental-ingest stream are quality-scored,
  * langid-checked, and deduped by content hash — the batch docCurate
  * verdict computed as rows arrive instead of per corpus sweep.
  *
  * The quality and langid stages are the SAME additive column
  * transforms the batch operator uses (TextOps.withQuality/withLangid
  * — stateless, so they stream as-is); only canonical selection
  * changes form: batch picks min doc_id per hash with a window,
  * streaming keeps the FIRST ARRIVAL per hash via
  * dropDuplicatesWithinWatermark, state bounded by the watermark delay
  * exactly like the reference's TTL cache bounds its sled DB.
  *
  * At 100 TB/day: everything before the dedup is narrow (no state, no
  * shuffle); the dedup shuffles on content_hash with per-key state of
  * one (hash, ts) row, evicted by the watermark.
  */
object DocStreamJob {

  /** Streaming twin of G16's audited JSONL reader: documents arriving
    * as JSONL FILES in a landing directory (the batch-drop ingest
    * pattern crawled corpora actually use) become a streaming relation
    * ready for streamDocCurate. Same enforced-schema + in-struct
    * corrupt-column discipline as Sinks.readJsonLinesAudited — one
    * codegen'd from_json pass, corrupt lines flagged (`is_corrupt`)
    * with their raw text kept for replay rather than killing the
    * stream; `ingest_ts` derives from the file's modification time
    * (`_metadata` — when the batch landed, which is what the curation
    * watermark should run on; intra-file order carries no time).
    *
    * One relation with a flag, not a (clean, quarantine) pair: a
    * streaming source can't feed two sinks from one query, so the
    * caller filters — clean rows continue into curation, corrupt rows
    * go to a quarantine sink as a second query over the same source.
    */
  def jsonlDocStream(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val pSchema = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = spark.readStream.text(path)
      .select(col("value").as("raw_line"),
        col("_metadata.file_modification_time").as("ingest_ts"),
        from_json(col("value"), pSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("rec"))
    parsed.select(
      (col("rec").isNull || col("rec._corrupt_record").isNotNull).as("is_corrupt"),
      col("raw_line"), col("ingest_ts"), col("rec.*")).drop("_corrupt_record")
  }

  /** docs: streaming relation with (doc_id, text, lang, ingest_ts).
    * Emits the curated keep-set: first copy of each content hash,
    * quality ≥ minScore, predicted language agrees.
    *
    * Dedup runs FIRST, filters second — the order is semantic, not
    * cosmetic: the batch verdict judges the CANONICAL copy of each
    * hash, so the stream must pick its survivor (first arrival) before
    * filtering. Filtering first would let a later copy with different
    * labels slip through as "first of its hash" whenever the canonical
    * copy fails a filter, breaking the stream ≡ batch keep-set law.
    * It is also the cheaper order: only unique survivors are scored.
    */
  def streamDocCurate(docs: DataFrame, minScore: Double = 0.5,
      watermarkDelay: String = "1 hour"): DataFrame =
    TextOps.withLangid(TextOps.withQuality(
      docs
        .withColumn("content_hash", md5(col("text")))
        // kept/dropped-by-reason observability, mirroring the event
        // pipeline's kes_cache_in/out pattern: in − unique = duplicates
        // suppressed by the dedup state; the reason sums use the SAME
        // flags the batch docCurate emits, so GraftMetricsListener's
        // counters agree with what a batch sweep would report
        .observe("doc_curate_in", count(lit(1)).as("n"))
        .withWatermark("ingest_ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("content_hash")))
      .observe("doc_curate_unique", count(lit(1)).as("n"),
        sum((col("quality_score") < minScore).cast("long")).as("low_quality"),
        sum((col("pred_lang") =!= col("lang")).cast("long")).as("lang_mismatch"))
      .filter(col("quality_score") >= minScore && col("pred_lang") === col("lang"))
      .observe("doc_curate_kept", count(lit(1)).as("n"))
      .select(col("doc_id"), col("ingest_ts"), col("lang"), col("pred_lang"),
        col("n_tokens"), col("quality_score"), col("content_hash"))

  /** Streaming form of E30 (model-based quality scoring applied
    * online): arriving docs are scored against the STATIC weight
    * relation (TextOps.qualityModelWeights — at deploy, the trained
    * artifact) — the train-offline/apply-online split A30 uses for
    * anomaly thresholds, applied to model scoring.
    *
    * Shape: the token explode is a stateless narrow transform; the
    * weight lookup is a stream-static equi-join against the bounded
    * (vocabV-row) relation — broadcast, no stream-side shuffle before
    * it; only the per-doc sum keeps state, keyed by (doc_id,
    * ingest_ts) and closed by the watermark. Same z/fast-sigmoid math
    * as the batch scorer, so stream ≡ batch per doc (StreamingSpec).
    */
  def streamDocQualityModel(docs: DataFrame, weights: DataFrame,
      bias: Double = 0.1, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("doc_id"), col("ingest_ts"),
        explode(split(lower(col("text")), " ")).as("token"))
      .join(broadcast(weights), Seq("token"), "left")
      .groupBy(col("doc_id"), col("ingest_ts"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w_milli"), lit(0L))).as("swm"))
      .withColumn("z", lit(bias) + (col("swm") / 1000.0) / col("n_tokens"))
      .select(col("doc_id"), col("ingest_ts"), col("n_tokens"),
        (col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))) + 0.5).as("score"),
        (col("z") >= 0).cast("int").as("keep"))

  /** Streaming form of E63 (the Gopher rule card): every rule is a
    * stateless narrow expression over the arriving document alone, so
    * the twin IS the batch projection on the ingest stream — no
    * watermark, no state, no join; the curation gate a stream deploy
    * applies before anything stateful sees the doc. StreamingSpec law:
    * stream ≡ batch verdict per document.
    */
  def streamDocGopherRules(docs: DataFrame): DataFrame =
    graft.operators.TextOps.withGopherRules(docs).drop("text")

  /** Streaming form of C8b (SURVEY §2.A32): documents arriving on the
    * ingest stream are near-dup-checked against the STATIC base band
    * index (Dedup.baseBandIndex — at deploy, the persisted artifact)
    * as they arrive, instead of per daily sweep. Emits the DUPLICATE
    * report: (doc_id, ingest_ts, dup_of, jaccard) for each arriving
    * doc whose verified Jaccard against some base doc clears the
    * threshold — lowest qualifying base id, exactly the batch rule.
    * Docs with no match emit nothing here (they continue down the
    * curation path; absence of a verdict is the "new" signal).
    *
    * Shape: gram hashing and the per-row native MinHashSig are
    * stateless narrow transforms (a groupBy signature aggregate would
    * be stateful — that is why MinHashSig exists); the band probe is a
    * stream-static equi-join (no state); only the min-partner
    * aggregation keeps state, keyed by (doc_id, ingest_ts) and closed
    * by the watermark like every windowed aggregate in this module.
    */
  def streamDocNearDup(docs: DataFrame, baseIndex: DataFrame,
      threshold: Double = 0.2, watermarkDelay: String = "10 minutes"): DataFrame = {
    val probe = docs
      .withColumn("gs", call_function("graft_gram3_hashes", col("text")))
      .withColumn("n_grams", size(col("gs")))
      .withColumn("sig", call_function("graft_minhash_sig", col("gs")))
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("doc_id"), col("ingest_ts"), col("gs"), col("n_grams"),
        expr("""stack(4,
          0, concat_ws(',', sig[0],  sig[1],  sig[2],  sig[3]),
          1, concat_ws(',', sig[4],  sig[5],  sig[6],  sig[7]),
          2, concat_ws(',', sig[8],  sig[9],  sig[10], sig[11]),
          3, concat_ws(',', sig[12], sig[13], sig[14], sig[15])) AS (pband, pband_val)"""))
    probe.join(baseIndex,
        col("pband") === col("band") && col("pband_val") === col("band_val"))
      .withColumn("c", call_function("graft_intersect_count", col("gs"), col("gsb")))
      .withColumn("j", col("c") / (col("n_grams") + col("nb") - col("c")))
      .filter(col("j") >= threshold)
      .groupBy(col("doc_id"), col("ingest_ts"))
      .agg(min(struct(col("db"), col("j"))).as("best"))
      .select(col("doc_id"), col("ingest_ts"),
        col("best.db").as("dup_of"), col("best.j").as("jaccard"))
  }

  final case class NearDupCand(doc_a: Long, doc_b: Long, agree: Long,
      est_jaccard: Double)

  /** A62: stream-INTERNAL near-dup candidates — the half A32 doesn't
    * cover: A32 probes a static base index, so two duplicates that
    * both arrive on today's stream sail through. Here the band index
    * IS the stream state: each arriving doc's 4 MinHash bands probe
    * their bucket for earlier arrivals (emitting a candidate per
    * shared band, with the signature-agreement estimate — C3b's
    * "trust the signatures" mode, no gram sets shuffled or stored),
    * then insert. Pairing is strictly earlier←later in arrival order
    * (intra-batch: doc_id order), so the emitted relation equals the
    * batch band-candidate relation with doc_a < doc_b
    * (StreamingSpec law, distinct over bands). State = the bucket
    * residents' 16-long signatures — the full-history cost inherent
    * to within-stream dedup; at deploy it is bounded by the same
    * TTL/compaction policy as any dedup store (drop buckets idle past
    * the retention window), or by periodically folding state into the
    * persisted C8b base index and restarting fresh.
    */
  /** `retention = Some(delay)` turns the doc-comment's deploy policy
    * into code: residents whose ingest_ts falls behind the ingest-time
    * watermark are dropped at next bucket access, and a fully idle
    * bucket is cleared by an event-time timeout at its newest
    * resident — state becomes O(arrival rate · retention), flat under
    * soak (StreamingSoakSpec), at the documented trade that a
    * duplicate arriving more than `retention` after its partner goes
    * unreported (the pair belongs to the persisted C8b base index by
    * then). The default (None) keeps the exact full-history relation
    * the stream ≡ batch law pins.
    */
  def streamDocNearDupWithin(docs: DataFrame,
      retention: Option[String] = None)
      : org.apache.spark.sql.Dataset[NearDupCand] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val src = retention match {
      case Some(d) => docs.withWatermark("ingest_ts", d)
      case None    => docs
    }
    val banded = src
      .withColumn("sig", call_function("graft_minhash_sig",
        call_function("graft_gram3_hashes", col("text"))))
      .select(col("doc_id"), col("sig"),
        expr("""stack(4,
          0, concat_ws(',', sig[0],  sig[1],  sig[2],  sig[3]),
          1, concat_ws(',', sig[4],  sig[5],  sig[6],  sig[7]),
          2, concat_ws(',', sig[8],  sig[9],  sig[10], sig[11]),
          3, concat_ws(',', sig[12], sig[13], sig[14], sig[15])) AS (band, band_val)"""),
        // the watermarked column itself must reach the stateful
        // operator (event-time timeout requires it in its input)
        col("ingest_ts"))
      .as[(Long, Seq[Long], Int, String, java.sql.Timestamp)]
    val timeoutConf =
      if (retention.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: (Int, String), it: Iterator[(Long, Seq[Long], Int, String, java.sql.Timestamp)],
            state: org.apache.spark.sql.streaming.GroupState[List[(Long, Seq[Long], Long)]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          if (retention.isDefined) {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            bucket = bucket.filter(_._3 >= wmUs)
          }
          val out = List.newBuilder[NearDupCand]
          it.toSeq.sortBy(_._1).foreach { case (id, sig, _, _, ts) =>
            bucket.foreach { case (pid, psig, _) =>
              val agree = psig.iterator.zip(sig.iterator).count { case (a, b) => a == b }.toLong
              out += NearDupCand(math.min(pid, id), math.max(pid, id),
                agree, agree / 16.0)
            }
            bucket = (id, sig, ts.getTime * 1000L) :: bucket
          }
          if (bucket.isEmpty) state.remove()
          else {
            state.update(bucket)
            // clear the bucket entirely once the watermark passes its
            // newest resident (no arrival will ever pair against it)
            if (retention.isDefined)
              state.setTimeoutTimestamp(bucket.map(_._3).max / 1000L + 1L)
          }
          out.result().iterator
      }
  }

  /** The per-batch drift report: each source's share of the batch vs a
    * broadcast BASELINE share relation (source, expected_share) —
    * trained offline from the historical corpus (E19/E25's world).
    * `drifted` flags a share outside [expected/tol, expected·tol];
    * sources in the baseline but ABSENT from the batch are emitted
    * with share 0 (a vanished feed is the drift most worth alarming
    * on). Pure batch logic so it is unit-testable and reusable.
    */
  def sourceDriftReport(batch: DataFrame, baseline: DataFrame,
      tolRatio: Double = 2.0): DataFrame = {
    val counts = batch.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    baseline
      .join(counts, Seq("source"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        (coalesce(col("n_docs"), lit(0L)).cast("double") / col("total").cast("double"))
          .as("share"),
        col("expected_share"))
      .withColumn("drifted",
        (col("share") < col("expected_share") / tolRatio) ||
          (col("share") > col("expected_share") * tolRatio))
  }

  /** Ingest drift monitor — A30's train-offline/apply-online shape for
    * corpus INTAKE: every micro-batch's source mix is compared to the
    * baseline and the report is handed to `onReport` (alerting sink,
    * metrics push, quarantine trigger). foreachBatch because share
    * needs two aggregation levels (counts + total), which a streaming
    * append aggregate can't chain; per-batch granularity is also the
    * operationally honest one — "this DROP was 90% one domain" beats
    * a windowed average that smears it.
    */
  def streamSourceDrift(docs: DataFrame, baseline: DataFrame,
      tolRatio: Double, queryName: String, checkpoint: String)(
      onReport: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          onReport(sourceDriftReport(batch, baseline, tolRatio), batchId)
      }
      .start()

  final case class CdcNovelty(doc_id: Long, ingest_ts: java.time.Instant,
      n_chunks: Long, n_known: Long, shared_bytes: Long, new_bytes: Long,
      novelty_r: Double)

  /** Per-doc CDC chunking in the JVM — EXACTLY the E55 relation's cut
    * rule, BYTE-LEVEL like the batch op: RollingHashAll window hashes
    * over the raw UTF-8 octets, cut at hv ≡ 0 mod modDiv at the window
    * end, final segment to end-of-bytes. Chunk identity = md5 of the
    * chunk bytes' UPPERCASE HEX (the batch convention md5(hex(bytes)),
    * chosen because the DuckDB oracle's md5 is VARCHAR-only). Lengths
    * are byte lengths. Works on any text — a cut may split a
    * multi-byte character; identity and novelty accounting stay exact.
    */
  private[graft] def cdcChunkHashes(text: String, window: Int,
      modDiv: Int): Seq[(Int, String)] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.isEmpty) return Nil
    val hs = graft.functions.RollingHashAll.hashes(bytes, window)
    val ends = scala.collection.mutable.TreeSet.empty[Int]
    var i = 0
    while (i < hs.numElements()) {
      if (hs.getLong(i) % modDiv == 0) ends += (i + window)
      i += 1
    }
    ends += bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexDigits = "0123456789ABCDEF"
    var start = 1
    ends.toSeq.map { e =>
      val n = e - start + 1
      val hexChunk = new Array[Byte](n * 2)
      var j = 0
      while (j < n) {
        val b = bytes(start - 1 + j) & 0xff
        hexChunk(2 * j) = hexDigits.charAt(b >> 4).toByte
        hexChunk(2 * j + 1) = hexDigits.charAt(b & 0xf).toByte
        j += 1
      }
      md.reset()
      val hex = md.digest(hexChunk).map(b => f"$b%02x").mkString
      start = e + 1
      (n, hex)
    }
  }

  /** E55 ONLINE: streaming CDC NOVELTY — each arriving document is
    * content-defined-chunked in-row and scored against the base chunk
    * store's hash set (G23's `chunks/` keys): how many chunks, and how
    * many BYTES, are genuinely new vs already stored. The intake
    * dedup-budget meter: a crawl re-delivering yesterday's pages shows
    * novelty ≈ 0 here before any pair join or cluster job runs.
    *
    * Scale shape: completely NARROW — chunking is per-row JVM work
    * (the batch op's exact cut rule via the shared helper), the base
    * hash set rides the closure as a broadcast set (at 100 TB: the
    * C9b Bloom swap — same test, ~10 bits/chunk, FPs undercount
    * novelty slightly and are measurable via E55's FP math). No
    * shuffle, no state; works in any output mode.
    */
  def streamDocCdcNovelty(docs: org.apache.spark.sql.Dataset[graft.model.IngestDoc],
      baseHashes: scala.collection.Set[String], window: Int = 16,
      modDiv: Int = 64): org.apache.spark.sql.Dataset[CdcNovelty] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      val chunks = cdcChunkHashes(d.text, window, modDiv)
      val (known, fresh) = chunks.partition { case (_, h) => baseHashes.contains(h) }
      val sharedB = known.map(_._1.toLong).sum
      val newB = fresh.map(_._1.toLong).sum
      val nov =
        if (chunks.isEmpty) 0.0
        else math.floor(newB.toDouble / (sharedB + newB) * 1e6 + 0.5) / 1e6
      CdcNovelty(d.doc_id, d.ingest_ts, chunks.length.toLong,
        known.length.toLong, sharedB, newB, nov)
    }
  }

  /** Streaming form of E64 (HTML→text, E64b): the extractor is one
    * stateless narrow pass per payload, so the twin is the batch core
    * mapped over the arriving (doc_id, ingest_ts, payload) rows — no
    * watermark, no state, no shuffle; the boundary a live crawl
    * ingest runs BEFORE the stateful stages (A32 near-dup, E15
    * curation) see the page. Quarantine rows flow through tagged, as
    * in batch. StreamingSpec law: stream ≡ batch extraction per doc.
    */
  def streamDocHtmlExtract(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(col("doc_id").cast("long"), col("ingest_ts"),
        col("payload").cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions(_.map { case (id, ts, s) =>
        val (st, ti, tx, nb, nl, ld) =
          TextOps.htmlExtractOne(Option(s).getOrElse(""))
        (id, ts, st, Option(ti), Option(tx),
          if (nb < 0L) None else Some(nb),
          if (nl < 0L) None else Some(nl),
          if (ld < 0.0) None else Some(ld))
      })
      .toDF("doc_id", "ingest_ts", "status", "title", "text", "n_blocks",
        "n_links", "link_density_r")
  }

  /** Streaming form of E66 (URL canonicalization, E66b): stateless
    * like E64b — the identity layer a live crawl applies per fetched
    * record before any URL-keyed state (frontier dedup, host budgets)
    * is touched. StreamingSpec law: stream ≡ batch canon per doc.
    */
  def streamDocUrlCanon(urls: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .select(col("doc_id").cast("long"), col("ingest_ts"),
        col("url").cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions(_.map { case (id, ts, u) =>
        val (st, canon, sc, ho, rd, np) =
          graft.operators.UrlOps.urlCanonOne(Option(u).getOrElse(""))
        (id, ts, st, Option(canon), Option(sc), Option(ho), Option(rd),
          if (np < 0L) None else Some(np))
      })
      .toDF("doc_id", "ingest_ts", "status", "url_canon", "scheme",
        "host", "reg_domain", "n_params")
  }

  /** Per-host throttle state: fetch requests still inside windows the
    * watermark has not closed — (win_s, ts_s, doc_id), bounded by the
    * host's arrival rate × (window + watermark delay), never history.
    */
  final case class ThrottleState(open: Seq[(Long, Long, Long)])

  final case class ThrottleRec(doc_id: Long, host: String, ts_s: Long,
      win_s: Long, fetch_rank: Long, allow: Int)

  /** E70 ONLINE: streaming per-host fetch throttle, the twin of
    * `UrlOps.docHostThrottle` — the politeness gate a live crawler
    * applies to its frontier. Arriving requests canonicalize to a
    * host (stateless, quarantined URLs drop — they cannot be
    * fetched), then buffer per (host, window) until the watermark
    * passes the window's END; the window then ranks by (ts, doc_id)
    * and emits allow/defer verdicts — exactly the batch rank replayed
    * online (the A42/A67b close-then-score discipline: a verdict
    * issued before the window closes could be invalidated by a late
    * earlier request). An event-time timeout closes tail windows
    * without waiting for the host's next arrival. StreamingSpec law:
    * stream ≡ batch verdicts.
    */
  def streamHostThrottle(urls: DataFrame, maxPerWindow: Int = 3,
      windowSec: Int = 60, watermarkDelay: String = "10 minutes"):
      org.apache.spark.sql.Dataset[ThrottleRec] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val canon = urls
      .select(col("doc_id").cast("long"), col("ingest_ts"),
        col("url").cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions(_.flatMap { case (id, ts, u) =>
        val (st, _, _, host, _, _) =
          graft.operators.UrlOps.urlCanonOne(Option(u).getOrElse(""))
        if (st == "ok") Some((id, ts, host)) else None
      })
      .toDF("doc_id", "ingest_ts", "host")
      .withWatermark("ingest_ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, String)]

    def fn(host: String, it: Iterator[(Long, java.sql.Timestamp, String)],
        state: org.apache.spark.sql.streaming.GroupState[ThrottleState]):
        Iterator[ThrottleRec] = {
      val prev = state.getOption.map(_.open).getOrElse(Nil)
      val incoming = it.map { case (id, ts, _) =>
        val s = ts.getTime / 1000L
        (s - s % windowSec, s, id)
      }.toSeq
      val all = prev ++ incoming
      val wmS = state.getCurrentWatermarkMs() / 1000L
      val (closed, open) = all.partition { case (w, _, _) =>
        w + windowSec <= wmS }
      val out = closed.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (w, rows) =>
          rows.sortBy { case (_, s, id) => (s, id) }.zipWithIndex.map {
            case ((_, s, id), i) =>
              ThrottleRec(id, host, s, w, i + 1L,
                if (i < maxPerWindow) 1 else 0)
          }
      }
      state.update(ThrottleState(open))
      if (open.nonEmpty)
        state.setTimeoutTimestamp((open.map(_._1).min + windowSec) * 1000L + 1L)
      out.iterator
    }

    canon.groupByKey(_._3)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
