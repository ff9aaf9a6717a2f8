package graft

import graft.functions.Hashing
import graft.operators.TextOps

/** DuckDB oracle SQL for the dedup/similarity/text operator families.
  *
  * These mirror the Spark operators expression-for-expression; the
  * machine-generated parts (16 minhash permutations, 60 simhash bit
  * sums) are emitted from the same Scala constants the operators use,
  * so the two sides cannot drift.
  *
  * Portable-hash identity: Spark conv(substr(md5(x),1,15),16,10)::long
  * ⇔ DuckDB ('0x'||substr(md5(x),1,15))::BIGINT.
  */
object OracleSqlGen {

  /** SQL string literal (single quotes doubled). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Shared CTE: distinct word-3-gram shingles + 60-bit base hash. */
  private val gramCtes: String =
    """t AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk)>=3
      |  THEN [array_to_string(tk[i:i+2],' ') for i in range(1,len(tk)-1)]
      |  ELSE [lt] END)) AS gram FROM t),
      |h AS (SELECT doc_id, gram, ('0x'||substr(md5(gram),1,15))::BIGINT AS h0 FROM g)""".stripMargin

  private val minExprs: String = Hashing.Perms.zipWithIndex.map { case ((a, b), i) =>
    s"MIN(($a*(h0%${Hashing.M30})+$b)%${Hashing.P}) AS m$i"
  }.mkString(",\n  ")

  private val sigCte = s"sig AS (SELECT doc_id,\n  $minExprs\n  FROM h GROUP BY doc_id)"

  private def bandConcat(js: Range): String = js.map(i => s"m$i").mkString("||','||")

  val docMinhashSig: String =
    s"""WITH $gramCtes,
       |$sigCte
       |SELECT doc_id, ${bandConcat(0 until 16)} AS sig FROM sig ORDER BY doc_id""".stripMargin

  private val jaccardCtes =
    """sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
      |common AS (SELECT da, db, COUNT(*) AS c FROM cand
      |  JOIN g ga ON ga.doc_id = da
      |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
      |  GROUP BY da, db)""".stripMargin

  private val jaccardSelect =
    """SELECT da AS doc_a, db AS doc_b, c/(sa.n+sb.n-c) AS jaccard
      |FROM common JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
      |WHERE c/(sa.n+sb.n-c) >= 0.2""".stripMargin

  private val jaccardTail = s"$jaccardCtes\n$jaccardSelect\nORDER BY doc_a, doc_b"

  val docMinhashLshPairs: String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |$jaccardTail""".stripMargin

  /** E55: content-defined chunking — BYTE-LEVEL, matching the Spark
    * side: the document's UTF-8 octets are recovered through DuckDB's
    * hex(encode(text)) (v1.0.0 has no BLOB md5/substr, so every byte
    * step rides the uppercase hex string: byte i = hex digits 2i-1,2i),
    * per-window Rabin–Karp fold over the byte-value list (recomputed
    * O(n·k); the Spark side's native pass is value-identical), cut
    * where hash ≡ 0 (mod modDiv), segmentation via LAG over the
    * distinct end positions, copy count per chunk content hash. Chunk
    * identity = md5 of the chunk bytes' uppercase hex — the one md5
    * input both engines can hash.
    *
    * The gated corpus is the documents table PLUS the multi-byte
    * plant ([[graft.operators.TextOps.plantUtf8Docs]] — same constants),
    * so the oracle comparison always covers docs whose byte and char
    * offsets diverge.
    */
  private def cdcCtes(window: Int, modDiv: Int): String = {
    val pfx = sqlLit(graft.operators.TextOps.Utf8PlantPrefix)
    val sfx = sqlLit(graft.operators.TextOps.Utf8PlantSuffix)
    val every = graft.operators.TextOps.Utf8PlantEvery
    s"""docs_aug AS (SELECT doc_id, text, source FROM documents
       |  UNION ALL SELECT doc_id + 9000000, $pfx || text || $sfx, source
       |  FROM documents WHERE doc_id % $every = 0),
       |d AS (SELECT doc_id, hex(encode(text)) AS hx,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM docs_aug WHERE length(text) > 0),
       |bl AS (SELECT doc_id,
       |  [CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)*16
       |     + strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1 AS BIGINT)
       |   for i in range(1, CAST(len AS INTEGER)+1)] AS bv
       |  FROM d),
       |pos AS (SELECT doc_id, unnest(range(1, CAST(len AS INTEGER) - ${window - 2})) AS p
       |  FROM d WHERE len >= $window),
       |hv AS (SELECT pos.doc_id, p,
       |  list_reduce(bl.bv[CAST(p AS INTEGER):CAST(p + ${window - 1} AS INTEGER)],
       |    (a, b) -> (a * 31 + b) % 1073741789) AS h
       |  FROM pos JOIN bl ON bl.doc_id = pos.doc_id),
       |cuts AS (SELECT doc_id, CAST(p + ${window - 1} AS BIGINT) AS e FROM hv WHERE h % $modDiv = 0),
       |ends AS (SELECT DISTINCT doc_id, e FROM
       |  (SELECT doc_id, e FROM cuts UNION ALL SELECT doc_id, len AS e FROM d)),
       |seg AS (SELECT doc_id, e,
       |  COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS start,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx
       |  FROM ends),
       |ch AS (SELECT s.doc_id, CAST(s.chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(s.start AS BIGINT) AS start_pos,
       |  CAST(s.e - s.start + 1 AS BIGINT) AS chunk_len,
       |  md5(substr(d.hx, CAST((s.start - 1) * 2 + 1 AS INTEGER), CAST((s.e - s.start + 1) * 2 AS INTEGER))) AS chunk_hash
       |  FROM seg s JOIN d ON d.doc_id = s.doc_id)""".stripMargin
  }

  def docCdcChunks(window: Int, modDiv: Int): String =
    s"""WITH ${cdcCtes(window, modDiv)}
       |SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_hash,
       |  CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS n_copies
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** E57: per-source chunk dup-mass rollup over the E55 chain — an
    * occurrence is dup mass when an earlier (doc, chunk) occurrence
    * of the same content hash exists.
    */
  def docCdcDupMass(window: Int, modDiv: Int): String =
    s"""WITH ${cdcCtes(window, modDiv)},
       |rk AS (SELECT doc_id, chunk_len, chunk_hash,
       |  ROW_NUMBER() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) AS occ_rank
       |  FROM ch)
       |SELECT dd.source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(rk.chunk_len) AS BIGINT) AS total_bytes,
       |  CAST(SUM(CASE WHEN rk.occ_rank > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  CAST(SUM(CASE WHEN rk.occ_rank > 1 THEN rk.chunk_len ELSE 0 END) AS BIGINT) AS dup_bytes,
       |  floor((CAST(SUM(CASE WHEN rk.occ_rank > 1 THEN rk.chunk_len ELSE 0 END) AS DOUBLE) /
       |    CAST(SUM(rk.chunk_len) AS DOUBLE))*1000000 + 0.5)/1000000 AS dup_share_r
       |FROM rk JOIN docs_aug dd ON dd.doc_id = rk.doc_id
       |GROUP BY dd.source ORDER BY dd.source""".stripMargin

  /** C30: dedup-decision agreement — C3's verified-Jaccard verdict vs
    * the r6'd Levenshtein similarity over the same candidates, one
    * 4-counter confusion aggregate with guarded ratios.
    */
  def docDedupAgreement(simThr: Double, jaccThr: Double): String = {
    def ratio(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN floor((CAST($num AS DOUBLE)/CAST($den AS DOUBLE))*1000000 + 0.5)/1000000 END"
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |pred AS (SELECT da, db
       |  FROM common JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
       |  WHERE c/(sa.n+sb.n-c) >= $jaccThr),
       |tr AS (SELECT c2.da, c2.db,
       |  CAST(floor((1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE) /
       |    CAST(GREATEST(length(x.text), length(y.text)) AS DOUBLE))*1000000 + 0.5)/1000000 >= $simThr AS INTEGER) AS y
       |  FROM cand c2 JOIN documents x ON x.doc_id = c2.da JOIN documents y ON y.doc_id = c2.db),
       |jn AS (SELECT tr.y, CAST(pred.da IS NOT NULL AS INTEGER) AS p
       |  FROM tr LEFT JOIN pred ON pred.da = tr.da AND pred.db = tr.db)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |  CAST(SUM(p*y) AS BIGINT) AS tp,
       |  CAST(SUM(p*(1-y)) AS BIGINT) AS fp,
       |  CAST(SUM((1-p)*y) AS BIGINT) AS fn,
       |  CAST(SUM((1-p)*(1-y)) AS BIGINT) AS tn,
       |  ${ratio("SUM(p*y)", "SUM(p*y) + SUM(p*(1-y))")} AS precision_r,
       |  ${ratio("SUM(p*y)", "SUM(p*y) + SUM((1-p)*y)")} AS recall_r,
       |  ${ratio("2*SUM(p*y)", "2*SUM(p*y) + SUM(p*(1-y)) + SUM((1-p)*y)")} AS f1_r
       |FROM jn""".stripMargin
  }

  /** C29: exact Levenshtein over the C3 band candidates — native
    * `levenshtein` on both engines (same DP definition), one r6'd
    * normalized-similarity division.
    */
  val docEditDistance: String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT c.da AS doc_a, c.db AS doc_b,
       |  CAST(length(x.text) AS BIGINT) AS len_a,
       |  CAST(length(y.text) AS BIGINT) AS len_b,
       |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
       |  floor((1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE) /
       |    CAST(GREATEST(length(x.text), length(y.text)) AS DOUBLE))*1000000 + 0.5)/1000000 AS sim_r
       |FROM cand c
       |JOIN documents x ON x.doc_id = c.da
       |JOIN documents y ON y.doc_id = c.db
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C28: b-bit minhash estimation card — low-b-bit agreement over
    * the SAME band candidates as C3b, with the Li–König collision
    * correction (C = 2^-b, exact binary fractions on both engines).
    */
  def docBbitMinhashEst(bBits: Int): String = {
    val mask = (1L << bBits) - 1
    val cFloor = 1.0 / (1L << bBits)
    val agreeF = (0 until 16)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    val agreeB = (0 until 16)
      .map(i => s"(CASE WHEN (a.m$i & $mask) = (b.m$i & $mask) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |common AS (SELECT da, db, COUNT(*) AS c FROM cand
       |  JOIN g ga ON ga.doc_id = da
       |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
       |  GROUP BY da, db),
       |agr AS (SELECT cand.da, cand.db,
       |  CAST($agreeF AS BIGINT) AS agree_full,
       |  CAST($agreeB AS BIGINT) AS agree_bbit
       |  FROM cand JOIN sig a ON a.doc_id = cand.da JOIN sig b ON b.doc_id = cand.db)
       |SELECT agr.da AS doc_a, agr.db AS doc_b, agr.agree_full, agr.agree_bbit,
       |  floor(((agr.agree_bbit/16.0 - $cFloor)/${1.0 - cFloor})*1000000 + 0.5)/1000000 AS est_bbit_r,
       |  COALESCE(common.c, 0)/(sa.n + sb.n - COALESCE(common.c, 0)) AS jaccard
       |FROM agr LEFT JOIN common ON common.da = agr.da AND common.db = agr.db
       |  JOIN sizes sa ON sa.doc_id = agr.da JOIN sizes sb ON sb.doc_id = agr.db
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** C22: df histogram — log₂ buckets via binary-repr length (integer
    * exact), posting volume and the uncapped pair bound per bucket.
    */
  val docShingleDfHist: String =
    s"""WITH $gramCtes,
       |d AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY 1),
       |b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_bucket, df FROM d)
       |SELECT df_bucket, COUNT(*) AS n_shingles,
       |  CAST(SUM(df) AS BIGINT) AS total_postings,
       |  CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS uncapped_pairs
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** C21: measured LSH recall — exact pairs left-joined against the
    * band-candidate relation, rolled up by Jaccard band.
    */
  val docLshRecall: String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |lcand AS (SELECT DISTINCT a.doc_id AS lca, b.doc_id AS lcb
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |exact AS ($jaccardSelect),
       |jx AS (SELECT
       |  CASE WHEN jaccard < 0.4 THEN 'low' WHEN jaccard < 0.7 THEN 'mid' ELSE 'high' END AS j_band,
       |  CAST(lca IS NOT NULL AS BIGINT) AS found
       |  FROM exact LEFT JOIN lcand ON doc_a = lca AND doc_b = lcb),
       |k AS (SELECT j_band, COUNT(*) AS n_exact, CAST(SUM(found) AS BIGINT) AS n_found
       |  FROM jx GROUP BY 1)
       |SELECT j_band, n_exact, n_found,
       |  floor((CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_r
       |FROM k ORDER BY j_band""".stripMargin

  /** Estimator-vs-exact relation: agreement count over the 16
    * signature components next to the verified Jaccard, ALL LSH
    * candidates (no threshold; zero-overlap candidates keep jaccard 0
    * via the left join).
    */
  val docMinhashJaccardEst: String = {
    val agree = (0 until 16)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |common AS (SELECT da, db, COUNT(*) AS c FROM cand
       |  JOIN g ga ON ga.doc_id = da
       |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
       |  GROUP BY da, db),
       |agr AS (SELECT cand.da, cand.db, CAST($agree AS BIGINT) AS agree
       |  FROM cand JOIN sig a ON a.doc_id = cand.da JOIN sig b ON b.doc_id = cand.db)
       |SELECT agr.da AS doc_a, agr.db AS doc_b, agr.agree,
       |  agr.agree/16.0 AS est_jaccard,
       |  COALESCE(common.c, 0)/(sa.n + sb.n - COALESCE(common.c, 0)) AS jaccard
       |FROM agr LEFT JOIN common ON common.da = agr.da AND common.db = agr.db
       |  JOIN sizes sa ON sa.doc_id = agr.da JOIN sizes sb ON sb.doc_id = agr.db
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** C26: duplicate-bias card — copy-vs-canonical chars/quality.
    * (def, not val: qualityCoreCtes initializes later in the object.)
    */
  def docDupBias: String =
    s"""WITH $qualityCoreCtes,
       |q AS (SELECT doc_id, n_chars, $qualityScoreExpr AS quality_score FROM r),
       |fl AS (SELECT q.doc_id, q.n_chars, q.quality_score,
       |  CAST(d.doc_id <> MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS INTEGER) AS duplicate
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id)
       |SELECT duplicate, COUNT(*) AS n_docs,
       |  floor((CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_chars_r,
       |  floor((CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_quality_r
       |FROM fl GROUP BY duplicate ORDER BY duplicate""".stripMargin

  /** C24: per-band LSH bucket-size/candidate-volume card. */
  val docLshBucketStats: String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |bs AS (SELECT j, band_val, COUNT(*) AS s FROM band GROUP BY 1, 2)
       |SELECT CAST(j AS BIGINT) AS band, COUNT(*) AS n_buckets,
       |  CAST(SUM(s) AS BIGINT) AS n_docs,
       |  CAST(MAX(s) AS BIGINT) AS max_bucket,
       |  CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS cand_pairs,
       |  CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singleton_buckets
       |FROM bs GROUP BY 1 ORDER BY band""".stripMargin

  /** C22: per-true-jaccard-bucket estimator bias/MAE over C3b pairs. */
  val docMinhashCalibration: String =
    s"""WITH pairs AS (SELECT * FROM ($docMinhashJaccardEst)),
       |e AS (SELECT CAST(floor(jaccard * 10.0) AS BIGINT) AS bucket,
       |  est_jaccard - jaccard AS err FROM pairs)
       |SELECT bucket, COUNT(*) AS n_pairs,
       |  floor((CAST(SUM(CAST(err AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_err_r,
       |  floor((CAST(SUM(CAST(abs(err) AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mae_r
       |FROM e GROUP BY bucket ORDER BY bucket""".stripMargin

  val docNgramJaccard: String =
    s"""WITH $gramCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardTail""".stripMargin

  /** df-capped candidates (shingles with df > cap generate none);
    * verification identical to the uncapped query.
    */
  def docNgramJaccardCapped(dfCap: Int): String =
    s"""WITH $gramCtes,
       |rare AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= $dfCap),
       |gc AS (SELECT g.doc_id, g.gram FROM g JOIN rare USING (gram)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM gc a JOIN gc b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardTail""".stripMargin

  /** C16: containment pairs off the same df-capped candidates as C5b;
    * both directions emitted, either clearing the threshold keeps the
    * pair. Divisions are BIGINT/BIGINT → DOUBLE in both engines.
    */
  def docNgramContainment(threshold: Double, dfCap: Int): String =
    s"""WITH $gramCtes,
       |rare AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= $dfCap),
       |gc AS (SELECT g.doc_id, g.gram FROM g JOIN rare USING (gram)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM gc a JOIN gc b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |common AS (SELECT da, db, COUNT(*) AS c FROM cand
       |  JOIN g ga ON ga.doc_id = da
       |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
       |  GROUP BY da, db)
       |SELECT da AS doc_a, db AS doc_b,
       |  c/sa.n AS cont_a_in_b, c/sb.n AS cont_b_in_a,
       |  c/(sa.n+sb.n-c) AS jaccard
       |FROM common JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
       |WHERE GREATEST(c/sa.n, c/sb.n) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C27: per-source duplicate shingle mass (df > 1 occurrence share). */
  val docDupNgramMass: String =
    s"""WITH $gramCtes,
       |d AS (SELECT doc_id, h0, COUNT(*) OVER (PARTITION BY h0) AS df FROM h),
       |j AS (SELECT d.df, doc.source FROM d JOIN documents doc ON doc.doc_id = d.doc_id)
       |SELECT source, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       |  floor((CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS dup_mass_r
       |FROM j GROUP BY 1 ORDER BY source""".stripMargin

  /** C17: per-doc corpus-unique shingle fraction. */
  val docNgramNovelty: String =
    s"""WITH $gramCtes,
       |d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS df FROM g),
       |a AS (SELECT doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CAST(df = 1 AS BIGINT)) AS BIGINT) AS n_unique
       |  FROM d GROUP BY doc_id)
       |SELECT doc_id, n_grams, n_unique,
       |  floor((n_unique/n_grams)*1000000 + 0.5)/1000000 AS novelty_r
       |FROM a ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: distinct shared-shingle count per
    * training doc vs the benchmark slice's shingle set.
    */
  private def decontCte(mod: Int, minShared: Int): String =
    s"""$gramCtes,
       |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % $mod = 0),
       |tr AS (SELECT doc_id, COUNT(*) AS n_grams FROM g WHERE doc_id % $mod <> 0 GROUP BY doc_id),
       |sh AS (SELECT g.doc_id, COUNT(*) AS n_shared
       |  FROM g JOIN bg USING (gram) WHERE g.doc_id % $mod <> 0 GROUP BY g.doc_id),
       |vr AS (SELECT tr.doc_id,
       |  COALESCE(sh.n_shared, 0) AS n_shared,
       |  tr.n_grams,
       |  CAST(COALESCE(sh.n_shared, 0) >= $minShared AS INTEGER) AS contaminated
       |FROM tr LEFT JOIN sh ON tr.doc_id = sh.doc_id)""".stripMargin

  def docDecontaminate(mod: Int, minShared: Int): String =
    s"""WITH ${decontCte(mod, minShared)}
       |SELECT doc_id, n_shared, n_grams, contaminated FROM vr
       |ORDER BY doc_id""".stripMargin

  /** C9b: Bloom-filter decontamination. The oracle phrases membership
    * relationally — a gram is Bloom-positive iff ALL kHashes affine
    * positions appear in the benchmark slice's distinct-position set —
    * which is bit-for-bit the Spark side's dense-bitset test.
    * Distinct-h0 (`hd`) mirrors Spark's hash-SET gs exactly.
    */
  def docDecontaminateBloom(mod: Int, minShared: Int, mBits: Int, k: Int): String = {
    val permRows = (0 until k).map(i =>
      s"(${Hashing.Perms(i)._1}, ${Hashing.Perms(i)._2})").mkString(", ")
    s"""WITH $gramCtes,
       |hd AS (SELECT DISTINCT doc_id, h0 FROM h),
       |perms(a, b) AS (VALUES $permRows),
       |bpos AS (SELECT DISTINCT (a*(h0%${Hashing.M30})+b)%${Hashing.P}%$mBits AS pos
       |  FROM hd, perms WHERE doc_id % $mod = 0),
       |tp AS (SELECT doc_id, h0, (a*(h0%${Hashing.M30})+b)%${Hashing.P}%$mBits AS pos
       |  FROM hd, perms WHERE doc_id % $mod <> 0),
       |gh AS (SELECT tp.doc_id, tp.h0,
       |  SUM(CASE WHEN bpos.pos IS NULL THEN 0 ELSE 1 END) AS set_n
       |  FROM tp LEFT JOIN bpos USING (pos) GROUP BY tp.doc_id, tp.h0),
       |ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM hd WHERE doc_id % $mod <> 0 GROUP BY doc_id)
       |SELECT gh.doc_id,
       |  CAST(SUM(CASE WHEN set_n = $k THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       |  MAX(ng.n_grams) AS n_grams,
       |  CAST(SUM(CASE WHEN set_n = $k THEN 1 ELSE 0 END) >= $minShared AS INTEGER) AS flagged
       |FROM gh JOIN ng ON ng.doc_id = gh.doc_id
       |GROUP BY gh.doc_id ORDER BY gh.doc_id""".stripMargin
  }

  /** Per-source contamination report off the C9 verdict relation. */
  def docContaminationStats(mod: Int, minShared: Int): String =
    s"""WITH ${decontCte(mod, minShared)}
       |SELECT d.source, COUNT(*) AS n_docs,
       |  CAST(SUM(vr.contaminated) AS BIGINT) AS n_contaminated,
       |  floor((CAST(SUM(vr.contaminated) AS DOUBLE)/COUNT(*))*1000000 + 0.5)/1000000 AS rate_r,
       |  CAST(SUM(vr.n_shared) AS BIGINT) AS total_shared
       |FROM vr JOIN documents d USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** C14: per-source dedup report — exact-copy counts, LSH near-dup
    * membership, mean E24 span ratio; span CTEs renamed (t2/sp4/…) to
    * avoid colliding with gramCtes' 3-gram names.
    */
  def corpusDedupStats(threshold: Double): String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |common AS (SELECT da, db, COUNT(*) AS c FROM cand
       |  JOIN g ga ON ga.doc_id = da
       |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
       |  GROUP BY da, db),
       |pairs AS (SELECT da, db FROM common
       |  JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
       |  WHERE c/(sa.n+sb.n-c) >= $threshold),
       |near AS (SELECT DISTINCT doc_id FROM
       |  (SELECT da AS doc_id FROM pairs UNION ALL SELECT db AS doc_id FROM pairs)),
       |ex AS (SELECT doc_id, md5(text) AS eh FROM documents),
       |keepx AS (SELECT eh, MIN(doc_id) AS keep_id FROM ex GROUP BY eh),
       |exact AS (SELECT ex.doc_id,
       |  CASE WHEN ex.doc_id <> keepx.keep_id THEN 1 ELSE 0 END AS is_exact
       |  FROM ex JOIN keepx USING (eh)),
       |t2 AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
       |sp4 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 4
       |  THEN [('0x'||substr(md5(array_to_string(tk[i:i+3],' ')),1,15))::BIGINT for i in range(1, len(tk)-2)]
       |  ELSE [('0x'||substr(md5(lt),1,15))::BIGINT] END) AS h4 FROM t2),
       |c4 AS (SELECT doc_id, h4, COUNT(*) AS c_sp FROM sp4 GROUP BY doc_id, h4),
       |df4 AS (SELECT h4, CAST(SUM(c_sp) AS BIGINT) AS df FROM c4 GROUP BY h4),
       |span AS (SELECT c4.doc_id,
       |  floor((CAST(SUM(CASE WHEN df4.df >= 2 THEN c_sp ELSE 0 END) AS DOUBLE)/SUM(c_sp))*1000000 + 0.5)/1000000 AS dup_ratio_r
       |  FROM c4 JOIN df4 USING (h4) GROUP BY c4.doc_id)
       |SELECT d.source AS source, COUNT(*) AS n_docs,
       |  CAST(SUM(exact.is_exact) AS BIGINT) AS n_exact_dup,
       |  CAST(SUM(CASE WHEN near.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |  floor((CAST(SUM(CAST(span.dup_ratio_r AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_span_dup_r
       |FROM documents d
       |JOIN exact ON exact.doc_id = d.doc_id
       |LEFT JOIN near ON near.doc_id = d.doc_id
       |JOIN span ON span.doc_id = d.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  /** C8b: batch-vs-corpus MinHash near-dup — C3's banding restricted
    * to batch-anchored candidates (base partners, or earlier-id batch
    * partners), exact-verified, lowest qualifying partner per batch
    * doc.
    */
  def docIncrementalMinhash(mod: Int, threshold: Double): String =
    s"""WITH $gramCtes,
       |$sigCte,
       |band AS (SELECT doc_id, j,
       |  CASE j WHEN 0 THEN ${bandConcat(0 until 4)}
       |         WHEN 1 THEN ${bandConcat(4 until 8)}
       |         WHEN 2 THEN ${bandConcat(8 until 12)}
       |         ELSE ${bandConcat(12 until 16)} END AS band_val
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM band a JOIN band b ON a.j = b.j AND a.band_val = b.band_val
       |    AND a.doc_id % $mod = 0 AND b.doc_id <> a.doc_id
       |    AND (b.doc_id % $mod <> 0 OR b.doc_id < a.doc_id)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |common AS (SELECT da, db, COUNT(*) AS c FROM cand
       |  JOIN g ga ON ga.doc_id = da
       |  JOIN g gb ON gb.doc_id = db AND gb.gram = ga.gram
       |  GROUP BY da, db),
       |ver AS (SELECT da, db, c/(sa.n+sb.n-c) AS j
       |  FROM common JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
       |  WHERE c/(sa.n+sb.n-c) >= $threshold),
       |best AS (SELECT da, MIN(db) AS dup_of FROM ver GROUP BY da),
       |bj AS (SELECT best.da, best.dup_of, ver.j FROM best
       |  JOIN ver ON ver.da = best.da AND ver.db = best.dup_of)
       |SELECT d.doc_id AS doc_id, bj.dup_of AS dup_of, bj.j AS jaccard,
       |  CAST(bj.dup_of IS NULL AS INTEGER) AS is_new
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $mod = 0) d
       |LEFT JOIN bj ON bj.da = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  def docIncrementalDedup(mod: Int): String =
    s"""WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
       |batch AS (SELECT * FROM hashed WHERE doc_id % $mod = 0),
       |base AS (SELECT * FROM hashed WHERE doc_id % $mod <> 0),
       |base_idx AS (SELECT content_hash, MIN(doc_id) AS base_id FROM base GROUP BY content_hash),
       |w AS (SELECT b.doc_id, b.content_hash, i.base_id,
       |  MIN(b.doc_id) OVER (PARTITION BY b.content_hash ORDER BY b.doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS intra_id
       |  FROM batch b LEFT JOIN base_idx i USING (content_hash))
       |SELECT doc_id, content_hash,
       |  CASE WHEN base_id IS NULL THEN intra_id
       |       WHEN intra_id IS NULL THEN base_id
       |       ELSE LEAST(base_id, intra_id) END AS dup_of,
       |  CAST((CASE WHEN base_id IS NULL THEN intra_id
       |       WHEN intra_id IS NULL THEN base_id
       |       ELSE LEAST(base_id, intra_id) END) IS NULL AS INTEGER) AS is_new
       |FROM w ORDER BY doc_id""".stripMargin

  /** Connected components over the jaccard pair graph via recursive
    * transitive closure, min reachable id per node = cluster. The CTE
    * chain is shared by C7 (cluster dump) and C15 (keep-best).
    */
  private val clusterCtes: String =
    s"""$gramCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |edges AS ($jaccardSelect),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
       |),
       |mins AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
       |  FROM reach GROUP BY src)""".stripMargin

  val docDedupClusters: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT d.doc_id,
       |  COALESCE(m.cluster, d.doc_id) AS cluster,
       |  CAST(COALESCE(m.cluster, d.doc_id) = d.doc_id AS INTEGER) AS is_canonical
       |FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** C15: keep-best canonical selection — C7's clusters joined with
    * the E2 quality score, per-cluster argmax (quality DESC, doc_id).
    */
  def docDedupKeepBest: String =
    s"""WITH RECURSIVE $clusterCtes,
       |cl AS (SELECT d.doc_id, COALESCE(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |$qualityCoreCtes,
       |q AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |sc AS (SELECT cl.doc_id, cl.cluster, q.quality_score FROM cl JOIN q USING (doc_id)),
       |k AS (SELECT cluster, doc_id AS keeper FROM (
       |  SELECT cluster, doc_id, row_number() OVER (
       |    PARTITION BY cluster ORDER BY quality_score DESC, doc_id) AS rn FROM sc)
       |  WHERE rn = 1)
       |SELECT sc.doc_id, sc.cluster, sc.quality_score, k.keeper,
       |  CAST(sc.doc_id = k.keeper AS INTEGER) AS keep
       |FROM sc JOIN k USING (cluster) ORDER BY sc.doc_id""".stripMargin

  /** C35: LSH band planner — analytic S-curve masses (powers unrolled
    * as left-associated multiplications, no libm pow) + measured
    * per-plan band-bucket candidate volume Σ C(count, 2).
    */
  def docLshBandPlanner(threshold: Double): String = {
    val plans = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
    val gridList = (0 until 20)
      .map(i => BigDecimal(25 + 50 * i, 3).toString).mkString("[", ", ", "]")
    def unroll(e: String, n: Int) = Seq.fill(n)(e).mkString("*")
    val an = plans.map { case (b, r) =>
      val q = s"(1.0 - ${unroll("s", r)})"
      val pr = s"floor((1.0 - ${unroll(q, b)})*1000000 + 0.5)/1000000"
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
         |  floor((CAST(SUM(CAST(CASE WHEN s < $threshold THEN p_r ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) * 0.05)*1000000 + 0.5)/1000000 AS fp_mass_r,
         |  floor((CAST(SUM(CAST(CASE WHEN s >= $threshold THEN 1.0 - p_r ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) * 0.05)*1000000 + 0.5)/1000000 AS fn_mass_r
         |FROM (SELECT s, $pr AS p_r FROM (SELECT CAST(unnest($gridList) AS DOUBLE) AS s))""".stripMargin
    }.mkString("\nUNION ALL ")
    val me = plans.map { case (b, r) =>
      val bandSelects = (0 until b).map { j =>
        s"SELECT $j AS band, ${bandConcat(j * r until (j + 1) * r)} AS band_val FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |  CAST(COALESCE(SUM(cnt*(cnt-1)), 0) // 2 AS BIGINT) AS cand_pairs
         |FROM (SELECT band, band_val, COUNT(*) AS cnt FROM (
         |  $bandSelects
         |) GROUP BY 1, 2)""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $gramCtes,
       |$sigCte,
       |an AS ($an),
       |me AS ($me)
       |SELECT an.bands, an.rows_per_band, an.fp_mass_r, an.fn_mass_r, me.cand_pairs
       |FROM an JOIN me USING (bands)
       |ORDER BY an.bands""".stripMargin
  }

  /** C33: cluster-keyed leakage-safe split — C7's cluster chain + the
    * E21 md5 permille lattice keyed on the cluster id.
    */
  def docSplitLeakageSafe(trainPermille: Int, validPermille: Int): String =
    s"""WITH RECURSIVE $clusterCtes,
       |cl AS (SELECT d.doc_id, COALESCE(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |sp AS (SELECT doc_id, cluster,
       |  ('0x'||substr(md5('split:'||CAST(cluster AS VARCHAR)),1,15))::BIGINT % 1000 AS mille
       |  FROM cl)
       |SELECT doc_id, cluster,
       |  CASE WHEN mille < $trainPermille THEN 'train'
       |       WHEN mille < ${trainPermille + validPermille} THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM sp ORDER BY doc_id""".stripMargin

  /** C34: cross-split near-dup pair counts, doc-keyed vs
    * cluster-keyed — the leakage audit (cluster-keyed is zero by
    * construction).
    */
  def docSplitLeakageAudit(trainPermille: Int, validPermille: Int): String = {
    val caseSplit =
      s"""CASE WHEN mille < $trainPermille THEN 'train'
         |       WHEN mille < ${trainPermille + validPermille} THEN 'valid'
         |       ELSE 'test' END AS split""".stripMargin
    def audit(rel: String, method: String) =
      s"""SELECT '$method' AS method, COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_split
         |FROM edges e JOIN $rel a ON a.doc_id = e.doc_a JOIN $rel b ON b.doc_id = e.doc_b""".stripMargin
    s"""WITH RECURSIVE $clusterCtes,
       |cl AS (SELECT d.doc_id, COALESCE(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |safes AS (SELECT doc_id, $caseSplit FROM (SELECT doc_id, cluster,
       |  ('0x'||substr(md5('split:'||CAST(cluster AS VARCHAR)),1,15))::BIGINT % 1000 AS mille FROM cl)),
       |naives AS (SELECT doc_id, $caseSplit FROM (SELECT doc_id,
       |  ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 1000 AS mille FROM documents))
       |${audit("naives", "doc_keyed")}
       |UNION ALL ${audit("safes", "cluster_keyed")}
       |ORDER BY method""".stripMargin
  }

  /** C21: cross-source exact duplication — hash groups spanning ≥2
    * sources.
    */
  val docCrossSourceDup: String =
    """SELECT content_hash, n_copies, n_sources, keep_id FROM (
      |  SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
      |    COUNT(DISTINCT source) AS n_sources, MIN(doc_id) AS keep_id
      |  FROM documents GROUP BY 1)
      |WHERE n_sources >= 2
      |ORDER BY content_hash""".stripMargin

  /** D19: cosine threshold ladder over the exact pair relation. */
  def annThresholdLadder(ths: Seq[Double]): String = {
    val lst = ths.map(t => s"$t::DOUBLE").mkString("[", ", ", "]")
    val lo = ths.min
    s"""WITH $normCte,
       |edges AS (SELECT floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < c.vec_id
       |  WHERE floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 >= $lo)
       |SELECT th AS threshold,
       |  CAST(COUNT(CASE WHEN cos_r >= th THEN 1 END) AS BIGINT) AS n_pairs
       |FROM edges CROSS JOIN (SELECT unnest($lst) AS th)
       |GROUP BY th ORDER BY th""".stripMargin
  }

  /** C19: near-dup pair counts at a threshold ladder, one pass over
    * the shared jaccard edge relation (edges non-empty at every test
    * SF, so the cross-joined threshold list survives the GROUP BY).
    */
  def docDedupRateByThreshold(ths: Seq[Double]): String = {
    val lst = ths.map(t => s"$t::DOUBLE").mkString("[", ", ", "]")
    s"""WITH $gramCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |edges AS ($jaccardSelect)
       |SELECT th AS threshold,
       |  CAST(COUNT(CASE WHEN jaccard >= th THEN 1 END) AS BIGINT) AS n_pairs
       |FROM edges CROSS JOIN (SELECT unnest($lst) AS th)
       |GROUP BY th ORDER BY th""".stripMargin
  }

  /** C18: cluster-size histogram off the shared C7 transitive-closure
    * CTEs.
    */
  val docClusterStats: String =
    s"""WITH RECURSIVE $clusterCtes,
       |cl AS (SELECT d.doc_id, COALESCE(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM cl GROUP BY 1)
       |SELECT cluster_size, COUNT(*) AS n_clusters,
       |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
       |FROM sz GROUP BY cluster_size
       |ORDER BY cluster_size""".stripMargin

  /** E34: declared×predicted language confusion matrix off the shared
    * E1 langid CTEs.
    */
  // def, not val: langidCoreCtes initializes later in the object —
  // a val here would capture null at object-init time
  def docLangConfusion: String =
    s"""WITH $langidCoreCtes,
       |m AS (SELECT lang, pred_lang, COUNT(*) AS n_docs FROM p GROUP BY 1, 2)
       |SELECT lang, pred_lang, n_docs,
       |  floor((CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE))*1000000 + 0.5)/1000000 AS share_r
       |FROM m ORDER BY lang, pred_lang""".stripMargin

  /** E33: Zipf OLS over integer micro-ln moments — op-for-op the Spark
    * expressions (r6'd ln as exact BIGINT micro-units, exact integer
    * moment sums, closed-form double math).
    */
  /** E56: Heaps'-law growth curve — first-seen-bucket counts cumsum'd
    * over the ≤nBuckets rollup, micro-ln integer OLS (E33's lattice).
    */
  def corpusHeapsLaw(nBuckets: Int): String =
    s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       |tk AS (SELECT (d.doc_id * $nBuckets) // (mx.m + 1) AS bucket,
       |  unnest(string_split(lower(d.text), ' ')) AS token FROM documents d, mx),
       |occ AS (SELECT bucket, COUNT(*) AS o FROM tk GROUP BY 1),
       |nw AS (SELECT fb, COUNT(*) AS n FROM
       |  (SELECT token, MIN(bucket) AS fb FROM tk GROUP BY 1) GROUP BY 1),
       |scf AS (SELECT unnest(range($nBuckets)) AS bucket),
       |cv AS (SELECT scf.bucket, COALESCE(occ.o, 0) AS o, COALESCE(nw.n, 0) AS n
       |  FROM scf LEFT JOIN occ USING (bucket) LEFT JOIN nw ON nw.fb = scf.bucket),
       |cum AS (SELECT bucket,
       |  CAST(SUM(o) OVER (ORDER BY bucket) AS BIGINT) AS n_tokens_cum,
       |  CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum FROM cv),
       |xy AS (SELECT
       |  CAST(floor(ln(CAST(n_tokens_cum AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS xm,
       |  CAST(floor(ln(CAST(vocab_cum AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS ym
       |  FROM cum WHERE n_tokens_cum > 0 AND vocab_cum > 0),
       |m AS (SELECT COUNT(*) AS k,
       |  CAST(SUM(xm) AS DOUBLE) AS sx, CAST(SUM(ym) AS DOUBLE) AS sy,
       |  CAST(SUM(xm*ym) AS DOUBLE) AS sxy, CAST(SUM(xm*xm) AS DOUBLE) AS sxx,
       |  CAST(SUM(ym*ym) AS DOUBLE) AS syy FROM xy),
       |t AS (SELECT k, sx, sy,
       |  sxx - sx*sx/CAST(k AS DOUBLE) AS vx,
       |  syy - sy*sy/CAST(k AS DOUBLE) AS vy,
       |  sxy - sx*sy/CAST(k AS DOUBLE) AS cxy FROM m),
       |fit AS (SELECT
       |  CASE WHEN vx > 0 THEN floor((cxy/vx)*1000000 + 0.5)/1000000 END AS heaps_beta_r,
       |  CASE WHEN vx > 0 THEN floor(((sy - cxy/vx*sx)/CAST(k AS DOUBLE)/1000000.0)*1000000 + 0.5)/1000000 END AS heaps_lnk_r,
       |  CASE WHEN vx > 0 AND vy > 0 THEN floor((cxy*cxy/(vx*vy))*1000000 + 0.5)/1000000 END AS r2_r
       |  FROM t)
       |SELECT bucket, n_tokens_cum, vocab_cum, heaps_beta_r, heaps_lnk_r, r2_r
       |FROM cum, fit ORDER BY bucket""".stripMargin

  def textZipf(topK: Int): String =
    s"""WITH c AS (SELECT token, COUNT(*) AS n
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
       |  GROUP BY token),
       |top AS (SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT $topK),
       |rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank FROM top),
       |xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS xm,
       |  CAST(floor(ln(CAST(n AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS ym FROM rk),
       |m AS (SELECT COUNT(*) AS k,
       |  CAST(SUM(xm) AS DOUBLE) AS sx, CAST(SUM(ym) AS DOUBLE) AS sy,
       |  CAST(SUM(xm*ym) AS DOUBLE) AS sxy, CAST(SUM(xm*xm) AS DOUBLE) AS sxx,
       |  CAST(SUM(ym*ym) AS DOUBLE) AS syy FROM xy),
       |t AS (SELECT k, sx, sy,
       |  sxx - sx*sx/CAST(k AS DOUBLE) AS vx,
       |  syy - sy*sy/CAST(k AS DOUBLE) AS vy,
       |  sxy - sx*sy/CAST(k AS DOUBLE) AS cxy FROM m)
       |SELECT k,
       |  CASE WHEN vx > 0 THEN floor((cxy/vx)*1000000 + 0.5)/1000000 END AS zipf_slope_r,
       |  CASE WHEN vx > 0 THEN floor(((sy - cxy/vx*sx)/CAST(k AS DOUBLE)/1000000.0)*1000000 + 0.5)/1000000 END AS intercept_r,
       |  CASE WHEN vx > 0 AND vy > 0 THEN floor((cxy*cxy/(vx*vy))*1000000 + 0.5)/1000000 END AS r2_r
       |FROM t""".stripMargin

  /** A70: stationary distribution of the event-type chain — the
    * Spark side's `iters` power-iteration steps unrolled as chained
    * CTEs, each edge term the identical truncating integer op
    * (HUGEINT product // row sum) on the 1e-12 lattice, so the
    * recursion gates bit-for-bit.
    */
  /** Shared A70 CTE chain: transition matrix `tm` + the 1e-12 integer
    * lattice power iteration ending at p$iters; reused by the A74
    * entropy-rate card so the two relations cannot drift.
    */
  private def markovCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT tm.to_type AS event_type,
         |  CAST(SUM((CAST(p.p AS HUGEINT) * tm.n) // tm.n_from) AS BIGINT) AS p
         |  FROM p${i - 1} p JOIN tm ON p.event_type = tm.from_type
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""seq AS (SELECT user_id, event_type,
       |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |tc AS (SELECT event_type AS from_type, to_type, COUNT(*) AS n
       |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tm AS (SELECT from_type, to_type, n,
       |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from FROM tc),
       |ty AS (SELECT from_type AS event_type FROM tm
       |  UNION SELECT to_type FROM tm),
       |kk AS (SELECT COUNT(*) AS k FROM ty),
       |p0 AS (SELECT event_type, 1000000000000 // k AS p FROM ty, kk),
       |$steps""".stripMargin
  }

  def evStationaryDist(iters: Int): String =
    s"""WITH ${markovCtes(iters)}
       |SELECT event_type, p AS p_e12,
       |  floor((CAST(p AS DOUBLE) / 1000000000000.0)*1000000 + 0.5)/1000000 AS p_r
       |FROM p$iters ORDER BY event_type""".stripMargin

  /** A74: Markov entropy rate — per-row Shannon terms r6'd before the
    * DECIMAL sum (order-independent), stationary weights from the A70
    * lattice, contrib = two deterministic double ops.
    */
  def evMarkovEntropyRate(iters: Int): String = {
    val pij = "CAST(n AS DOUBLE)/CAST(n_from AS DOUBLE)"
    s"""WITH ${markovCtes(iters)},
       |re AS (SELECT from_type, n_from,
       |  CAST(SUM(CAST(floor(-($pij) * ln($pij)*1000000 + 0.5)/1000000 AS DECIMAL(18,6))) AS DOUBLE) AS row_entropy
       |  FROM tm GROUP BY 1, 2),
       |pi AS (SELECT event_type,
       |  floor((CAST(p AS DOUBLE) / 1000000000000.0)*1000000 + 0.5)/1000000 AS p_r
       |  FROM p$iters)
       |SELECT re.from_type, re.n_from, pi.p_r,
       |  floor(row_entropy*1000000 + 0.5)/1000000 AS row_entropy_r,
       |  floor(pi.p_r*row_entropy*1000000 + 0.5)/1000000 AS contrib_r
       |FROM re JOIN pi ON pi.event_type = re.from_type
       |ORDER BY re.from_type""".stripMargin
  }

  /** A71: seasonal-adjusted hourly anomaly — per-(type, hour-of-day)
    * integer-moment baseline, z r6'd before the flag compare.
    */
  def evAnomalySeasonal(zFlag: Double): String =
    s"""WITH hh AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
       |  COUNT(*) AS n FROM events GROUP BY 1, 2),
       |hx AS (SELECT event_type, hour_idx, n, hour_idx % 24 AS hod FROM hh),
       |base AS (SELECT event_type AS bt, hod AS bh, COUNT(*) AS k,
       |  CAST(SUM(n) AS BIGINT) AS s1, SUM(n*n) AS s2 FROM hx GROUP BY 1, 2),
       |bm AS (SELECT bt, bh,
       |  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
       |  sqrt(GREATEST(CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)),
       |    0.0)) AS sigma FROM base),
       |z AS (SELECT hx.event_type, hx.hour_idx, hx.n, hx.hod, bm.mu,
       |  CASE WHEN bm.sigma > 0.0
       |    THEN floor(((CAST(hx.n AS DOUBLE) - bm.mu) / bm.sigma)*1000000 + 0.5)/1000000
       |  END AS z_r
       |  FROM hx JOIN bm ON hx.event_type = bm.bt AND hx.hod = bm.bh)
       |SELECT event_type, hour_idx, n, hod,
       |  floor(mu*1000000 + 0.5)/1000000 AS mu_r, z_r,
       |  (abs(COALESCE(z_r, 0.0)) > $zFlag) AS flagged
       |FROM z ORDER BY event_type, hour_idx""".stripMargin

  /** A60: Zipf OLS over the top-K user activity ranks. */
  def evUserZipf(topK: Int): String =
    s"""WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
       |top AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT $topK),
       |rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rank FROM top),
       |xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS xm,
       |  CAST(floor(ln(CAST(n AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS ym FROM rk),
       |m AS (SELECT COUNT(*) AS k,
       |  CAST(SUM(xm) AS DOUBLE) AS sx, CAST(SUM(ym) AS DOUBLE) AS sy,
       |  CAST(SUM(xm*ym) AS DOUBLE) AS sxy, CAST(SUM(xm*xm) AS DOUBLE) AS sxx,
       |  CAST(SUM(ym*ym) AS DOUBLE) AS syy FROM xy),
       |t AS (SELECT k,
       |  sxx - sx*sx/CAST(k AS DOUBLE) AS vx,
       |  syy - sy*sy/CAST(k AS DOUBLE) AS vy,
       |  sxy - sx*sy/CAST(k AS DOUBLE) AS cxy FROM m)
       |SELECT k,
       |  CASE WHEN vx > 0 THEN floor((cxy/vx)*1000000 + 0.5)/1000000 END AS zipf_slope_r,
       |  CASE WHEN vx > 0 AND vy > 0 THEN floor((cxy*cxy/(vx*vy))*1000000 + 0.5)/1000000 END AS r2_r
       |FROM t""".stripMargin

  private val bitSumExprs: String = (0 until 60).map(j =>
    s"SUM(((h0 >> $j) & 1) * 2 - 1) AS s$j").mkString(",\n  ")

  private val simhashExpr: String = (0 until 60).map(j =>
    s"(CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")

  private val simhashCtes: String =
    s"""$gramCtes,
       |s AS (SELECT doc_id,
       |  $bitSumExprs
       |  FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $simhashExpr AS simhash FROM s)""".stripMargin

  val docSimhash: String =
    s"""WITH $simhashCtes
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  def docSimhashPairs(maxHamming: Int): String =
    s"""WITH $simhashCtes,
       |ch AS (SELECT doc_id, simhash, j, (simhash >> (15*j)) & 32767 AS chunk_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS j))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C25: zero-filled hamming histogram over the banded simhash
    * pairs.
    */
  def docSimhashHammingHist(maxHamming: Int): String =
    s"""WITH $simhashCtes,
       |ch AS (SELECT doc_id, simhash, j, (simhash >> (15*j)) & 32767 AS chunk_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS j)),
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) <= $maxHamming),
       |grid AS (SELECT unnest(range(0, ${maxHamming + 1})) AS hamming),
       |c AS (SELECT hamming, COUNT(*) AS n FROM p GROUP BY 1)
       |SELECT CAST(grid.hamming AS BIGINT) AS hamming,
       |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_pairs
       |FROM grid LEFT JOIN c ON grid.hamming = c.hamming
       |ORDER BY hamming""".stripMargin

  /** F6: dHash oracle — block byte sums via a filtered list
    * comprehension (ord() per char, == byte values for the ASCII
    * corpus; blocks past the payload sum to 0 via COALESCE of the
    * empty list), gradient bits via the i→i+1 self-join (i = 60 has
    * no successor row, so exactly bits 0..59 are produced). All
    * integer compares — bit-exact vs the native DHash60 loop.
    */
  private val dhashCtes: String =
    """b AS (SELECT doc_id, text, unnest(range(61)) AS i FROM documents),
      |bs AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
      |  COALESCE(list_sum([ord(substr(text, CAST(i*8+j+1 AS INTEGER), 1))
      |                     for j in range(8) if length(text) >= i*8+j+1]), 0) AS s
      |  FROM b),
      |ph AS (
      |  SELECT a.doc_id,
      |    CAST(SUM(CASE WHEN a.s > b2.s THEN (1::BIGINT << a.i) ELSE 0 END) AS BIGINT) AS phash
      |  FROM bs a JOIN bs b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1
      |  GROUP BY a.doc_id)""".stripMargin

  val mmPhash: String =
    s"""WITH $dhashCtes
       |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin

  /** F10: frame-granularity dhash (1-byte blocks) banded pairs, rolled
    * up per asset pair.
    */
  def mmFramePhashPairs(frameBytes: Int, stride: Int, maxHamming: Int): String =
    s"""WITH fr AS (SELECT doc_id, frame_idx,
       |    substr(text, frame_idx*$frameBytes + 1, $frameBytes) AS ft
       |  FROM (SELECT doc_id, text,
       |    unnest([i for i in range(0, length(text) // $frameBytes, $stride)]) AS frame_idx
       |    FROM documents)),
       |fb AS (SELECT doc_id, frame_idx, ft, unnest(range(61)) AS i FROM fr),
       |fbs AS (SELECT doc_id, frame_idx, CAST(i AS INTEGER) AS i,
       |  CASE WHEN length(ft) >= i+1 THEN ord(substr(ft, CAST(i+1 AS INTEGER), 1)) ELSE 0 END AS s
       |  FROM fb),
       |fph AS (SELECT a.doc_id, a.frame_idx,
       |  CAST(SUM(CASE WHEN a.s > b2.s THEN (1::BIGINT << a.i) ELSE 0 END) AS BIGINT) AS ph
       |  FROM fbs a JOIN fbs b2 ON a.doc_id = b2.doc_id AND a.frame_idx = b2.frame_idx AND b2.i = a.i + 1
       |  GROUP BY a.doc_id, a.frame_idx),
       |ch AS (SELECT doc_id, frame_idx, ph, j, (ph >> (15*j)) & 32767 AS chunk_val
       |  FROM fph, (SELECT unnest([0,1,2,3]) AS j)),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, a.frame_idx AS fa,
       |  b.doc_id AS doc_b, b.frame_idx AS fb2,
       |  CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) <= $maxHamming)
       |SELECT doc_a, doc_b, COUNT(*) AS n_near_frames,
       |  CAST(MIN(hamming) AS INTEGER) AS min_hamming
       |FROM pr GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  /** F12: scene cuts — the F10 per-frame dhash CTEs + an asset-keyed
    * LAG, cuts where consecutive-frame hamming clears the threshold.
    */
  def mmSceneCuts(frameBytes: Int, stride: Int, threshold: Int): String =
    s"""WITH fr AS (SELECT doc_id, frame_idx,
       |    substr(text, frame_idx*$frameBytes + 1, $frameBytes) AS ft
       |  FROM (SELECT doc_id, text,
       |    unnest([i for i in range(0, length(text) // $frameBytes, $stride)]) AS frame_idx
       |    FROM documents)),
       |fb AS (SELECT doc_id, frame_idx, ft, unnest(range(61)) AS i FROM fr),
       |fbs AS (SELECT doc_id, frame_idx, CAST(i AS INTEGER) AS i,
       |  CASE WHEN length(ft) >= i+1 THEN ord(substr(ft, CAST(i+1 AS INTEGER), 1)) ELSE 0 END AS s
       |  FROM fb),
       |fph AS (SELECT a.doc_id, a.frame_idx,
       |  CAST(SUM(CASE WHEN a.s > b2.s THEN (1::BIGINT << a.i) ELSE 0 END) AS BIGINT) AS ph
       |  FROM fbs a JOIN fbs b2 ON a.doc_id = b2.doc_id AND a.frame_idx = b2.frame_idx AND b2.i = a.i + 1
       |  GROUP BY a.doc_id, a.frame_idx),
       |sq AS (SELECT doc_id, frame_idx, ph,
       |  LAG(frame_idx) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_idx,
       |  LAG(ph) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_ph
       |  FROM fph)
       |SELECT doc_id, frame_idx, prev_idx,
       |  CAST(bit_count(xor(ph, prev_ph)) AS INTEGER) AS hamming
       |FROM sq
       |WHERE prev_ph IS NOT NULL AND CAST(bit_count(xor(ph, prev_ph)) AS INTEGER) >= $threshold
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** F14: per-asset summary card — F12's frame/hash CTEs + cut lag +
    * within-asset dup rank, rolled up per asset.
    */
  def mmVideoSummary(frameBytes: Int, stride: Int, threshold: Int): String =
    s"""WITH fr AS (SELECT doc_id, frame_idx,
       |    substr(text, frame_idx*$frameBytes + 1, $frameBytes) AS ft
       |  FROM (SELECT doc_id, text,
       |    unnest([i for i in range(0, length(text) // $frameBytes, $stride)]) AS frame_idx
       |    FROM documents)),
       |fb AS (SELECT doc_id, frame_idx, ft, unnest(range(61)) AS i FROM fr),
       |fbs AS (SELECT doc_id, frame_idx, CAST(i AS INTEGER) AS i,
       |  CASE WHEN length(ft) >= i+1 THEN ord(substr(ft, CAST(i+1 AS INTEGER), 1)) ELSE 0 END AS s
       |  FROM fb),
       |fph AS (SELECT a.doc_id, a.frame_idx,
       |  CAST(SUM(CASE WHEN a.s > b2.s THEN (1::BIGINT << a.i) ELSE 0 END) AS BIGINT) AS ph
       |  FROM fbs a JOIN fbs b2 ON a.doc_id = b2.doc_id AND a.frame_idx = b2.frame_idx AND b2.i = a.i + 1
       |  GROUP BY a.doc_id, a.frame_idx),
       |mk AS (SELECT doc_id, frame_idx, ph,
       |  CASE WHEN LAG(ph) OVER (PARTITION BY doc_id ORDER BY frame_idx) IS NOT NULL
       |    AND CAST(bit_count(xor(ph, LAG(ph) OVER (PARTITION BY doc_id ORDER BY frame_idx))) AS INTEGER) >= $threshold
       |    THEN 1 ELSE 0 END AS is_cut,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id, ph ORDER BY frame_idx) AS dup_rank
       |  FROM fph)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       |  CAST(SUM(is_cut) + 1 AS BIGINT) AS n_scenes,
       |  floor((CAST(COUNT(*) AS DOUBLE) / CAST(SUM(is_cut) + 1 AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_scene_len_r,
       |  CAST(SUM(CASE WHEN dup_rank > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_frames,
       |  floor((CAST(SUM(CASE WHEN dup_rank > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS dup_frame_share_r
       |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** F13: keyframe selection — F12's frame/cut CTEs + a per-frame
    * distinct-byte detail score, running cut count as scene id, and a
    * per-scene (detail desc, frame asc) argmax.
    */
  def mmKeyframeSelect(frameBytes: Int, stride: Int, threshold: Int): String =
    s"""WITH fr AS (SELECT doc_id, frame_idx,
       |    substr(text, frame_idx*$frameBytes + 1, $frameBytes) AS ft
       |  FROM (SELECT doc_id, text,
       |    unnest([i for i in range(0, length(text) // $frameBytes, $stride)]) AS frame_idx
       |    FROM documents)),
       |fb AS (SELECT doc_id, frame_idx, ft, unnest(range(61)) AS i FROM fr),
       |fbs AS (SELECT doc_id, frame_idx, CAST(i AS INTEGER) AS i,
       |  CASE WHEN length(ft) >= i+1 THEN ord(substr(ft, CAST(i+1 AS INTEGER), 1)) ELSE 0 END AS s
       |  FROM fb),
       |fph AS (SELECT a.doc_id, a.frame_idx,
       |  CAST(SUM(CASE WHEN a.s > b2.s THEN (1::BIGINT << a.i) ELSE 0 END) AS BIGINT) AS ph
       |  FROM fbs a JOIN fbs b2 ON a.doc_id = b2.doc_id AND a.frame_idx = b2.frame_idx AND b2.i = a.i + 1
       |  GROUP BY a.doc_id, a.frame_idx),
       |dt AS (SELECT doc_id, frame_idx,
       |  CAST(COUNT(DISTINCT substr(ft, CAST(i+1 AS INTEGER), 1)) AS BIGINT) AS detail
       |  FROM (SELECT doc_id, frame_idx, ft, unnest(range(length(ft))) AS i FROM fr)
       |  GROUP BY 1, 2),
       |lg AS (SELECT doc_id, frame_idx, ph,
       |  LAG(ph) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_ph
       |  FROM fph),
       |sq AS (SELECT lg.doc_id, lg.frame_idx, dt.detail,
       |  CASE WHEN prev_ph IS NOT NULL
       |    AND CAST(bit_count(xor(ph, prev_ph)) AS INTEGER) >= $threshold
       |    THEN 1 ELSE 0 END AS is_cut
       |  FROM lg JOIN dt ON dt.doc_id = lg.doc_id AND dt.frame_idx = lg.frame_idx),
       |sc AS (SELECT *, SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_id FROM sq),
       |pk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, scene_id
       |  ORDER BY detail DESC, frame_idx ASC) AS pn FROM sc)
       |SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
       |  MIN(frame_idx) AS start_idx, MAX(frame_idx) AS end_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_frames,
       |  MAX(CASE WHEN pn = 1 THEN frame_idx END) AS key_frame_idx,
       |  MAX(CASE WHEN pn = 1 THEN detail END) AS key_detail
       |FROM pk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** F15: cross-source rollup of the F6 banded pair relation, pair
    * sources normalized least/greatest, same-source pairs excluded.
    */
  def mmCrossSourceDup(maxHamming: Int): String =
    s"""WITH $dhashCtes,
       |ch AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming),
       |sp AS (SELECT LEAST(sa.source, sb.source) AS source_a,
       |  GREATEST(sa.source, sb.source) AS source_b, pr.hamming
       |  FROM pr JOIN documents sa ON sa.doc_id = pr.doc_a
       |  JOIN documents sb ON sb.doc_id = pr.doc_b
       |  WHERE sa.source <> sb.source)
       |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(MIN(hamming) AS INTEGER) AS min_hamming
       |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def mmPhashPairs(maxHamming: Int): String =
    s"""WITH $dhashCtes,
       |ch AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  /** F8: hamming histogram over the banded pair relation, zero-filled
    * 0..maxHamming.
    */
  def mmPhashHammingHist(maxHamming: Int): String =
    s"""WITH $dhashCtes,
       |ch AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming),
       |grid AS (SELECT unnest(range(0, ${maxHamming + 1})) AS hamming),
       |c AS (SELECT hamming, COUNT(*) AS n FROM p GROUP BY 1)
       |SELECT CAST(grid.hamming AS BIGINT) AS hamming,
       |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_pairs
       |FROM grid LEFT JOIN c ON grid.hamming = c.hamming
       |ORDER BY hamming""".stripMargin

  /** F7: incremental perceptual dedup — batch (id ≡ 0 mod `mod`)
    * probes the chunk index; best partner = (hamming, db) argmin over
    * qualifying base/earlier-batch partners.
    */
  def mmPhashIncremental(mod: Int, maxHamming: Int): String =
    s"""WITH $dhashCtes,
       |ch AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b ON a.j = b.j AND a.chunk_val = b.chunk_val
       |    AND a.doc_id % $mod = 0 AND b.doc_id <> a.doc_id
       |    AND (b.doc_id % $mod <> 0 OR b.doc_id < a.doc_id)),
       |best AS (SELECT da, db, hamming FROM (
       |  SELECT da, db, hamming,
       |    ROW_NUMBER() OVER (PARTITION BY da ORDER BY hamming ASC, db ASC) AS rn
       |  FROM cand WHERE hamming <= $maxHamming) WHERE rn = 1)
       |SELECT d.doc_id, best.db AS dup_of, best.hamming,
       |  CAST(best.db IS NULL AS INTEGER) AS is_new
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $mod = 0) d
       |LEFT JOIN best ON d.doc_id = best.da
       |ORDER BY d.doc_id""".stripMargin

  /** G36b: WARC round-trip profile over the multi-byte-planted corpus
    * — every field re-derived from the source row (the mm-payload
    * discipline): Content-Length is the UTF-8 BYTE length (encode),
    * header count and id/uri shapes are the builder's constants, and
    * payload_ok = 1 asserts byte-exact recovery through the real
    * parser (the Spark side computes it by comparison; a broken
    * length jump or header walk yields 0 / a corrupt row and fails
    * the gate per document).
    */
  def docWarcRoundtrip: String = {
    val pfx = sqlLit(graft.operators.TextOps.Utf8PlantPrefix)
    val sfx = sqlLit(graft.operators.TextOps.Utf8PlantSuffix)
    val every = graft.operators.TextOps.Utf8PlantEvery
    s"""WITH docs_aug AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 9000000, $pfx || text || $sfx
       |  FROM documents WHERE doc_id % $every = 0)
       |SELECT doc_id, 'response' AS warc_type,
       |  'urn:graft:doc:' || CAST(doc_id AS VARCHAR) AS record_id,
       |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       |  CAST(6 AS INTEGER) AS n_headers,
       |  CAST(1 AS INTEGER) AS payload_ok
       |FROM docs_aug ORDER BY doc_id""".stripMargin
  }

  /** Sequential left-fold vector ops (order-matching Spark's
    * `aggregate`; 0.0 + x == x in IEEE so the seeds agree).
    */
  private val normCte =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, label, v,
      |  list_reduce([x*x for x in v], (x,y) -> x+y) AS n2 FROM e)""".stripMargin

  private val dotQC =
    "list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y)"

  val docEmbedCosineDup: String =
    s"""WITH $normCte
       |SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |FROM n q JOIN n c ON q.vec_id < c.vec_id
       |WHERE floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 >= 0.45
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Shared deterministic-quantizer CTEs (D7/C11): centers = the
    * nCenters vectors with the smallest md5("centroid:"||vec_id), cell
    * = rank in that hash order (0-based); assignment = per-vector
    * argmin of the 6dp-rounded squared L2 (ties → lowest cell),
    * expressed as a ROW_NUMBER window here — the Spark side computes
    * the identical argmin in one narrow pass over literal centers.
    */
  private def centCte(nCenters: Int): String = {
    val ckey = "('0x'||substr(md5('centroid:'||CAST(vec_id AS VARCHAR)),1,15))::BIGINT"
    s"""$normCte,
       |cent AS (SELECT v AS cv, n2 AS c2,
       |  ROW_NUMBER() OVER (ORDER BY $ckey, vec_id) - 1 AS cell
       |  FROM n ORDER BY $ckey, vec_id LIMIT $nCenters)""".stripMargin
  }

  /** Lloyd-trained quantizer chain (the Spark side's lloydTrain,
    * unrolled as chained CTEs — the D38 discipline): seed =
    * hash-selected centers, then per round assignment (argmin of r6'd
    * squared L2, ties → lowest cell), micro-lattice per-(cell, dim)
    * mean (same (Σ/n)/1e6 division order, r6'd), center rebuild with
    * empty cells COALESCE'd to the previous round. Emits CTEs
    * `${pfx}0 .. ${pfx}$rounds` (centers) and `${pfx}a1 ..` (per-round
    * assignments with dist2_r, for the D45 curve), closing with
    * `$alias AS (... FROM ${pfx}$rounds)`. Does NOT include normCte —
    * callers place it once.
    */
  private def lloydChainCtes(nCenters: Int, rounds: Int,
      alias: String, pfx: String, src: String = "n"): String = {
    val ckey = "('0x'||substr(md5('centroid:'||CAST(vec_id AS VARCHAR)),1,15))::BIGINT"
    val seed =
      s"""${pfx}0 AS (SELECT v AS cv, n2 AS c2,
         |  ROW_NUMBER() OVER (ORDER BY $ckey, vec_id) - 1 AS cell
         |  FROM $src ORDER BY $ckey, vec_id LIMIT $nCenters)""".stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""${pfx}d$r AS (SELECT $src.vec_id, $src.v, c.cell,
         |  floor(($src.n2 - 2*list_reduce([$src.v[i]*c.cv[i] for i in range(1, len($src.v)+1)], (x,y) -> x+y) + c.c2)*1000000 + 0.5)/1000000 AS dist2_r
         |  FROM $src, ${pfx}${r - 1} c),
         |${pfx}a$r AS (SELECT vec_id, v, cell, dist2_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM ${pfx}d$r) WHERE rn = 1),
         |${pfx}e$r AS (SELECT cell, CAST(dim - 1 AS BIGINT) AS dim, vm[CAST(dim AS INTEGER)] AS xm FROM (
         |  SELECT cell, unnest(range(1, len(vm)+1)) AS dim, vm FROM (
         |    SELECT cell, [CAST(floor(x*1000000.0 + 0.5) AS BIGINT) for x in v] AS vm FROM ${pfx}a$r))),
         |${pfx}u$r AS (SELECT cell, dim,
         |  floor((CAST(SUM(xm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0)*1000000 + 0.5)/1000000 AS coord_r
         |  FROM ${pfx}e$r GROUP BY cell, dim),
         |${pfx}v$r AS (SELECT cell, list(coord_r ORDER BY dim) AS cv FROM ${pfx}u$r GROUP BY cell),
         |${pfx}$r AS (SELECT p.cell, COALESCE(c.cv, p.cv) AS cv,
         |  CASE WHEN c.cv IS NULL THEN p.c2
         |       ELSE list_reduce([c.cv[i]*c.cv[i] for i in range(1, len(c.cv)+1)], (x,y) -> x+y) END AS c2
         |  FROM ${pfx}${r - 1} p LEFT JOIN ${pfx}v$r c ON c.cell = p.cell)""".stripMargin
    }.mkString(",\n")
    val chain = if (rounds == 0) seed else s"$seed,\n$perRound"
    s"""$chain,
       |$alias AS (SELECT cv, c2, cell FROM ${pfx}$rounds)""".stripMargin
  }

  /** The rounds the deploy arc trains for — MUST equal the Spark
    * side's Similarity.TrainRounds.
    */
  private val TrainRounds = graft.operators.Similarity.TrainRounds

  /** centCte's trained counterpart: same `cent`(cv, c2, cell) contract,
    * centers Lloyd-trained for TrainRounds rounds.
    */
  private def trainedCentCte(nCenters: Int): String =
    s"""$normCte,
       |${lloydChainCtes(nCenters, TrainRounds, "cent", "tc")}""".stripMargin

  /** D45: the per-round training curve off the SAME chain — round r's
    * stats come from the assignment against the round's incoming
    * centers (round 1 = the seed's error); SSE decimal-summed then
    * r6'd, mean via the same division.
    */
  def embKmeansTrainCurve(nCenters: Int, rounds: Int): String = {
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, COUNT(*) AS n_vectors,
         |  floor(CAST(SUM(CAST(dist2_r AS DECIMAL(18,6))) AS DOUBLE)*1000000 + 0.5)/1000000 AS sse_r,
         |  floor((CAST(SUM(CAST(dist2_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_dist2_r
         |FROM tca$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $normCte,
       |${lloydChainCtes(nCenters, rounds, "centf", "tc")}
       |$rows
       |ORDER BY round""".stripMargin
  }

  private def cellCte(nCenters: Int): String = {
    s"""${centCte(nCenters)},
       |d AS (SELECT n.vec_id, n.label, n.v, n.n2, cent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*cent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + cent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, cent),
       |asg AS (SELECT vec_id, label, v, n2, cell, dist2_r FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM d)
       |  WHERE rn = 1)""".stripMargin
  }

  /** D29: per-subspace PQ reconstruction-error rollup over the D8
    * relation.
    */
  def embPqError(m: Int, dsub: Int, nCodes: Int): String = {
    val codes = embPqCodes(m, dsub, nCodes)
    s"""WITH pq AS ($codes)
       |SELECT sub_j, COUNT(*) AS n,
       |  floor((CAST(SUM(CAST(dist2_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_dist2_r,
       |  floor(MAX(dist2_r)*1000000 + 0.5)/1000000 AS max_dist2_r
       |FROM pq GROUP BY sub_j ORDER BY sub_j""".stripMargin
  }

  /** D48: raw-PQ vs residual-PQ mean reconstruction error at the same
    * trained code budget — both Lloyd chains + the residual relation,
    * each variant's per-(vec, subspace) min code distance averaged
    * (decimal-routed, r6).
    */
  def embRpqError(m: Int, dsub: Int, nCodes: Int, nCells: Int): String = {
    val rawSlice = s"list_slice(cent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    val resSlice = s"list_slice(pcent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    def meanSel(src: String, variant: String) =
      s"""SELECT '$variant' AS variant, COUNT(*) AS n,
         |  floor((CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_dist2_r
         |FROM $src""".stripMargin
    s"""WITH $normCte,
       |${lloydChainCtes(nCodes, TrainRounds, "cent", "tq")},
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "vq")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |casg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |rres AS (SELECT n.vec_id, a.cell,
       |  [n.v[i] - c.cv[i] for i in range(1, len(n.v)+1)] AS v
       |  FROM n JOIN casg a ON a.vec_id = n.vec_id JOIN ccent c ON c.cell = a.cell),
       |rr AS (SELECT vec_id, cell, v,
       |  list_reduce([x*x for x in v], (x,y) -> x+y) AS n2 FROM rres),
       |${lloydChainCtes(nCodes, TrainRounds, "pcent", "rq", src = "rr")},
       |rawsub AS (SELECT n.vec_id, list_slice(n.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM n, (SELECT unnest(range(0, $m)) AS j)),
       |rawmin AS (SELECT vec_id, sub_j, MIN(
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$rawSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $rawSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000) AS d
       |  FROM rawsub, cent GROUP BY vec_id, sub_j),
       |ressub AS (SELECT rr.vec_id, list_slice(rr.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM rr, (SELECT unnest(range(0, $m)) AS j)),
       |resmin AS (SELECT vec_id, sub_j, MIN(
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$resSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $resSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000) AS d
       |  FROM ressub, pcent GROUP BY vec_id, sub_j)
       |${meanSel("rawmin", "pq_raw")}
       |UNION ALL ${meanSel("resmin", "pq_residual")}
       |ORDER BY variant""".stripMargin
  }

  /** D28: per-cell count/share + global imbalance over the D7
    * assignment.
    */
  def annIvfImbalance(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)},
       |bc AS (SELECT cell, COUNT(*) AS n_vectors FROM asg GROUP BY cell),
       |tt AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n_total,
       |  CAST(MAX(n_vectors) AS BIGINT) AS n_max, COUNT(*) AS n_cells FROM bc)
       |SELECT bc.cell, bc.n_vectors,
       |  floor((CAST(bc.n_vectors AS DOUBLE) / CAST(tt.n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS share_r,
       |  floor((CAST(tt.n_max AS DOUBLE) * CAST(tt.n_cells AS DOUBLE) / CAST(tt.n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS imbalance_r
       |FROM bc, tt ORDER BY cell""".stripMargin

  /** Product-quantization codes: per (vector, subspace) the nearest
    * sub-codebook entry (codebooks = subvector slices of the same
    * hash-selected center vectors). Same fold/rounding parity as the
    * cell assignment, per 8-dim slice.
    */
  def embPqCodes(m: Int, dsub: Int, nCodes: Int): String = {
    val cvSlice = s"list_slice(cent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    s"""WITH ${centCte(nCodes)},
       |sub AS (SELECT n.vec_id, list_slice(n.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM n, (SELECT unnest(range(0, $m)) AS j)),
       |sc AS (SELECT sub.vec_id, sub.sub_j, cent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM sub, cent),
       |a AS (SELECT vec_id, sub_j, code, dist2_r,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j ORDER BY dist2_r, code) AS rn FROM sc)
       |SELECT vec_id, sub_j, code, dist2_r FROM a WHERE rn = 1
       |ORDER BY vec_id, sub_j""".stripMargin
  }

  /** PQ asymmetric-distance top-k: the query-side per-(subspace, code)
    * distances are the SAME expression as the corpus assignment (sc),
    * filtered to the query ids; candidate distance = decimal sum of m
    * code lookups.
    */
  def annPqAdc(nQueries: Int, k: Int, m: Int, dsub: Int, nCodes: Int): String = {
    val cvSlice = s"list_slice(cent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    s"""WITH ${trainedCentCte(nCodes)},
       |sub AS (SELECT n.vec_id, list_slice(n.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM n, (SELECT unnest(range(0, $m)) AS j)),
       |sc AS (SELECT sub.vec_id, sub.sub_j, cent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM sub, cent),
       |codes AS (SELECT vec_id, sub_j, code FROM
       |  (SELECT vec_id, sub_j, code, dist2_r,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j ORDER BY dist2_r, code) AS rn FROM sc)
       |  WHERE rn = 1),
       |qd AS (SELECT vec_id AS q_id, sub_j, code, dist2_r AS d_r FROM sc WHERE vec_id < $nQueries),
       |s AS (SELECT qd.q_id, codes.vec_id,
       |  CAST(SUM(CAST(qd.d_r AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist_r
       |  FROM codes JOIN qd ON codes.sub_j = qd.sub_j AND codes.code = qd.code
       |    AND qd.q_id <> codes.vec_id
       |  GROUP BY qd.q_id, codes.vec_id),
       |r AS (SELECT q_id, vec_id, adc_dist_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist_r, vec_id) AS rank FROM s)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_dist_r FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D10: IVF-ADC — coarse assignment (cellCte shape, `ccent`) + PQ
    * codes (`pcent`) + per-query probe set (ROW_NUMBER ≤ nProbe over
    * r6'd coarse distances, matching Spark's array_sort tiebreak) +
    * ADC sum restricted to probed cells.
    */
  /** D4: IVF probe-limited exact search — Lloyd-TRAINED coarse centers
    * (lloydChainCtes, TrainRounds rounds from the ckey seed — r10),
    * per-vector argmin assignment, per-query nProbe nearest cells,
    * exact cosine + top-k within the probed cells. Assignment and
    * probe both rank by (r6 dist2, cell), mirroring withCell's
    * struct-min / array_sort tie rule.
    */
  def annIvf(nQueries: Int, k: Int, nCells: Int, nProbe: Int): String = {
    s"""WITH $normCte,
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "ic")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |asg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |pr AS (SELECT vec_id AS q_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn
       |   FROM cd WHERE vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |sc AS (SELECT pr.q_id, a.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM pr JOIN asg a ON a.cell = pr.cell AND a.vec_id <> pr.q_id
       |  JOIN n q ON q.vec_id = pr.q_id JOIN n c ON c.vec_id = a.vec_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM sc)
       |WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D38: MMR re-ranking — the k greedy steps unrolled as chained
    * CTEs (the A70/E47 unrolled-recursion pattern): step t picks the
    * unselected pool row maximizing λ·cos_r − (1−λ)·max sim to the
    * selected set, ties on vec_id. All cosines r6'd; the objective is
    * the identical double expression the Spark group loop evaluates.
    */
  def annMmrDiversify(nQueries: Int, k: Int, poolM: Int,
      lambda: Double): String = {
    val om = 1.0 - lambda
    val score = s"$lambda*cos_r - $om*maxsim"
    val steps = (2 to k).map { i =>
      s"""st$i AS (SELECT c.q_id, c.vec_id, c.cos_r, MAX(p.cos_r) AS maxsim
         |  FROM cand c
         |  JOIN pw p ON p.q_id = c.q_id AND p.va = c.vec_id
         |  JOIN selu${i - 1} s ON s.q_id = p.q_id AND s.vec_id = p.vb
         |  LEFT JOIN selu${i - 1} x ON x.q_id = c.q_id AND x.vec_id = c.vec_id
         |  WHERE x.vec_id IS NULL
         |  GROUP BY 1, 2, 3),
         |sel$i AS (SELECT q_id, $i AS rank, vec_id, cos_r,
         |  floor(($score)*1000000 + 0.5)/1000000 AS mmr_r
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY ($score) DESC, vec_id ASC) AS rn FROM st$i) WHERE rn = 1),
         |selu$i AS (SELECT q_id, vec_id FROM selu${i - 1}
         |  UNION ALL SELECT q_id, vec_id FROM sel$i)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(i => s"SELECT * FROM sel$i").mkString("\n  UNION ALL ")
    val dotXY = "list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)], (x,y) -> x+y)"
    s"""WITH $normCte,
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |cand AS (SELECT q_id, vec_id, cos_r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM sc) WHERE rn <= $poolM),
       |pw AS (SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
       |  floor(($dotXY/(sqrt(x.n2)*sqrt(y.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
       |  JOIN n x ON x.vec_id = a.vec_id JOIN n y ON y.vec_id = b.vec_id),
       |sel1 AS (SELECT q_id, 1 AS rank, vec_id, cos_r, cos_r AS mmr_r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM cand) WHERE rn = 1),
       |selu1 AS (SELECT q_id, vec_id FROM sel1),
       |$steps
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r, mmr_r FROM (
       |  $union)
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D37: IVF nprobe-tuning card — candidates generated once at the
    * largest level with the probed cell's rank attached; a sweep
    * point's candidate set is the `crank <= nprobe` prefix. Per-query
    * recall@k vs the exact top-k and scanned-corpus fraction, r6'd
    * before the DECIMAL mean (the Spark operator's exact shape).
    */
  def annNprobeTuning(nQueries: Int, k: Int, nCells: Int,
      probes: Seq[Int]): String = {
    val ckey = "('0x'||substr(md5('centroid:'||CAST(vec_id AS VARCHAR)),1,15))::BIGINT"
    val maxP = probes.max
    val lvList = probes.mkString("[", ", ", "]")
    s"""WITH $normCte,
       |ccent AS (SELECT v AS cv, n2 AS c2,
       |  ROW_NUMBER() OVER (ORDER BY $ckey, vec_id) - 1 AS cell
       |  FROM n ORDER BY $ckey, vec_id LIMIT $nCells),
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |asg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |pr AS (SELECT vec_id AS q_id, cell, CAST(rn AS BIGINT) AS crank FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn
       |   FROM cd WHERE vec_id < $nQueries)
       |  WHERE rn <= $maxP),
       |sz AS (SELECT cell, COUNT(*) AS n_c FROM asg GROUP BY cell),
       |tt AS (SELECT COUNT(*) AS n_total FROM n),
       |lv AS (SELECT CAST(unnest($lvList) AS BIGINT) AS nprobe),
       |sc AS (SELECT pr.q_id, pr.crank, a.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM pr JOIN asg a ON a.cell = pr.cell AND a.vec_id <> pr.q_id
       |  JOIN n q ON q.vec_id = pr.q_id JOIN n c ON c.vec_id = a.vec_id),
       |tk AS (SELECT q_id, nprobe, vec_id FROM (
       |  SELECT sc.q_id, lv.nprobe, sc.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY sc.q_id, lv.nprobe ORDER BY sc.cos_r DESC, sc.vec_id ASC) AS rank
       |  FROM sc JOIN lv ON sc.crank <= lv.nprobe) WHERE rank <= $k),
       |ex AS (SELECT q_id, vec_id FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 DESC, c.vec_id ASC) AS rank
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id) WHERE rank <= $k),
       |kx AS (SELECT q_id, COUNT(*) AS k_exact FROM ex GROUP BY q_id),
       |hits AS (SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
       |  FROM tk t JOIN ex e ON e.q_id = t.q_id AND e.vec_id = t.vec_id
       |  GROUP BY 1, 2),
       |scan AS (SELECT pr.q_id, lv.nprobe, CAST(SUM(sz.n_c) AS BIGINT) AS n_scan
       |  FROM pr JOIN lv ON pr.crank <= lv.nprobe JOIN sz ON sz.cell = pr.cell
       |  GROUP BY 1, 2),
       |scaffold AS (SELECT q_id, nprobe FROM (SELECT DISTINCT q_id FROM pr), lv),
       |perq AS (SELECT s.q_id, s.nprobe,
       |  floor((CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(kx.k_exact AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_r,
       |  floor((CAST(scan.n_scan AS DOUBLE) / CAST(tt.n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS scan_frac_r
       |  FROM scaffold s
       |  LEFT JOIN hits h ON h.q_id = s.q_id AND h.nprobe = s.nprobe
       |  JOIN scan ON scan.q_id = s.q_id AND scan.nprobe = s.nprobe
       |  JOIN kx ON kx.q_id = s.q_id, tt)
       |SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  floor((CAST(SUM(CAST(recall_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_recall_r,
       |  floor((CAST(SUM(CAST(scan_frac_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_scan_frac_r
       |FROM perq GROUP BY nprobe ORDER BY nprobe""".stripMargin
  }

  def annIvfAdc(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int): String =
    s"""WITH ${ivfAdcBody(nQueries, m, dsub, nCodes, nCells, nProbe)}
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_dist_r FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** D11: the D10 pipeline's rank relation reduced to a rerankR pool,
    * exact-rescored from raw vectors (same fold/rounding as the Spark
    * side's DotProduct + r6).
    */
  def annIvfRerank(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int, rerankR: Int): String =
    s"""WITH ${ivfAdcBody(nQueries, m, dsub, nCodes, nCells, nProbe)},
       |pool AS (SELECT q_id, vec_id FROM r WHERE rank <= $rerankR),
       |ex AS (SELECT p.q_id, p.vec_id,
       |  floor((q.n2 - 2*list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y) + c.n2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM pool p JOIN n q ON q.vec_id = p.q_id JOIN n c ON c.vec_id = p.vec_id),
       |rr AS (SELECT q_id, vec_id, dist2_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist2_r, vec_id) AS rank FROM ex)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, dist2_r FROM rr WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  private def ivfAdcBody(nQueries: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int): String = {
    val cvSlice = s"list_slice(pcent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    // both quantizers Lloyd-trained (r10) — distinct chains (the
    // registered params may differ in center count)
    s"""$normCte,
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "ia")},
       |${lloydChainCtes(nCodes, TrainRounds, "pcent", "ip")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |asg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |sub AS (SELECT n.vec_id, list_slice(n.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM n, (SELECT unnest(range(0, $m)) AS j)),
       |sc AS (SELECT sub.vec_id, sub.sub_j, pcent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM sub, pcent),
       |codes AS (SELECT vec_id, sub_j, code FROM
       |  (SELECT vec_id, sub_j, code, dist2_r,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j ORDER BY dist2_r, code) AS rn FROM sc)
       |  WHERE rn = 1),
       |probe AS (SELECT q_id, cell FROM
       |  (SELECT cd.vec_id AS q_id, cd.cell,
       |    ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY cd.dist2_r, cd.cell) AS rn
       |   FROM cd WHERE cd.vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |qd AS (SELECT vec_id AS q_id, sub_j, code, dist2_r AS d_r FROM sc WHERE vec_id < $nQueries),
       |s AS (SELECT qd.q_id, c.vec_id,
       |  CAST(SUM(CAST(qd.d_r AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist_r
       |  FROM codes c
       |  JOIN asg a ON a.vec_id = c.vec_id
       |  JOIN probe p ON p.cell = a.cell
       |  JOIN qd ON qd.q_id = p.q_id AND qd.sub_j = c.sub_j AND qd.code = c.code
       |    AND qd.q_id <> c.vec_id
       |  GROUP BY qd.q_id, c.vec_id),
       |r AS (SELECT q_id, vec_id, adc_dist_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist_r, vec_id) AS rank FROM s)""".stripMargin
  }

  /** D46: IVF with RESIDUAL PQ — coarse Lloyd chain → per-vector
    * residual (v − c_cell) → residual-space Lloyd chain (the PQ
    * codebook trained on `rr`, the residual relation, via
    * lloydChainCtes' src hook) → residual codes; the query's distance
    * table is keyed (q, probed cell, subspace, code) off the query's
    * own residual against that cell. Every rounding/tiebreak site
    * mirrors the D10 oracle op-for-op.
    */
  def annIvfRpq(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int): String =
    s"""WITH ${ivfRpqBody(nQueries, m, dsub, nCodes, nCells, nProbe)}
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_dist_r FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** D47: residual-PQ candidates refined by exact rescoring (the
    * FAISS refine step over the D46 pool) — the D11 pattern with the
    * residual encode underneath.
    */
  def annIvfRpqRerank(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int, rerankR: Int): String =
    s"""WITH ${ivfRpqBody(nQueries, m, dsub, nCodes, nCells, nProbe)},
       |pool AS (SELECT q_id, vec_id FROM r WHERE rank <= $rerankR),
       |ex AS (SELECT p.q_id, p.vec_id,
       |  floor((q.n2 - 2*list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y) + c.n2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM pool p JOIN n q ON q.vec_id = p.q_id JOIN n c ON c.vec_id = p.vec_id),
       |rrk AS (SELECT q_id, vec_id, dist2_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist2_r, vec_id) AS rank FROM ex)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, dist2_r FROM rrk WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** D49: recall@k of the residual-PQ stages (adc / refined) vs the
    * exact L2 top-k — shared ivfRpqBody, a second refine leg, and the
    * brute-force ground truth, each k-row set left-joined per query.
    */
  def annRpqRecall(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int, rerankR: Int): String = {
    def recallSel(rel: String, method: String) =
      s"""SELECT '$method' AS method, e.q_id, COUNT(a.vec_id) AS n_hits,
         |  floor((CAST(COUNT(a.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_r
         |FROM exk e LEFT JOIN $rel a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
         |GROUP BY e.q_id""".stripMargin
    s"""WITH ${ivfRpqBody(nQueries, m, dsub, nCodes, nCells, nProbe)},
       |adck AS (SELECT q_id, vec_id FROM r WHERE rank <= $k),
       |pool AS (SELECT q_id, vec_id FROM r WHERE rank <= $rerankR),
       |exr AS (SELECT p.q_id, p.vec_id,
       |  floor((q.n2 - 2*list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y) + c.n2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM pool p JOIN n q ON q.vec_id = p.q_id JOIN n c ON c.vec_id = p.vec_id),
       |refk AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist2_r, vec_id) AS rank FROM exr)
       |  WHERE rank <= $k),
       |exd AS (SELECT q.vec_id AS q_id, c.vec_id,
       |  floor((q.n2 - 2*list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y) + c.n2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n q, n c WHERE q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |exk AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist2_r, vec_id) AS rank FROM exd)
       |  WHERE rank <= $k)
       |SELECT method, q_id, CAST(n_hits AS BIGINT) AS n_hits, recall_r FROM (
       |${recallSel("adck", "adc")}
       |UNION ALL ${recallSel("refk", "refined")})
       |ORDER BY method, q_id""".stripMargin
  }

  /** D50: nprobe sweep over the residual-PQ stack — the ivfRpqBody
    * chains with the probe relation carrying its 1-based probe rank
    * (crank) at the widest level; each level filters crank ≤ nprobe
    * and re-ranks the single scored relation (D37's sweep scaffolding
    * with ADC scoring and the exact-L2 ground truth).
    */
  def annRpqNprobeTuning(nQueries: Int, k: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, probes: Seq[Int]): String = {
    val maxP = probes.max
    val lvList = probes.mkString("[", ", ", "]")
    val cvSlice = s"list_slice(pcent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    s"""WITH $normCte,
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "vc")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |casg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |rres AS (SELECT n.vec_id, a.cell,
       |  [n.v[i] - c.cv[i] for i in range(1, len(n.v)+1)] AS v
       |  FROM n JOIN casg a ON a.vec_id = n.vec_id JOIN ccent c ON c.cell = a.cell),
       |rr AS (SELECT vec_id, cell, v,
       |  list_reduce([x*x for x in v], (x,y) -> x+y) AS n2 FROM rres),
       |${lloydChainCtes(nCodes, TrainRounds, "pcent", "rp", src = "rr")},
       |sub AS (SELECT rr.vec_id, rr.cell, list_slice(rr.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM rr, (SELECT unnest(range(0, $m)) AS j)),
       |sc AS (SELECT sub.vec_id, sub.cell, sub.sub_j, pcent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM sub, pcent),
       |codes AS (SELECT vec_id, cell, sub_j, code FROM
       |  (SELECT vec_id, cell, sub_j, code,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j ORDER BY dist2_r, code) AS rn FROM sc)
       |  WHERE rn = 1),
       |pr AS (SELECT q_id, cell AS pcell, CAST(rn AS BIGINT) AS crank FROM
       |  (SELECT cd.vec_id AS q_id, cd.cell,
       |    ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY cd.dist2_r, cd.cell) AS rn
       |   FROM cd WHERE cd.vec_id < $nQueries)
       |  WHERE rn <= $maxP),
       |qres AS (SELECT p.q_id, p.pcell, p.crank,
       |  [n.v[i] - c.cv[i] for i in range(1, len(n.v)+1)] AS qv
       |  FROM pr p JOIN n ON n.vec_id = p.q_id JOIN ccent c ON c.cell = p.pcell),
       |qsub AS (SELECT q_id, pcell, crank, list_slice(qv, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM qres, (SELECT unnest(range(0, $m)) AS j)),
       |qd AS (SELECT qsub.q_id, qsub.pcell, qsub.crank, qsub.sub_j, pcent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS d_r
       |  FROM qsub, pcent),
       |scored AS (SELECT qd.q_id, c.vec_id, MAX(qd.crank) AS crank,
       |  CAST(SUM(CAST(qd.d_r AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist_r
       |  FROM codes c
       |  JOIN qd ON qd.pcell = c.cell AND qd.sub_j = c.sub_j AND qd.code = c.code
       |    AND qd.q_id <> c.vec_id
       |  GROUP BY qd.q_id, c.vec_id),
       |lv AS (SELECT CAST(unnest($lvList) AS BIGINT) AS nprobe),
       |tk AS (SELECT q_id, nprobe, vec_id FROM (
       |  SELECT s.q_id, lv.nprobe, s.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY s.q_id, lv.nprobe ORDER BY s.adc_dist_r ASC, s.vec_id ASC) AS rank
       |  FROM scored s JOIN lv ON s.crank <= lv.nprobe) WHERE rank <= $k),
       |exd AS (SELECT q.vec_id AS q_id, c.vec_id,
       |  floor((q.n2 - 2*list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y) + c.n2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n q, n c WHERE q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |exk AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist2_r, vec_id) AS rank FROM exd)
       |  WHERE rank <= $k),
       |kx AS (SELECT q_id, COUNT(*) AS k_exact FROM exk GROUP BY q_id),
       |hits AS (SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
       |  FROM tk t JOIN exk e ON e.q_id = t.q_id AND e.vec_id = t.vec_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT cell, COUNT(*) AS n_c FROM casg GROUP BY cell),
       |tt AS (SELECT COUNT(*) AS n_total FROM n),
       |scan AS (SELECT pr.q_id, lv.nprobe, CAST(SUM(sz.n_c) AS BIGINT) AS n_scan
       |  FROM pr JOIN lv ON pr.crank <= lv.nprobe JOIN sz ON sz.cell = pr.pcell
       |  GROUP BY 1, 2),
       |scaffold AS (SELECT q_id, nprobe FROM (SELECT DISTINCT q_id FROM pr), lv),
       |perq AS (SELECT s.q_id, s.nprobe,
       |  floor((CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(kx.k_exact AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_r,
       |  floor((CAST(scan.n_scan AS DOUBLE) / CAST(tt.n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS scan_frac_r
       |  FROM scaffold s
       |  LEFT JOIN hits h ON h.q_id = s.q_id AND h.nprobe = s.nprobe
       |  JOIN scan ON scan.q_id = s.q_id AND scan.nprobe = s.nprobe
       |  JOIN kx ON kx.q_id = s.q_id, tt)
       |SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  floor((CAST(SUM(CAST(recall_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_recall_r,
       |  floor((CAST(SUM(CAST(scan_frac_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_scan_frac_r
       |FROM perq GROUP BY nprobe ORDER BY nprobe""".stripMargin
  }

  private def ivfRpqBody(nQueries: Int, m: Int, dsub: Int,
      nCodes: Int, nCells: Int, nProbe: Int): String = {
    val cvSlice = s"list_slice(pcent.cv, sub_j*$dsub+1, sub_j*$dsub+$dsub)"
    s"""$normCte,
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "vc")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |casg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |rres AS (SELECT n.vec_id, a.cell,
       |  [n.v[i] - c.cv[i] for i in range(1, len(n.v)+1)] AS v
       |  FROM n JOIN casg a ON a.vec_id = n.vec_id JOIN ccent c ON c.cell = a.cell),
       |rr AS (SELECT vec_id, cell, v,
       |  list_reduce([x*x for x in v], (x,y) -> x+y) AS n2 FROM rres),
       |${lloydChainCtes(nCodes, TrainRounds, "pcent", "rp", src = "rr")},
       |sub AS (SELECT rr.vec_id, rr.cell, list_slice(rr.v, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM rr, (SELECT unnest(range(0, $m)) AS j)),
       |sc AS (SELECT sub.vec_id, sub.cell, sub.sub_j, pcent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM sub, pcent),
       |codes AS (SELECT vec_id, cell, sub_j, code FROM
       |  (SELECT vec_id, cell, sub_j, code,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j ORDER BY dist2_r, code) AS rn FROM sc)
       |  WHERE rn = 1),
       |probe AS (SELECT q_id, cell FROM
       |  (SELECT cd.vec_id AS q_id, cd.cell,
       |    ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY cd.dist2_r, cd.cell) AS rn
       |   FROM cd WHERE cd.vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |qres AS (SELECT p.q_id, p.cell AS pcell,
       |  [n.v[i] - c.cv[i] for i in range(1, len(n.v)+1)] AS qv
       |  FROM probe p JOIN n ON n.vec_id = p.q_id JOIN ccent c ON c.cell = p.cell),
       |qsub AS (SELECT q_id, pcell, list_slice(qv, j*$dsub+1, j*$dsub+$dsub) AS xv, j AS sub_j
       |  FROM qres, (SELECT unnest(range(0, $m)) AS j)),
       |qd AS (SELECT qsub.q_id, qsub.pcell, qsub.sub_j, pcent.cell AS code,
       |  floor((list_reduce([x*x for x in xv], (x,y) -> x+y)
       |    - 2*list_reduce([xv[i]*$cvSlice[i] for i in range(1, $dsub+1)], (x,y) -> x+y)
       |    + list_reduce([x*x for x in $cvSlice], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS d_r
       |  FROM qsub, pcent),
       |s AS (SELECT qd.q_id, c.vec_id,
       |  CAST(SUM(CAST(qd.d_r AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist_r
       |  FROM codes c
       |  JOIN qd ON qd.pcell = c.cell AND qd.sub_j = c.sub_j AND qd.code = c.code
       |    AND qd.q_id <> c.vec_id
       |  GROUP BY qd.q_id, c.vec_id),
       |r AS (SELECT q_id, vec_id, adc_dist_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist_r, vec_id) AS rank FROM s)""".stripMargin
  }

  /** Per-dimension (min, max) SQ8 bounds + per-(vec, dim) code — the
    * shared head of both D12 oracles. `d` is 0-based to match
    * posexplode.
    */
  private val sq8Cte =
    s"""$normCte,
       |xd AS (SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) - 1 AS d FROM n),
       |mm AS (SELECT d, MIN(val) AS mn, MAX(val) AS mx FROM xd GROUP BY d),
       |c AS (SELECT vec_id, xd.d,
       |  CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
       |       ELSE LEAST(CAST(255 AS BIGINT), CAST(floor((val - mn)/(mx - mn)*256.0) AS BIGINT)) END AS code,
       |  mn, mx
       |  FROM xd JOIN mm ON xd.d = mm.d)""".stripMargin

  /** D12: SQ8 codes + midpoint reconstruction, op-for-op the Spark
    * expressions (same division/multiplication order, r6 at the end).
    */
  val embSq8Codes: String =
    s"""WITH $sq8Cte
       |SELECT vec_id, CAST(d AS BIGINT) AS d, code,
       |  floor((mn + (code + 0.5)*(mx - mn)/256.0)*1000000 + 0.5)/1000000 AS recon_r
       |FROM c ORDER BY vec_id, d""".stripMargin

  /** D27: per-dimension SQ8 reconstruction error (mean decimal-routed,
    * max order-free).
    */
  val embSq8Error: String =
    s"""WITH $sq8Cte,
       |sq8e AS (SELECT c.d,
       |  abs(xd.val - (c.mn + (c.code + 0.5)*(c.mx - c.mn)/256.0)) AS err
       |  FROM c JOIN xd ON c.vec_id = xd.vec_id AND c.d = xd.d)
       |SELECT CAST(d AS BIGINT) AS d, COUNT(*) AS n,
       |  floor((CAST(SUM(CAST(err AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_abs_err_r,
       |  floor(MAX(err)*1000000 + 0.5)/1000000 AS max_abs_err_r
       |FROM sq8e GROUP BY 1 ORDER BY d""".stripMargin

  /** D12b: SQ8 asymmetric top-k — full-precision query vs
    * code-reconstructed candidates; the squared-diff fold runs in
    * dimension order (list_reduce ≡ Spark's sequential aggregate), one
    * r6 at the end.
    */
  def annSq8Adc(nQueries: Int, k: Int, dim: Int): String = {
    val recon = "(l.mns[i] + (cl.codes[i] + 0.5)*(l.mxs[i] - l.mns[i])/256.0)"
    val term = s"(q.v[i] - $recon)*(q.v[i] - $recon)"
    s"""WITH $sq8Cte,
       |cl AS (SELECT vec_id, list(code ORDER BY d) AS codes FROM c GROUP BY vec_id),
       |l AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM mm),
       |s AS (SELECT q.vec_id AS q_id, cl.vec_id,
       |  floor(list_reduce([$term for i in range(1, $dim + 1)], (x,y) -> x + y)*1000000 + 0.5)/1000000 AS adc_dist_r
       |  FROM n q, cl, l WHERE q.vec_id < $nQueries AND cl.vec_id <> q.vec_id),
       |r AS (SELECT q_id, vec_id, adc_dist_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist_r, vec_id) AS rank FROM s)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_dist_r FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  def embKmeansAssign(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)}
       |SELECT vec_id, label, cell, dist2_r FROM asg ORDER BY vec_id""".stripMargin

  /** D40: quantizer drift — D7's assignment + conditional epoch sums
    * per cell, per-epoch DECIMAL distance means, r6'd deltas.
    */
  def embQuantizerDrift(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)},
       |ep AS (SELECT cell, dist2_r, CAST(vec_id % 2 AS INTEGER) AS epoch FROM asg),
       |ag AS (SELECT cell,
       |  CAST(SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |  CAST(SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_serve,
       |  SUM(CASE WHEN epoch = 0 THEN CAST(dist2_r AS DECIMAL(18,6)) END) AS sd_train,
       |  SUM(CASE WHEN epoch = 1 THEN CAST(dist2_r AS DECIMAL(18,6)) END) AS sd_serve
       |  FROM ep GROUP BY cell),
       |tt AS (SELECT CAST(SUM(n_train) AS BIGINT) AS tt_train,
       |  CAST(SUM(n_serve) AS BIGINT) AS tt_serve FROM ag),
       |ex AS (SELECT cell, n_train, n_serve,
       |  floor((CAST(n_train AS DOUBLE)/CAST(tt_train AS DOUBLE))*1000000 + 0.5)/1000000 AS share_train_r,
       |  floor((CAST(n_serve AS DOUBLE)/CAST(tt_serve AS DOUBLE))*1000000 + 0.5)/1000000 AS share_serve_r,
       |  CASE WHEN n_train > 0 THEN floor((CAST(sd_train AS DOUBLE)/CAST(n_train AS DOUBLE))*1000000 + 0.5)/1000000 END AS mean_dist_train_r,
       |  CASE WHEN n_serve > 0 THEN floor((CAST(sd_serve AS DOUBLE)/CAST(n_serve AS DOUBLE))*1000000 + 0.5)/1000000 END AS mean_dist_serve_r
       |  FROM ag, tt)
       |SELECT cell, n_train, n_serve, share_train_r, share_serve_r,
       |  mean_dist_train_r, mean_dist_serve_r,
       |  floor((share_serve_r - share_train_r)*1000000 + 0.5)/1000000 AS share_delta_r,
       |  CASE WHEN mean_dist_train_r IS NOT NULL AND mean_dist_serve_r IS NOT NULL
       |    THEN floor((mean_dist_serve_r - mean_dist_train_r)*1000000 + 0.5)/1000000 END AS dist_delta_r
       |FROM ex ORDER BY cell""".stripMargin

  /** D23: per-dimension mean/variance on the exact integer lattice. */
  val embDimStats: String =
    s"""WITH m AS (SELECT vec_id,
       |  [CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT) for x in embedding] AS vm
       |  FROM embeddings),
       |d AS (SELECT vm, unnest(range(1, len(vm)+1)) AS dim FROM m),
       |ex AS (SELECT CAST(dim - 1 AS BIGINT) AS dim, vm[CAST(dim AS INTEGER)] AS xm FROM d),
       |a AS (SELECT dim, COUNT(*) AS n, CAST(SUM(xm) AS BIGINT) AS s1,
       |  CAST(SUM(xm * xm) AS BIGINT) AS s2 FROM ex GROUP BY 1)
       |SELECT dim, n,
       |  floor((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)*1000000 + 0.5)/1000000 AS mean_r,
       |  floor((CAST((n * s2 - s1 * s1) // (n * n) AS DOUBLE) / 1000000000000.0)*1000000 + 0.5)/1000000 AS var_r
       |FROM a ORDER BY dim""".stripMargin

  /** E46: k-round BPE merge-table training — the same round chain the
    * Spark operator builds (mine top pair of the current sentinel
    * representation, replace with chr(r)), with sentinel expansion
    * newest-first in the output.
    */
  def textBpeTrain(rounds: Int): String = {
    def mine(src: String, wCol: String, tAlias: Int): String =
      s"""t$tAlias AS (SELECT pair AS p$tAlias, total AS total$tAlias FROM (
         |  SELECT pair, CAST(SUM(n) AS BIGINT) AS total FROM (
         |    SELECT unnest([substring($wCol, i, 2) for i in range(1, length($wCol))]) AS pair, n
         |    FROM $src WHERE length($wCol) >= 2)
         |  GROUP BY pair)
         |  ORDER BY total DESC, pair ASC LIMIT 1)""".stripMargin
    def expand(r: Int): String = {
      var e = s"(SELECT p$r FROM t$r)"
      for (s <- (r - 1) to 1 by -1) e = s"replace($e, chr($s), ${expand(s)})"
      e
    }
    val ctes = new StringBuilder(
      """w0 AS (
        |  SELECT word AS w0, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin)
    for (r <- 1 to rounds) {
      ctes.append(",\n").append(mine(s"w${r - 1}", s"w${r - 1}", r))
      if (r < rounds)
        ctes.append(",\n").append(
          s"""w$r AS (SELECT replace(w${r - 1}, (SELECT p$r FROM t$r), chr($r)) AS w$r, n
             |  FROM w${r - 1})""".stripMargin)
    }
    val selects = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, ${expand(r)} AS merged_token, (SELECT total$r FROM t$r) AS total"
    }.mkString("\n", "\nUNION ALL ", "\nORDER BY round")
    s"WITH ${ctes.result()}$selects"
  }

  /** D23: covariance matrix upper triangle on the micro-lattice.
    * `//` and Spark's `div` both truncate toward zero, so negative
    * covariances de-scale identically.
    */
  val embCovariance: String =
    s"""WITH m AS (SELECT
       |  [CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT) for x in embedding] AS vm
       |  FROM embeddings),
       |d AS (SELECT vm, unnest(range(1, len(vm)+1)) AS i1 FROM m),
       |dd AS (SELECT vm, i1, unnest(range(i1, len(vm)+1)) AS j1 FROM d),
       |ex AS (SELECT CAST(i1 - 1 AS BIGINT) AS i, CAST(j1 - 1 AS BIGINT) AS j,
       |  vm[CAST(i1 AS INTEGER)] AS xa, vm[CAST(j1 AS INTEGER)] AS xb FROM dd),
       |a AS (SELECT i, j, COUNT(*) AS n, CAST(SUM(xa) AS BIGINT) AS sa,
       |  CAST(SUM(xb) AS BIGINT) AS sb, CAST(SUM(xa * xb) AS BIGINT) AS sab
       |  FROM ex GROUP BY 1, 2)
       |SELECT i, j,
       |  floor((CAST((n * sab - sa * sb) // (n * n) AS DOUBLE) / 1000000000000.0)*1000000 + 0.5)/1000000 AS cov_r
       |FROM a ORDER BY i, j""".stripMargin

  /** D24: two fixed-point power-iteration rounds over the covariance
    * lattice; `//` matches Spark's `div`, the norm² runs in HUGEINT
    * (exact, like Spark's DECIMAL(38,0)) with one double conversion
    * at the sqrt.
    */
  /** Shared D25/D26 chain through the unnormalized direction v2. */
  private val powerCtes: String =
    s"""m AS (SELECT
       |  [CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT) for x in embedding] AS vm
       |  FROM embeddings),
       |d AS (SELECT vm, unnest(range(1, len(vm)+1)) AS i1 FROM m),
       |dd AS (SELECT vm, i1, unnest(range(i1, len(vm)+1)) AS j1 FROM d),
       |ex AS (SELECT CAST(i1 - 1 AS BIGINT) AS i, CAST(j1 - 1 AS BIGINT) AS j,
       |  vm[CAST(i1 AS INTEGER)] AS xa, vm[CAST(j1 AS INTEGER)] AS xb FROM dd),
       |up AS (SELECT i, j, CAST((COUNT(*) * CAST(SUM(xa*xb) AS BIGINT)
       |    - CAST(SUM(xa) AS BIGINT) * CAST(SUM(xb) AS BIGINT))
       |    // (COUNT(*) * COUNT(*)) AS BIGINT) AS cm
       |  FROM ex GROUP BY 1, 2),
       |full_m AS (SELECT i, j, cm FROM up
       |  UNION ALL SELECT j AS i, i AS j, cm FROM up WHERE i <> j),
       |v1 AS (SELECT i AS k, CAST(CAST(SUM(cm) AS BIGINT) // 1000000000 AS BIGINT) AS v1s
       |  FROM full_m GROUP BY 1),
       |v2 AS (SELECT f.i, CAST(SUM(f.cm * v1.v1s) AS BIGINT) AS v2
       |  FROM full_m f JOIN v1 ON f.j = v1.k GROUP BY 1)""".stripMargin

  val embPowerIteration: String =
    s"""WITH $powerCtes,
       |nrm AS (SELECT sqrt(CAST(SUM(CAST(v2 AS HUGEINT) * v2) AS DOUBLE)) AS norm FROM v2)
       |SELECT i, floor((CAST(v2 AS DOUBLE) / norm)*1000000 + 0.5)/1000000 AS eig_r
       |FROM v2, nrm ORDER BY i""".stripMargin

  /** D39: principal-direction projection rollup — D26's eigenvector
    * as an ordered list, one list_reduce dot per vector (the Spark
    * side's sequential fold), r6'd before the DECIMAL mean.
    */
  val embPcaProject: String =
    s"""WITH $powerCtes,
       |nrm AS (SELECT sqrt(CAST(SUM(CAST(v2 AS HUGEINT) * v2) AS DOUBLE)) AS norm FROM v2),
       |eig AS (SELECT i, floor((CAST(v2 AS DOUBLE) / norm)*1000000 + 0.5)/1000000 AS eig_r
       |  FROM v2, nrm),
       |ev AS (SELECT list(eig_r ORDER BY i) AS e FROM eig),
       |pd AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |pj AS (SELECT pd.label,
       |  floor(list_reduce([pd.v[i]*ev.e[i] for i in range(1, len(pd.v)+1)], (x,y) -> x+y)*1000000 + 0.5)/1000000 AS proj_r
       |  FROM pd, ev)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |  floor((CAST(SUM(CAST(proj_r AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_proj_r,
       |  MIN(proj_r) AS min_proj_r,
       |  MAX(proj_r) AS max_proj_r
       |FROM pj GROUP BY label ORDER BY label""".stripMargin

  /** D36: MIPS top-k via norm augmentation — M = max corpus norm as
    * a one-row CTE; transformed cosine dot/(‖q‖·M) ranked exactly as
    * the Spark side (6dp-rounded, ties on vec_id), raw dot alongside.
    */
  def annMipsTopk(nQueries: Int, k: Int): String = {
    val dotQC2 = "list_reduce([qs.qv[i]*c.v[i] for i in range(1, len(qs.qv)+1)], (x,y) -> x+y)"
    s"""WITH $normCte,
       |mx AS (SELECT MAX(sqrt(n2)) AS m_norm FROM n),
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |sc AS (SELECT qs.q_id, c.vec_id,
       |  floor(($dotQC2)*1000000 + 0.5)/1000000 AS dot_r,
       |  floor(($dotQC2/(sqrt(qs.qn2)*mx.m_norm))*1000000 + 0.5)/1000000 AS aug_cos_r
       |  FROM n c, qs, mx WHERE c.vec_id <> qs.q_id)
       |SELECT q_id, rank, vec_id, dot_r, aug_cos_r FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY aug_cos_r DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc)
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** D35: sign-binarized Hamming prefilter + exact-cosine rerank —
    * the two 32-bit packed words mirror signBucketAt(v,32,0/32)
    * exactly (strict `> 0.0`, bit i from dimension offset+i), so the
    * sketch, the XOR popcount, and the surviving candidate set are
    * bit-identical across engines; cosine and ranking follow the D1
    * convention (6dp-rounded before ordering, ties on vec_id).
    */
  def annHammingRerank(nQueries: Int, k: Int, hamMax: Int): String = {
    def pack(base: Int): String =
      s"CAST(list_reduce([CASE WHEN v[i${if (base == 0) "" else s"+$base"}] > 0.0 " +
        "THEN (1::BIGINT)<<(i-1) ELSE 0::BIGINT END for i in range(1, 33)], " +
        "(x,y) -> x+y) AS BIGINT)"
    s"""WITH $normCte,
       |bits AS (SELECT vec_id, v, n2,
       |  ${pack(0)} AS b_lo,
       |  ${pack(32)} AS b_hi
       |  FROM n),
       |qh AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, b_lo AS qb_lo, b_hi AS qb_hi
       |  FROM bits WHERE vec_id < $nQueries),
       |candh AS (SELECT qh.q_id, c.vec_id,
       |  CAST(bit_count(xor(c.b_lo, qh.qb_lo)) + bit_count(xor(c.b_hi, qh.qb_hi)) AS BIGINT) AS hamming,
       |  floor((list_reduce([qh.qv[i]*c.v[i] for i in range(1, len(qh.qv)+1)], (x,y) -> x+y)
       |    /(sqrt(qh.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM bits c, qh WHERE c.vec_id <> qh.q_id
       |    AND bit_count(xor(c.b_lo, qh.qb_lo)) + bit_count(xor(c.b_hi, qh.qb_hi)) <= $hamMax)
       |SELECT q_id, rank, vec_id, hamming, cos_r FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rank
       |  FROM candh)
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** D34: Rayleigh quotient along v2 over the covariance trace —
    * exact HUGEINT sums, the lattice units cancel in explained_r.
    */
  val embExplainedVariance: String =
    s"""WITH $powerCtes,
       |vs AS (SELECT i AS vi, CAST(v2 // 1000000000 AS BIGINT) AS vsc FROM v2),
       |num AS (SELECT SUM(CAST(f.cm AS HUGEINT) * a.vsc * b.vsc) AS num
       |  FROM full_m f JOIN vs a ON a.vi = f.i JOIN vs b ON b.vi = f.j),
       |den AS (SELECT SUM(CAST(vsc AS HUGEINT) * vsc) AS den FROM vs),
       |tr AS (SELECT CAST(SUM(cm) AS BIGINT) AS trace_e12 FROM up WHERE i = j)
       |SELECT tr.trace_e12,
       |  floor((CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE))*1000000 + 0.5)/1000000 AS rayleigh_e12_r,
       |  floor(((CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)) / CAST(tr.trace_e12 AS DOUBLE))*1000000 + 0.5)/1000000 AS explained_r
       |FROM num, den, tr""".stripMargin

  /** D22: per-cell majority label + purity off the same assignment. */
  def embClusterPurity(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)},
       |bl AS (SELECT cell, label, COUNT(*) AS n FROM asg GROUP BY 1, 2),
       |x AS (SELECT cell, label, n,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, label ASC) AS rn,
       |    CAST(SUM(n) OVER (PARTITION BY cell) AS BIGINT) AS cell_n
       |  FROM bl)
       |SELECT cell, label AS majority_label, cell_n AS n_vectors, n AS n_majority,
       |  floor((CAST(n AS DOUBLE) / CAST(cell_n AS DOUBLE))*1000000 + 0.5)/1000000 AS purity_r
       |FROM x WHERE rn = 1 ORDER BY cell""".stripMargin

  /** D21: round-2 reassignment under the data-driven round-1 means —
    * D20's update relation pivoted to per-cell center arrays, the same
    * sequential-fold distance, argmin with ties to the lowest cell.
    */
  def embKmeansReassign(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)},
       |vm AS (SELECT cell, [CAST(floor(x*1000000.0 + 0.5) AS BIGINT) for x in v] AS vm FROM asg),
       |dd AS (SELECT cell, unnest(range(1, len(vm)+1)) AS dim, vm FROM vm),
       |ex AS (SELECT cell, CAST(dim - 1 AS BIGINT) AS dim, vm[CAST(dim AS INTEGER)] AS xm FROM dd),
       |upd AS (SELECT cell, dim,
       |  floor((CAST(SUM(xm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0)*1000000 + 0.5)/1000000 AS coord_r
       |  FROM ex GROUP BY cell, dim),
       |cvs AS (SELECT cell AS ncell, list(coord_r ORDER BY dim) AS cv FROM upd GROUP BY cell),
       |sc AS (SELECT n.vec_id, n.label, cvs.ncell,
       |  floor((n.n2 - 2.0*list_reduce([n.v[i]*cvs.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y)
       |    + list_reduce([cvs.cv[i]*cvs.cv[i] for i in range(1, len(cvs.cv)+1)], (x,y) -> x+y))*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, cvs)
       |SELECT vec_id, label, ncell AS cell, dist2_r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, ncell) AS rn FROM sc)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** D20: Lloyd update — per (cell, dim) micro-lattice mean of the
    * assigned vectors (0-based dim to match posexplode).
    */
  def embKmeansUpdate(nCenters: Int): String =
    s"""WITH ${cellCte(nCenters)},
       |vm AS (SELECT cell, [CAST(floor(x*1000000.0 + 0.5) AS BIGINT) for x in v] AS vm FROM asg),
       |dd AS (SELECT cell, unnest(range(1, len(vm)+1)) AS dim, vm FROM vm),
       |ex AS (SELECT cell, CAST(dim - 1 AS BIGINT) AS dim, vm[CAST(dim AS INTEGER)] AS xm FROM dd)
       |SELECT cell, dim, COUNT(*) AS n_assigned,
       |  floor((CAST(SUM(xm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0)*1000000 + 0.5)/1000000 AS coord_r
       |FROM ex GROUP BY cell, dim
       |ORDER BY cell, dim""".stripMargin

  /** SemDeDup: in-cell cosine pairs; a vector is dropped iff a
    * same-cell partner with a smaller vec_id matches at >= threshold.
    */
  def docSemdedup(nCenters: Int, threshold: Double): String = {
    val dotAB = "list_reduce([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)], (x,y) -> x+y)"
    s"""WITH ${cellCte(nCenters)},
       |pr AS (SELECT DISTINCT b.vec_id AS drop_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE floor(($dotAB/(sqrt(a.n2)*sqrt(b.n2)))*1000000 + 0.5)/1000000 >= $threshold)
       |SELECT asg.vec_id, asg.label, asg.cell, (pr.drop_id IS NULL) AS keep
       |FROM asg LEFT JOIN pr ON asg.vec_id = pr.drop_id
       |ORDER BY vec_id""".stripMargin
  }

  /** MaxSim late interaction: per-(label, query-vector) max cosine,
    * summed per label through DECIMAL(18,6) (order-independent).
    */
  def annMaxsim(nQueryVecs: Int): String =
    s"""WITH $normCte,
       |q AS (SELECT vec_id AS q_id, v, n2 FROM n WHERE vec_id < $nQueryVecs),
       |sc AS (SELECT c.label, q.q_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n c, q),
       |b AS (SELECT label, q_id, MAX(cos_r) AS best FROM sc GROUP BY label, q_id)
       |SELECT label, CAST(SUM(CAST(best AS DECIMAL(18,6))) AS DOUBLE) AS maxsim_r,
       |  COUNT(*) AS n_query_vecs
       |FROM b GROUP BY label
       |ORDER BY maxsim_r DESC, label""".stripMargin

  /** D13: cosine range search — the brute-force scored relation with a
    * threshold filter instead of a rank. */
  def annRange(nQueries: Int, radius: Double): String =
    s"""WITH $normCte,
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id)
       |SELECT q_id, vec_id, cos_r FROM sc WHERE cos_r >= $radius
       |ORDER BY q_id, vec_id""".stripMargin

  val annTopkBruteforce: String =
    s"""WITH $normCte,
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM sc)
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** D55: prefix-dimension recall — per prefix p, the exact top-k on
    * the FIRST p dims (sliced dot + sliced norms, same sequential
    * list_reduce fold as the native DotProduct), graded against the
    * full-dim exact top-k (recall) and in full space (mean full cos of
    * what the prefix retrieved). scf/top$p are multiply referenced →
    * MATERIALIZED (the DuckDB CTE-inlining discipline).
    */
  def annPrefixDimRecall(nQueries: Int = 8, k: Int = 5,
      prefixes: Seq[Int] = Seq(8, 16, 32, 64)): String = {
    def dmean(x: String) =
      s"floor((CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE) / " +
        s"CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    val perP = prefixes.map { p =>
      s"""scp$p AS (SELECT q.q_id, c.vec_id,
         |  floor((list_reduce([q.v[i]*c.v[i] for i in range(1, ${p + 1})], (x,y) -> x+y) /
         |    (sqrt(list_reduce([x*x for x in q.v[1:$p]], (x,y) -> x+y)) *
         |     sqrt(list_reduce([x*x for x in c.v[1:$p]], (x,y) -> x+y))))*1000000 + 0.5)/1000000 AS cos_r
         |  FROM q JOIN n c ON c.vec_id <> q.q_id),
         |top$p AS MATERIALIZED (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM scp$p) WHERE rn <= $k),
         |rec$p AS (SELECT x.q_id,
         |  floor((CAST(COUNT(f.vec_id) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_q
         |  FROM exact x LEFT JOIN top$p f ON f.q_id = x.q_id AND f.vec_id = x.vec_id
         |  GROUP BY x.q_id)""".stripMargin
    }
    val rows = prefixes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS prefix_dims,
         |  (SELECT ${dmean("recall_q")} FROM rec$p) AS mean_recall_r,
         |  (SELECT ${dmean("cos_r")} FROM top$p t
         |     JOIN scf s ON s.q_id = t.q_id AND s.vec_id = t.vec_id) AS mean_full_cos_r""".stripMargin
    }
    s"""WITH $normCte,
       |q AS (SELECT vec_id AS q_id, v, n2 FROM n WHERE vec_id < $nQueries),
       |scf AS MATERIALIZED (SELECT q.q_id, c.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM q JOIN n c ON c.vec_id <> q.q_id),
       |exact AS MATERIALIZED (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM scf) WHERE rn <= $k),
       |${perP.mkString(",\n")}
       |SELECT * FROM (${rows.mkString("\nUNION ALL\n")})
       |ORDER BY prefix_dims""".stripMargin
  }

  /** D56: the Matryoshka serving path — prefix-p retrieval pool
    * (sliced dot + sliced norms, the D55 expressions) re-ranked with
    * the full-dim exact cosine; the pool is multiply referenced →
    * MATERIALIZED.
    */
  def annPrefixRerank(nQueries: Int = 8, k: Int = 5, p: Int = 16,
      kPool: Int = 20): String =
    s"""WITH $normCte,
       |q AS (SELECT vec_id AS q_id, v, n2 FROM n WHERE vec_id < $nQueries),
       |scp AS (SELECT q.q_id, c.vec_id,
       |  floor((list_reduce([q.v[i]*c.v[i] for i in range(1, ${p + 1})], (x,y) -> x+y) /
       |    (sqrt(list_reduce([x*x for x in q.v[1:$p]], (x,y) -> x+y)) *
       |     sqrt(list_reduce([x*x for x in c.v[1:$p]], (x,y) -> x+y))))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM q JOIN n c ON c.vec_id <> q.q_id),
       |pool AS MATERIALIZED (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM scp) WHERE rn <= $kPool),
       |rr AS (SELECT p.q_id, p.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM pool p JOIN q ON q.q_id = p.q_id JOIN n c ON c.vec_id = p.vec_id)
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM rr) WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** D57: the Matryoshka INDEX variant — Lloyd chain trained IN the
    * prefix space (the generic `src` hook of [[lloydChainCtes]] over a
    * sliced relation), prefix-space probes + in-cell prefix cosines,
    * full-dim rerank of the pool. pasg/pd/pool multiply referenced →
    * MATERIALIZED.
    */
  def annPrefixIvfRerank(nQueries: Int = 8, k: Int = 5, p: Int = 16,
      nCells: Int = 16, nProbe: Int = 4, kPool: Int = 20): String =
    s"""WITH $normCte,
       |np AS MATERIALIZED (SELECT vec_id, v[1:$p] AS v,
       |  list_reduce([x*x for x in v[1:$p]], (x,y) -> x+y) AS n2 FROM n),
       |${lloydChainCtes(nCells, TrainRounds, "pcent", "pv", src = "np")},
       |pd AS MATERIALIZED (SELECT np.vec_id, pcent.cell,
       |  floor((np.n2 - 2*list_reduce([np.v[i]*pcent.cv[i] for i in range(1, len(np.v)+1)], (x,y) -> x+y) + pcent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM np, pcent),
       |pasg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM pd)
       |  WHERE rn = 1),
       |ppr AS (SELECT vec_id AS q_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn
       |   FROM pd WHERE vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |psc AS (SELECT ppr.q_id, a.vec_id,
       |  floor((list_reduce([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)], (x,y) -> x+y)/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM ppr JOIN pasg a ON a.cell = ppr.cell AND a.vec_id <> ppr.q_id
       |  JOIN np q ON q.vec_id = ppr.q_id JOIN np c ON c.vec_id = a.vec_id),
       |pool AS MATERIALIZED (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM psc) WHERE rn <= $kPool),
       |rr AS (SELECT p.q_id, p.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM pool p JOIN n q ON q.vec_id = p.q_id JOIN n c ON c.vec_id = p.vec_id)
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM rr) WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** D56b: the serving path's ledger — end-to-end recall@k + full-dim
    * scored-candidate volume per prefix, with the exact full-dim
    * baseline row. exact/pool CTEs are multiply referenced →
    * MATERIALIZED.
    */
  def annPrefixRerankLedger(nQueries: Int = 8, k: Int = 5,
      prefixes: Seq[Int] = Seq(16, 32), kPool: Int = 20): String = {
    def dmean(x: String) =
      s"floor((CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE) / " +
        s"CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    val perP = prefixes.map { p =>
      s"""scp$p AS (SELECT q.q_id, c.vec_id,
         |  floor((list_reduce([q.v[i]*c.v[i] for i in range(1, ${p + 1})], (x,y) -> x+y) /
         |    (sqrt(list_reduce([x*x for x in q.v[1:$p]], (x,y) -> x+y)) *
         |     sqrt(list_reduce([x*x for x in c.v[1:$p]], (x,y) -> x+y))))*1000000 + 0.5)/1000000 AS cos_r
         |  FROM q JOIN n c ON c.vec_id <> q.q_id),
         |pool$p AS MATERIALIZED (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM scp$p) WHERE rn <= $kPool),
         |rrtop$p AS MATERIALIZED (SELECT q_id, vec_id FROM (
         |  SELECT r.q_id, r.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY r.q_id ORDER BY r.cos_r DESC, r.vec_id ASC) AS rn
         |  FROM (SELECT p.q_id, p.vec_id,
         |      floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
         |    FROM pool$p p JOIN q ON q.q_id = p.q_id JOIN n c ON c.vec_id = p.vec_id) r)
         |  WHERE rn <= $k),
         |rec$p AS (SELECT x.q_id,
         |  floor((CAST(COUNT(f.vec_id) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_q
         |  FROM exact x LEFT JOIN rrtop$p f ON f.q_id = x.q_id AND f.vec_id = x.vec_id
         |  GROUP BY x.q_id),
         |cnt$p AS (SELECT q_id, COUNT(*) AS n_cands FROM pool$p GROUP BY q_id)""".stripMargin
    }
    val rows = prefixes.map { p =>
      s"""SELECT 'prefix_rerank' AS method, CAST($p AS BIGINT) AS prefix_dims,
         |  (SELECT ${dmean("CAST(n_cands AS DOUBLE)")} FROM cnt$p) AS mean_cands_r,
         |  (SELECT ${dmean("recall_q")} FROM rec$p) AS mean_recall_r""".stripMargin
    }
    val fullRow =
      s"""SELECT 'exact_full' AS method, CAST(${prefixes.max.max(64)} AS BIGINT) AS prefix_dims,
         |  (SELECT CAST(COUNT(*) - 1 AS DOUBLE) FROM n) AS mean_cands_r,
         |  CAST(1.0 AS DOUBLE) AS mean_recall_r""".stripMargin
    s"""WITH $normCte,
       |q AS (SELECT vec_id AS q_id, v, n2 FROM n WHERE vec_id < $nQueries),
       |scf AS (SELECT q.q_id, c.vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM q JOIN n c ON c.vec_id <> q.q_id),
       |exact AS MATERIALIZED (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM scf) WHERE rn <= $k),
       |${perP.mkString(",\n")}
       |SELECT * FROM ((${rows.mkString(")\nUNION ALL\n(")})
       |UNION ALL
       |($fullRow))
       |ORDER BY prefix_dims, method""".stripMargin
  }

  /** E63: the Gopher rule card re-derived with DuckDB's own list and
    * regex machinery — trivially-portable tokenizations (space/newline
    * words, newline lines) are the whole point of the card's gate.
    */
  val docGopherRules: String = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopSum = stops.map(s =>
      s"CASE WHEN list_contains(wl, '$s') THEN 1 ELSE 0 END").mkString(" + ")
    def r6sql(x: String) = s"floor(($x)*1000000 + 0.5)/1000000"
    s"""WITH w AS (SELECT doc_id,
       |    regexp_extract_all(text, '[^ \\n]+') AS words,
       |    string_split(text, chr(10)) AS lines,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash
       |  FROM documents),
       |m AS (SELECT doc_id, n_hash,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(list_sum([length(x) for x in words]) AS BIGINT) AS word_chars,
       |    CAST(len([x for x in words if x LIKE '%...']) AS BIGINT) AS n_ellipsis_words,
       |    CAST(len([x for x in lines if x LIKE '-%' OR x LIKE '*%']) AS BIGINT) AS n_bullet_lines,
       |    CAST(len([x for x in lines if x LIKE '%...']) AS BIGINT) AS n_ellipsis_lines,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len([x for x in words if regexp_matches(x, '[A-Za-z]')]) AS BIGINT) AS n_alpha_words,
       |    CAST($stopSum AS BIGINT) AS stop_hits
       |  FROM (SELECT *, [lower(x) for x in words] AS wl FROM w)),
       |r AS (SELECT doc_id, n_words, stop_hits,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE ${r6sql("CAST(word_chars AS DOUBLE)/n_words")} END AS mean_word_len_r,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE ${r6sql("CAST(n_hash + n_ellipsis_words AS DOUBLE)/n_words")} END AS symbol_word_ratio_r,
       |    ${r6sql("CAST(n_bullet_lines AS DOUBLE)/n_lines")} AS bullet_line_ratio_r,
       |    ${r6sql("CAST(n_ellipsis_lines AS DOUBLE)/n_lines")} AS ellipsis_line_ratio_r,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE ${r6sql("CAST(n_alpha_words AS DOUBLE)/n_words")} END AS alpha_word_ratio_r
       |  FROM m),
       |f AS (SELECT *,
       |    CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS pass_word_count,
       |    CAST(mean_word_len_r >= 3.0 AND mean_word_len_r <= 10.0 AS INTEGER) AS pass_word_len,
       |    CAST(symbol_word_ratio_r < 0.1 AS INTEGER) AS pass_symbol,
       |    CAST(bullet_line_ratio_r < 0.9 AS INTEGER) AS pass_bullet,
       |    CAST(ellipsis_line_ratio_r < 0.3 AS INTEGER) AS pass_ellipsis,
       |    CAST(alpha_word_ratio_r > 0.8 AS INTEGER) AS pass_alpha,
       |    CAST(stop_hits >= 2 AS INTEGER) AS pass_stops
       |  FROM r)
       |SELECT doc_id, n_words, mean_word_len_r, symbol_word_ratio_r,
       |  bullet_line_ratio_r, ellipsis_line_ratio_r, alpha_word_ratio_r,
       |  stop_hits, pass_word_count, pass_word_len, pass_symbol,
       |  pass_bullet, pass_ellipsis, pass_alpha, pass_stops,
       |  CAST(pass_word_count + pass_word_len + pass_symbol + pass_bullet +
       |    pass_ellipsis + pass_alpha + pass_stops = 7 AS INTEGER) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  private val bucketExpr: String = (1 to 8).map(d =>
    s"(CASE WHEN v[$d] > 0.0 THEN (1::BIGINT << ${d - 1}) ELSE 0 END)").mkString(" + ")

  val annLshBucketed: String =
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, n2, $bucketExpr AS bucket FROM n),
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.bucket,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb q JOIN nb c ON q.vec_id < 8 AND c.bucket = q.bucket AND c.vec_id <> q.vec_id)
       |SELECT q_id, rank, vec_id, bucket, cos_r FROM (
       |  SELECT q_id, vec_id, bucket, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM sc)
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  private def bucketExprAt(offset: Int): String = (1 to 8).map(d =>
    s"(CASE WHEN v[${offset + d}] > 0.0 THEN (1::BIGINT << ${d - 1}) ELSE 0 END)").mkString(" + ")

  /** Multi-table sign-LSH: 4 tables on disjoint 8-dim slices, posting
    * lists capped at 64 per (table, bucket) by lowest vec_id, candidate
    * hits deduped, exact cosine + top-3.
    */
  val annLshMultiTable: String = {
    val cases = (0 until 4).map(i => s"WHEN $i THEN ${bucketExprAt(i * 8)}").mkString(" ")
    s"""WITH $normCte,
       |p AS (SELECT vec_id, v, n2, tbl,
       |  CASE tbl $cases END AS bucket
       |  FROM n, (SELECT unnest([0,1,2,3]) AS tbl)),
       |corpus AS (SELECT vec_id, v, n2, tbl, bucket FROM (
       |  SELECT vec_id, v, n2, tbl, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY tbl, bucket ORDER BY vec_id ASC) AS pn
       |  FROM p) WHERE pn <= 64),
       |sc AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM p q JOIN corpus c
       |    ON q.vec_id < 8 AND c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id)
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM sc)
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D17: recall@k of the sign-LSH index vs brute force — both CTE
    * chains composed, per-query hit counts over the exact top-k.
    */
  def annRecallEval(k: Int): String =
    s"""WITH $normCte,
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
       |ex AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM sc) WHERE rank <= $k),
       |nb AS (SELECT vec_id, v, n2, $bucketExpr AS bucket FROM n),
       |lsc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb q JOIN nb c ON q.vec_id < 8 AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |ap AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM lsc) WHERE rank <= $k)
       |SELECT e.q_id, CAST(COUNT(a.vec_id) AS BIGINT) AS n_hits,
       |  floor((CAST(COUNT(a.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_r
       |FROM ex e LEFT JOIN ap a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin

  /** D18: mutual-kNN-graph connected components — D14's edge chain +
    * mutuality join + the C7 recursive transitive closure.
    */
  /** Shared CTE prefix for the mutual-kNN-graph family (D18/D32):
    * normCte → sign-bucketed capped candidates → per-src top-k → cosine
    * floor → mutuality join, ending at `m` (src < dst mutual edges).
    */
  private def mutualKnnCtes(k: Int, bucketCap: Int, threshold: Double): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    s"""$normCte,
       |nb AS (SELECT vec_id, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, v, n2, bucket FROM (
       |  SELECT vec_id, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sc AS (SELECT s.vec_id AS src, c.vec_id AS dst,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |kn AS (SELECT src, dst, cos_r FROM (
       |  SELECT src, dst, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sc) WHERE rank <= $k),
       |eg AS (SELECT src, dst FROM kn WHERE cos_r >= $threshold),
       |m AS (SELECT a.src, a.dst FROM eg a JOIN eg b ON a.src = b.dst AND a.dst = b.src
       |  WHERE a.src < a.dst)""".stripMargin
  }

  def embKnnClusters(k: Int, bucketCap: Int, threshold: Double): String = {
    s"""WITH RECURSIVE ${mutualKnnCtes(k, bucketCap, threshold)},
       |sym AS (SELECT src, dst FROM m UNION ALL SELECT dst AS src, src AS dst FROM m),
       |reach AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
       |),
       |mins AS (SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster
       |  FROM reach GROUP BY src)
       |SELECT emb.vec_id, COALESCE(m2.cluster, emb.vec_id) AS cluster,
       |  CAST(COALESCE(m2.cluster, emb.vec_id) = emb.vec_id AS INTEGER) AS is_canonical
       |FROM embeddings emb LEFT JOIN mins m2 ON emb.vec_id = m2.vec_id
       |ORDER BY emb.vec_id""".stripMargin
  }

  /** D32: triangle count + local clustering coefficient over the
    * mutual-kNN graph — the D18 edge relation, closed over ordered
    * edge triples (a<b<c); per-node membership counts and 2T/(d(d−1)).
    */
  def annTriangles(k: Int, bucketCap: Int, threshold: Double): String =
    s"""WITH ${mutualKnnCtes(k, bucketCap, threshold)},
       |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM m e1 JOIN m e2 ON e2.src = e1.dst
       |  JOIN m e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |tv AS (SELECT a AS vec_id FROM tri
       |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
       |tn AS (SELECT vec_id, COUNT(*) AS n_triangles FROM tv GROUP BY 1),
       |dg AS (SELECT vec_id, COUNT(*) AS degree FROM
       |  (SELECT src AS vec_id FROM m UNION ALL SELECT dst FROM m) GROUP BY 1)
       |SELECT dg.vec_id, dg.degree,
       |  COALESCE(tn.n_triangles, 0) AS n_triangles,
       |  CASE WHEN dg.degree >= 2 THEN
       |    floor((2.0*CAST(COALESCE(tn.n_triangles, 0) AS DOUBLE)/CAST(dg.degree*(dg.degree-1) AS DOUBLE))*1000000 + 0.5)/1000000
       |  END AS clustering_r
       |FROM dg LEFT JOIN tn USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  /** D14: k-NN graph — sign-bucket candidates, dst side posting-capped
    * by lowest vec_id, exact cosine + per-source top-k.
    */
  def annKnnGraph(k: Int, bucketCap: Int): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, v, n2, bucket FROM (
       |  SELECT vec_id, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sc AS (SELECT s.vec_id AS src, c.vec_id AS dst,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id)
       |SELECT src, rank, dst, cos_r FROM (
       |  SELECT src, dst, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sc)
       |WHERE rank <= $k
       |ORDER BY src, rank""".stripMargin
  }

  /** The D14 single-table edge CTEs (nb/corpus/sce/edges) — kept for
    * the D42b fragmentation probe.
    */
  private def singleEdgeCtes(kGraph: Int, bucketCap: Int): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    s"""nb AS (SELECT vec_id, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, v, n2, bucket FROM (
       |  SELECT vec_id, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sce AS (SELECT s.vec_id AS src, c.vec_id AS dst,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |edges AS (SELECT src, dst FROM (
       |  SELECT src, dst,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sce) WHERE rank <= $kGraph)""".stripMargin
  }

  /** The connected `nTables`-table edge union (p/pc/sce/edges) — the
    * knnEdgesMulti shape D41/D42/D43 default onto: disjoint 8-dim
    * sign-LSH slices, per-(tbl,bucket) posting cap, per-(src,tbl)
    * top-kPerTable, DISTINCT union.
    */
  private def multiEdgeCtes(kPerTable: Int, bucketCap: Int,
      nTables: Int = 4, src: String = "n", pfx: String = ""): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    val cases = (0 until nTables).map(i => s"WHEN $i THEN ${bucketExprAt(i * 8)}").mkString(" ")
    s"""${pfx}p AS (SELECT vec_id, v, n2, tbl, CASE tbl $cases END AS bucket
       |  FROM $src, (SELECT unnest([${(0 until nTables).mkString(",")}]) AS tbl)),
       |${pfx}pc AS (SELECT vec_id, v, n2, tbl, bucket FROM (
       |  SELECT vec_id, v, n2, tbl, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY tbl, bucket ORDER BY vec_id ASC) AS pn
       |  FROM ${pfx}p) WHERE pn <= $bucketCap),
       |${pfx}sce AS (SELECT s.vec_id AS src, c.vec_id AS dst, s.tbl,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM ${pfx}p s JOIN ${pfx}pc c ON c.tbl = s.tbl AND c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |${pfx}edgesc AS MATERIALIZED (SELECT DISTINCT src, dst, cos_r FROM (
       |  SELECT src, dst, cos_r,
       |    ROW_NUMBER() OVER (PARTITION BY src, tbl ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM ${pfx}sce) WHERE rank <= $kPerTable),
       |${pfx}edges AS (SELECT src, dst FROM ${pfx}edgesc)""".stripMargin
  }

  /** NN-descent refinement CTEs over a (src, dst, cos_r) seed edge
    * relation — the D53/D51-graph_nnd mirror of Similarity
    * .nnDescentEdges: per round symmetrize (reverse edges reuse the
    * commutative r6'd cosine), cap each vertex's list at kOut,
    * propose neighbor-of-neighbor pairs through a shared pivot, score
    * exactly, keep each vertex's best kOut of old ∪ new. Ends at
    * `${pfx}ne$descRounds` (src, dst, cos_r).
    */
  private def nnDescentCtes(seedRel: String, kOut: Int, descRounds: Int,
      pfx: String = ""): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    // every CTE here is MATERIALIZED: ne/ncap are each referenced
    // twice downstream (symmetrize+union, self-join), and an inlining
    // engine would re-derive the whole upstream chain per reference —
    // 4^rounds scans (the r12 "too many open files" failure mode)
    val e0 =
      s"""${pfx}ne0 AS MATERIALIZED (SELECT src, dst, cos_r FROM (
         |  SELECT src, dst, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rn
         |  FROM $seedRel) WHERE rn <= $kOut)""".stripMargin
    val roundCtes = (1 to descRounds).map { r =>
      s"""${pfx}nsym$r AS (SELECT src, dst, cos_r FROM ${pfx}ne${r - 1}
         |  UNION SELECT dst AS src, src AS dst, cos_r FROM ${pfx}ne${r - 1}),
         |${pfx}ncap$r AS MATERIALIZED (SELECT src, dst FROM (
         |  SELECT src, dst,
         |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rn
         |  FROM ${pfx}nsym$r) WHERE rn <= $kOut),
         |${pfx}ncd$r AS (SELECT DISTINCT a.dst AS src, b.dst AS dst
         |  FROM ${pfx}ncap$r a JOIN ${pfx}ncap$r b ON b.src = a.src AND b.dst <> a.dst),
         |${pfx}nsc$r AS (SELECT x.src, x.dst,
         |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
         |  FROM ${pfx}ncd$r x JOIN n s ON s.vec_id = x.src JOIN n c ON c.vec_id = x.dst),
         |${pfx}ne$r AS MATERIALIZED (SELECT src, dst, cos_r FROM (
         |  SELECT src, dst, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rn
         |  FROM (SELECT src, dst, cos_r FROM ${pfx}ne${r - 1}
         |        UNION SELECT src, dst, cos_r FROM ${pfx}nsc$r))
         |  WHERE rn <= $kOut)""".stripMargin
    }
    (e0 +: roundCtes).mkString(",\n")
  }

  /** Symmetrize an (src, dst, cos_r) refined edge CTE into an
    * undirected (src, dst) relation — UNION dedups.
    */
  private def symmEdgeCte(name: String, from: String): String =
    s"""$name AS MATERIALIZED (SELECT src, dst FROM $from
       |  UNION SELECT dst AS src, src AS dst FROM $from)""".stripMargin

  /** D54: NN-descent rounds tuning — one MATERIALIZED descent chain
    * (ne0..neR), per level an edge-quality rollup (mean kept cosine,
    * mean out-degree) × a flat D41 search unroll over the symmetrized
    * level edges scored against the shared exact top-k, with the
    * visited union as scan volume (the D51 convention).
    */
  def annNndTuning(nQueries: Int, k: Int, kGraph: Int, bucketCap: Int,
      nTables: Int, kOut: Int, descRounds: Int, beam: Int,
      rounds: Int): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    def dmean(c: String) =
      s"floor((CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    def levelCtes(r: Int): String = {
      val pfx = s"l$r"
      val roundCtes = (1 to rounds).map { rr =>
        s"""${pfx}exp$rr AS (SELECT DISTINCT x.q_id, ed.dst AS vec_id
           |  FROM ${pfx}vis${rr - 1} x JOIN sy$r ed ON ed.src = x.vec_id),
           |${pfx}sc$rr AS (SELECT x.q_id, x.vec_id, $cosQC AS cos_r
           |  FROM ${pfx}exp$rr x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
           |${pfx}u$rr AS (SELECT q_id, vec_id, cos_r FROM ${pfx}vis${rr - 1}
           |  UNION SELECT q_id, vec_id, cos_r FROM ${pfx}sc$rr),
           |${pfx}vis$rr AS MATERIALIZED (SELECT q_id, vec_id, cos_r FROM (
           |  SELECT q_id, vec_id, cos_r,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
           |  FROM ${pfx}u$rr) WHERE rn <= $beam)""".stripMargin
      }.mkString(",\n")
      val visited = (s"SELECT q_id, vec_id FROM ${pfx}vis0" +:
        (1 to rounds).map(rr => s"SELECT q_id, vec_id FROM ${pfx}sc$rr"))
        .mkString("\n  UNION ALL ")
      s"""${symmEdgeCte(s"sy$r", s"ne$r")},
         |${pfx}vis0 AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
         |  FROM qs q, ent JOIN n c ON c.vec_id = ent.vec_id),
         |$roundCtes,
         |${pfx}found AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM ${pfx}vis$rounds WHERE vec_id <> q_id) WHERE rn <= $k),
         |${pfx}cands AS (SELECT q_id, COUNT(*) AS n_cands FROM (
         |  SELECT DISTINCT q_id, vec_id FROM (
         |  $visited)
         |  WHERE vec_id <> q_id) GROUP BY q_id),
         |${pfx}row AS (SELECT CAST($r AS BIGINT) AS desc_rounds,
         |  (SELECT ${dmean("cos_r")} FROM ne$r) AS mean_edge_cos_r,
         |  (SELECT floor((CAST(COUNT(*) AS DOUBLE)/CAST(COUNT(DISTINCT src) AS DOUBLE))*1000000 + 0.5)/1000000 FROM ne$r) AS mean_degree_r,
         |  (SELECT ${dmean("CAST(COALESCE(c.n_cands, 0) AS DOUBLE)")}
         |     FROM (SELECT DISTINCT q_id FROM qs) qq LEFT JOIN ${pfx}cands c ON c.q_id = qq.q_id) AS mean_cands_r,
         |  (SELECT ${dmean("r.recall_q")} FROM (
         |     SELECT e.q_id,
         |       floor((CAST(COUNT(f.vec_id) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_q
         |     FROM exk e LEFT JOIN ${pfx}found f ON f.q_id = e.q_id AND f.vec_id = e.vec_id
         |     GROUP BY e.q_id) r) AS mean_recall_r)""".stripMargin
    }
    s"""WITH $normCte,
       |xsc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |exk AS MATERIALIZED (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM xsc) WHERE rank <= $k),
       |${multiEdgeCtes(kGraph, bucketCap, nTables)},
       |${nnDescentCtes("edgesc", kOut, descRounds)},
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |ent AS (SELECT MIN(vec_id) AS vec_id FROM n),
       |${(0 to descRounds).map(levelCtes).mkString(",\n")}
       |${(0 to descRounds).map(r => s"SELECT * FROM l${r}row").mkString("\nUNION ALL ")}
       |ORDER BY desc_rounds""".stripMargin
  }

  /** D53: graph-ANN beam search over the NN-descent-refined graph —
    * the full probe-set design: refined SYMMETRIZED full edges
    * (nnDescentCtes over the bucketed seed union), a coarse sampled
    * layer refined the same way, the coarse final beam seeding layer
    * 0 (the D52 unrolling run twice), every rounding/tiebreak site
    * mirroring D41.
    */
  def annGraphSearchNnd(nQueries: Int, beam: Int, rounds: Int, k: Int,
      kGraph: Int, bucketCap: Int, nTables: Int, kOut: Int,
      descRounds: Int, sampleMod: Int, kOutC: Int, descRoundsC: Int): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    def roundCtes(pfx: String, edgeRel: String): String =
      (1 to rounds).map { r =>
        s"""${pfx}exp$r AS (SELECT DISTINCT x.q_id, ed.dst AS vec_id
           |  FROM ${pfx}vis${r - 1} x JOIN $edgeRel ed ON ed.src = x.vec_id),
           |${pfx}sc$r AS (SELECT x.q_id, x.vec_id, $cosQC AS cos_r
           |  FROM ${pfx}exp$r x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
           |${pfx}u$r AS (SELECT q_id, vec_id, cos_r FROM ${pfx}vis${r - 1}
           |  UNION SELECT q_id, vec_id, cos_r FROM ${pfx}sc$r),
           |${pfx}vis$r AS MATERIALIZED (SELECT q_id, vec_id, cos_r FROM (
           |  SELECT q_id, vec_id, cos_r,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
           |  FROM ${pfx}u$r) WHERE rn <= $beam)""".stripMargin
      }.mkString(",\n")
    s"""WITH $normCte,
       |${multiEdgeCtes(kGraph, bucketCap, nTables)},
       |${nnDescentCtes("edgesc", kOut, descRounds)},
       |${symmEdgeCte("nedges", s"ne$descRounds")},
       |ns AS (SELECT vec_id, label, v, n2 FROM n WHERE vec_id % $sampleMod = 0),
       |${multiEdgeCtes(kGraph, bucketCap, nTables, src = "ns", pfx = "s")},
       |${nnDescentCtes("sedgesc", kOutC, descRoundsC, pfx = "s")},
       |${symmEdgeCte("cedges", s"sne$descRoundsC")},
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |ent AS (SELECT MIN(vec_id) AS vec_id FROM ns),
       |avis0 AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
       |  FROM qs q, ent JOIN n c ON c.vec_id = ent.vec_id),
       |${roundCtes("a", "cedges")},
       |vis0 AS (SELECT q_id, vec_id, cos_r FROM avis$rounds),
       |${roundCtes("", "nedges")}
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS BIGINT) AS rank
       |  FROM vis$rounds) WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D41: graph-ANN beam search — the CONNECTED multi-table edge
    * union (multiEdgeCtes; nTables = 1 recovers the single-table
    * probe graph), then `rounds` expand/score/truncate rounds
    * unrolled as chained CTEs (the D38 discipline); UNION dedups on
    * identical r6'd scores.
    */
  def annGraphSearch(nQueries: Int, beam: Int, rounds: Int, k: Int,
      kGraph: Int, bucketCap: Int, nTables: Int = 4): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    val roundCtes = (1 to rounds).map { r =>
      s"""exp$r AS (SELECT DISTINCT b.q_id, ed.dst AS vec_id
         |  FROM vis${r - 1} b JOIN edges ed ON ed.src = b.vec_id),
         |sc$r AS (SELECT x.q_id, x.vec_id, $cosQC AS cos_r
         |  FROM exp$r x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
         |u$r AS (SELECT q_id, vec_id, cos_r FROM vis${r - 1}
         |  UNION SELECT q_id, vec_id, cos_r FROM sc$r),
         |vis$r AS (SELECT q_id, vec_id, cos_r FROM (
         |  SELECT q_id, vec_id, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM u$r) WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    val edgeCtes = if (nTables <= 1) singleEdgeCtes(kGraph, bucketCap)
      else multiEdgeCtes(kGraph, bucketCap, nTables)
    s"""WITH $normCte,
       |$edgeCtes,
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |ent AS (SELECT MIN(vec_id) AS vec_id FROM n),
       |vis0 AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
       |  FROM qs q, ent JOIN n c ON c.vec_id = ent.vec_id),
       |$roundCtes
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS BIGINT) AS rank
       |  FROM vis$rounds) WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** B61: revenue concentration — per-customer decimal-routed revenue,
    * r4'd quantile_cont cutoffs (the A45 percentile convention), one
    * conditional rollup per rung unioned to rows.
    */
  def qRevenueConcentration(topPcts: Seq[Int]): String = {
    val cuts = topPcts.map(p =>
      s"floor(quantile_cont(rev, ${1.0 - p / 100.0})*10000 + 0.5)/10000 AS cut$p").mkString(",\n  ")
    // mirror the Spark shape: ONE conditional rollup (w) over cr × c,
    // then per-rung selects off the single wide row — an empty rung
    // yields a count-0 row on both engines (the grouped per-rung form
    // would drop it here but not in Spark)
    val condSums = topPcts.map { p =>
      s"""CAST(SUM(CASE WHEN rev >= c.cut$p THEN 1 ELSE 0 END) AS BIGINT) AS n_$p,
         |  CAST(SUM(CASE WHEN rev >= c.cut$p THEN CAST(rev AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS r_$p,
         |  ANY_VALUE(c.cut$p) AS c_$p""".stripMargin
    }.mkString(",\n  ")
    val rungs = topPcts.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS top_pct, c_$p AS cutoff_r, n_$p AS n_customers,
         |  floor((CAST(n_$p AS DOUBLE) / CAST(n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS cust_frac_r,
         |  floor((r_$p / total)*1000000 + 0.5)/1000000 AS share_r
         |FROM w""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH cr AS (SELECT o_custkey,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
       |c AS (SELECT COUNT(*) AS n_total,
       |  CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total,
       |  $cuts
       |  FROM cr),
       |w AS (SELECT ANY_VALUE(c.n_total) AS n_total, ANY_VALUE(c.total) AS total,
       |  $condSums
       |  FROM cr, c)
       |$rungs
       |ORDER BY top_pct""".stripMargin
  }

  /** D44: nlist tuning — per size a suffixed cent/d/asg block (the
    * cellCte construction), cell rollup, one-level decimal error sum
    * (exact ⇒ bit-identical to the Spark side's two-level sum).
    */
  def annNlistTuning(sizes: Seq[Int]): String = {
    val ckey = "('0x'||substr(md5('centroid:'||CAST(vec_id AS VARCHAR)),1,15))::BIGINT"
    val blocks = sizes.map { nc =>
      s"""cent_$nc AS (SELECT v AS cv, n2 AS c2,
         |  ROW_NUMBER() OVER (ORDER BY $ckey, vec_id) - 1 AS cell
         |  FROM n ORDER BY $ckey, vec_id LIMIT $nc),
         |d_$nc AS (SELECT n.vec_id, cent_$nc.cell,
         |  floor((n.n2 - 2*list_reduce([n.v[i]*cent_$nc.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + cent_$nc.c2)*1000000 + 0.5)/1000000 AS dist2_r
         |  FROM n, cent_$nc),
         |asg_$nc AS (SELECT vec_id, cell, dist2_r FROM
         |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM d_$nc)
         |  WHERE rn = 1),
         |cc_$nc AS (SELECT cell, COUNT(*) AS cn FROM asg_$nc GROUP BY 1),
         |row_$nc AS (SELECT CAST($nc AS BIGINT) AS n_cells,
         |  floor(((SELECT CAST(SUM(CAST(dist2_r AS DECIMAL(18,6))) AS DOUBLE) FROM asg_$nc) /
         |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM asg_$nc))*1000000 + 0.5)/1000000 AS mean_dist2_r,
         |  floor(((SELECT CAST(MAX(cn) AS DOUBLE) FROM cc_$nc) /
         |    (SELECT CAST(SUM(cn) AS DOUBLE) FROM cc_$nc))*1000000 + 0.5)/1000000 AS max_share_r,
         |  CAST($nc - (SELECT COUNT(*) FROM cc_$nc) AS BIGINT) AS n_empty_cells)""".stripMargin
    }.mkString(",\n")
    s"""WITH $normCte,
       |$blocks
       |${sizes.map(nc => s"SELECT * FROM row_$nc").mkString("\nUNION ALL ")}
       |ORDER BY n_cells""".stripMargin
  }

  private def bucketExprAtBits(offset: Int, bits: Int): String = (1 to bits).map(d =>
    s"(CASE WHEN v[${offset + d}] > 0.0 THEN (1::BIGINT << ${d - 1}) ELSE 0 END)").mkString(" + ")

  /** D51: cross-method recall ledger — graph beam search, IVF probing
    * and multi-table sign-LSH against the same exact cosine top-k,
    * each with its measured per-query candidate volume. Composes the
    * D41 round unrolling (+ a visited union over the per-round scored
    * CTEs), the D4 Lloyd/assignment/probe chain, and the D2b posting
    * construction at a parameterized bit width; per-query recalls and
    * candidate counts r6'd then decimal-meaned (the D37 convention).
    */
  def annMethodRecall(nQueries: Int, k: Int, beam: Int, rounds: Int,
      kGraph: Int, bucketCap: Int, nTables: Int, nCells: Int, nProbe: Int,
      lshBits: Int, lshTables: Int, lshCap: Int, kOut: Int = 16,
      descRounds: Int = 3): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC2 = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    def dmean(c: String) =
      s"floor((CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    val roundCtes = (1 to rounds).map { r =>
      s"""exp$r AS (SELECT DISTINCT b.q_id, ed.dst AS vec_id
         |  FROM vis${r - 1} b JOIN edges ed ON ed.src = b.vec_id),
         |sc$r AS (SELECT x.q_id, x.vec_id, $cosQC2 AS cos_r
         |  FROM exp$r x JOIN n c ON c.vec_id = x.vec_id JOIN gqs q ON q.q_id = x.q_id),
         |u$r AS (SELECT q_id, vec_id, cos_r FROM vis${r - 1}
         |  UNION SELECT q_id, vec_id, cos_r FROM sc$r),
         |vis$r AS MATERIALIZED (SELECT q_id, vec_id, cos_r FROM (
         |  SELECT q_id, vec_id, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM u$r) WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    val visitedUnion = (s"SELECT q_id, vec_id FROM vis0" +:
      (1 to rounds).map(r => s"SELECT q_id, vec_id FROM sc$r"))
      .mkString("\n  UNION ALL ")
    // layered leg round CTEs (coarse prefix "a" over sedges, layer-0
    // prefix "z" over the full edges)
    def layRounds(pfx: String, edgeRel: String): String =
      (1 to rounds).map { r =>
        s"""${pfx}exp$r AS (SELECT DISTINCT x.q_id, ed.dst AS vec_id
           |  FROM ${pfx}vis${r - 1} x JOIN $edgeRel ed ON ed.src = x.vec_id),
           |${pfx}sc$r AS (SELECT x.q_id, x.vec_id, $cosQC2 AS cos_r
           |  FROM ${pfx}exp$r x JOIN n c ON c.vec_id = x.vec_id JOIN gqs q ON q.q_id = x.q_id),
           |${pfx}u$r AS (SELECT q_id, vec_id, cos_r FROM ${pfx}vis${r - 1}
           |  UNION SELECT q_id, vec_id, cos_r FROM ${pfx}sc$r),
           |${pfx}vis$r AS MATERIALIZED (SELECT q_id, vec_id, cos_r FROM (
           |  SELECT q_id, vec_id, cos_r,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
           |  FROM ${pfx}u$r) WHERE rn <= $beam)""".stripMargin
      }.mkString(",\n")
    val layVisited = (Seq("SELECT q_id, vec_id FROM avis0") ++
      (1 to rounds).map(r => s"SELECT q_id, vec_id FROM asc$r") ++
      (1 to rounds).map(r => s"SELECT q_id, vec_id FROM zsc$r"))
      .mkString("\n  UNION ALL ")
    val lshCases = (0 until lshTables).map(i =>
      s"WHEN $i THEN ${bucketExprAtBits(i * lshBits, lshBits)}").mkString(" ")
    def methodRow(name: String, foundRel: String, candsRel: String) =
      s"""SELECT '$name' AS method,
         |  ${dmean(s"CAST(COALESCE(c.n_cands, 0) AS DOUBLE)")} AS mean_cands_r,
         |  ${dmean("r.recall_q")} AS mean_recall_r
         |FROM (SELECT e.q_id,
         |    floor((CAST(COUNT(f.vec_id) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS recall_q
         |  FROM exk e LEFT JOIN $foundRel f ON f.q_id = e.q_id AND f.vec_id = e.vec_id
         |  GROUP BY e.q_id) r
         |LEFT JOIN $candsRel c ON c.q_id = r.q_id""".stripMargin
    s"""WITH $normCte,
       |xsc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |  floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |exk AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM xsc) WHERE rank <= $k),
       |${multiEdgeCtes(kGraph, bucketCap, nTables)},
       |gqs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |gent AS (SELECT MIN(vec_id) AS vec_id FROM n),
       |vis0 AS (SELECT q.q_id, c.vec_id, $cosQC2 AS cos_r
       |  FROM gqs q, gent JOIN n c ON c.vec_id = gent.vec_id),
       |$roundCtes,
       |gfound AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM vis$rounds WHERE vec_id <> q_id) WHERE rn <= $k),
       |gcands AS (SELECT q_id, COUNT(*) AS n_cands FROM (
       |  SELECT DISTINCT q_id, vec_id FROM (
       |  $visitedUnion)
       |  WHERE vec_id <> q_id) GROUP BY q_id),
       |lns AS (SELECT vec_id, label, v, n2 FROM n WHERE vec_id % 8 = 0),
       |${multiEdgeCtes(kGraph, bucketCap, nTables, src = "lns", pfx = "s")},
       |aent AS (SELECT MIN(vec_id) AS vec_id FROM lns),
       |avis0 AS (SELECT q.q_id, c.vec_id, $cosQC2 AS cos_r
       |  FROM gqs q, aent JOIN n c ON c.vec_id = aent.vec_id),
       |${layRounds("a", "sedges")},
       |zvis0 AS (SELECT q_id, vec_id, cos_r FROM avis$rounds),
       |${layRounds("z", "edges")},
       |lgfound AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM zvis$rounds WHERE vec_id <> q_id) WHERE rn <= $k),
       |lgcands AS (SELECT q_id, COUNT(*) AS n_cands FROM (
       |  SELECT DISTINCT q_id, vec_id FROM (
       |  $layVisited)
       |  WHERE vec_id <> q_id) GROUP BY q_id),
       |${nnDescentCtes("edgesc", kOut, descRounds)},
       |${symmEdgeCte("nedges", s"ne$descRounds")},
       |${nnDescentCtes("sedgesc", 8, 2, pfx = "s")},
       |${symmEdgeCte("cedges", "sne2")},
       |yvis0 AS (SELECT q.q_id, c.vec_id, $cosQC2 AS cos_r
       |  FROM gqs q, aent JOIN n c ON c.vec_id = aent.vec_id),
       |${layRounds("y", "cedges")},
       |wvis0 AS (SELECT q_id, vec_id, cos_r FROM yvis$rounds),
       |${layRounds("w", "nedges")},
       |nfound AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM wvis$rounds WHERE vec_id <> q_id) WHERE rn <= $k),
       |ncands AS (SELECT q_id, COUNT(*) AS n_cands FROM (
       |  SELECT DISTINCT q_id, vec_id FROM (
       |  ${(Seq("SELECT q_id, vec_id FROM yvis0") ++
             (1 to rounds).map(r => s"SELECT q_id, vec_id FROM ysc$r") ++
             (1 to rounds).map(r => s"SELECT q_id, vec_id FROM wsc$r"))
               .mkString("\n  UNION ALL ")})
       |  WHERE vec_id <> q_id) GROUP BY q_id),
       |${lloydChainCtes(nCells, TrainRounds, "ccent", "ic")},
       |cd AS (SELECT n.vec_id, ccent.cell,
       |  floor((n.n2 - 2*list_reduce([n.v[i]*ccent.cv[i] for i in range(1, len(n.v)+1)], (x,y) -> x+y) + ccent.c2)*1000000 + 0.5)/1000000 AS dist2_r
       |  FROM n, ccent),
       |asg AS (SELECT vec_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn FROM cd)
       |  WHERE rn = 1),
       |pr AS (SELECT vec_id AS q_id, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_r, cell) AS rn
       |   FROM cd WHERE vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |icand AS (SELECT pr.q_id, a.vec_id FROM pr JOIN asg a ON a.cell = pr.cell AND a.vec_id <> pr.q_id),
       |ifound AS (SELECT q_id, vec_id FROM (
       |  SELECT x.q_id, x.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY x.q_id ORDER BY
       |      floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 DESC, x.vec_id ASC) AS rn
       |  FROM icand x JOIN n q ON q.vec_id = x.q_id JOIN n c ON c.vec_id = x.vec_id)
       |  WHERE rn <= $k),
       |icands AS (SELECT q_id, COUNT(*) AS n_cands FROM icand GROUP BY q_id),
       |lpost AS (SELECT vec_id, v, n2, tbl, CASE tbl $lshCases END AS bucket
       |  FROM n, (SELECT unnest([${(0 until lshTables).mkString(",")}]) AS tbl)),
       |lcorp AS (SELECT vec_id, v, n2, tbl, bucket FROM (
       |  SELECT vec_id, v, n2, tbl, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY tbl, bucket ORDER BY vec_id ASC) AS pn
       |  FROM lpost) WHERE pn <= $lshCap),
       |lhit AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
       |  FROM lpost q JOIN lcorp c
       |    ON q.vec_id < $nQueries AND c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |lfound AS (SELECT q_id, vec_id FROM (
       |  SELECT x.q_id, x.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY x.q_id ORDER BY
       |      floor(($dotQC/(sqrt(q.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 DESC, x.vec_id ASC) AS rn
       |  FROM lhit x JOIN n q ON q.vec_id = x.q_id JOIN n c ON c.vec_id = x.vec_id)
       |  WHERE rn <= $k),
       |lcands AS (SELECT q_id, COUNT(*) AS n_cands FROM lhit GROUP BY q_id)
       |SELECT method, mean_cands_r, mean_recall_r FROM (
       |${methodRow("graph_beam", "gfound", "gcands")}
       |UNION ALL ${methodRow("graph_layered", "lgfound", "lgcands")}
       |UNION ALL ${methodRow("graph_nnd", "nfound", "ncands")}
       |UNION ALL ${methodRow("ivf", "ifound", "icands")}
       |UNION ALL ${methodRow("lsh_multi", "lfound", "lcands")})
       |ORDER BY method""".stripMargin
  }

  /** D52: layered graph search — the D41 unrolled-rounds pattern run
    * TWICE: once over the sampled coarse layer (vertex set `ns`, edge
    * chain prefixed `s`), whose per-query best vertex seeds the full-
    * graph rounds. Every rounding/tiebreak site mirrors D41.
    */
  def annGraphSearchLayered(nQueries: Int, beam: Int, rounds: Int, k: Int,
      kGraph: Int, bucketCap: Int, nTables: Int, sampleMod: Int,
      beam1: Int, rounds1: Int): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    def roundCtes(pfx: String, edgeRel: String, b: Int, n: Int): String =
      (1 to n).map { r =>
        s"""${pfx}exp$r AS (SELECT DISTINCT x.q_id, ed.dst AS vec_id
           |  FROM ${pfx}vis${r - 1} x JOIN $edgeRel ed ON ed.src = x.vec_id),
           |${pfx}sc$r AS (SELECT x.q_id, x.vec_id, $cosQC AS cos_r
           |  FROM ${pfx}exp$r x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
           |${pfx}u$r AS (SELECT q_id, vec_id, cos_r FROM ${pfx}vis${r - 1}
           |  UNION SELECT q_id, vec_id, cos_r FROM ${pfx}sc$r),
           |${pfx}vis$r AS (SELECT q_id, vec_id, cos_r FROM (
           |  SELECT q_id, vec_id, cos_r,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
           |  FROM ${pfx}u$r) WHERE rn <= $b)""".stripMargin
      }.mkString(",\n")
    s"""WITH $normCte,
       |ns AS (SELECT vec_id, label, v, n2 FROM n WHERE vec_id % $sampleMod = 0),
       |${multiEdgeCtes(kGraph, bucketCap, nTables, src = "ns", pfx = "s")},
       |${multiEdgeCtes(kGraph, bucketCap, nTables)},
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |aent AS (SELECT MIN(vec_id) AS vec_id FROM ns),
       |avis0 AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
       |  FROM qs q, aent JOIN n c ON c.vec_id = aent.vec_id),
       |${roundCtes("a", "sedges", beam1, rounds1)},
       |ent0 AS (SELECT q_id, vec_id FROM avis$rounds1),
       |vis0 AS (SELECT x.q_id, c.vec_id, $cosQC AS cos_r
       |  FROM ent0 x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
       |${roundCtes("", "edges", beam, rounds)}
       |SELECT q_id, rank, vec_id, cos_r FROM (
       |  SELECT q_id, vec_id, cos_r,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS BIGINT) AS rank
       |  FROM vis$rounds) WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** D43: beam tuning — the two-table edge union (D2b's CASE-bucket
    * postings, capped corpus side, per-(src,tbl) rank), one exact
    * ranked relation shared by all beams, and per beam the D41 search
    * rounds unrolled with a `_b<beam>` CTE suffix; per-query recalls
    * r6'd before the DECIMAL mean (the D37 convention).
    */
  def annBeamTuning(beams: Seq[Int], rounds: Int, k: Int, nQueries: Int,
      kPerTable: Int, bucketCap: Int): String = {
    val dotQC2 = "list_reduce([q.qv[i]*c.v[i] for i in range(1, len(q.qv)+1)], (x,y) -> x+y)"
    val cosQC = s"floor(($dotQC2/(sqrt(q.qn2)*sqrt(c.n2)))*1000000 + 0.5)/1000000"
    def dmean(c: String) =
      s"floor((CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    def searchCtes(b: Int): String = {
      val roundCtes = (1 to rounds).map { r =>
        s"""exp${r}_b$b AS (SELECT DISTINCT x.q_id, ed.dst AS vec_id
           |  FROM vis${r - 1}_b$b x JOIN edges ed ON ed.src = x.vec_id),
           |sc${r}_b$b AS (SELECT x.q_id, x.vec_id, $cosQC AS cos_r
           |  FROM exp${r}_b$b x JOIN n c ON c.vec_id = x.vec_id JOIN qs q ON q.q_id = x.q_id),
           |u${r}_b$b AS (SELECT q_id, vec_id, cos_r FROM vis${r - 1}_b$b
           |  UNION SELECT q_id, vec_id, cos_r FROM sc${r}_b$b),
           |vis${r}_b$b AS (SELECT q_id, vec_id, cos_r FROM (
           |  SELECT q_id, vec_id, cos_r,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
           |  FROM u${r}_b$b) WHERE rn <= $b)""".stripMargin
      }.mkString(",\n")
      s"""vis0_b$b AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
         |  FROM qs q, ent JOIN n c ON c.vec_id = ent.vec_id),
         |$roundCtes,
         |found_b$b AS (SELECT q_id, vec_id, cos_r FROM (
         |  SELECT q_id, vec_id, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rn
         |  FROM vis${rounds}_b$b WHERE vec_id <> q_id) WHERE rn <= $k),
         |pq_b$b AS (SELECT f.q_id,
         |  floor((CAST(COUNT(x.vec_id) AS DOUBLE) / ${k}.0)*1000000 + 0.5)/1000000 AS recall_q,
         |  MAX(f.cos_r) AS best_q
         |  FROM found_b$b f LEFT JOIN ex x ON x.q_id = f.q_id AND x.vec_id = f.vec_id
         |  GROUP BY 1),
         |row_b$b AS (SELECT CAST($b AS BIGINT) AS beam,
         |  ${dmean("p.recall_q")} AS mean_recall_r,
         |  ${dmean("p.best_q")} AS mean_best_cos_r,
         |  ${dmean("e2.x_best")} AS exact_best_cos_r
         |  FROM pq_b$b p JOIN exbest e2 ON e2.q_id = p.q_id)""".stripMargin
    }
    s"""WITH $normCte,
       |${multiEdgeCtes(kPerTable, bucketCap)},
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < $nQueries),
       |scx AS (SELECT q.q_id, c.vec_id, $cosQC AS cos_r
       |  FROM qs q JOIN n c ON c.vec_id <> q.q_id),
       |rk AS (SELECT q_id, vec_id, cos_r,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rank
       |  FROM scx),
       |ex AS (SELECT q_id, vec_id FROM rk WHERE rank <= $k),
       |exbest AS (SELECT q_id, cos_r AS x_best FROM rk WHERE rank = 1),
       |ent AS (SELECT MIN(vec_id) AS vec_id FROM n),
       |${beams.map(searchCtes).mkString(",\n")}
       |${beams.map(b => s"SELECT * FROM row_b$b").mkString("\nUNION ALL ")}
       |ORDER BY beam""".stripMargin
  }

  /** D42: BFS reachability — D41's edge CTEs (multi-table default;
    * nTables = 1 is the D42b fragmentation probe), hop layers
    * unrolled with NOT-IN anti-joins against the running visited set;
    * the unreached row derives from the corpus count.
    */
  def annGraphReach(maxHops: Int, kGraph: Int, bucketCap: Int,
      nTables: Int = 4): String = {
    val hopCtes = (1 to maxHops).map { r =>
      s"""f$r AS (SELECT DISTINCT ed.dst AS vec_id
         |  FROM f${r - 1} b JOIN edges ed ON ed.src = b.vec_id
         |  WHERE ed.dst NOT IN (SELECT vec_id FROM vis${r - 1})),
         |vis$r AS (SELECT vec_id, hop FROM vis${r - 1}
         |  UNION ALL SELECT vec_id, CAST($r AS BIGINT) AS hop FROM f$r)""".stripMargin
    }.mkString(",\n")
    val edgeCtes = if (nTables <= 1) singleEdgeCtes(kGraph, bucketCap)
      else multiEdgeCtes(kGraph, bucketCap, nTables)
    s"""WITH $normCte,
       |$edgeCtes,
       |ent AS (SELECT MIN(vec_id) AS vec_id FROM n),
       |vis0 AS (SELECT vec_id, CAST(0 AS BIGINT) AS hop FROM ent),
       |f0 AS (SELECT vec_id FROM ent),
       |$hopCtes
       |SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_vertices
       |  FROM vis$maxHops GROUP BY 1
       |UNION ALL SELECT CAST(-1 AS BIGINT) AS hop,
       |  CAST((SELECT COUNT(*) FROM n) - (SELECT COUNT(*) FROM vis$maxHops) AS BIGINT) AS n_vertices
       |ORDER BY hop""".stripMargin
  }

  /** D33: kNN in-degree (hubness) — the D14 kn CTE grouped by dst,
    * zero-filled over the corpus id universe.
    */
  def annHubness(k: Int, bucketCap: Int): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, v, n2, bucket FROM (
       |  SELECT vec_id, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sc AS (SELECT s.vec_id AS src, c.vec_id AS dst,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |kn AS (SELECT src, dst FROM (
       |  SELECT src, dst,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sc) WHERE rank <= $k),
       |ind AS (SELECT dst AS vec_id, COUNT(*) AS in_degree FROM kn GROUP BY 1)
       |SELECT e.vec_id, CAST(COALESCE(ind.in_degree, 0) AS BIGINT) AS in_degree
       |FROM embeddings e LEFT JOIN ind ON ind.vec_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  /** D15: k-NN majority-vote label prediction off the D14 edge
    * relation (labels carried through; votes argmax with the
    * (votes DESC, label ASC) tiebreak).
    */
  def annLabelKnn(k: Int, bucketCap: Int): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, label, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, label, v, n2, bucket FROM (
       |  SELECT vec_id, label, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sc AS (SELECT s.vec_id AS src, s.label AS actual_label,
       |  c.vec_id AS dst, c.label AS dlabel,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |kn AS (SELECT src, actual_label, dst, dlabel FROM (
       |  SELECT src, actual_label, dst, dlabel,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sc) WHERE rank <= $k),
       |v AS (SELECT src, actual_label, dlabel, COUNT(*) AS votes FROM kn GROUP BY 1, 2, 3),
       |p AS (SELECT src, actual_label, dlabel AS pred_label, votes FROM (
       |  SELECT src, actual_label, dlabel, votes,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY votes DESC, dlabel ASC) AS rn
       |  FROM v) WHERE rn = 1)
       |SELECT src, pred_label, votes, actual_label,
       |  CAST(pred_label = actual_label AS INTEGER) AS is_correct
       |FROM p ORDER BY src""".stripMargin
  }

  /** D16: per-label centroid distance — micro-lattice exact centroid
    * sums, sequential-fold dot products (‖x‖² − 2x·c + ‖c‖²).
    */
  val embCentroidDist: String =
    s"""WITH m AS (SELECT vec_id, label,
       |  [CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT) for x in embedding] AS vm
       |  FROM embeddings),
       |d AS (SELECT label, vm, unnest(range(1, len(vm)+1)) AS dim FROM m),
       |ex AS (SELECT label, CAST(dim AS INTEGER) AS dim, vm[CAST(dim AS INTEGER)] AS xm FROM d),
       |cs AS (SELECT label, dim,
       |  CAST(SUM(xm) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE)/1000000.0 AS c
       |  FROM ex GROUP BY 1, 2),
       |cv AS (SELECT label, list(c ORDER BY dim) AS cv FROM cs GROUP BY label),
       |x AS (SELECT vec_id, label, [CAST(v AS DOUBLE)/1000000.0 for v in vm] AS xd FROM m)
       |SELECT x.vec_id, x.label,
       |  floor(sqrt(greatest(0.0,
       |    list_reduce([x.xd[i]*x.xd[i] for i in range(1, len(x.xd)+1)], (a,b) -> a+b)
       |    - 2.0*list_reduce([x.xd[i]*cv.cv[i] for i in range(1, len(x.xd)+1)], (a,b) -> a+b)
       |    + list_reduce([cv.cv[i]*cv.cv[i] for i in range(1, len(cv.cv)+1)], (a,b) -> a+b)))*1000000 + 0.5)/1000000 AS dist_r
       |FROM x JOIN cv ON x.label = cv.label
       |ORDER BY x.vec_id""".stripMargin

  /** D19: integer-lattice PageRank over the D14 k-NN graph, unrolled
    * to `iters` CTE levels. Every step is BIGINT floor division on the
    * 1e-12 lattice — the recursion is exact, so the oracle equality is
    * bit-level with zero float drift across iterations.
    */
  def annPagerank(iters: Int, k: Int, bucketCap: Int): String = {
    val dotSC = "list_reduce([s.v[i]*c.v[i] for i in range(1, len(s.v)+1)], (x,y) -> x+y)"
    val levels = (1 to iters).map { i =>
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""f$i AS (SELECT ed.dst, CAST(SUM((85 * p.pr) // (100 * ed.outdeg)) AS BIGINT) AS inflow
         |  FROM ed JOIN $prev p ON ed.src = p.vec_id GROUP BY ed.dst),
         |p$i AS (SELECT emb.vec_id,
         |  (15 * (1000000000000 // nn.n)) // 100 + COALESCE(f$i.inflow, 0) AS pr
         |  FROM embeddings emb CROSS JOIN nn LEFT JOIN f$i ON emb.vec_id = f$i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, n2, ${bucketExprAt(0)} AS bucket FROM n),
       |corpus AS (SELECT vec_id, v, n2, bucket FROM (
       |  SELECT vec_id, v, n2, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS pn
       |  FROM nb) WHERE pn <= $bucketCap),
       |sc AS (SELECT s.vec_id AS src, c.vec_id AS dst,
       |  floor(($dotSC/(sqrt(s.n2)*sqrt(c.n2)))*1000000 + 0.5)/1000000 AS cos_r
       |  FROM nb s JOIN corpus c ON c.bucket = s.bucket AND c.vec_id <> s.vec_id),
       |kn AS (SELECT src, dst FROM (
       |  SELECT src, dst,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst ASC) AS rank
       |  FROM sc) WHERE rank <= $k),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM kn GROUP BY src),
       |ed AS (SELECT kn.src, kn.dst, deg.outdeg FROM kn JOIN deg USING (src)),
       |nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |p0 AS (SELECT vec_id, 1000000000000 // nn.n AS pr FROM embeddings CROSS JOIN nn),
       |$levels
       |SELECT vec_id, CAST(pr AS BIGINT) AS pr_e12 FROM p$iters ORDER BY vec_id""".stripMargin
  }

  /** D18: outliers past the label's r4-rounded p95 centroid distance;
    * the distance relation is D16's verbatim, nested as a subquery.
    */
  val embOutliers: String =
    s"""WITH dist AS (SELECT * FROM ($embCentroidDist)),
       |cuts AS (SELECT label AS cl,
       |  floor(quantile_cont(dist_r, 0.95)*10000 + 0.5)/10000 AS cutoff_r
       |  FROM dist GROUP BY label)
       |SELECT vec_id, label, dist_r, cutoff_r
       |FROM dist JOIN cuts ON label = cl
       |WHERE dist_r > cutoff_r
       |ORDER BY vec_id""".stripMargin

  val embNormStats: String =
    s"""WITH $normCte
       |SELECT label, COUNT(*) AS n,
       |  MIN(norm_r) AS min_norm, MAX(norm_r) AS max_norm,
       |  CAST(SUM(CAST(norm_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_norm
       |FROM (SELECT label, floor(sqrt(n2)*1000000 + 0.5)/1000000 AS norm_r FROM n)
       |GROUP BY label ORDER BY label""".stripMargin

  private def markerList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def markerCountSql(words: Seq[String]): String =
    s"len(list_filter(tk, x -> list_contains(${markerList(words)}, x)))"

  /** Langid CTE chain c → b → p (p = per-doc predicted language),
    * shared by textLangid and the composed docCurate pipeline.
    */
  private val langidCoreCtes: String = {
    val counts = TextOps.LangMarkers.map { case (l, ws) =>
      s"${markerCountSql(ws)} AS ${l}_n"
    }.mkString(",\n  ")
    val best = TextOps.LangMarkers.map { case (l, _) => s"${l}_n" }.mkString("greatest(", ", ", ")")
    val pred = TextOps.LangMarkers.map { case (l, _) =>
      s"WHEN ${l}_n = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    s"""c AS (
       |  SELECT doc_id, lang,
       |  $counts
       |  FROM (SELECT doc_id, lang, string_split(lower(text),' ') AS tk FROM documents)),
       |b AS (SELECT *, $best AS best FROM c),
       |p AS (SELECT doc_id, lang, en_n, de_n, es_n, fr_n, zh_n,
       |  CASE $pred ELSE 'und' END AS pred_lang FROM b)""".stripMargin
  }

  val textLangid: String =
    s"""WITH $langidCoreCtes
       |SELECT doc_id, lang, en_n, de_n, es_n, fr_n, zh_n, pred_lang,
       |  CAST(pred_lang = lang AS INTEGER) AS is_match
       |FROM p ORDER BY doc_id""".stripMargin

  /** Quality CTE chain base → r; the score expression is separate so
    * composing queries (docCurate) emit the identical double math.
    */
  private val qualityCoreCtes: String = {
    val allMarkers = TextOps.LangMarkers.flatMap(_._2)
    s"""base AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    len(string_split(lower(text),' ')) AS n_tokens,
       |    ${markerCountSql(allMarkers).replace("tk", "string_split(lower(text),' ')")} AS stop_n,
       |    length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS alpha_n
       |  FROM documents),
       |r AS (SELECT *, floor((stop_n/n_tokens)*1000000 + 0.5)/1000000 AS stop_ratio,
       |  floor((alpha_n/n_chars)*1000000 + 0.5)/1000000 AS alpha_ratio FROM base)""".stripMargin
  }

  private val qualityScoreExpr: String =
    "floor((least(1.0, n_tokens/100.0) * (0.5 + 0.25*stop_ratio + 0.25*alpha_ratio))*1000000 + 0.5)/1000000"

  /** E62: per-source quality-score quantiles off the deterministic
    * bottom-k row sample — B62's pattern over the E2 score chain.
    */
  def docQualityQuantileSample(k: Int): String = {
    def pick(p: String) =
      s"sv[CAST(floor($p*CAST(n_sample - 1 AS DOUBLE)+0.5) AS INTEGER)+1]"
    s"""WITH $qualityCoreCtes,
       |q AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |h AS (SELECT d.source, q.quality_score AS x,
       |  ('0x'||substr(md5('qqs:'||CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT AS hv
       |  FROM documents d JOIN q USING (doc_id)),
       |p AS (SELECT DISTINCT source, hv, x FROM h),
       |rk AS (SELECT source, x,
       |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, x) AS rn FROM p),
       |s AS (SELECT source, list(x ORDER BY x) AS sv,
       |  COUNT(*) AS n_sample FROM rk WHERE rn <= $k GROUP BY 1),
       |n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT n.source, n.n_docs, CAST(s.n_sample AS BIGINT) AS n_sample,
       |  ${pick("0.25")} AS q25, ${pick("0.50")} AS q50,
       |  ${pick("0.75")} AS q75, ${pick("0.90")} AS q90
       |FROM n JOIN s USING (source)
       |ORDER BY source""".stripMargin
  }

  /** E60: quality × dup-multiplicity cross card — E2's CTE chain +
    * C1's md5 multiplicity window, bucketed.
    */
  val docQualityVsDup: String =
    s"""WITH $qualityCoreCtes,
       |q AS (SELECT doc_id, n_chars, $qualityScoreExpr AS quality_score FROM r),
       |dn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY md5(text)) AS dup_n
       |  FROM documents),
       |b AS (SELECT q.doc_id, q.n_chars, q.quality_score,
       |  CASE WHEN dn.dup_n = 1 THEN '1_unique'
       |       WHEN dn.dup_n <= 3 THEN '2_small'
       |       ELSE '3_heavy' END AS dup_bucket
       |  FROM q JOIN dn ON dn.doc_id = q.doc_id)
       |SELECT dup_bucket, COUNT(*) AS n_docs,
       |  floor((CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_quality_r,
       |  floor((CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_chars_r
       |FROM b GROUP BY 1 ORDER BY dup_bucket""".stripMargin

  /** E38: per-source quality rollup off the shared E2 CTE chain. */
  def corpusQualityStats(minScore: Double): String =
    s"""WITH $qualityCoreCtes,
       |q AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  floor((CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_quality_r,
       |  CAST(SUM(CASE WHEN quality_score < $minScore THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       |  floor((CAST(SUM(CASE WHEN quality_score < $minScore THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS low_rate_r
       |FROM q JOIN src USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  /** E32: weighted sampling — op-for-op the Spark expressions (integer-
    * derived u, rounded ln, rounded key, doc_id tiebreak).
    */
  def docSampleWeighted(k: Int): String =
    s"""WITH $qualityCoreCtes,
       |q AS (SELECT doc_id, GREATEST($qualityScoreExpr, 0.001) AS w FROM r),
       |ky AS (SELECT doc_id, w,
       |  floor(ln((('0x'||substr(md5('ws:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 999983 + 1) / 999984.0)*1000000 + 0.5)/1000000 AS lnu_r
       |  FROM q),
       |sel AS (SELECT doc_id, w,
       |  floor((lnu_r/w)*1000000 + 0.5)/1000000 AS key_r FROM ky),
       |rk AS (SELECT doc_id, w, key_r,
       |  ROW_NUMBER() OVER (ORDER BY key_r DESC, doc_id ASC) AS rn FROM sel)
       |SELECT doc_id, w, key_r FROM rk WHERE rn <= $k
       |ORDER BY doc_id""".stripMargin

  val textQuality: String =
    s"""WITH $qualityCoreCtes
       |SELECT doc_id, n_chars, n_tokens, stop_n, alpha_n, stop_ratio, alpha_ratio,
       |  $qualityScoreExpr AS quality_score
       |FROM r ORDER BY doc_id""".stripMargin

  /** Word-bigram list per doc ("a b" strings; empty below 2 tokens) —
    * the DuckDB mirror of TextOps.bigramStrings.
    */
  private val bigramListExpr: String =
    "CASE WHEN len(tk) >= 2 THEN [array_to_string(tk[i:i+1],' ') for i in range(1, len(tk))] ELSE []::VARCHAR[] END"

  def textRepetition(dupTokMax: Double, topTokMax: Double, dupBigramMax: Double): String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk FROM documents),
       |b2 AS (SELECT doc_id,
       |  len(tk) AS n_tokens,
       |  len(list_distinct(tk)) AS n_distinct_tokens,
       |  len($bigramListExpr) AS n_bigrams,
       |  len(list_distinct($bigramListExpr)) AS n_distinct_bigrams
       |  FROM t),
       |tc AS (SELECT doc_id, tok, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY doc_id, tok),
       |top AS (SELECT doc_id, MAX(c) AS top_token_n FROM tc GROUP BY doc_id),
       |f AS (SELECT b2.doc_id, n_tokens, n_distinct_tokens, top_token_n,
       |  n_bigrams, n_distinct_bigrams,
       |  floor(((n_tokens - n_distinct_tokens)/n_tokens)*1000000 + 0.5)/1000000 AS dup_token_frac,
       |  floor((top_token_n/n_tokens)*1000000 + 0.5)/1000000 AS top_token_frac,
       |  CASE WHEN n_bigrams = 0 THEN 0.0
       |       ELSE floor(((n_bigrams - n_distinct_bigrams)/n_bigrams)*1000000 + 0.5)/1000000 END AS dup_bigram_frac
       |  FROM b2 JOIN top USING (doc_id))
       |SELECT doc_id, n_tokens, n_distinct_tokens, top_token_n, n_bigrams, n_distinct_bigrams,
       |  dup_token_frac, top_token_frac, dup_bigram_frac,
       |  CAST(dup_token_frac > $dupTokMax OR top_token_frac > $topTokMax
       |    OR dup_bigram_frac > $dupBigramMax AS INTEGER) AS repetitive
       |FROM f ORDER BY doc_id""".stripMargin

  def textCollocations(minCount: Int, topK: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk FROM documents),
       |bge AS (SELECT unnest($bigramListExpr) AS bg FROM t),
       |bgc AS (SELECT bg, COUNT(*) AS c_ab FROM bge GROUP BY bg),
       |uc AS (SELECT tok, COUNT(*) AS c
       |  FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY tok),
       |tot AS (SELECT SUM(len(tk)) AS n_tok, SUM(greatest(len(tk)-1, 0)) AS n_big FROM t),
       |j AS (SELECT string_split(bg,' ')[1] AS w1, string_split(bg,' ')[2] AS w2, c_ab
       |  FROM bgc WHERE c_ab >= $minCount),
       |k AS (SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b
       |  FROM j JOIN uc a ON a.tok = j.w1 JOIN uc b ON b.tok = j.w2)
       |SELECT w1, w2, c_ab, c_a, c_b,
       |  floor(((c_ab::DOUBLE * n_tok * n_tok) / (n_big::DOUBLE * c_a * c_b))*1000000 + 0.5)/1000000 AS lift
       |FROM k, tot
       |ORDER BY lift DESC, c_ab DESC, w1, w2 LIMIT $topK""".stripMargin

  /** Fingerprint-overlap pairs: 0-mod-p sampled shingle hashes as
    * fingerprints, pairs sharing ≥ minShared; fingerprints held by
    * more than dfCap documents generate no pairs (same cap as the
    * Spark side's stop-set anti-join).
    */
  def docFingerprintPairs(mod: Int, minShared: Int, dfCap: Int): String =
    s"""WITH $gramCtes,
       |fp AS (SELECT doc_id, h0 FROM h WHERE h0 % $mod = 0),
       |keep AS (SELECT h0 FROM fp GROUP BY h0 HAVING COUNT(*) <= $dfCap),
       |fpk AS (SELECT fp.doc_id, fp.h0 FROM fp JOIN keep USING (h0))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |FROM fpk a JOIN fpk b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $minShared
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The composed curation pipeline: quality + langid + exact-dedup
    * canonical, one verdict row per document.
    */
  def docCurate(minScore: Double): String =
    s"""WITH $qualityCoreCtes,
       |$langidCoreCtes,
       |qual AS (SELECT doc_id, n_tokens, $qualityScoreExpr AS quality_score FROM r),
       |k AS (SELECT doc_id,
       |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS INTEGER) AS duplicate
       |  FROM (SELECT doc_id, md5(text) AS content_hash FROM documents))
       |SELECT qual.doc_id, lang, pred_lang, n_tokens, quality_score,
       |  CAST(quality_score < $minScore AS INTEGER) AS low_quality,
       |  CAST(pred_lang <> lang AS INTEGER) AS lang_mismatch,
       |  duplicate,
       |  CAST(quality_score >= $minScore AND pred_lang = lang AND duplicate = 0 AS INTEGER) AS keep
       |FROM qual JOIN p USING (doc_id) JOIN k USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** E52: ordered curation funnel — every doc attributed to exactly
    * one drop stage (pipeline order), counts + corpus shares; the C7
    * cluster CTEs + the nested E14 curate relation + the C15 keeper
    * window.
    */
  def docCurationFunnel(minScore: Double): String =
    s"""WITH RECURSIVE $clusterCtes,
       |cur AS (SELECT * FROM (${docCurate(minScore)})),
       |cl AS (SELECT d.doc_id, COALESCE(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |sc AS (SELECT cur.doc_id, cur.quality_score, cur.low_quality,
       |  cur.lang_mismatch, cur.duplicate, cl.cluster
       |  FROM cur JOIN cl USING (doc_id)),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |  PARTITION BY cluster ORDER BY quality_score DESC, doc_id) AS rn FROM sc),
       |st AS (SELECT CASE
       |    WHEN low_quality = 1 THEN '2_low_quality'
       |    WHEN lang_mismatch = 1 THEN '3_lang_mismatch'
       |    WHEN duplicate = 1 THEN '4_exact_dup'
       |    WHEN rn <> 1 THEN '5_near_dup'
       |    ELSE '6_kept' END AS stage FROM rk),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM st)
       |SELECT stage, COUNT(*) AS n_docs,
       |  floor((CAST(COUNT(*) AS DOUBLE)/CAST(MIN(tot) AS DOUBLE))*1000000 + 0.5)/1000000 AS share_r
       |FROM st, tot GROUP BY stage ORDER BY stage""".stripMargin

  /** E53: text × embedding cross-modal card — nested D16 distance
    * relation + E2 quality CTEs + the dup window, rolled per label.
    */
  def docTextEmbeddingCard: String = {
    def dmean(c: String) =
      s"floor((CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    s"""WITH dist AS (SELECT * FROM ($embCentroidDist)),
       |$qualityCoreCtes,
       |q AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |dp AS (SELECT doc_id,
       |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS dup
       |  FROM documents)
       |SELECT dist.label, COUNT(*) AS n_docs,
       |  ${dmean("quality_score")} AS mean_quality_r,
       |  ${dmean("dist_r")} AS mean_dist_r,
       |  floor((CAST(SUM(dup) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS dup_share_r
       |FROM dist JOIN q ON q.doc_id = dist.vec_id
       |JOIN dp ON dp.doc_id = dist.vec_id
       |GROUP BY 1 ORDER BY label""".stripMargin
  }

  /** E43: drop-reason combination matrix over the curate relation. */
  def docCurateExplain(minScore: Double): String =
    s"""WITH cur AS (SELECT * FROM (${docCurate(minScore)})),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM cur)
       |SELECT low_quality, lang_mismatch, duplicate,
       |  COUNT(*) AS n_docs,
       |  floor((CAST(COUNT(*) AS DOUBLE) / CAST(MIN(tot) AS DOUBLE))*1000000 + 0.5)/1000000 AS share_r
       |FROM cur, t
       |GROUP BY low_quality, lang_mismatch, duplicate
       |ORDER BY low_quality, lang_mismatch, duplicate""".stripMargin

  val textTokencount: String =
    """SELECT doc_id,
      |  len(string_split(text,' ')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS re_tokens,
      |  CAST(ceil(length(text)/4.0) AS BIGINT) AS est_bpe
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BM25 vs a literal query-term set. Every arithmetic step is spelled
    * op-for-op as the Spark expression (same parenthesization, same
    * literal values via Scala double toString) so the r6'd score is
    * engine-portable; tf/dl stay integer until IEEE-exact promotion.
    */
  def textBm25(terms: Seq[String], k1: Double, b: Double): String = {
    val (k1p1, oneMinusB) = (k1 + 1, 1 - b)
    val tfDefs = terms.map(t => s"len(list_filter(tk, x -> x = '$t')) AS tf_$t").mkString(", ")
    val dfDefs = terms
      .map(t => s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(", ")
    val contribs = terms.map(t =>
        s"ln(1.0 + (n - df_$t + 0.5)/(df_$t + 0.5)) * (tf_$t*$k1p1)/(tf_$t + $k1*($oneMinusB + $b*dl/avgdl))")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk FROM documents),
       |f AS (SELECT doc_id, len(tk) AS dl, $tfDefs FROM t),
       |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |  CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl, $dfDefs FROM f)
       |SELECT doc_id, dl, ${terms.map(t => s"tf_$t").mkString(", ")},
       |  floor(($contribs)*1000000 + 0.5)/1000000 AS bm25_r
       |FROM f, s ORDER BY doc_id""".stripMargin
  }

  /** Unigram-LM scoring: per-token log-probs r6-rounded then summed
    * through DECIMAL(18,6) per doc (order-independent).
    */
  private val dtcCte: String =
    """t AS (SELECT doc_id, string_split(lower(text),' ') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
      |dtc AS (SELECT doc_id, w, COUNT(*) AS c_dw FROM tok GROUP BY doc_id, w)""".stripMargin

  /** Per-doc top-k TF-IDF keywords off the shared (doc, term) stage. */
  def textKeywords(k: Int): String =
    s"""WITH $dtcCte,
       |dfr AS (SELECT w, COUNT(*) AS df FROM dtc GROUP BY w),
       |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
       |s AS (SELECT dtc.doc_id, dtc.w AS term,
       |  floor((dtc.c_dw * ln(nd.nd/dfr.df))*1000000 + 0.5)/1000000 AS tfidf_r
       |  FROM dtc JOIN dfr USING (w), nd),
       |r AS (SELECT doc_id, term, tfidf_r,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, term) AS rank FROM s)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf_r FROM r WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin

  private val logprobCte: String =
    s"""$dtcCte,
      |vc AS (SELECT w, CAST(SUM(c_dw) AS BIGINT) AS c FROM dtc GROUP BY w),
      |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tt FROM vc),
      |lp AS (SELECT w, floor(ln(CAST(c AS DOUBLE)/tt)*1000000 + 0.5)/1000000 AS lp_r FROM vc, tot),
      |d AS (SELECT dtc.doc_id, dtc.c_dw, lp.lp_r FROM dtc JOIN lp USING (w)),
      |lpq AS (SELECT doc_id, CAST(SUM(c_dw) AS BIGINT) AS n_tokens,
      |  CAST(SUM(c_dw * CAST(lp_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_lp,
      |  floor((CAST(SUM(c_dw * CAST(lp_r AS DECIMAL(18,6))) AS DOUBLE)/SUM(c_dw))*1000000 + 0.5)/1000000 AS mean_lp_r
      |FROM d GROUP BY doc_id)""".stripMargin

  val textUnigramLogprob: String =
    s"""WITH $logprobCte
       |SELECT doc_id, n_tokens, sum_lp, mean_lp_r FROM lpq ORDER BY doc_id""".stripMargin

  /** E31: bigram-LM scoring — E23's determinism convention over
    * conditional add-one probabilities ln((cb+1)/(cu+V)).
    */
  val textBigramLogprob: String =
    s"""WITH t2 AS (SELECT doc_id, string_split(lower(text),' ') AS tk FROM documents),
       |bgx AS (SELECT doc_id, unnest($bigramListExpr) AS bg FROM t2),
       |db AS (SELECT doc_id, bg, COUNT(*) AS c_db FROM bgx GROUP BY doc_id, bg),
       |bc AS (SELECT bg, CAST(SUM(c_db) AS BIGINT) AS cb FROM db GROUP BY bg),
       |cu AS (SELECT split_part(bg, ' ', 1) AS prev, CAST(SUM(cb) AS BIGINT) AS cu
       |  FROM bc GROUP BY 1),
       |vv AS (SELECT COUNT(DISTINCT split_part(bg, ' ', 2)) AS v FROM bc),
       |lp AS (SELECT bg,
       |  floor(ln(CAST(cb + 1 AS DOUBLE)/CAST(cu.cu + vv.v AS DOUBLE))*1000000 + 0.5)/1000000 AS lp_r
       |  FROM bc JOIN cu ON split_part(bc.bg, ' ', 1) = cu.prev, vv)
       |SELECT db.doc_id, CAST(SUM(c_db) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(c_db * CAST(lp_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_lp,
       |  floor((CAST(SUM(c_db * CAST(lp_r AS DECIMAL(18,6))) AS DOUBLE)/SUM(c_db))*1000000 + 0.5)/1000000 AS mean_lp_r
       |FROM db JOIN lp USING (bg)
       |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin

  /** E59: reference-model perplexity — add-one bigram LM from the
    * trusted source only, LEFT-join scoring with the 0-count backoff,
    * mean r6'd before exp, per-source decimal-routed rollup.
    */
  def docPplReference(refSource: String, pplMax: Double): String =
    s"""WITH t2 AS (SELECT doc_id, source, string_split(lower(text),' ') AS tk FROM documents),
       |bgx AS (SELECT doc_id, source, unnest($bigramListExpr) AS bg FROM t2),
       |db AS (SELECT doc_id, source, bg, COUNT(*) AS c_db FROM bgx GROUP BY 1, 2, 3),
       |rb AS (SELECT bg, CAST(SUM(c_db) AS BIGINT) AS cb FROM db WHERE source = '$refSource' GROUP BY bg),
       |rc AS (SELECT split_part(bg, ' ', 1) AS prev, CAST(SUM(cb) AS BIGINT) AS cu FROM rb GROUP BY 1),
       |vv AS (SELECT COUNT(DISTINCT split_part(bg, ' ', 2)) AS v FROM rb),
       |lp AS (SELECT db.doc_id, db.source, db.c_db,
       |  floor(ln(CAST(COALESCE(rb.cb, 0) + 1 AS DOUBLE)/CAST(COALESCE(rc.cu, 0) + vv.v AS DOUBLE))*1000000 + 0.5)/1000000 AS lp_r
       |  FROM db LEFT JOIN rb USING (bg)
       |  LEFT JOIN rc ON split_part(db.bg, ' ', 1) = rc.prev, vv),
       |pd AS (SELECT doc_id, source, CAST(SUM(c_db) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(c_db * CAST(lp_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_lp
       |  FROM lp GROUP BY 1, 2),
       |pp AS (SELECT source,
       |  floor(exp(-(floor((sum_lp/n_bigrams)*1000000 + 0.5)/1000000))*1000000 + 0.5)/1000000 AS ppl_r
       |  FROM pd)
       |SELECT source, COUNT(*) AS n_docs,
       |  floor((CAST(SUM(CAST(ppl_r AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_ppl_r,
       |  floor((CAST(SUM(CASE WHEN ppl_r > $pplMax THEN 1 ELSE 0 END) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS p_filtered_r
       |FROM pp GROUP BY source ORDER BY source""".stripMargin

  /** CCNet-style head/middle/tail bucketing by unigram-logprob
    * percentiles; thresholds from a deterministic hash-bounded sample
    * (exact interpolated percentile over a BOUNDED set).
    */
  def docQualityBucket(sampleK: Int): String =
    s"""WITH $logprobCte,
       |sk AS (SELECT doc_id, mean_lp_r FROM lpq
       |  ORDER BY ('0x'||substr(md5('qb:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT, doc_id
       |  LIMIT $sampleK),
       |th AS (SELECT
       |  floor(quantile_cont(mean_lp_r, 0.333333)*10000 + 0.5)/10000 AS p33,
       |  floor(quantile_cont(mean_lp_r, 0.666667)*10000 + 0.5)/10000 AS p67 FROM sk)
       |SELECT doc_id, mean_lp_r,
       |  CASE WHEN mean_lp_r >= p67 THEN 'head'
       |       WHEN mean_lp_r >= p33 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM lpq, th ORDER BY doc_id""".stripMargin

  /** E30: hashed linear classifier scoring — top-V vocab by frequency
    * carries integer milli-weights (perm-0 affine over the portable
    * hash); exact long sum, one double division, rational fast
    * sigmoid — op-for-op the Spark expression.
    */
  def docQualityModel(vocabV: Int, bias: Double): String = {
    val (a, b) = Hashing.Perms(0)
    s"""WITH tk AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
       |vocab AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token
       |  ORDER BY cnt DESC, token LIMIT $vocabV),
       |w AS (SELECT token,
       |  ($a*((('0x'||substr(md5(token),1,15))::BIGINT)%${Hashing.M30})+$b)%${Hashing.P}%2001 - 1000 AS w_milli
       |  FROM vocab),
       |d AS (SELECT tk.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(w.w_milli, 0)) AS BIGINT) AS swm
       |  FROM tk LEFT JOIN w USING (token) GROUP BY tk.doc_id),
       |zz AS (SELECT doc_id, n_tokens, $bias + (swm/1000.0)/n_tokens AS z FROM d)
       |SELECT doc_id, n_tokens,
       |  floor(z*1000000 + 0.5)/1000000 AS z_r,
       |  floor((z/(2.0*(1.0+abs(z))) + 0.5)*1000000 + 0.5)/1000000 AS score_r,
       |  CAST(z >= 0 AS INTEGER) AS keep
       |FROM zz ORDER BY doc_id""".stripMargin
  }

  /** E30t: trained quality-model scoring — the E30 scoring chain with
    * weights from one exact logistic-gradient step over E14's keep
    * verdicts (w_milli = ⌊1000·grad/cnt⌋, grad = Σ occurrences·(2y−1)),
    * op-for-op the Spark expressions so the trained weights hash-gate.
    */
  def docQualityModelTrained(vocabV: Int, bias: Double, minScore: Double): String =
    s"""WITH $qualityCoreCtes,
       |$langidCoreCtes,
       |qual AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |dup AS (SELECT doc_id,
       |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS INTEGER) AS duplicate
       |  FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)),
       |lbl AS (SELECT qual.doc_id,
       |  CAST(quality_score >= $minScore AND pred_lang = lang AND duplicate = 0 AS INTEGER) AS y
       |  FROM qual JOIN p USING (doc_id) JOIN dup USING (doc_id)),
       |tk AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
       |vocab AS (SELECT token, COUNT(*) AS cnt, CAST(SUM(2*y - 1) AS BIGINT) AS grad
       |  FROM tk JOIN lbl USING (doc_id) GROUP BY token
       |  ORDER BY cnt DESC, token LIMIT $vocabV),
       |w AS (SELECT token, CAST(floor(1000.0*grad/cnt) AS BIGINT) AS w_milli FROM vocab),
       |d AS (SELECT tk.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(w.w_milli, 0)) AS BIGINT) AS swm
       |  FROM tk LEFT JOIN w USING (token) GROUP BY tk.doc_id),
       |zz AS (SELECT doc_id, n_tokens, $bias + (swm/1000.0)/n_tokens AS z FROM d)
       |SELECT doc_id, n_tokens,
       |  floor(z*1000000 + 0.5)/1000000 AS z_r,
       |  floor((z/(2.0*(1.0+abs(z))) + 0.5)*1000000 + 0.5)/1000000 AS score_r,
       |  CAST(z >= 0 AS INTEGER) AS keep
       |FROM zz ORDER BY doc_id""".stripMargin

  /** E58: reliability diagram + ECE — the trained scorer's chain,
    * fixed-width probability bins, r6'd means/gaps, ECE broadcast.
    */
  def docQualityCalibration(vocabV: Int, bias: Double, minScore: Double,
      nBins: Int): String =
    s"""WITH $qualityCoreCtes,
       |$langidCoreCtes,
       |qual AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |dup AS (SELECT doc_id,
       |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS INTEGER) AS duplicate
       |  FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)),
       |lbl AS (SELECT qual.doc_id,
       |  CAST(quality_score >= $minScore AND pred_lang = lang AND duplicate = 0 AS INTEGER) AS y
       |  FROM qual JOIN p USING (doc_id) JOIN dup USING (doc_id)),
       |tk AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
       |vocab AS (SELECT token, COUNT(*) AS cnt, CAST(SUM(2*y - 1) AS BIGINT) AS grad
       |  FROM tk JOIN lbl USING (doc_id) GROUP BY token
       |  ORDER BY cnt DESC, token LIMIT $vocabV),
       |w AS (SELECT token, CAST(floor(1000.0*grad/cnt) AS BIGINT) AS w_milli FROM vocab),
       |d AS (SELECT tk.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(w.w_milli, 0)) AS BIGINT) AS swm
       |  FROM tk LEFT JOIN w USING (token) GROUP BY tk.doc_id),
       |zz AS (SELECT doc_id, $bias + (swm/1000.0)/n_tokens AS z FROM d),
       |sc AS (SELECT doc_id,
       |  floor((z/(2.0*(1.0+abs(z))) + 0.5)*1000000 + 0.5)/1000000 AS score_r FROM zz),
       |rng AS (SELECT MIN(score_r) AS mn, MAX(score_r) AS mx FROM sc),
       |bj AS (SELECT sc.doc_id,
       |  CASE WHEN rng.mx = rng.mn THEN 0
       |    ELSE LEAST(${nBins - 1},
       |      CAST(floor((score_r - rng.mn) / (rng.mx - rng.mn) * $nBins) AS BIGINT)) END AS bin,
       |  score_r, lbl.y FROM sc JOIN lbl USING (doc_id), rng),
       |cal AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  floor((CAST(SUM(CAST(score_r AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_pred_r,
       |  floor((CAST(SUM(y) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS pos_rate_r
       |  FROM bj GROUP BY bin),
       |cal2 AS (SELECT bin, n_docs, mean_pred_r, pos_rate_r,
       |  floor(abs(mean_pred_r - pos_rate_r)*1000000 + 0.5)/1000000 AS gap_r FROM cal),
       |ece AS (SELECT
       |  floor((CAST(SUM(CAST(gap_r AS DECIMAL(18,6)) * n_docs) AS DOUBLE) /
       |    CAST(SUM(n_docs) AS DOUBLE))*1000000 + 0.5)/1000000 AS ece_r FROM cal2)
       |SELECT bin, n_docs, mean_pred_r, pos_rate_r, gap_r, ece_r
       |FROM cal2, ece ORDER BY bin""".stripMargin

  /** E49: confusion matrix of the trained model's keep vs its E14
    * weak labels — same CTE chain as the trained scorer, one 4-counter
    * aggregate, single guarded divisions.
    */
  def docQualityModelEval(vocabV: Int, bias: Double, minScore: Double): String = {
    def ratio(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN floor((CAST($num AS DOUBLE)/CAST($den AS DOUBLE))*1000000 + 0.5)/1000000 END"
    s"""WITH $qualityCoreCtes,
       |$langidCoreCtes,
       |qual AS (SELECT doc_id, $qualityScoreExpr AS quality_score FROM r),
       |dup AS (SELECT doc_id,
       |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS INTEGER) AS duplicate
       |  FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)),
       |lbl AS (SELECT qual.doc_id,
       |  CAST(quality_score >= $minScore AND pred_lang = lang AND duplicate = 0 AS INTEGER) AS y
       |  FROM qual JOIN p USING (doc_id) JOIN dup USING (doc_id)),
       |tk AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
       |vocab AS (SELECT token, COUNT(*) AS cnt, CAST(SUM(2*y - 1) AS BIGINT) AS grad
       |  FROM tk JOIN lbl USING (doc_id) GROUP BY token
       |  ORDER BY cnt DESC, token LIMIT $vocabV),
       |w AS (SELECT token, CAST(floor(1000.0*grad/cnt) AS BIGINT) AS w_milli FROM vocab),
       |d AS (SELECT tk.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(w.w_milli, 0)) AS BIGINT) AS swm
       |  FROM tk LEFT JOIN w USING (token) GROUP BY tk.doc_id),
       |pred AS (SELECT doc_id,
       |  CAST($bias + (swm/1000.0)/n_tokens >= 0 AS INTEGER) AS pred_keep FROM d),
       |cm AS (SELECT
       |  CAST(SUM(CASE WHEN pred_keep = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN pred_keep = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN pred_keep = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN pred_keep = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM pred JOIN lbl USING (doc_id))
       |SELECT tp, fp, fn, tn,
       |  ${ratio("tp", "tp + fp")} AS precision_r,
       |  ${ratio("tp", "tp + fn")} AS recall_r,
       |  ${ratio("tp + tn", "tp + fp + fn + tn")} AS accuracy_r,
       |  ${ratio("2*tp", "2*tp + fp + fn")} AS f1_r
       |FROM cm""".stripMargin
  }

  /** Temperature mixture weights: r6'd share^τ decimal-normalized. */
  def docMixWeights(temperature: Double): String =
    s"""WITH s AS (SELECT source, CAST(SUM(len(string_split(lower(text),' '))) AS BIGINT) AS toks
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(toks) AS DOUBLE) AS tt FROM s),
       |w AS (SELECT source, toks, CAST(toks AS DOUBLE)/tt AS share,
       |  floor(power(CAST(toks AS DOUBLE)/tt, $temperature)*1000000 + 0.5)/1000000 AS wgt_r FROM s, tot),
       |sw AS (SELECT CAST(SUM(CAST(wgt_r AS DECIMAL(18,6))) AS DOUBLE) AS sumw FROM w)
       |SELECT source, toks, floor(share*1000000 + 0.5)/1000000 AS share_r, wgt_r,
       |  floor((wgt_r/sumw)*1000000 + 0.5)/1000000 AS norm_weight_r,
       |  floor((wgt_r/sumw/share)*1000000 + 0.5)/1000000 AS boost_r
       |FROM w, sw ORDER BY source""".stripMargin

  /** Winnowing fingerprints: sliding min over the positional 4-gram
    * hash list, distinct per doc.
    */
  def textWinnow(w: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(tk) >= 4
       |  THEN [('0x'||substr(md5(array_to_string(tk[i:i+3],' ')),1,15))::BIGINT for i in range(1, len(tk)-2)]
       |  ELSE [('0x'||substr(md5(lt),1,15))::BIGINT] END AS gh FROM t),
       |wins AS (SELECT doc_id, unnest(CASE WHEN len(gh) >= $w
       |  THEN [list_min(gh[i:i+${w - 1}]) for i in range(1, len(gh)-${w - 2})]
       |  ELSE [list_min(gh)] END) AS fingerprint FROM g)
       |SELECT DISTINCT doc_id, fingerprint FROM wins
       |ORDER BY doc_id, fingerprint""".stripMargin

  /** Winnow-indexed near-dup pairs: C10's join over the E28 index. */
  def docWinnowPairs(w: Int, minShared: Int, dfCap: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(tk) >= 4
       |  THEN [('0x'||substr(md5(array_to_string(tk[i:i+3],' ')),1,15))::BIGINT for i in range(1, len(tk)-2)]
       |  ELSE [('0x'||substr(md5(lt),1,15))::BIGINT] END AS gh FROM t),
       |wins AS (SELECT DISTINCT doc_id, fingerprint FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(gh) >= $w
       |    THEN [list_min(gh[i:i+${w - 1}]) for i in range(1, len(gh)-${w - 2})]
       |    ELSE [list_min(gh)] END) AS fingerprint FROM g)),
       |stop AS (SELECT fingerprint FROM wins GROUP BY fingerprint HAVING COUNT(*) > $dfCap),
       |fp AS (SELECT * FROM wins WHERE fingerprint NOT IN (SELECT fingerprint FROM stop))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $minShared
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Duplicated-span ratio: 4-token sliding-window hashes (whole-text
    * fallback below 4 tokens, mirroring GramHashes), corpus-wide span
    * frequency, per-doc dup occurrence counts — integer math until the
    * final r6'd ratio.
    */
  val docSpanDedup: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
      |sp AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 4
      |  THEN [('0x'||substr(md5(array_to_string(tk[i:i+3],' ')),1,15))::BIGINT for i in range(1, len(tk)-2)]
      |  ELSE [('0x'||substr(md5(lt),1,15))::BIGINT] END) AS h FROM t),
      |c AS (SELECT doc_id, h, COUNT(*) AS c_sp FROM sp GROUP BY doc_id, h),
      |dfh AS (SELECT h, CAST(SUM(c_sp) AS BIGINT) AS df FROM c GROUP BY h),
      |d AS (SELECT c.doc_id, c.c_sp, dfh.df FROM c JOIN dfh USING (h))
      |SELECT doc_id, CAST(SUM(c_sp) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN df >= 2 THEN c_sp ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |  floor((CAST(SUM(CASE WHEN df >= 2 THEN c_sp ELSE 0 END) AS DOUBLE)/SUM(c_sp))*1000000 + 0.5)/1000000 AS dup_ratio_r
      |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** E24b: span removal — positions ride a struct-list comprehension
    * (0-based to match posexplode); the rewrite is the same
    * anti-join + ordered string_agg the Spark side performs.
    */
  val docSpanRemoval: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS otk, string_split(lower(text), ' ') AS tk FROM documents),
      |sp AS (SELECT doc_id, unnest([{'pos': i - 1, 'h': ('0x'||substr(md5(array_to_string(tk[i:i+3],' ')),1,15))::BIGINT} for i in range(1, len(tk)-2)]) AS s
      |       FROM t WHERE len(tk) >= 4),
      |sp2 AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM sp),
      |dfh AS (SELECT h, COUNT(*) AS df FROM sp2 GROUP BY h),
      |dup AS (SELECT sp2.doc_id, sp2.pos FROM sp2 JOIN dfh USING (h) WHERE df >= 2),
      |cov AS (SELECT DISTINCT doc_id, pos + o AS j FROM dup, (SELECT unnest([0,1,2,3]) AS o) u),
      |tokx AS (SELECT doc_id, unnest(range(1, len(otk)+1)) AS j1, otk FROM t),
      |tok AS (SELECT doc_id, CAST(j1 AS INTEGER) - 1 AS j, otk[CAST(j1 AS INTEGER)] AS tok FROM tokx),
      |kept AS (SELECT tok.doc_id, tok.j, tok.tok FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j WHERE cov.j IS NULL),
      |rw AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS text_clean, COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id, COALESCE(rw.text_clean, '') AS text_clean,
      |  CAST(len(t.otk) AS BIGINT) AS n_tokens,
      |  CAST(len(t.otk) - COALESCE(rw.n_kept, 0) AS BIGINT) AS n_removed
      |FROM t LEFT JOIN rw ON t.doc_id = rw.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** F20: JOINT cross-modal dedup — the C5 verified-jaccard text pairs
    * and the F6b banded-hamming perceptual pairs unioned into one
    * symmetric edge relation, then the shared C7 recursive transitive
    * closure; a component may chain edges of both kinds. CTE chains
    * are disjoint by name (gram: t/g/h/cand/sizes/common; dhash:
    * b/bs/ph/chx).
    */
  def mmJointDedup(maxHamming: Int): String =
    s"""WITH RECURSIVE $gramCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |tedges AS ($jaccardSelect),
       |$dhashCtes,
       |chx AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |iedges AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM chx a JOIN chx b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM tedges
       |  UNION SELECT doc_b, doc_a FROM tedges
       |  UNION SELECT doc_a, doc_b FROM iedges
       |  UNION SELECT doc_b, doc_a FROM iedges),
       |reach AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
       |),
       |mins AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
       |  FROM reach GROUP BY src)
       |SELECT d.doc_id,
       |  COALESCE(m.cluster, d.doc_id) AS cluster,
       |  CAST(COALESCE(m.cluster, d.doc_id) = d.doc_id AS INTEGER) AS is_canonical
       |FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** F6c: transitive closure over the banded-hamming pair graph — the
    * C7 recursive-CTE shape on dhash pairs.
    */
  def mmPhashClusters(maxHamming: Int): String =
    s"""WITH RECURSIVE $dhashCtes,
       |chx AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |edges AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM chx a JOIN chx b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
       |),
       |mins AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
       |  FROM reach GROUP BY src)
       |SELECT d.doc_id,
       |  COALESCE(m.cluster, d.doc_id) AS cluster,
       |  CAST(COALESCE(m.cluster, d.doc_id) = d.doc_id AS INTEGER) AS is_canonical
       |FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** F9: keep-best (largest bytes, tie → lowest id) per F6c cluster. */
  def mmDedupKeepBest(maxHamming: Int): String =
    s"""WITH RECURSIVE $dhashCtes,
       |chx AS (SELECT doc_id, phash, j, (phash >> (15*j)) & 32767 AS chunk_val
       |  FROM ph, (SELECT unnest([0,1,2,3]) AS j)),
       |edges AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM chx a JOIN chx b ON a.j = b.j AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |  WHERE CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) <= $maxHamming),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
       |),
       |mins AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |scored AS (SELECT d.doc_id,
       |    COALESCE(m.cluster, d.doc_id) AS cluster,
       |    octet_length(d.text::BLOB) AS n_bytes
       |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
       |keepers AS (SELECT cluster, doc_id AS keeper FROM (
       |  SELECT cluster, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY cluster
       |      ORDER BY n_bytes DESC, doc_id ASC) AS rn
       |  FROM scored) WHERE rn = 1)
       |SELECT s.doc_id, s.cluster, s.n_bytes, k.keeper,
       |  CAST(s.doc_id = k.keeper AS INTEGER) AS keep
       |FROM scored s JOIN keepers k ON s.cluster = k.cluster
       |ORDER BY s.doc_id""".stripMargin

  val textFingerprint: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS tk, lower(text) AS lt FROM documents),
      |w AS (SELECT doc_id, unnest(CASE WHEN len(tk)>=5
      |  THEN [array_to_string(tk[i:i+4],' ') for i in range(1,len(tk)-3)]
      |  ELSE [lt] END) AS win FROM t),
      |fp AS (SELECT doc_id, MIN(('0x'||substr(md5(win),1,15))::BIGINT) AS fingerprint
      |  FROM w GROUP BY doc_id)
      |SELECT doc_id, fingerprint,
      |  COUNT(*) OVER (PARTITION BY fingerprint) AS cluster_size
      |FROM fp ORDER BY doc_id""".stripMargin

  /** B50: KMV set-operation estimates — sketches as k-minimum order
    * statistics (B47's CTEs), θ-truncated union/intersection counts
    * relationally, exact pair overlaps from the distinct (type, user)
    * relation; every estimate is the same two double ops as Spark.
    */
  def qKmvSetOps(k: Int): String = {
    val h0 = "('0x'||substr(md5('kmv:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT"
    s"""WITH hv AS (SELECT DISTINCT event_type, $h0 AS hv FROM events),
       |r AS (SELECT event_type, hv,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
       |  COUNT(*) OVER (PARTITION BY event_type) AS nd FROM hv),
       |sk AS (SELECT event_type, hv FROM r WHERE rn <= $k),
       |th AS (SELECT event_type,
       |  CASE WHEN MAX(nd) >= $k THEN MAX(CASE WHEN rn <= $k THEN hv END)
       |       ELSE 1152921504606846976 END AS theta
       |  FROM r GROUP BY 1),
       |ty AS (SELECT DISTINCT event_type FROM events),
       |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |  LEAST(tha.theta, thb.theta) AS theta
       |  FROM ty a JOIN ty b ON a.event_type < b.event_type
       |  JOIN th tha ON tha.event_type = a.event_type
       |  JOIN th thb ON thb.event_type = b.event_type),
       |uni AS (SELECT p.type_a, p.type_b, COUNT(DISTINCT s.hv) AS u_cnt
       |  FROM pr p JOIN sk s ON s.event_type IN (p.type_a, p.type_b) AND s.hv < p.theta
       |  GROUP BY 1, 2),
       |intr AS (SELECT p.type_a, p.type_b, COUNT(*) AS i_cnt
       |  FROM pr p JOIN sk sa ON sa.event_type = p.type_a AND sa.hv < p.theta
       |  JOIN sk sb ON sb.event_type = p.type_b AND sb.hv = sa.hv
       |  GROUP BY 1, 2),
       |du AS (SELECT DISTINCT event_type, user_id FROM events),
       |nx AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
       |ei AS (SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_inter_x
       |  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT p.type_a, p.type_b,
       |  CAST(na.n + nb.n - COALESCE(ei.n_inter_x, 0) AS BIGINT) AS n_union,
       |  CAST(COALESCE(ei.n_inter_x, 0) AS BIGINT) AS n_inter,
       |  floor((CAST(uni.u_cnt AS DOUBLE) * 1152921504606846976.0 / CAST(p.theta AS DOUBLE))*1000000 + 0.5)/1000000 AS est_union_r,
       |  floor((CAST(COALESCE(intr.i_cnt, 0) AS DOUBLE) * 1152921504606846976.0 / CAST(p.theta AS DOUBLE))*1000000 + 0.5)/1000000 AS est_inter_r,
       |  floor((CAST(COALESCE(intr.i_cnt, 0) AS DOUBLE) / CAST(uni.u_cnt AS DOUBLE))*1000000 + 0.5)/1000000 AS est_jaccard_r
       |FROM pr p
       |JOIN uni ON uni.type_a = p.type_a AND uni.type_b = p.type_b
       |LEFT JOIN intr ON intr.type_a = p.type_a AND intr.type_b = p.type_b
       |JOIN nx na ON na.event_type = p.type_a
       |JOIN nx nb ON nb.event_type = p.type_b
       |LEFT JOIN ei ON ei.type_a = p.type_a AND ei.type_b = p.type_b
       |ORDER BY p.type_a, p.type_b""".stripMargin
  }

  /** B49: cheapest supplier per part (TPC-H Q2 correlated-min shape):
    * per-(part, supplier) min unit price, per-part argmin with
    * lowest-suppkey ties — MIN of per-row double divisions is
    * order-free, so the only rounding is the display r6.
    */
  /** B54: value-based RANGE frame — trailing `days`-day order totals
    * per customer over the integer day key, frame sums DECIMAL-routed.
    */
  def qRangeFrame(days: Int): String =
    s"""SELECT o_custkey, o_orderkey,
       |  epoch_us(o_orderdate) // 86400000000 AS day_n,
       |  CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trail_sum,
       |  floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) /
       |    CAST(COUNT(*) OVER w AS DOUBLE))*1000000 + 0.5)/1000000 AS trail_avg_r
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000
       |  RANGE BETWEEN ${days - 1} PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, day_n, o_orderkey""".stripMargin

  /** B53: the PLAIN selective join — the Bloom prefilter is transparent
    * by construction (false positives die in the exact join), so the
    * oracle states the join without it.
    */
  def qBloomJoinReduce(priceMin: Double): String =
    s"""SELECT o.o_orderpriority,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE o.o_totalprice >= $priceMin
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** B58: partition advisor — the same fixed+variable byte model on
    * integer lattices; `//` is DuckDB's integral division (Spark DIV).
    */
  def qPartitionAdvisor(targetMb: Long): String = {
    val p = targetMb * 1024L * 1024L
    s"""WITH u AS (
       |  SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
       |    CAST(SUM(28 + strlen(text) + strlen(lang) + strlen(source)) AS BIGINT) AS est_bytes FROM documents
       |  UNION ALL SELECT 'embeddings', COUNT(*),
       |    CAST(SUM(16 + 4*len(embedding)) AS BIGINT) FROM embeddings
       |  UNION ALL SELECT 'events', COUNT(*),
       |    CAST(SUM(40 + strlen(event_type) + strlen(props)) AS BIGINT) FROM events
       |  UNION ALL SELECT 'lineitem', COUNT(*),
       |    CAST(SUM(76 + strlen(l_returnflag) + strlen(l_linestatus)) AS BIGINT) FROM lineitem
       |  UNION ALL SELECT 'orders', COUNT(*),
       |    CAST(SUM(40 + strlen(o_orderstatus) + strlen(o_orderpriority)) AS BIGINT) FROM orders)
       |SELECT table_name, n_rows, est_bytes,
       |  (est_bytes + ${p - 1}) // $p AS parts_target,
       |  (n_rows + ((est_bytes + ${p - 1}) // $p) - 1) // ((est_bytes + ${p - 1}) // $p) AS rows_per_part
       |FROM u ORDER BY table_name""".stripMargin
  }

  /** B55: Q9-shaped profit rollup — per-row amount is the same
    * left-associated double expression as the Spark side, decimal-
    * routed sum, year cast BIGINT to match Spark's long.
    */
  def qProductProfit(nameToken: String): String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%$nameToken%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year""".stripMargin

  /** B56: Q16-shaped distinct-supplier counts with the NOT IN
    * complaint-supplier exclusion (negative acctbal stand-in).
    */
  def qSupplierPartTypes(sizes: Seq[Int]): String =
    s"""SELECT p_brand, p_type, p_size,
       |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#17' AND p_type <> 'PROMO'
       |  AND p_size IN (${sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** B57: Q20-shaped correlated-share semi-join — the nested
    * aggregate spelled as a window over the (part, supp) rollup;
    * l_quantity is integer-valued so double sums are exact.
    */
  def qPotentialPromotion(nameToken: String, share: Double): String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '$nameToken%'
       |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |w AS (SELECT l_suppkey, qty,
       |  SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty FROM ps)
       |SELECT s_suppkey, s_name, n_name
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE s_suppkey IN (SELECT DISTINCT l_suppkey FROM w WHERE qty > $share * part_qty)
       |ORDER BY s_suppkey""".stripMargin

  val qMinCostSupplier: String =
    """WITH u AS (SELECT l_partkey, l_suppkey,
      |  MIN(l_extendedprice / l_quantity) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |rk AS (SELECT l_partkey, l_suppkey, cost,
      |  ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY cost, l_suppkey) AS rn
      |  FROM u)
      |SELECT r.l_partkey AS p_partkey, s.s_name, n.n_name,
      |  floor(r.cost*1000000 + 0.5)/1000000 AS min_cost_r
      |FROM rk r JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE r.rn = 1 ORDER BY p_partkey""".stripMargin

  /** D31: prefix-energy curve — per-row energy ratio is the same
    * fixed-order fold over the dimension prefix on both engines, 6dp-
    * rounded before the decimal-routed mean (E38 convention).
    */
  def embEnergyCurve(prefixes: Seq[Int]): String =
    s"""WITH $normCte,
       |pe AS (SELECT p.d,
       |  floor((list_reduce([x*x for x in list_slice(n.v, 1, p.d)], (x,y) -> x+y) / n.n2)*1000000 + 0.5)/1000000 AS energy_r
       |  FROM n, (SELECT unnest([${prefixes.mkString(",")}]) AS d) p)
       |SELECT CAST(d AS BIGINT) AS prefix_dim, COUNT(*) AS n_vectors,
       |  floor((CAST(SUM(CAST(energy_r AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS mean_energy_r,
       |  MIN(energy_r) AS min_energy_r
       |FROM pe GROUP BY 1 ORDER BY prefix_dim""".stripMargin

  /** B48: portable CMS error card — the affine bucket family mirrored
    * literal-for-literal from Hashing.Perms (the bloom/minhash oracle
    * convention), min-over-depth estimate, exact integer arithmetic
    * end to end.
    */
  /** B59: portable HLL — the register construction mirrored exactly:
    * same md5_60 base hash, bucket/word split, the identical integer
    * CASE ladder for rho (no floating log2 on either engine), the
    * scaled-integer indicator sum, and the same spelled-out constant
    * expression for α·m²·2^52/S; register sums are HUGEINT-safe and
    * CAST back to BIGINT per the output convention.
    */
  /** rho = 53 - bitlen(w), capped at 52 — the same ladder as the
    * Spark side's chained `when`s, top bit (2^51) first (shared by
    * B59 and E59).
    */
  private def hllLadderSql: String = (51 to 0 by -1).map(k =>
    s"WHEN w >= ${1L << k} THEN ${52 - k}").mkString(" ")

  /** E59: the B59 construction over tokens per source. */
  def textVocabHll: String = {
    val ladder = hllLadderSql
    s"""WITH tk AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |h AS (SELECT source, ('0x'||substr(md5('hll:'||tok),1,15))::BIGINT AS h0 FROM tk),
       |b AS (SELECT source, h0 % 256 AS bucket, h0 // 256 AS w FROM h),
       |r AS (SELECT source, bucket,
       |  MAX(CASE $ladder ELSE 52 END) AS reg FROM b GROUP BY 1, 2),
       |a AS (SELECT source, COUNT(*) AS nb,
       |  SUM((1::BIGINT << (52 - reg))::HUGEINT) AS s_present FROM r GROUP BY 1),
       |s AS (SELECT source, CAST(256 - nb AS BIGINT) AS n_zero,
       |  CAST(s_present + (256 - nb)::HUGEINT * 4503599627370496 AS BIGINT) AS sum_scaled
       |  FROM a),
       |ex AS (SELECT source, COUNT(DISTINCT tok) AS n_exact FROM tk GROUP BY 1),
       |e AS (SELECT s.*, ex.n_exact,
       |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 4503599627370496.0 /
       |    CAST(sum_scaled AS DOUBLE) AS eraw
       |  FROM s JOIN ex USING (source))
       |SELECT source, n_zero, sum_scaled,
       |  floor(eraw*1000000 + 0.5)/1000000 AS est_raw_r,
       |  floor((CASE WHEN eraw <= 640.0 AND n_zero > 0
       |    THEN 256.0 * ln(256.0 / CAST(n_zero AS DOUBLE))
       |    ELSE eraw END)*1000000 + 0.5)/1000000 AS est_r,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM e ORDER BY source""".stripMargin
  }

  def qHllPortable: String = {
    val ladder = hllLadderSql
    s"""WITH h AS (SELECT event_type,
       |  ('0x'||substr(md5('hll:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h0
       |  FROM events),
       |b AS (SELECT event_type, h0 % 256 AS bucket, h0 // 256 AS w FROM h),
       |r AS (SELECT event_type, bucket,
       |  MAX(CASE $ladder ELSE 52 END) AS reg FROM b GROUP BY 1, 2),
       |a AS (SELECT event_type, COUNT(*) AS nb,
       |  SUM((1::BIGINT << (52 - reg))::HUGEINT) AS s_present FROM r GROUP BY 1),
       |s AS (SELECT event_type, CAST(256 - nb AS BIGINT) AS n_zero,
       |  CAST(s_present + (256 - nb)::HUGEINT * 4503599627370496 AS BIGINT) AS sum_scaled
       |  FROM a),
       |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY 1),
       |e AS (SELECT s.*, ex.n_exact,
       |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 4503599627370496.0 /
       |    CAST(sum_scaled AS DOUBLE) AS eraw
       |  FROM s JOIN ex USING (event_type))
       |SELECT event_type, n_zero, sum_scaled,
       |  floor(eraw*1000000 + 0.5)/1000000 AS est_raw_r,
       |  floor((CASE WHEN eraw <= 640.0 AND n_zero > 0
       |    THEN 256.0 * ln(256.0 / CAST(n_zero AS DOUBLE))
       |    ELSE eraw END)*1000000 + 0.5)/1000000 AS est_r,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM e ORDER BY event_type""".stripMargin
  }

  def qCmsPortable(depth: Int, width: Int, topK: Int): String = {
    val permRows = (0 until depth).map(d =>
      s"($d, ${Hashing.Perms(d)._1}, ${Hashing.Perms(d)._2})").mkString(", ")
    def h0(expr: String) =
      s"('0x'||substr(md5('cms:'||CAST($expr AS VARCHAR)),1,15))::BIGINT"
    s"""WITH pm(d, a, b) AS (SELECT * FROM (VALUES $permRows)),
       |h AS (SELECT user_id, ${h0("user_id")} AS h0 FROM events),
       |bk AS (SELECT h.user_id, pm.d,
       |  ((pm.a * (h.h0 % 1073741824) + pm.b) % 1073741789) % $width AS bucket
       |  FROM h, pm),
       |cms AS (SELECT d, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
       |top AS (SELECT user_id, COUNT(*) AS n_true FROM events GROUP BY 1
       |  ORDER BY n_true DESC, user_id LIMIT $topK),
       |pr AS (SELECT t.user_id, t.n_true, pm.d,
       |  ((pm.a * ((${h0("t.user_id")}) % 1073741824) + pm.b) % 1073741789) % $width AS bucket
       |  FROM top t, pm),
       |est AS (SELECT pr.user_id, pr.n_true, MIN(cms.cnt) AS cms_est
       |  FROM pr JOIN cms ON cms.d = pr.d AND cms.bucket = pr.bucket
       |  GROUP BY 1, 2)
       |SELECT user_id, n_true, CAST(cms_est AS BIGINT) AS cms_est,
       |  CAST(cms_est - n_true AS BIGINT) AS overcount
       |FROM est ORDER BY n_true DESC, user_id""".stripMargin
  }

  /** A78: A/B card — the same hash-variant split, HUGEINT-exact
    * per-arm moments, and the identical left-associated double
    * expressions for mean/variance/Welch-t as the Spark side.
    */
  def evAbtest: String = {
    val ma = "CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    val mb = "CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    val va = "(CAST(n_a AS DOUBLE) * CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)) / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val vb = "(CAST(n_b AS DOUBLE) * CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)) / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val se2 = s"$va / CAST(n_a AS DOUBLE) + $vb / CAST(n_b AS DOUBLE)"
    val tstat = s"CASE WHEN n_a > 1 AND n_b > 1 AND ($se2) > 0.0 THEN (($ma) - ($mb)) / sqrt($se2) END"
    s"""WITH cnt AS (SELECT event_type, user_id, COUNT(*) AS c,
       |  ('0x'||substr(md5('ab:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT % 2 AS v
       |  FROM events GROUP BY 1, 2),
       |m AS (SELECT event_type,
       |  CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |  CAST(SUM(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS s1a,
       |  SUM(CASE WHEN v = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS s2a,
       |  CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |  CAST(SUM(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS s1b,
       |  SUM(CASE WHEN v = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS s2b
       |  FROM cnt GROUP BY 1)
       |SELECT event_type, n_a, n_b,
       |  floor(($ma)*1000000 + 0.5)/1000000 AS mean_a_r,
       |  floor(($mb)*1000000 + 0.5)/1000000 AS mean_b_r,
       |  floor((($ma) - ($mb))*1000000 + 0.5)/1000000 AS diff_r,
       |  floor(($tstat)*1000000 + 0.5)/1000000 AS t_r,
       |  abs($tstat) > 1.96 AS significant
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** A79: MDE/power card — the same arm-moment CTE as A78 with the
    * SE/MDE expressions spelled identically to the Spark side.
    */
  def evMdePower: String = {
    val va = "(CAST(n_a AS DOUBLE) * CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)) / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val vb = "(CAST(n_b AS DOUBLE) * CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)) / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val se2 = s"$va / CAST(n_a AS DOUBLE) + $vb / CAST(n_b AS DOUBLE)"
    val se = s"CASE WHEN n_a > 1 AND n_b > 1 AND ($se2) > 0.0 THEN sqrt($se2) END"
    val pooled = "CAST(s1a + s1b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
    s"""WITH cnt AS (SELECT event_type, user_id, COUNT(*) AS c,
       |  ('0x'||substr(md5('ab:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT % 2 AS v
       |  FROM events GROUP BY 1, 2),
       |m AS (SELECT event_type,
       |  CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |  CAST(SUM(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS s1a,
       |  SUM(CASE WHEN v = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS s2a,
       |  CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |  CAST(SUM(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS s1b,
       |  SUM(CASE WHEN v = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS s2b
       |  FROM cnt GROUP BY 1)
       |SELECT event_type, n_a, n_b,
       |  floor(($pooled)*1000000 + 0.5)/1000000 AS pooled_mean_r,
       |  floor(($se)*1000000 + 0.5)/1000000 AS se_r,
       |  floor((2.8016 * ($se))*1000000 + 0.5)/1000000 AS mde_abs_r,
       |  floor((2.8016 * ($se) / ($pooled))*1000000 + 0.5)/1000000 AS mde_rel_r
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** A84: conversion-window sweep — the same FOLLOWING-frame min
    * window for time-to-next-purchase, rungs as conditional sums
    * unioned to rows.
    */
  def evConversionWindowSweep(windowsH: Seq[Int]): String = {
    val convs = windowsH.map(h =>
      s"CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= ${h.toLong * 3600000000L} THEN 1 ELSE 0 END) AS BIGINT) AS c$h").mkString(",\n  ")
    val rows = windowsH.map(h =>
      s"SELECT CAST($h AS BIGINT) AS window_hours, n_clicks, c$h AS n_converted FROM a").mkString("\nUNION ALL ")
    s"""WITH g AS (SELECT user_id, ts, event_id, event_type,
       |  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pts
       |  FROM events),
       |gg AS (SELECT pts - epoch_us(ts) AS gap_us FROM g WHERE event_type = 'click'),
       |a AS (SELECT COUNT(*) AS n_clicks,
       |  $convs
       |  FROM gg)
       |SELECT window_hours, CAST(n_clicks AS BIGINT) AS n_clicks, n_converted,
       |  floor((CAST(n_converted AS DOUBLE) / CAST(n_clicks AS DOUBLE))*1000000 + 0.5)/1000000 AS rate_r
       |FROM ($rows)
       |ORDER BY window_hours""".stripMargin
  }

  /** A83: bot suspects — the same user-keyed lag window, HUGEINT
    * moments, guarded cv, and TakeOrdered-k spelled as ORDER BY+LIMIT.
    */
  def evBotSuspects(k: Int, minEvents: Long, cvFlag: Double): String = {
    val mean = "CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)"
    val vr = "(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / (CAST(n_gaps AS DOUBLE) * (CAST(n_gaps AS DOUBLE) - 1.0))"
    val cv = s"CASE WHEN n_gaps > 1 AND ($mean) > 0.0 AND ($vr) >= 0.0 THEN sqrt($vr) / ($mean) END"
    s"""WITH g AS (SELECT user_id,
       |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS g
       |  FROM events),
       |m AS (SELECT user_id, COUNT(*) AS n_gaps,
       |  CAST(SUM(g) AS BIGINT) AS sg,
       |  SUM(CAST(g AS HUGEINT) * g) AS sgg
       |  FROM g WHERE g IS NOT NULL GROUP BY 1
       |  HAVING COUNT(*) >= $minEvents),
       |c AS (SELECT user_id, CAST(n_gaps + 1 AS BIGINT) AS n_events,
       |  floor((($mean) / 1000000.0)*1000000 + 0.5)/1000000 AS mean_gap_s_r,
       |  floor(($cv)*1000000 + 0.5)/1000000 AS cv_r,
       |  ($cv) < $cvFlag AS bot_flag
       |  FROM m)
       |SELECT * FROM c WHERE cv_r IS NOT NULL
       |ORDER BY cv_r ASC, user_id ASC LIMIT $k""".stripMargin
  }

  /** A82: CUPED — the same midpoint split (exact integer micros), the
    * same HUGEINT moments and left-associated variance/covariance
    * expressions as the Spark side.
    */
  def evCuped: String = {
    def sv(n: String, a: String, b: String) =
      s"(CAST(n AS DOUBLE) * CAST($n AS DOUBLE) - CAST($a AS DOUBLE) * CAST($b AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))"
    val vx = sv("sxx", "sx", "sx")
    val vy = sv("syy", "sy", "sy")
    val cxy = sv("sxy", "sx", "sy")
    val ok = s"n > 1 AND ($vx) > 0.0 AND ($vy) > 0.0"
    s"""WITH mid AS (SELECT min(epoch_us(ts)) +
       |  (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS mid_us FROM events),
       |xy AS (SELECT event_type, user_id,
       |  SUM(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS x,
       |  SUM(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS y
       |  FROM events, mid GROUP BY 1, 2),
       |m AS (SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |  SUM(CAST(x AS HUGEINT) * y) AS sxy,
       |  SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |  SUM(CAST(y AS HUGEINT) * y) AS syy
       |  FROM xy GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_users,
       |  floor((CASE WHEN $ok THEN ($cxy) / ($vx) END)*1000000 + 0.5)/1000000 AS theta_r,
       |  floor((CASE WHEN $ok THEN ($cxy) * ($cxy) / (($vx) * ($vy)) END)*1000000 + 0.5)/1000000 AS var_reduction_r,
       |  floor(($vy)*1000000 + 0.5)/1000000 AS var_y_r,
       |  floor((CASE WHEN $ok THEN ($vy) * (1.0 - ($cxy) * ($cxy) / (($vx) * ($vy))) END)*1000000 + 0.5)/1000000 AS var_yadj_r
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** A81: SRM — the same arm-size CTE, chi-square spelled identically. */
  def evAbSrm: String = {
    val chi2 = "CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
    s"""WITH cnt AS (SELECT event_type, user_id, COUNT(*) AS c,
       |  ('0x'||substr(md5('ab:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT % 2 AS v
       |  FROM events GROUP BY 1, 2),
       |m AS (SELECT event_type,
       |  CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |  CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM cnt GROUP BY 1)
       |SELECT event_type, n_a, n_b,
       |  floor(($chi2)*1000000 + 0.5)/1000000 AS chi2_r,
       |  ($chi2) > 3.841 AS srm_flag
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** A65: lag-k autocorrelation — exact HUGEINT moments over the
    * hourly rollup (mirroring the Spark side's decimal lattice), three
    * deterministic double ops at the end.
    */
  def evAutocorr(lags: Seq[Int]): String = {
    def momentArm(k: Int) =
      s"""SELECT x.event_type, CAST($k AS BIGINT) AS lag_hours, COUNT(*) AS n_pairs,
         |  SUM(CAST(x.n AS HUGEINT)) AS sx, SUM(CAST(y.n AS HUGEINT)) AS sy,
         |  SUM(CAST(x.n AS HUGEINT) * CAST(y.n AS HUGEINT)) AS sxy,
         |  SUM(CAST(x.n AS HUGEINT) * CAST(x.n AS HUGEINT)) AS sxx,
         |  SUM(CAST(y.n AS HUGEINT) * CAST(y.n AS HUGEINT)) AS syy
         |  FROM h x JOIN h y ON y.event_type = x.event_type
         |    AND y.hour = x.hour + INTERVAL $k HOUR
         |  GROUP BY 1""".stripMargin
    s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |m AS (${lags.map(momentArm).mkString("\nUNION ALL\n")})
       |SELECT event_type, lag_hours, n_pairs,
       |  CASE WHEN (n_pairs*sxx - sx*sx) > 0 AND (n_pairs*syy - sy*sy) > 0 THEN
       |    floor((CAST(n_pairs*sxy - sx*sy AS DOUBLE) /
       |      sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE) * CAST(n_pairs*syy - sy*sy AS DOUBLE)))*1000000 + 0.5)/1000000
       |  END AS acf_r
       |FROM m ORDER BY event_type, lag_hours""".stripMargin
  }

  /** A68: burst windows — gaps-and-islands over above-threshold hours
    * (integer-moment μ/σ, island id = epoch-hour − row_number on the
    * FILTERED rows — window-after-WHERE matches the Spark order).
    */
  def evBurstWindows(kSigma: Double): String =
    s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type,
       |  CAST(SUM(n) AS DOUBLE)/COUNT(*) AS mu,
       |  sqrt(GREATEST(CAST(SUM(n*n) AS DOUBLE)/COUNT(*) -
       |    (CAST(SUM(n) AS DOUBLE)/COUNT(*))*(CAST(SUM(n) AS DOUBLE)/COUNT(*)), 0.0)) AS sigma
       |  FROM h GROUP BY 1),
       |b AS (SELECT h.event_type, h.hour, h.n,
       |  epoch_us(h.hour) // 3600000000 AS eh,
       |  ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY h.hour) AS rn
       |  FROM h JOIN st USING (event_type)
       |  WHERE CAST(h.n AS DOUBLE) > st.mu + $kSigma * st.sigma)
       |SELECT event_type, MIN(hour) AS start_hour, MAX(hour) AS end_hour,
       |  COUNT(*) AS n_hours, CAST(MAX(n) AS BIGINT) AS peak_n,
       |  CAST(SUM(n) AS BIGINT) AS total_n
       |FROM b GROUP BY event_type, eh - rn
       |ORDER BY event_type, start_hour""".stripMargin

  /** A69: burst impact — the A68 relation ranked top-K by volume,
    * interval-joined (naive BETWEEN form) against other-type events.
    */
  def evBurstImpact(kSigma: Double, topK: Int): String =
    s"""WITH bw AS (SELECT * FROM (${evBurstWindows(kSigma)})),
       |wr AS (SELECT *, ROW_NUMBER() OVER (
       |  ORDER BY total_n DESC, event_type, start_hour) AS w_id FROM bw),
       |w AS (SELECT CAST(w_id AS BIGINT) AS w_id, event_type AS burst_type,
       |  start_hour, end_hour + INTERVAL 1 HOUR AS end_excl
       |  FROM wr WHERE w_id <= $topK)
       |SELECT w.w_id, w.burst_type, w.start_hour,
       |  COUNT(*) AS n_other_events,
       |  COUNT(DISTINCT e.event_type) AS n_other_types,
       |  COUNT(DISTINCT e.user_id) AS n_users
       |FROM w JOIN events e ON e.ts >= w.start_hour AND e.ts < w.end_excl
       |  AND e.event_type <> w.burst_type
       |GROUP BY 1, 2, 3 ORDER BY w_id""".stripMargin

  /** A67: Holt double-exponential smoothing — (level, trend) carried
    * UNROUNDED through a recursive CTE (rounding only in the output
    * columns, like the Spark side's state), every step the same few
    * IEEE ops with identical association.
    */
  /** Shared A67 recursion CTE chain (hourly rollup → row-numbered →
    * Holt level/trend/resid recursion), reused by the forecast card
    * and the A73 backtest so the two relations cannot drift.
    */
  private def holtCtes(alpha: Double, beta: Double): String = {
    val lvl = s"$alpha * CAST(hr.n AS DOUBLE) + (1.0 - $alpha) * (rec.level + rec.trend)"
    s"""h AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |hr AS (SELECT event_type, hour, n,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS rn FROM h),
       |rec AS (
       |  SELECT event_type, hour, n, rn,
       |    CAST(n AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend,
       |    CAST(NULL AS DOUBLE) AS resid
       |  FROM hr WHERE rn = 1
       |  UNION ALL
       |  SELECT hr.event_type, hr.hour, hr.n, hr.rn,
       |    $lvl AS level,
       |    $beta * (($lvl) - rec.level) + (1.0 - $beta) * rec.trend AS trend,
       |    CAST(hr.n AS DOUBLE) - (rec.level + rec.trend) AS resid
       |  FROM rec JOIN hr ON hr.event_type = rec.event_type AND hr.rn = rec.rn + 1)""".stripMargin
  }

  def evHoltForecast(alpha: Double, beta: Double): String =
    s"""WITH RECURSIVE ${holtCtes(alpha, beta)}
       |SELECT event_type, hour, n,
       |  floor(level*1000000 + 0.5)/1000000 AS level_r,
       |  floor(trend*1000000 + 0.5)/1000000 AS trend_r,
       |  floor(resid*1000000 + 0.5)/1000000 AS resid_r
       |FROM rec ORDER BY event_type, hour""".stripMargin

  /** A73: forecast backtest — Holt vs the naive last-value forecast,
    * MAE/RMSE per type. Residuals r6'd BEFORE abs/square (the
    * recursion itself is bit-identical per the A67 discipline), holt
    * squares r6'd per row then DECIMAL-summed; naive errors are pure
    * integers. HUGEINT sums cast before the one double division.
    */
  def evForecastEval(alpha: Double, beta: Double): String =
    s"""WITH RECURSIVE ${holtCtes(alpha, beta)},
       |sc AS (SELECT event_type, rn, n,
       |  floor(resid*1000000 + 0.5)/1000000 AS resid_r,
       |  LAG(n) OVER (PARTITION BY event_type ORDER BY rn) AS prev_n
       |  FROM rec),
       |e AS (SELECT event_type,
       |  abs(resid_r) AS h_abs,
       |  floor(resid_r*resid_r*1000000 + 0.5)/1000000 AS h_sq,
       |  abs(n - prev_n) AS nv_abs,
       |  (n - prev_n)*(n - prev_n) AS nv_sq
       |  FROM sc WHERE resid_r IS NOT NULL AND prev_n IS NOT NULL)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
       |  floor((CAST(SUM(CAST(h_abs AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS holt_mae_r,
       |  floor(sqrt(CAST(SUM(CAST(h_sq AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS holt_rmse_r,
       |  floor((CAST(SUM(nv_abs) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS naive_mae_r,
       |  floor(sqrt(CAST(SUM(nv_sq) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS naive_rmse_r,
       |  floor(sqrt(CAST(SUM(CAST(h_sq AS DECIMAL(18,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 <
       |    floor(sqrt(CAST(SUM(nv_sq) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS holt_better
       |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A49: CUSUM change-point — the S⁺ recursion as a recursive CTE
    * over the row-numbered per-type hourly series. Baseline (μ, σ)
    * from integer moments (Σn, Σn² — exact), so every double op
    * (division, μ², sqrt, the per-step max(0, s + drift)) is a single
    * deterministic expression with identical association on both
    * engines; the Spark side computes σ the same way (EventOps
    * integer-moment comment).
    */
  def evCusumChangepoint(baselineHours: Int, kSigma: Double, hSigma: Double): String = {
    val drift = s"CAST(hr.n AS DOUBLE) - st.mu - $kSigma * st.sigma"
    s"""WITH RECURSIVE h AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |hr AS (SELECT event_type, hour, n,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS rn FROM h),
       |st AS (SELECT event_type,
       |  CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
       |  GREATEST(sqrt(GREATEST(CAST(SUM(n*n) AS DOUBLE) / COUNT(*) -
       |    (CAST(SUM(n) AS DOUBLE) / COUNT(*)) * (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 0.0)), 1e-9) AS sigma
       |  FROM hr WHERE rn <= $baselineHours GROUP BY event_type),
       |rec AS (
       |  SELECT hr.event_type, hr.hour, hr.n, hr.rn,
       |    GREATEST(0.0 + ($drift), 0.0) AS s
       |  FROM hr JOIN st USING (event_type) WHERE hr.rn = 1
       |  UNION ALL
       |  SELECT hr.event_type, hr.hour, hr.n, hr.rn,
       |    GREATEST(rec.s + ($drift), 0.0) AS s
       |  FROM rec JOIN hr ON hr.event_type = rec.event_type AND hr.rn = rec.rn + 1
       |  JOIN st ON st.event_type = hr.event_type)
       |SELECT rec.event_type, rec.hour, rec.n,
       |  floor(rec.s / st.sigma * 1000000 + 0.5)/1000000 AS cusum_sigmas_r,
       |  rec.s > $hSigma * st.sigma AS flagged
       |FROM rec JOIN st USING (event_type)
       |ORDER BY event_type, hour""".stripMargin
  }

  /** A77: TTL tuning ladder — each rung replays the A3 recursive
    * LATERAL emission CTE at its own TTL, counts union, one shared
    * total.
    */
  def evTtlTuning(ttls: Seq[Long]): String = {
    def emittedCount(h: Long) =
      s"""(WITH RECURSIVE numbered AS (
         |  SELECT user_id::VARCHAR || ':' || event_type AS key, ts, event_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id::VARCHAR || ':' || event_type
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |emitted AS (
         |  SELECT key, ts, event_id FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT nx.key, nx.ts, nx.event_id
         |  FROM emitted e, LATERAL (
         |    SELECT n.key, n.ts, n.event_id FROM numbered n
         |    WHERE n.key = e.key AND n.ts >= e.ts + INTERVAL $h HOUR
         |    ORDER BY n.ts, n.event_id LIMIT 1) nx)
         |SELECT COUNT(*) AS c FROM emitted)""".stripMargin
    val branches = ttls.map(h =>
      s"SELECT CAST($h AS BIGINT) AS ttl_hours, CAST(ec$h.c AS BIGINT) AS n_emitted FROM ${emittedCount(h)} ec$h")
      .mkString("\nUNION ALL ")
    s"""WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
       |SELECT b.ttl_hours, b.n_emitted, tot.n_total,
       |  floor((1.0 - CAST(b.n_emitted AS DOUBLE)/CAST(tot.n_total AS DOUBLE))*1000000 + 0.5)/1000000 AS dedup_rate_r
       |FROM ($branches) b, tot ORDER BY b.ttl_hours""".stripMargin
  }

  /** A75: drop-side CUSUM — A49's recursion with the drift reversed
    * (S⁻ accumulates the deficit below baseline), same integer-moment
    * μ/σ and association discipline.
    */
  def evCusumDrop(baselineHours: Int, kSigma: Double, hSigma: Double): String = {
    val drift = s"st.mu - $kSigma * st.sigma - CAST(hr.n AS DOUBLE)"
    s"""WITH RECURSIVE h AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |hr AS (SELECT event_type, hour, n,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS rn FROM h),
       |st AS (SELECT event_type,
       |  CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
       |  GREATEST(sqrt(GREATEST(CAST(SUM(n*n) AS DOUBLE) / COUNT(*) -
       |    (CAST(SUM(n) AS DOUBLE) / COUNT(*)) * (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 0.0)), 1e-9) AS sigma
       |  FROM hr WHERE rn <= $baselineHours GROUP BY event_type),
       |rec AS (
       |  SELECT hr.event_type, hr.hour, hr.n, hr.rn,
       |    GREATEST(0.0 + ($drift), 0.0) AS s
       |  FROM hr JOIN st USING (event_type) WHERE hr.rn = 1
       |  UNION ALL
       |  SELECT hr.event_type, hr.hour, hr.n, hr.rn,
       |    GREATEST(rec.s + ($drift), 0.0) AS s
       |  FROM rec JOIN hr ON hr.event_type = rec.event_type AND hr.rn = rec.rn + 1
       |  JOIN st ON st.event_type = hr.event_type)
       |SELECT rec.event_type, rec.hour, rec.n,
       |  floor(rec.s / st.sigma * 1000000 + 0.5)/1000000 AS cusum_drop_sigmas_r,
       |  rec.s > $hSigma * st.sigma AS flagged
       |FROM rec JOIN st USING (event_type)
       |ORDER BY event_type, hour""".stripMargin
  }

  /** A72: token-bucket throttle replay — integer micro-token lattice
    * recursion (LEAST(cap, tokens + gap_µs // rate) − consume) as a
    * per-user recursive CTE chained on row_number, exactly the Spark
    * side's loop (no doubles anywhere, so parity is structural).
    */
  def evTokenBucket(capTokens: Int, usPerMicroToken: Long): String = {
    val cap = capTokens * 1000000L
    val avail = s"LEAST($cap, rec.tokens + (ev.tus - rec.tus) // $usPerMicroToken)"
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tus,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |rec AS (
       |  SELECT user_id, rn, tus,
       |    CASE WHEN $cap >= 1000000 THEN 1 ELSE 0 END AS allowed,
       |    $cap - CASE WHEN $cap >= 1000000 THEN 1000000 ELSE 0 END AS tokens
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT ev.user_id, ev.rn, ev.tus,
       |    CASE WHEN $avail >= 1000000 THEN 1 ELSE 0 END AS allowed,
       |    ($avail) - CASE WHEN $avail >= 1000000 THEN 1000000 ELSE 0 END AS tokens
       |  FROM rec JOIN ev ON ev.user_id = rec.user_id AND ev.rn = rec.rn + 1),
       |cnt AS (SELECT user_id, COUNT(*) AS n FROM ev GROUP BY user_id)
       |SELECT r.user_id, CAST(cnt.n AS BIGINT) AS n_events,
       |  CAST(SUM(r.allowed) AS BIGINT) AS n_allowed,
       |  CAST(cnt.n - SUM(r.allowed) AS BIGINT) AS n_dropped,
       |  CAST(MAX(CASE WHEN r.rn = cnt.n THEN r.tokens END) AS BIGINT) AS final_tokens
       |FROM rec r JOIN cnt ON cnt.user_id = r.user_id
       |GROUP BY r.user_id, cnt.n
       |ORDER BY r.user_id""".stripMargin
  }

  val mmBinaryMeta: String =
    """SELECT doc_id,
      |  octet_length(text::BLOB) AS n_bytes,
      |  md5(text) AS checksum,
      |  lower(hex(substr(text, 1, 8))) AS prefix_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  val docExactDedup: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY content_hash""".stripMargin

  /** C20: banding-plan recall curve over the df-capped verified pair
    * set (the C5b deploy feeder — same rare/gc candidate CTEs, cap
    * mirrored from the Spark side's dfCap=100). Every power is the
    * same explicit squaring chain the Spark side builds (qa=1−j,
    * qa2=qa·qa, … — association identical, so the doubles match
    * bit-for-bit; no libm pow on either engine).
    */
  val docLshTuning: String = {
    def agg(p: String) =
      s"floor((CAST(SUM(CAST($p AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))*1000000 + 0.5)/1000000"
    def row(b: Int, r: Int, p: String) =
      s"SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band, COUNT(*) AS n_pairs, ${agg(p)} AS avg_recall_r FROM px"
    s"""WITH $gramCtes,
       |rare AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 100),
       |gc AS (SELECT g.doc_id, g.gram FROM g JOIN rare USING (gram)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM gc a JOIN gc b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |$jaccardCtes,
       |pairs AS ($jaccardSelect),
       |s2 AS (SELECT jaccard AS j, jaccard*jaccard AS j2 FROM pairs),
       |s3 AS (SELECT *, j2*j2 AS j4 FROM s2),
       |s4 AS (SELECT *, j4*j4 AS j8 FROM s3),
       |s5 AS (SELECT *, j8*j8 AS j16 FROM s4),
       |t1 AS (SELECT *, 1.0-j AS qa, 1.0-j2 AS qb, 1.0-j4 AS qc, 1.0-j8 AS qd FROM s5),
       |t2 AS (SELECT *, qa*qa AS qa2, qb*qb AS qb2, qc*qc AS qc2, qd*qd AS qd2 FROM t1),
       |t3 AS (SELECT *, qa2*qa2 AS qa4, qb2*qb2 AS qb4, qc2*qc2 AS qc4 FROM t2),
       |t4 AS (SELECT *, qa4*qa4 AS qa8, qb4*qb4 AS qb8 FROM t3),
       |t5 AS (SELECT *, qa8*qa8 AS qa16 FROM t4),
       |px AS (SELECT
       |  1.0-(1.0-j16) AS p_1_16,
       |  1.0-qd2 AS p_2_8,
       |  1.0-qc4 AS p_4_4,
       |  1.0-qb8 AS p_8_2,
       |  1.0-qa16 AS p_16_1
       |  FROM t5)
       |${row(1, 16, "p_1_16")}
       |UNION ALL ${row(2, 8, "p_2_8")}
       |UNION ALL ${row(4, 4, "p_4_4")}
       |UNION ALL ${row(8, 2, "p_8_2")}
       |UNION ALL ${row(16, 1, "p_16_1")}
       |ORDER BY bands""".stripMargin
  }

  /** E65: BPE encode — the E47 mining chain verbatim (same CTEs), then
    * every document's words run the trained replace chain in order and
    * map to code-point ids. Sentinel chr(r) has id r, so the id
    * stream is a pure function of the merge table both engines mine
    * identically.
    */
  def textBpeEncode(rounds: Int): String = {
    def mine(src: String, wCol: String, tAlias: Int): String =
      s"""t$tAlias AS (SELECT pair AS p$tAlias, total AS total$tAlias FROM (
         |  SELECT pair, CAST(SUM(n) AS BIGINT) AS total FROM (
         |    SELECT unnest([substring($wCol, i, 2) for i in range(1, length($wCol))]) AS pair, n
         |    FROM $src WHERE length($wCol) >= 2)
         |  GROUP BY pair)
         |  ORDER BY total DESC, pair ASC LIMIT 1)""".stripMargin
    val ctes = new StringBuilder(
      """w0 AS (
        |  SELECT word AS w0, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin)
    for (r <- 1 to rounds) {
      ctes.append(",\n").append(mine(s"w${r - 1}", s"w${r - 1}", r))
      if (r < rounds)
        ctes.append(",\n").append(
          s"""w$r AS (SELECT replace(w${r - 1}, (SELECT p$r FROM t$r), chr($r)) AS w$r, n
             |  FROM w${r - 1})""".stripMargin)
    }
    // the 1-row pair CTEs cross-join in as plain columns: DuckDB
    // rejects subqueries inside lambda/list-comprehension bodies
    val repl = (1 to rounds).foldLeft("w")((e, r) =>
      s"replace($e, p$r, chr($r))")
    val topsFrom = (1 to rounds).map(r => s"t$r").mkString(", ")
    s"""WITH ${ctes.result()},
       |enc AS (
       |  SELECT doc_id,
       |    [$repl for w in list_filter(string_split(lower(text), ' '), w -> w <> '')] AS ws
       |  FROM documents, $topsFrom),
       |ids AS (
       |  SELECT doc_id, ws,
       |    flatten([[ord(substring(w, i, 1)) for i in range(1, length(w)+1)] for w in ws]) AS idl
       |  FROM enc)
       |SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(len(idl) AS BIGINT) AS n_tokens,
       |  array_to_string([CAST(x AS VARCHAR) for x in idl], ' ') AS token_ids,
       |  CASE WHEN len(ws) = 0 THEN 0.0
       |    ELSE floor(CAST(len(idl) AS DOUBLE) / len(ws) * 1000000 + 0.5) / 1000000
       |  END AS fertility_r
       |FROM ids
       |ORDER BY doc_id""".stripMargin
  }

  /** E64: the planted-HTML extraction — the F2 formula-corpus
    * discipline for markup. The EXPECTED output is a pure function of
    * doc_id (three affine lowercase chunks + constant traps), so the
    * oracle re-derives title/text/blocks/link-density directly; any
    * extractor drift (tag stripping, script/style/comment drops,
    * entity decode, block segmentation, the nav density drop,
    * whitespace normalization) hash-fails per document. Every 17th
    * doc is plaintext and must quarantine as `not_html`.
    */
  def docHtmlExtract(): String = {
    def chunk(k: Int) =
      s"array_to_string([chr(97 + CAST((doc_id*31 + i*7 + ${k * 11}) % 26 " +
        s"AS INTEGER)) for i in range(0, 20 + doc_id % 17)], '')"
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ${chunk(1)} AS c1,
       |    ${chunk(2)} AS c2,
       |    ${chunk(3)} AS c3
       |  FROM documents),
       |x AS (
       |  SELECT doc_id,
       |    'Heading ' || doc_id AS b1,
       |    c1 || ' & <b>' AS b2,
       |    c2 || ' anchor ' || doc_id AS b3,
       |    c3 || ' double spaces' AS b5,
       |    length('anchor ' || doc_id) + 6 AS lc
       |  FROM h)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 17 = 0 THEN 'not_html' ELSE 'ok' END AS status,
       |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 'Doc ' || doc_id END AS title,
       |  CASE WHEN doc_id % 17 = 0 THEN NULL
       |    ELSE b1 || chr(10) || b2 || chr(10) || b3 || chr(10) || b5 END AS text,
       |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(4 AS BIGINT) END AS n_blocks,
       |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(4 AS BIGINT) END AS n_links,
       |  CASE WHEN doc_id % 17 = 0 THEN NULL
       |    ELSE floor(CAST(lc AS DOUBLE) /
       |      (length(b1) + length(b2) + length(b3) + 8 + length(b5)) * 1000000
       |      + 0.5) / 1000000 END AS link_density_r
       |FROM x
       |ORDER BY doc_id""".stripMargin
  }

  /** E66: the planted-URL corpus's expected canonical form, derived
    * directly from the doc_id residue formulas (the F2 discipline —
    * the oracle re-states the PLANT, not the parser, so every
    * canonicalization branch is gated per document).
    */
  def docUrlCanon(): String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END AS sch,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
      |      'site' || (doc_id % 7) ||
      |      (CASE WHEN doc_id % 11 = 0 THEN '.example.co.uk'
      |            ELSE '.example.com' END) AS hst,
      |    CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END AS prt,
      |    CASE WHEN doc_id % 4 = 0 THEN '/'
      |         ELSE '/d' || (doc_id % 4) || '/p' || doc_id END AS pth,
      |    CASE WHEN doc_id % 6 = 0 THEN '?a=1&b=' || (doc_id % 9)
      |         WHEN doc_id % 6 = 2 THEN '?y=' || (doc_id % 9) || '&z=2'
      |         ELSE '' END AS q,
      |    CASE WHEN doc_id % 6 IN (0, 2) THEN 2 ELSE 0 END AS np,
      |    (doc_id % 17 = 0 OR doc_id % 13 = 0) AS quar
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 17 = 0 THEN 'not_url'
      |       WHEN doc_id % 13 = 0 THEN 'non_http' ELSE 'ok' END AS status,
      |  CASE WHEN quar THEN NULL
      |       ELSE sch || '://' || hst || prt || pth || q END AS url_canon,
      |  CASE WHEN quar THEN NULL ELSE sch END AS scheme,
      |  CASE WHEN quar THEN NULL ELSE hst END AS host,
      |  CASE WHEN quar THEN NULL
      |       WHEN doc_id % 11 = 0 THEN 'example.co.uk'
      |       ELSE 'example.com' END AS reg_domain,
      |  CASE WHEN quar THEN NULL ELSE CAST(np AS BIGINT) END AS n_params
      |FROM b
      |ORDER BY doc_id""".stripMargin

  /** C42: the colliding-URL plant's canonical form per doc, GROUPED in
    * SQL (group sizes come from the data, never a closed form — the
    * corpus-size boundary can orphan a pair member).
    */
  def docUrlDup(): String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 19 = 0
      |         THEN 'https://only.example.org/u' || doc_id
      |         ELSE 'https://dup' || ((doc_id - doc_id % 2) % 5) ||
      |              '.example.org/x/p' || (doc_id - doc_id % 2) ||
      |              '?id=' || ((doc_id - doc_id % 2) % 9) END AS url_canon
      |  FROM documents)
      |SELECT doc_id, url_canon,
      |  COUNT(*) OVER (PARTITION BY url_canon) AS group_size,
      |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY url_canon)
      |    AS INTEGER) AS is_dup
      |FROM c
      |ORDER BY doc_id""".stripMargin

  /** E67: per-(registered domain, host) crawl card off the E66 plant
    * joined with the documents' whitespace token counts.
    */
  def docHostStats(): String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END AS scheme,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
      |      'site' || (doc_id % 7) ||
      |      (CASE WHEN doc_id % 11 = 0 THEN '.example.co.uk'
      |            ELSE '.example.com' END) AS host,
      |    CASE WHEN doc_id % 11 = 0 THEN 'example.co.uk'
      |         ELSE 'example.com' END AS reg_domain
      |  FROM documents
      |  WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0),
      |j AS (
      |  SELECT c.*, len(string_split(d.text, ' ')) AS n_tokens
      |  FROM c JOIN documents d USING (doc_id))
      |SELECT reg_domain, host,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |  floor(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
      |    / 1000000 AS mean_tokens_r,
      |  floor(CAST(SUM(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END)
      |      AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
      |    AS https_share_r
      |FROM j
      |GROUP BY reg_domain, host
      |ORDER BY reg_domain, host""".stripMargin

  /** E68: the planted link page's expected (ord, kind, resolved URL)
    * rows — one per resolution kind, plus the not_html quarantine row.
    */
  def docHtmlLinks(): String =
    """WITH d AS (SELECT doc_id FROM documents),
      |r AS (
      |  SELECT doc_id, CAST(0 AS BIGINT) AS link_ord,
      |    'not_html' AS kind, CAST(NULL AS VARCHAR) AS url_abs
      |  FROM d WHERE doc_id % 17 = 0
      |  UNION ALL
      |  SELECT doc_id, 1, 'absolute',
      |    'https://other' || (doc_id % 5) || '.example.net/abs' || doc_id
      |  FROM d WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'protocol_relative',
      |    'https://cdn' || (doc_id % 3) || '.example.net/c' || doc_id
      |  FROM d WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id, 3, 'root_relative',
      |    'https://site' || (doc_id % 7) || '.example.com/r/p' || doc_id
      |  FROM d WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id, 4, 'relative',
      |    'https://site' || (doc_id % 7) ||
      |      '.example.com/dir/a/sub/q' || doc_id
      |  FROM d WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id, 5, 'parent',
      |    'https://site' || (doc_id % 7) || '.example.com/dir/up' || doc_id
      |  FROM d WHERE doc_id % 17 <> 0)
      |SELECT doc_id, link_ord, kind, url_abs
      |FROM r
      |ORDER BY doc_id, link_ord""".stripMargin

  /** E70: the per-host fetch throttle — the planted request relation
    * (host from the link-corpus base URL, ts_s = (doc_id·37) mod 600)
    * ranked per (host, window) by (ts, doc_id).
    */
  def docHostThrottle(maxPerWindow: Int = 3, windowSec: Int = 60): String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |    'site' || (doc_id % 7) || '.example.com' AS host,
       |    (doc_id * 37) % 600 AS ts_s
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, host, ts_s,
       |    ts_s - ts_s % $windowSec AS win_s FROM r),
       |k AS (
       |  SELECT doc_id, host, ts_s, win_s,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY host, win_s
       |      ORDER BY ts_s, doc_id) AS BIGINT) AS fetch_rank
       |  FROM w)
       |SELECT doc_id, host, ts_s, win_s, fetch_rank,
       |  CAST(fetch_rank <= $maxPerWindow AS INTEGER) AS allow
       |FROM k
       |ORDER BY doc_id""".stripMargin

  /** E71: robots verdicts re-derived from the plant — every residue
    * class pins one matcher branch (prefix deny, longer-allow
    * override, no-match under correct group selection, $ anchor,
    * wildcard), so the oracle states the EXPECTED rule and verdict
    * arithmetically rather than re-parsing robots.txt.
    */
  def docRobotsFilter(): String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 7 AS h, doc_id % 5 AS r FROM documents)
      |SELECT doc_id,
      |  'site' || h || '.example.com' AS host,
      |  CASE r WHEN 0 THEN '/d' || h || '/x' || doc_id
      |         WHEN 1 THEN '/d' || h || '/open' || doc_id
      |         WHEN 2 THEN '/ok/p' || doc_id
      |         WHEN 3 THEN '/priv'
      |         ELSE '/w' || doc_id || 'z' END AS path,
      |  CASE r WHEN 0 THEN '/d' || h || '/'
      |         WHEN 1 THEN '/d' || h || '/open'
      |         WHEN 3 THEN '/priv$'
      |         WHEN 4 THEN '/w*z' END AS rule,
      |  CAST(CASE r WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 3 THEN 6
      |         WHEN 4 THEN 4 END AS BIGINT) AS rule_len,
      |  CAST(CASE WHEN r IN (1, 2) THEN 1 ELSE 0 END AS INTEGER) AS allow
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** E72: charset custody verdicts re-derived from the plant's
    * residue classes — valid sequences (ASCII/2/3/4-byte, optional
    * BOM) vs the five rejection classes that fall back to Latin-1.
    */
  def docCharsetSniff(): String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 11 AS stem, doc_id % 9 AS r,
      |    CASE WHEN doc_id % 2 = 0 AND doc_id % 9 <= 3 THEN 3 ELSE 0 END AS bom
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN r >= 4 THEN 'latin-1'
      |       WHEN bom = 3 THEN 'utf-8-bom' ELSE 'utf-8' END AS charset,
      |  CAST(bom + stem + CASE r WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
      |       WHEN 3 THEN 4 WHEN 4 THEN 2 WHEN 5 THEN 1 WHEN 6 THEN 2
      |       WHEN 7 THEN 3 ELSE 4 END AS BIGINT) AS n_bytes,
      |  CAST(CASE WHEN r <= 3 THEN stem + CASE r WHEN 0 THEN 0 ELSE 1 END
      |       ELSE stem + CASE r WHEN 4 THEN 2 WHEN 5 THEN 1 WHEN 6 THEN 2
      |            WHEN 7 THEN 3 ELSE 4 END END AS BIGINT) AS n_chars
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** E73: the composed intake funnel — every stage verdict re-derived
    * from its own plant's formula (robots residues, throttle ranks,
    * HTML envelope, charset residues) and rolled up per host.
    */
  def crawlIntakeFunnel(maxPerWindow: Int = 3, windowSec: Int = 60): String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |    'site' || (doc_id % 7) || '.example.com' AS host,
       |    (doc_id * 37) % 600 AS ts_s
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, host, ts_s, ts_s - ts_s % $windowSec AS win_s FROM r),
       |k AS (
       |  SELECT doc_id, host,
       |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY host, win_s
       |      ORDER BY ts_s, doc_id) <= $maxPerWindow THEN 1 ELSE 0 END AS sched_ok
       |  FROM w),
       |b AS (
       |  SELECT doc_id, host, sched_ok,
       |    CASE WHEN doc_id % 5 IN (1, 2) THEN 1 ELSE 0 END AS robots_ok,
       |    CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END AS html_ok,
       |    CASE WHEN doc_id % 9 <= 3 THEN 1 ELSE 0 END AS utf8_ok
       |  FROM k)
       |SELECT host, COUNT(*) AS n_reqs,
       |  CAST(SUM(robots_ok) AS BIGINT) AS n_robots_ok,
       |  CAST(SUM(sched_ok) AS BIGINT) AS n_sched_ok,
       |  CAST(SUM(robots_ok*sched_ok) AS BIGINT) AS n_fetch_ok,
       |  CAST(SUM(robots_ok*sched_ok*html_ok) AS BIGINT) AS n_extracted,
       |  CAST(SUM(utf8_ok) AS BIGINT) AS n_utf8,
       |  floor(CAST(SUM(robots_ok*sched_ok*html_ok) AS DOUBLE) / COUNT(*)
       |    * 1000000 + 0.5) / 1000000 AS yield_r
       |FROM b
       |GROUP BY host
       |ORDER BY host""".stripMargin

  /** E69: damped PageRank on the planted host graph, replayed on the
    * same 10⁻⁶ integer lattice as the Spark side (`//` everywhere a
    * float would make the sum order observable), one MATERIALIZED CTE
    * per round ([[graft-duckdb-materialized]]: every r_k is read by
    * two consumers in round k+1).
    */
  def hostRank(rounds: Int = 8): String = {
    val iters = (1 to rounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT nodes.host,
         |    CAST((150000 // nn.n) +
         |      (850000 * (COALESCE(s.sv, 0) + (dang.d // nn.n))) // 1000000
         |      AS BIGINT) AS r
         |  FROM nodes
         |  CROSS JOIN nn
         |  CROSS JOIN (
         |    SELECT COALESCE(SUM(CASE WHEN od.src IS NULL THEN p.r
         |        ELSE 0 END), 0) AS d
         |    FROM r${k - 1} p LEFT JOIN od ON p.host = od.src) dang
         |  LEFT JOIN (
         |    SELECT e.dst AS h, SUM(p.r // od.outdeg) AS sv
         |    FROM e JOIN r${k - 1} p ON e.src = p.host
         |    JOIN od ON od.src = e.src
         |    GROUP BY e.dst) s ON s.h = nodes.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT 'site' || (doc_id % 7) || '.example.com' AS src,
       |           'other' || (doc_id % 5) || '.example.net' AS dst
       |    FROM docs
       |    UNION ALL
       |    SELECT 'site' || (doc_id % 7) || '.example.com',
       |           'cdn' || (doc_id % 3) || '.example.net'
       |    FROM docs)),
       |nodes AS MATERIALIZED (
       |  SELECT host FROM (SELECT src AS host FROM e
       |                    UNION SELECT dst FROM e)),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
       |od AS MATERIALIZED (
       |  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
       |r0 AS MATERIALIZED (
       |  SELECT host, CAST(1000000 // nn.n AS BIGINT) AS r
       |  FROM nodes CROSS JOIN nn),
       |$iters,
       |ind AS (SELECT dst, COUNT(*) AS in_deg FROM e GROUP BY dst)
       |SELECT nodes.host,
       |  CAST(COALESCE(od.outdeg, 0) AS BIGINT) AS out_deg,
       |  CAST(COALESCE(ind.in_deg, 0) AS BIGINT) AS in_deg,
       |  r$rounds.r AS rank_6,
       |  CAST(r$rounds.r AS DOUBLE) / 1000000 AS rank_r
       |FROM nodes
       |LEFT JOIN od ON od.src = nodes.host
       |LEFT JOIN ind ON ind.dst = nodes.host
       |JOIN r$rounds ON r$rounds.host = nodes.host
       |ORDER BY nodes.host""".stripMargin
  }
}
