package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ONLINE ANN serving off the persisted G26 IVFPQ index — the
  * streaming twin the vector-index deploy arc was missing (the r11
  * verdict's #3 gap): dedup/CDC/quality all had stream twins, but
  * `searchIvfPqIndex` was batch-only, and a production vector service
  * answers ARRIVING queries, not batch jobs.
  *
  * Shape: every step up to the final top-k is STATELESS — the coarse
  * centers and residual codebook load once from the index artifacts
  * (bounded, the broadcast-as-literals discipline), each arriving
  * query row computes its probe cells and per-cell ADC table as
  * narrow codegen'd columns, and candidates come from a STREAM-STATIC
  * equi-join against the persisted packed code relation (tombstones
  * anti-joined — a deleted vector never serves online either). Only
  * the per-query top-k keeps state, keyed (q_id, ingest_ts) and
  * closed by the watermark like every windowed aggregate in this
  * module; the in-group sort mirrors the batch adcTopK tie rule
  * (dist asc, vec_id asc) via array_sort's struct ordering.
  *
  * StreamingSpec law: on watermark-closed queries the emitted rows ≡
  * [[graft.sources.Sinks.searchIvfPqIndex]] row-for-row.
  *
  * Scale note: the static side is the full codes relation — per-batch
  * partition PRUNING (the batch path's planning-time win) would need
  * foreachBatch re-planning, at the cost of composability; the
  * stream-static hash join still touches only matching cells' rows
  * after the scan. At true serving scale the codes relation is
  * bucketed by cell so the join co-locates.
  */
object AnnStreamJob {

  /** `queries`: streaming (q_id: long, v: array<double>, ingest_ts:
    * timestamp). Returns (q_id, rank, vec_id, adc_dist_r) per closed
    * query.
    */
  def streamAnnServe(queries: DataFrame, indexPath: String, k: Int = 5,
      m: Int = 8, nProbe: Int = 4,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorExprs.ensureRegistered(spark)
    val sinks = graft.sources.Sinks
    val coarse = sinks.readQuantizer(spark, s"$indexPath/coarse")
    val pqr = sinks.readQuantizer(spark, s"$indexPath/codebook")
    val dsub = pqr.head._2.length / m
    val byCell = typedLit(coarse.sortBy(_._1).toSeq.map(_._2))
    val r6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    // per-row probe cells: literal-center r6'd dist2 + cell tiebreak,
    // mirroring Similarity.probeCells bit for bit (same native dot)
    val n2 = graft.functions.VectorExprs.dot(col("v"), col("v"))
    val cellCands = coarse.map { case (cell, cv, c2) =>
      struct(
        r6(col("n2") - lit(2.0) * graft.functions.VectorExprs.dot(col("v"), typedLit(cv))
          + lit(c2)).as("dist2_r"),
        lit(cell.toLong).as("cell"))
    }
    val probed = queries
      .withWatermark("ingest_ts", watermarkDelay)
      .withColumn("n2", n2)
      .select(col("q_id"), col("ingest_ts"),
        explode(slice(array_sort(array(cellCands: _*)), 1, nProbe)).as("p"),
        col("v"))
      .select(col("q_id"), col("ingest_ts"), col("p.cell").as("pcell"),
        zip_with(col("v"),
          element_at(byCell, col("p.cell").cast("int") + 1),
          (x, c) => x - c).as("qr"))
    val perJ = (0 until m).map { j =>
      val xv = slice(col("qr"), j * dsub + 1, dsub)
      graft.functions.VectorExprs.pqDists(xv,
        graft.operators.Similarity.subCodebook(pqr, j, dsub))
    }
    val adc = probed.select(col("q_id"), col("ingest_ts"),
      col("pcell"), array(perJ: _*).as("dtab"))
    // static side: packed codes, tombstones anti-joined (G32 custody
    // holds online too)
    val codesBase = spark.read.parquet(s"$indexPath/codes")
      .select(col("vec_id"), col("cell").cast("long").as("cell"), col("codes"))
    val tomb = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val codes =
      if (tomb.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tomb))
        codesBase.join(broadcast(spark.read.parquet(s"$indexPath/tombstones")
          .select(col("vec_id")).distinct()), Seq("vec_id"), "left_anti")
      else codesBase
    val scored = adc.join(codes,
        col("cell") === col("pcell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("ingest_ts"), col("vec_id"),
        expr("CAST(aggregate(zip_with(dtab, codes, " +
          "(ds, c) -> element_at(ds, CAST(c AS INT) + 1)), " +
          "CAST(0 AS DECIMAL(38, 6)), " +
          "(acc, x) -> acc + CAST(x AS DECIMAL(18, 6))) AS DOUBLE)")
          .as("adc_dist_r"))
    scored
      .groupBy(col("q_id"), col("ingest_ts"))
      .agg(slice(sort_array(collect_list(
        struct(col("adc_dist_r"), col("vec_id")))), 1, k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("ri", "t")))
      .select(col("q_id"), (col("ri") + 1).cast("long").as("rank"),
        col("t.vec_id").as("vec_id"), col("t.adc_dist_r").as("adc_dist_r"))
  }
}
