package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Byte-level witness for the G43 prefix-sliced Matryoshka layout —
  * the measurement that closes the r14 "byte cut is unrealized" weak:
  * the D56/D57 claim is that prefix-p retrieval reads ~p/d of the
  * vector bytes, and this probe measures it from the REAL artifacts
  * (parquet footer column-chunk sizes — what the I/O layer actually
  * transfers per column group) and the REAL executed plans (every
  * FileSourceScanExec over the artifact: its ReadSchema, pushed
  * filters, and output rows).
  *
  * What it checks, in the G12/G26 discipline:
  *  - layout: bytes(v_prefix) / bytes(v_prefix + v_tail) ≈ p/d
  *    (compression makes it approximate; the footer numbers are the
  *    transferred truth);
  *  - retrieval: every corpus-sized scan projects ONLY
  *    (vec_id, v_prefix) — zero tail column chunks opened;
  *  - rerank: every tail-projecting scan carries a pushed vec_id
  *    predicate and outputs ≤ pool ∪ query rows, with footer min/max
  *    stats bounding the matched row groups.
  *
  * `runMain graft.PrefixSliceProbe [sfDir] [p]`. Results in SURVEY §7r.
  */
object PrefixSliceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val p = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.ensureRegistered(spark)
    val t = graft.sources.Tables(spark, sfDir)
    val nCorpus = t.embeddings.count()
    val dir = java.nio.file.Files.createTempDirectory("prefix_slice_probe").toString
    graft.sources.Sinks.writeEmbeddingsPrefixSliced(t, dir, p)
    val (_, dim) = graft.sources.Sinks.readPrefixSlicedMeta(spark, dir)

    // ---- footer truth: per-top-level-column compressed bytes + per-
    // row-group vec_id ranges (what parquet I/O actually pays per group)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(s"$dir/sliced")
      .getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/sliced"))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    var colBytes = Map.empty[String, Long].withDefaultValue(0L)
    // (vec_id min, vec_id max, block total bytes) per row group
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    files.foreach { f =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try {
        rdr.getFooter.getBlocks.forEach { b =>
          var lo = Long.MaxValue; var hi = Long.MinValue; var tot = 0L
          b.getColumns.forEach { c =>
            val top = c.getPath.toDotString.split('.').head
            colBytes = colBytes.updated(top, colBytes(top) + c.getTotalSize)
            tot += c.getTotalSize
            if (top == "vec_id") {
              val s = c.getStatistics
              lo = math.min(lo, s.genericGetMin.asInstanceOf[Number].longValue)
              hi = math.max(hi, s.genericGetMax.asInstanceOf[Number].longValue)
            }
          }
          groups += ((lo, hi, tot))
        }
      } finally rdr.close()
    }
    val prefixB = colBytes("v_prefix"); val tailB = colBytes("v_tail")
    val idB = colBytes("vec_id")

    // ---- executed-plan truth: capture every scan the served query runs
    case class Scan(root: String, cols: Seq[String], pushed: String, rows: Long)
    val scans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Scan]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      private def walk(n: SparkPlan): Seq[SparkPlan] = n match {
        case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
        case s: QueryStageExec => s +: walk(s.plan)
        case r: ReusedExchangeExec => r +: walk(r.child)
        case o => o +: (o.children ++ o.subqueries).flatMap(walk)
      }
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        walk(qe.executedPlan).foreach {
          case s: FileSourceScanExec =>
            scans.add(Scan(
              s.relation.location.rootPaths.headOption.fold("")(_.toString),
              s.requiredSchema.fieldNames.toSeq,
              s.metadata.getOrElse("PushedFilters", ""),
              s.metrics.get("numOutputRows").fold(0L)(_.value)))
          case _ => ()
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val served = graft.sources.Sinks.searchPrefixSliced(spark, dir)
      .collect()
    val ivfServed = graft.sources.Sinks.searchPrefixSlicedIvf(spark, dir)
      .collect()
    // async listener bus: wait for the scan list to go quiet
    var last = -1; var stable = 0
    while (stable < 3) {
      if (scans.size == last) stable += 1 else { stable = 0; last = scans.size }
      Thread.sleep(500)
    }
    spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    // scope to the DATA relation (the one-row meta scan is not part
    // of the byte claim)
    val artScans = scans.asScala.toSeq.filter(_.root.contains(s"$dir/sliced"))
    val tailScans = artScans.filter(_.cols.contains("v_tail"))
    val prefScans = artScans.filterNot(_.cols.contains("v_tail"))
    val badPref = prefScans.filterNot(_.cols.toSet.subsetOf(Set("vec_id", "v_prefix")))
    val unpushedTail = tailScans.filterNot(s =>
      s.pushed.contains("vec_id") || s.pushed.contains("In(") ||
        s.pushed.contains("LessThan"))

    // the rerank's pool, re-derived for the footer row-group bound
    val eP = graft.sources.Sinks.prefixSlicedRetrievalRel(spark, dir)
    val qP = eP.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
    val poolIds = graft.operators.Similarity.prefixPool(eP, qP, p, 20)
      .select(col("vec_id")).distinct().collect().map(_.getLong(0))
    val touchIds = (poolIds ++ (0L until 8L)).distinct
    val matched = groups.filter { case (lo, hi, _) =>
      touchIds.exists(id => id >= lo && id <= hi) }

    def frac(a: Long, b: Long) = if (b == 0) 0.0 else a.toDouble / b
    println(f"PREFIXSLICEPROBE $sfDir p=$p dim=$dim corpus_rows=$nCorpus " +
      f"layout_bytes prefix=$prefixB tail=$tailB vec_id=$idB " +
      f"vector_byte_fraction=${frac(prefixB, prefixB + tailB)}%.4f " +
      f"(p/d=${p.toDouble / dim}%.4f)")
    println(f"PREFIXSLICEPROBE retrieval artifact_scans=${artScans.size} " +
      f"prefix_only=${prefScans.size} rows_max=${
        if (prefScans.isEmpty) 0L else prefScans.map(_.rows).max} " +
      f"bad_projection=${badPref.size} " +
      f"retrieval_byte_fraction=${frac(idB + prefixB, idB + prefixB + tailB)}%.4f")
    println(f"PREFIXSLICEPROBE rerank tail_scans=${tailScans.size} " +
      f"tail_rows_max=${if (tailScans.isEmpty) 0L else tailScans.map(_.rows).max} " +
      f"unpushed=${unpushedTail.size} pool_ids=${poolIds.length} " +
      f"row_groups_matched=${matched.size}/${groups.size} " +
      f"matched_bytes=${matched.map(_._3).sum} total_bytes=${groups.map(_._3).sum}")
    println(s"PREFIXSLICEPROBE served_rows=${served.length} " +
      s"ivf_served_rows=${ivfServed.length}")
    spark.stop()
  }
}
