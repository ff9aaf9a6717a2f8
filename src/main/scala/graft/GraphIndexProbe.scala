package graft

import org.apache.spark.sql.functions._

/** Insertion-quality probe for the G39 persisted graph index — the
  * measurement behind the append claim (the LayerProbe discipline:
  * SinksSpec pins the deterministic duplicate-findability law; this
  * measures the general case): build the index on HALF the corpus
  * (even vec_ids), NSW-append the other half, and compare recall@5
  * (vs the exact corpus-wide top-k) against a one-shot index over the
  * full corpus. The gap between the two columns is the price of
  * insertion order; `recall_appended_only` isolates how findable the
  * APPENDED vectors themselves are.
  * `runMain graft.GraphIndexProbe [sfDir]`.
  */
object GraphIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, dir)
    val sim = graft.operators.Similarity
    val exact = sim.annTopkBruteforce(t).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(m: Map[Long, Set[Long]], restrict: Option[Long => Boolean] = None) = {
      val ex = restrict.fold(exact)(p =>
        exact.view.mapValues(_.filter(p)).filter(_._2.nonEmpty).toMap)
      if (ex.isEmpty) -1.0
      else {
        val rs = ex.map { case (q, e) =>
          m.getOrElse(q, Set.empty).count(e).toDouble / e.size }
        rs.sum / rs.size
      }
    }
    def served(path: String) = graft.sources.Sinks
      .searchGraphIndex(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val oneShot = java.nio.file.Files.createTempDirectory("gidx_one").toString
    graft.sources.Sinks.writeGraphIndex(t, oneShot)
    val one = served(oneShot)
    val grown = java.nio.file.Files.createTempDirectory("gidx_grow").toString
    val tHalf = t.copy(embOverride = Some(
      t.embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)))
    graft.sources.Sinks.writeGraphIndex(tHalf, grown)
    graft.sources.Sinks.appendToGraphIndex(spark, grown,
      t.embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
        .select(col("vec_id"), col("embedding")))
    val gr = served(grown)
    println(f"GRAPHIDXPROBE $dir one_shot=${recall(one)}%.3f " +
      f"grown=${recall(gr)}%.3f " +
      f"grown_appended_only=${recall(gr, Some(_ % 2 == 1))}%.3f " +
      f"one_shot_appended_only=${recall(one, Some(_ % 2 == 1))}%.3f")
    // the G42 provisioning guard's build-time number: out-degree of
    // the serving entry over the stored coarse layer (0 = the
    // edge-less-entry pathology writeGraphIndex warns/refuses on)
    println(s"GRAPHIDXENTRY $dir coarse_entry_out_degree=" +
      s"${graft.sources.Sinks.coarseEntryOutDegree(spark, oneShot)} " +
      s"grown=${graft.sources.Sinks.coarseEntryOutDegree(spark, grown)}")
    // r13 append-wave SOAK (the r12 verdict's #3): one wave proved a
    // single insert batch doesn't degrade the graph; continuous
    // insertion needs the CURVE — build on 1/12 of the corpus, append
    // the other 11 twelfths as sequential NSW waves, and report
    // recall@5 after every wave, graded against the exact top-k
    // RESTRICTED to the vectors present at that wave (both the exact
    // sets and the query set grow as waves land). The claim under
    // test: no monotone decay as appended mass comes to dominate the
    // descent-built base.
    val nWaves = 12
    val waves = java.nio.file.Files.createTempDirectory("gidx_waves").toString
    graft.sources.Sinks.writeGraphIndex(t.copy(embOverride = Some(
      t.embeddings.filter(pmod(col("vec_id"), lit(nWaves)) === 0))), waves)
    def waveRecall(m: Map[Long, Set[Long]], present: Long => Boolean): Double = {
      val qs = exact.keys.filter(present).toSeq.sorted
      val rs = qs.map { q =>
        val e = exact(q).filter(present)
        if (e.isEmpty) 1.0 else m.getOrElse(q, Set.empty).count(e).toDouble / e.size
      }
      if (rs.isEmpty) -1.0 else rs.sum / rs.size
    }
    // each wave is graded against TWO yardsticks: the exact top-k over
    // the present vectors (absolute recall — declines as the corpus
    // grows because the task hardens, not because insertion degrades)
    // and a ONE-SHOT descent-built index over the same present set
    // (the decay-isolating baseline: grown − one_shot is the price of
    // insertion order, and THAT is what must not decay monotonically)
    val curve = (0 until nWaves).map { w =>
      if (w > 0)
        graft.sources.Sinks.appendToGraphIndex(spark, waves,
          t.embeddings.filter(pmod(col("vec_id"), lit(nWaves)) === w)
            .select(col("vec_id"), col("embedding")))
      val present = (id: Long) => id % nWaves <= w
      val r = waveRecall(served(waves), present)
      val oneW = java.nio.file.Files.createTempDirectory(s"gidx_one_w$w").toString
      graft.sources.Sinks.writeGraphIndex(t.copy(embOverride = Some(
        t.embeddings.filter(pmod(col("vec_id"), lit(nWaves)) <= w))), oneW)
      val r1 = waveRecall(served(oneW), present)
      println(f"GRAPHIDXWAVE $dir wave=$w grown=$r%.3f one_shot=$r1%.3f " +
        f"gap=${r - r1}%+.3f")
      (r, r1)
    }
    println(s"GRAPHIDXWAVES $dir grown=" +
      curve.map(c => f"${c._1}%.3f").mkString(",") +
      " one_shot=" + curve.map(c => f"${c._2}%.3f").mkString(","))
    // G42 coarse-layer drift after the 11 append waves, and again
    // after a takedown wave — the D40-style monitor that says when the
    // coarse layer needs a re-descend (share under-provisioned or
    // entry-reach trailing a fresh re-sample)
    def driftLine(tag: String): Unit = {
      val c = graft.sources.Sinks.coarseDriftCard(spark, waves).collect()(0)
      println(f"GRAPHIDXDRIFT $dir $tag n_live=${c.getAs[Long]("n_live")} " +
        f"n_coarse_live=${c.getAs[Long]("n_coarse_live")} " +
        f"share=${c.getAs[Double]("coarse_share_r")}%.4f " +
        f"share_drift=${c.getAs[Double]("share_drift_r")}%+.4f " +
        f"reach=${c.getAs[Double]("reach_r")}%.3f " +
        f"reach_fresh=${c.getAs[Double]("reach_fresh_r")}%.3f " +
        f"reach_gap=${c.getAs[Double]("reach_gap_r")}%+.3f")
    }
    driftLine("post_waves")
    graft.sources.Sinks.deleteFromGraphIndex(spark, waves,
      t.embeddings.select(col("vec_id")).filter(pmod(col("vec_id"), lit(16)) === 0))
    driftLine("post_takedown")
    spark.stop()
  }
}
