package graft

/** Recall probe for the D52 layered graph search — the experiment
  * that set its seeding rule and defaults (SURVEY §7n). Measured at
  * sf0.1 (recall@5 vs exact, 8 queries): flat D41 0.150; layered with
  * TOP-1 coarse seeding 0.100 (WORSE — the coarse winner strands the
  * walk in one fragmented component, the D42 effect); layered with
  * FULL-BEAM seeding 0.175 at (sampleMod=8, beam1=4, rounds1=2) and
  * 0.250 at the shipped defaults (8, 8, 4) — +67% over flat at the
  * same layer-0 beam. Denser samples (sampleMod 2/4) measured worse
  * than 8: their seeds cluster into fewer distinct components.
  * `runMain graft.LayerProbe [sfDir]`.
  */
object LayerProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, dir)
    val sim = graft.operators.Similarity
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(sim.annTopkBruteforce(t))
    def recall(m: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, ex) =>
        m.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    println(f"LAYERPROBE $dir flat=${recall(sets(sim.annGraphSearch(t)))}%.3f")
    for ((sm, b1, r1) <- Seq((8, 8, 4), (8, 4, 2), (4, 8, 3), (2, 8, 3)))
      println(f"LAYERPROBE $dir layered sm=$sm b1=$b1 r1=$r1 " +
        f"rec=${recall(sets(sim.annGraphSearchLayered(t, sampleMod = sm, beam1 = b1, rounds1 = r1)))}%.3f")
    spark.stop()
  }
}
