package graft

import org.apache.spark.sql.functions._

/** Recall probe for the D53 NN-descent graph search — the experiment
  * that sets its search topology and defaults (the LayerProbe
  * discipline: measure, don't assume). Candidates: directed vs
  * SYMMETRIZED refined edges (a top-kOut kNN graph is locally tight
  * but hard to ESCAPE along out-edges only), fixed-entry vs layered
  * coarse seeding (the D52 lesson), kOut/descRounds budgets, and a
  * refined ∪ seed union (long-range diversity). Prints recall@5 vs
  * exact plus the true scan volume (distinct scored vertices/query).
  * `runMain graft.NndProbe [sfDir]`.
  */
object NndProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, dir)
    val sim = graft.operators.Similarity
    val e = sim.withNorm(t.embeddings)
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(sim.annTopkBruteforce(t)
      .select(col("q_id"), col("vec_id")))
    def recall(m: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, ex) =>
        m.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    val beamW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("vec_id").asc)
    def run(tag: String, edges: org.apache.spark.sql.DataFrame,
        seeds: Option[org.apache.spark.sql.DataFrame], beam: Int, rounds: Int): Unit = {
      val (vis, visited) = seeds match {
        case Some(s) => sim.beamSearchVisitedFrom(e, edges, 8, s, beam, rounds)
        case None => sim.beamSearchVisited(e, edges, 8, beam, rounds)
      }
      val found = vis.filter(col("vec_id") =!= col("q_id"))
        .withColumn("rn", row_number().over(beamW))
        .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      val nc = visited.filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n")).agg(avg("n"))
        .head().getDouble(0)
      println(f"NNDPROBE $dir $tag rec=${recall(sets(found))}%.3f cands=$nc%.0f")
    }
    val seed = sim.knnEdgesMultiCosOf(e, 3, 8, 4, 128)
    def refined(kOut: Int, r: Int) = sim.nnDescentEdges(e, seed, kOut, r)
    def symm(ed: org.apache.spark.sql.DataFrame) =
      ed.select(col("src"), col("dst"))
        .unionByName(ed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    val r82 = refined(8, 2).cache()
    run("directed k8r2 flat", r82.select(col("src"), col("dst")), None, 8, 4)
    run("symm k8r2 flat", symm(r82), None, 8, 4)
    run("symm k8r2 flat r6", symm(r82), None, 8, 6)
    val r123 = refined(12, 3).cache()
    run("symm k12r3 flat", symm(r123), None, 8, 4)
    // layered seeding: coarse = refined graph over the mod-8 sample
    val es = e.filter(pmod(col("vec_id"), lit(8L)) === 0L)
    val seedS = sim.knnEdgesMultiCosOf(es, 3, 8, 4, 128)
    val coarse = symm(sim.nnDescentEdges(es, seedS, 8, 2))
    val ent1 = es.agg(min(col("vec_id")).as("vec_id"))
    val seeds1 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id")).crossJoin(broadcast(ent1))
    val (vis1, _) = sim.beamSearchVisitedFrom(e, coarse, 8, seeds1, 8, 4)
    val s0 = vis1.select(col("q_id"), col("vec_id")).cache()
    run("symm k8r2 layered", symm(r82), Some(s0), 8, 4)
    run("symm k12r3 layered", symm(r123), Some(s0), 8, 4)
    // refined ∪ raw-seed union (long-range diversity)
    val uni = symm(r82.select(col("src"), col("dst"), col("cos_r"))
      .unionByName(seed).distinct())
    run("symm k8r2+seed flat", uni, None, 8, 4)
    run("symm k8r2 beam16", symm(r82), None, 16, 4)
    // second wave: push the winning layered k12r3 design
    run("symm k12r3 layered beam12", symm(r123), Some(s0), 12, 4)
    run("symm k12r3 layered r6", symm(r123), Some(s0), 8, 6)
    val coarse123 = symm(sim.nnDescentEdges(es, seedS, 12, 3))
    val (vis1b, _) = sim.beamSearchVisitedFrom(e, coarse123, 8, seeds1, 8, 4)
    val s0b = vis1b.select(col("q_id"), col("vec_id")).cache()
    run("symm k12r3 layered c12r3", symm(r123), Some(s0b), 8, 4)
    val r163 = refined(16, 3).cache()
    run("symm k16r3 layered", symm(r163), Some(s0), 8, 4)
    run("symm k16r3 layered c12r3", symm(r163), Some(s0b), 8, 4)
    spark.stop()
  }
}
