package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured context for the B53 Bloom semi-join reduction: `runMain
  * graft.BloomProbe [factRows] [nKeys] [selPctHash] [iters]` builds a
  * synthetic fact table against a SELECTIVE dim (≈2% of keys kept)
  * with broadcast disabled and times THREE variants of the join:
  *
  *  1. `naive`   — runtime filtering OFF: the join shuffles the whole
  *     fact table to probe it (the 100 TB failure mode);
  *  2. `builtin` — Spark's own runtime Bloom filter (injected by the
  *     optimizer since 3.3, on by default): shuffle collapses to
  *     ~selectivity·fact;
  *  3. `explicit` — the B53 operator's hand-built broadcast bit
  *     array: same shuffle cut as the builtin.
  *
  * Probe findings (local[8], 20M fact × 200k keys, 2% selected):
  *
  *  - When the selection is lineage-visible (a predicate in the same
  *    plan), Catalyst's CONSTRAINT INFERENCE propagates it onto the
  *    fact side at plan time — the "naive" join already shuffled only
  *    400k rows, and localCheckpoint doesn't sever it (LogicalRDD
  *    preserves constraints). Declare the join; the optimizer wins.
  *  - When the dim is PRE-MATERIALIZED (parquet round-trip — a key
  *    set computed by an earlier job, the C9b decontamination shape),
  *    neither constraint inference nor the builtin runtime Bloom can
  *    see its selectivity: both naive and builtin shuffle the full
  *    20,003,988 records. The explicit B53 bit array cuts that to
  *    454,692 (44× fewer shuffle records, ~1.6–3× wall at local[8];
  *    at cluster scale shuffle bytes are the job). THAT is the
  *    operator's niche — persisted/cross-job/externally-supplied key
  *    sets, plus filters reused by several downstream queries.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val factRows = if (args.length > 0) args(0).toLong else 20000000L
    val nKeys = if (args.length > 1) args(1).toLong else 200000L
    val selPct = if (args.length > 2) args(2).toInt else 2
    val iters = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The dim must round-trip through parquet: a lineage-visible
    // key-derived selection gets propagated onto the fact side by
    // Catalyst's constraint inference (measured: the 20M-row "naive"
    // shuffle collapsed to 400k with ALL runtime filters off — and
    // localCheckpoint didn't sever it either, LogicalRDD preserves
    // constraints). A real selective dim (predicate over attributes
    // the key doesn't determine) is what the parquet round-trip
    // models.
    spark.range(nKeys)
      .select(col("id").as("k"))
      .filter(pmod(hash(col("k")), lit(100)) < selPct)
      .write.mode("overwrite").parquet("target/bloomprobe-dim")
    val dim = spark.read.parquet("target/bloomprobe-dim")
    val fact = spark.range(factRows)
      .select((col("id") % nKeys).as("fk"), col("id").as("payload"))

    val mBits = 65536
    val kHashes = 4
    val nWords = mBits / 64
    def pos(c: org.apache.spark.sql.Column, r: Int) =
      pmod(hash(c, lit(r)), lit(mBits)).cast("long")
    val bloomRow = dim
      .select(explode(array((0 until kHashes).map(r => pos(col("k"), r)): _*)).as("p"))
      .groupBy(shiftright(col("p"), 6).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("wm"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        w => coalesce(element_at(col("wm"), w), lit(0L))).as("bloom"))
    def bitTest(p: org.apache.spark.sql.Column) =
      element_at(col("bloom"), (shiftright(p, 6) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L

    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleRecs.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    def timeIt(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      shuffleRecs.set(0L)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      (s, shuffleRecs.get())
    }

    def plain() = fact.join(dim, col("fk") === col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    def bloomed() = fact.crossJoin(broadcast(bloomRow))
      .filter((0 until kHashes).map(r => bitTest(pos(col("fk"), r))).reduce(_ && _))
      .drop("bloom")
      .join(dim, col("fk") === col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))

    // correctness first: identical result rows
    val diff = plain().union(bloomed()).except(plain().intersect(bloomed())).count()
    require(diff == 0, s"bloom-prefiltered join must be row-identical, diff=$diff")

    val rbfConf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    def withRbf[A](on: Boolean)(body: => A): A = {
      val prev = spark.conf.get(rbfConf)
      spark.conf.set(rbfConf, on.toString)
      try body finally spark.conf.set(rbfConf, prev)
    }

    if (sys.env.contains("BLOOM_PROBE_PLANS")) {
      withRbf(on = false) {
        val df = plain(); df.collect()
        println("== naive (rbf off) ==\n" + df.queryExecution.executedPlan.toString.take(2500))
      }
    }

    (1 to iters).foreach { i =>
      val (tn, rn) = withRbf(on = false)(timeIt(plain()))
      val (tp, rp) = withRbf(on = true)(timeIt(plain()))
      val (tb, rb) = withRbf(on = false)(timeIt(bloomed()))
      println(f"iter=$i naive=$tn%.2fs shuffled=$rn builtin=$tp%.2fs shuffled=$rp " +
        f"explicit=$tb%.2fs shuffled=$rb " +
        f"naive_vs_filtered_shuffle_cut=${rn.toDouble / math.max(rb, 1)}%.1fx " +
        f"builtin_vs_explicit=${rp.toDouble / math.max(rb, 1)}%.2fx")
    }
    spark.stop()
  }
}
