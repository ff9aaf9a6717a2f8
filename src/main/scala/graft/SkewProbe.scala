package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-skew measurement for the salting utility (B44 /
  * plans/SaltedJoin): `runMain graft.SkewProbe [hotRows] [uniformRows]
  * [iters]` builds a synthetic power-law corpus — ONE hot key carrying
  * `hotRows` rows next to `uniformRows` spread over 200k keys (the
  * shape A60's Zipf fit measures on real event streams) — and times
  * the plain shuffled equi-join against the salted join, with the two
  * runtime remedies OFF (AQE skew-join disabled, broadcast threshold
  * −1): the regime explicit salting exists for, where the right side
  * is "too big to broadcast" and the planner can't re-split at
  * runtime. The SaltedJoinSpec laws prove row-identity; this probe
  * turns the mitigation into a measured wall-time win — without it a
  * single reducer owns the hot key's whole row mass while the other
  * cores idle.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val hotRows = if (args.length > 0) args(0).toLong else 8000000L
    val uniformRows = if (args.length > 1) args(1).toLong else 8000000L
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nKeys = 200000L
    val left = spark.range(hotRows).select(lit(0L).as("k"), col("id").as("payload"))
      .union(spark.range(uniformRows)
        .select((col("id") % nKeys + 1L).as("k"), col("id").as("payload")))
    val right = spark.range(nKeys + 1L)
      .select(col("id").as("rk"), (col("id") * 7L).as("weight"))

    // straggler visibility: wall-clock under-sells the skew (map-side
    // scan/shuffle-write is parallel either way and hides part of the
    // one-reducer stall), so the probe also reports the longest single
    // task of each run — the number that becomes the job time once
    // maps are a smaller fraction, i.e. at real scale
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        maxTask.accumulateAndGet(te.taskInfo.duration, Math.max(_, _))
    })
    def timeIt(label: String)(df: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      maxTask.set(0L)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      // listener is async; the max task of the heavy stage has landed
      // by the time the action returns, modulo milliseconds
      Thread.sleep(200)
      val mt = maxTask.get() / 1000.0
      println(f"SKEWPROBE $label%-7s $s%8.3f s wall, $mt%7.3f s max-task  (hot=$hotRows uniform=$uniformRows cpus=$cpus)")
      (s, mt)
    }

    val results = (1 to iters).map { _ =>
      val plain = timeIt("plain") {
        left.join(right, left("k") === right("rk")).select(col("k"), col("weight"))
      }
      val salted = timeIt("salted") {
        graft.plans.SaltedJoin.saltedJoin(left, right, "k", "rk", 8)
          .select(col("k"), col("weight"))
      }
      (plain, salted)
    }
    val bestPlain = results.map(_._1._1).min
    val bestSalted = results.map(_._2._1).min
    val taskPlain = results.map(_._1._2).min
    val taskSalted = results.map(_._2._2).min
    println(f"SKEWPROBE speedup ${bestPlain / bestSalted}%.2fx wall (plain $bestPlain%.3f s -> salted $bestSalted%.3f s), " +
      f"${taskPlain / taskSalted}%.2fx straggler-task (plain $taskPlain%.3f s -> salted $taskSalted%.3f s)")
    spark.stop()
  }
}
