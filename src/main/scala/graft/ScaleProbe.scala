package graft

import org.apache.spark.sql.SparkSession

/** One-query timing probe: `runMain graft.ScaleProbe <query> <dir>
  * [iters]` times SparkEntry.queries(query) against the given table
  * dir through the noop sink (same evaluation discipline as Bench)
  * and prints per-iteration seconds. For chasing a single query's
  * scaling behavior without paying a full bench sweep.
  * `iters = 0` prints the executed plan (post-AQE, after one run)
  * instead of timing — the plan-audit loop.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMillis: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    // per-stage task-time accounting, to localize warmup/slow modes
    val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val m = info.taskMetrics
        val desc = f"in=${m.inputMetrics.recordsRead}%,d " +
          f"sR=${m.shuffleReadMetrics.recordsRead}%,d sW=${m.shuffleWriteMetrics.recordsWritten}%,d " +
          f"spillMem=${m.memoryBytesSpilled / 1048576}%,dMB spillDisk=${m.diskBytesSpilled / 1048576}%,dMB " +
          f"tasks=${info.numTasks}"
        stageTimes.put(info.stageId, (desc, m.executorRunTime))
      }
    })
    if (iters == 0) {
      val df = fn(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      println(s"PLAN $name\n${df.queryExecution.executedPlan}")
      spark.stop()
      return
    }
    (1 to iters).foreach { i =>
      stageTimes.clear()
      val (t0, g0, j0) = (System.nanoTime(), gcMillis, jitMillis)
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"PROBE $name iter=$i ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"gc=${(gcMillis - g0) / 1000.0}%.1f s jit=${(jitMillis - j0) / 1000.0}%.1f s")
      stageTimes.asScala.toSeq.sortBy(-_._2._2).take(4).foreach { case (id, (nm, t)) =>
        println(f"  stage $id%4d ${t / 1000.0}%8.1f s-task  $nm")
      }
    }
    spark.stop()
  }
}
