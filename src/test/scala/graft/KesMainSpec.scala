package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.KubeEventOps
import graft.sources.KubeEventSource

/** End-to-end drive of the KesMain pipeline shape (same query, test
  * dirs, AvailableNow): JSON-lines in → deduped JSON-lines out.
  */
class KesMainSpec extends SparkSpec {

  test("directory-to-directory pipeline dedups and writes JSON lines") {
    val in = Files.createTempDirectory("kes_in").toFile
    val out = Files.createTempDirectory("kes_out").toFile.getAbsolutePath + "/data"
    val ckpt = Files.createTempDirectory("kes_ckpt").toFile.getAbsolutePath
    val lines = Seq(
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}""",
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}""",
      """{"metadata":{"name":"e2","uid":"u2","resourceVersion":"2","creationTimestamp":"2024-01-01T00:00:05Z"},"involvedObject":{"kind":"Pod"},"reason":"Pulled","type":"Normal"}""")
    Files.writeString(new java.io.File(in, "events.json").toPath, lines.mkString("\n"))

    val q = KubeEventOps
      .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
      .select(col("line").as("value"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = spark.read.text(out).collect().map(_.getString(0))
    assert(got.length == 2, s"3 lines, 1 dup → 2: ${got.toSeq}")
    assert(got.forall(_.startsWith("""{"time":""")), got.head)
  }

  test("CurateMain: JSONL landing dir to curated parquet + quarantine; second --once run is incremental with recovered dedup state") {
    val in = Files.createTempDirectory("curate_in").toFile
    val out = Files.createTempDirectory("curate_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("curate_ckpt2").toFile.getAbsolutePath
    val good = ("the and of to in " * 25).trim
    def line(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"t","n_chars":${text.length}}"""
    Files.writeString(new java.io.File(in, "b1.json").toPath,
      Seq(line(1, good), line(2, good + " extra"), "{ corrupt").mkString("\n"))
    def runOnce(): Unit =
      CurateMain.startQueries(spark, in.getAbsolutePath, out, ckpt, once = true)
        .foreach(_.awaitTermination(120000))
    runOnce()
    val kept1 = spark.read.parquet(s"$out/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(1L, 2L), s"kept=$kept1")
    assert(spark.read.text(s"$out/_quarantine").collect()
      .map(_.getString(0)).toSeq == Seq("{ corrupt"))
    // second landing file, second process lifetime: only NEW docs are
    // processed, and a duplicate of a run-1 doc stays suppressed
    // (the curation dedup state came back from the checkpoint)
    Files.writeString(new java.io.File(in, "b2.json").toPath,
      Seq(line(3, good), line(4, good + " fresh")).mkString("\n"))
    runOnce()
    val kept2 = spark.read.parquet(s"$out/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L, 4L),
      s"run-2 must dedup doc 3 against run-1's state: $kept2")
  }

  test("restart recovers dedup state from the checkpoint (the reference's persistent CACHE_DB)") {
    val in = Files.createTempDirectory("kes_in2").toFile
    val out = Files.createTempDirectory("kes_out2").toFile.getAbsolutePath + "/data"
    val ckpt = Files.createTempDirectory("kes_ckpt2").toFile.getAbsolutePath
    def run(): Unit = {
      val q = KubeEventOps
        .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
        .select(col("line").as("value"))
        .writeStream.format("text")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    val e1 =
      """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}"""
    val e3 =
      """{"metadata":{"name":"e3","uid":"u3","resourceVersion":"3","creationTimestamp":"2024-01-01T00:00:30Z"},"involvedObject":{"kind":"Pod"},"reason":"Killing","type":"Normal"}"""
    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    run()
    // second process lifetime: the duplicate of e1 arrives again + a new event
    Files.writeString(new java.io.File(in, "b2.json").toPath, Seq(e1, e3).mkString("\n"))
    run()
    val got = spark.read.text(out).collect().map(_.getString(0))
    assert(got.length == 2, s"dup across restart must be suppressed by recovered state: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u1\"")) && got.exists(_.contains("\"uid\":\"u3\"")))
  }

  private val e1 =
    """{"metadata":{"name":"e1","uid":"u1","resourceVersion":"1","creationTimestamp":"2024-01-01T00:00:00Z"},"involvedObject":{"kind":"Pod"},"reason":"Started","type":"Normal"}"""
  private val e3 =
    """{"metadata":{"name":"e3","uid":"u3","resourceVersion":"3","creationTimestamp":"2024-01-01T00:00:30Z"},"involvedObject":{"kind":"Pod"},"reason":"Killing","type":"Normal"}"""

  test("LOG_JSON=1 switches the driver to structured JSON logging (reference src/main.rs:38-49)") {
    val L = org.apache.spark.graftbridge.LoggingBridge
    val before = L.jsonLogsEnabled
    try {
      KesMain.configureLogging(Map.empty)
      assert(L.jsonLogsEnabled == before, "no flag → no change")
      KesMain.configureLogging(Map("LOG_JSON" -> "1"))
      assert(L.jsonLogsEnabled, "flag must enable the JSON layout path")
    } finally {
      if (!before) L.disableJsonLogs()
      System.clearProperty("spark.log.structuredLogging.enabled")
    }
  }

  test("orderly stop mid-stream commits the checkpoint; restart resumes cleanly (reference term_request)") {
    val in = Files.createTempDirectory("kes_in3").toFile
    val out = Files.createTempDirectory("kes_out3").toFile.getAbsolutePath + "/data"
    val ckpt = Files.createTempDirectory("kes_ckpt3").toFile.getAbsolutePath

    // first lifetime: a CONTINUOUS query (the daemon mode), stopped by
    // the same orderlyStop the SIGTERM hook runs — not by JVM death
    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    val q1 = KubeEventOps
      .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
      .select(col("line").as("value"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    q1.processAllAvailable() // e1's micro-batch is in flight or committed
    KesMain.orderlyStop(q1, None, None)
    assert(!q1.isActive, "orderlyStop must stop the query")

    // second lifetime resumes from the committed checkpoint: the dup of
    // e1 is suppressed by recovered state, e3 flows
    Files.writeString(new java.io.File(in, "b2.json").toPath, Seq(e1, e3).mkString("\n"))
    val q2 = KubeEventOps
      .streamPipeline(KubeEventSource.streamJsonLines(spark, in.getAbsolutePath))
      .select(col("line").as("value"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)

    val got = spark.read.text(out).collect().map(_.getString(0))
    assert(got.length == 2, s"orderly stop must not lose or duplicate state: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u1\"")) && got.exists(_.contains("\"uid\":\"u3\"")))
  }

  test("CACHE_RECREATE=1 moves a corrupt checkpoint aside and continues (reference get_db recovery)") {
    val in = Files.createTempDirectory("kes_in4").toFile
    val outDir = Files.createTempDirectory("kes_out4").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("kes_ckpt4").toFile.getAbsolutePath + "/ckpt"

    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"), Map.empty)

    // corrupt the query metadata (the file read first on restart)
    Files.writeString(java.nio.file.Paths.get(ckpt, "metadata"), "{truncated")

    // without the flag: crash-loop behavior (the run throws)
    Files.writeString(new java.io.File(in, "b2.json").toPath, e3)
    intercept[Exception] {
      KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"), Map.empty)
    }

    // with the flag: dir moved aside, fresh state, pipeline continues
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"),
      Map("CACHE_RECREATE" -> "1"))
    val got = spark.read.text(s"$outDir/data").collect().map(_.getString(0))
    // fresh state re-reads the whole input dir: e1 re-emits (dedup state
    // discarded — the same trade the reference makes recreating a
    // corrupt sled DB) and e3 flows; the metadata-aware reader sees the
    // post-recovery sink log (the old one is moved aside with the
    // checkpoint)
    assert(got.exists(_.contains("\"uid\":\"u3\"")), s"post-recovery batch must flow: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u1\"")), s"fresh state re-emits the dup once: ${got.toSeq}")
    val aside = new java.io.File(ckpt).getParentFile.listFiles()
      .filter(_.getName.startsWith("ckpt.corrupt-"))
    assert(aside.nonEmpty, "corrupt checkpoint must be preserved aside")
  }

  test("CACHE_RECREATE completes an interrupted recovery (sink log aside, checkpoint intact)") {
    val in = Files.createTempDirectory("kes_in6").toFile
    val outDir = Files.createTempDirectory("kes_out6").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("kes_ckpt6").toFile.getAbsolutePath + "/ckpt"

    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"), Map.empty)

    // simulate the crash window: a recovery wrote its in-progress
    // marker, moved the sink log aside, and died before moving the
    // (actually healthy) checkpoint — so the marker survived
    java.nio.file.Files.createFile(KesMain.recoveryMarker(s"$outDir/data"))
    val sinkLog = java.nio.file.Paths.get(s"$outDir/data", "_spark_metadata")
    java.nio.file.Files.move(sinkLog,
      sinkLog.resolveSibling("_spark_metadata.corrupt-simulated"))

    Files.writeString(new java.io.File(in, "b2.json").toPath, e3)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"),
      Map("CACHE_RECREATE" -> "1"))

    // the orphaned checkpoint must be moved aside (recovery completed)
    assert(new java.io.File(ckpt).getParentFile.listFiles()
      .exists(_.getName.startsWith("ckpt.corrupt-")),
      "interrupted recovery must move the checkpoint aside")
    // ... and the marker cleared, so the NEXT start is a normal one
    assert(!java.nio.file.Files.exists(KesMain.recoveryMarker(s"$outDir/data")),
      "completed recovery must delete its in-progress marker")
    // fresh state re-emits e1 and flows e3 into a FRESH sink log the
    // metadata-aware reader trusts (no invisible pre-crash output)
    val got = spark.read.text(s"$outDir/data").collect().map(_.getString(0))
    assert(got.exists(_.contains("\"uid\":\"u1\"")), s"re-emit after completed recovery: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u3\"")), s"new batch must flow: ${got.toSeq}")
  }

  test("leftover corrupt-* forensics never discard a later healthy checkpoint (marker precision)") {
    val in = Files.createTempDirectory("kes_in8").toFile
    val outDir = Files.createTempDirectory("kes_out8").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("kes_ckpt8").toFile.getAbsolutePath + "/ckpt"

    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"), Map.empty)

    // state after an OLD completed recovery (its forensic names linger
    // forever) plus a crash before the next lifetime's first sink
    // commit: healthy checkpoint, sink log absent, stale corrupt-*
    // name present — but NO in-progress marker
    Files.createDirectory(java.nio.file.Paths.get(s"$outDir/data", "_spark_metadata.corrupt-999"))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$outDir/data", "_spark_metadata"))

    def partFiles(): Set[java.io.File] = Option(new java.io.File(s"$outDir/data").listFiles())
      .fold(Set.empty[java.io.File])(_.filter(_.getName.startsWith("part-")).toSet)
    val before = partFiles()
    Files.writeString(new java.io.File(in, "b2.json").toPath, Seq(e1, e3).mkString("\n"))
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"),
      Map("CACHE_RECREATE" -> "1"))

    // the healthy checkpoint must survive: no aside copy, and the
    // recovered dedup state still suppresses the duplicate of e1.
    // (Raw part files, not the metadata-aware reader: the resumed
    // query's fresh sink log starts at the checkpoint's next batch id,
    // so the log has a gap — the data itself is intact.)
    assert(!new java.io.File(ckpt).getParentFile.listFiles()
      .exists(_.getName.startsWith("ckpt.corrupt-")),
      "healthy checkpoint must not be discarded on forensic leftovers alone")
    val got = (partFiles() -- before).toSeq.map(f => Files.readString(f.toPath)).mkString("\n")
    assert(got.contains("\"uid\":\"u3\""), s"new batch must flow: $got")
    assert(!got.contains("\"uid\":\"u1\""),
      s"recovered state must suppress the replayed duplicate: $got")
  }

  test("CACHE_RECREATE moves a stale sink log aside when the checkpoint is gone (no silent batch skip)") {
    val in = Files.createTempDirectory("kes_in7").toFile
    val outDir = Files.createTempDirectory("kes_out7").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("kes_ckpt7").toFile.getAbsolutePath + "/ckpt"

    Files.writeString(new java.io.File(in, "b1.json").toPath, e1)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"), Map.empty)

    // operator loses the checkpoint out-of-band; the committed sink
    // log survives — a fresh batch 0 would be silently skipped
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(ckpt))

    Files.writeString(new java.io.File(in, "b2.json").toPath, e3)
    KesMain.run(Array(in.getAbsolutePath, s"$outDir/data", ckpt, "3600 seconds", "--once"),
      Map("CACHE_RECREATE" -> "1"))

    val got = spark.read.text(s"$outDir/data").collect().map(_.getString(0))
    assert(got.exists(_.contains("\"uid\":\"u3\"")),
      s"fresh query must not silently skip its batches against the stale log: ${got.toSeq}")
    assert(got.exists(_.contains("\"uid\":\"u1\"")), s"re-emitted backlog flows: ${got.toSeq}")
  }

  test("recovery move order is crash-safe: sink log goes aside before the checkpoint") {
    // if the process dies between the two moves, the survivor state
    // must be old-checkpoint + no sink log (restart merely re-emits) —
    // never no-checkpoint + stale sink log (restart silently skips
    // every batch the stale log lists). Simulate the failing second
    // move with a nonexistent checkpoint path: the sink log must
    // already be aside when the checkpoint move throws.
    val outDir = Files.createTempDirectory("kes_out5").toFile.getAbsolutePath
    val sinkLog = java.nio.file.Paths.get(outDir, "_spark_metadata")
    Files.createDirectory(sinkLog)
    Files.writeString(sinkLog.resolve("0"), "v1")
    val ckpt = Files.createTempDirectory("kes_ckpt5").toFile.getAbsolutePath + "/missing"
    intercept[java.nio.file.NoSuchFileException] {
      KesMain.moveCheckpointAside(ckpt, outDir)
    }
    assert(!Files.exists(sinkLog),
      "sink log must be moved aside before the checkpoint move can fail")
    assert(new java.io.File(outDir).listFiles()
      .exists(_.getName.startsWith("_spark_metadata.corrupt-")),
      "moved-aside sink log must be preserved for forensics")
  }

  test("metrics default to port 9000 with no env (reference main.rs:63); 0 disables") {
    assert(KesMain.metricsPort(Map.empty).contains(9000))
    assert(KesMain.metricsPort(Map("METRICS_PORT" -> "1234")).contains(1234))
    assert(KesMain.metricsPort(Map("METRICS_PORT" -> "0")).isEmpty)
    // /metrics actually served on the default port with NO env set
    val metrics = new graft.streaming.GraftMetricsListener
    val server = KesMain.startMetrics(Map.empty, metrics)
    assert(server.nonEmpty, "default metrics server must bind")
    try {
      assert(server.get.getAddress.getPort == 9000)
      val conn = new java.net.URL("http://127.0.0.1:9000/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        assert(conn.getResponseCode == 200)
        val body = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(body.contains("graft_"), body.take(200))
      } finally conn.disconnect()
      // an occupied port degrades to no-metrics with a warning, never
      // a crashed pipeline
      assert(KesMain.startMetrics(Map.empty, metrics).isEmpty,
        "second bind on an occupied port must degrade, not throw")
    } finally server.get.stop(0)
  }

  test("version stamp names the build and spark versions (reference build.rs/main.rs:22)") {
    val s = KesMain.versionStamp
    assert(s.startsWith("graft "), s)
    assert(s.contains(org.apache.spark.SPARK_VERSION), s)
  }

  test("crash reporter: CRASH_DIR hook writes a parseable JSON report and delegates (reference main.rs:27)") {
    val dir = Files.createTempDirectory("kes_crash")
    // the report itself: valid JSON carrying version/thread/stack
    val f = KesMain.crashReport(dir, Thread.currentThread(),
      new IllegalStateException("boom \"quoted\"\nline2"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(f))
    assert(node.get("version").asText.startsWith("graft "))
    assert(node.get("exception").asText.contains("boom"))
    assert(node.get("stack").asText.contains("IllegalStateException"))
    // the hook: installs only when CRASH_DIR is set, writes through the
    // handler, and delegates to the previous handler
    val prev = Thread.getDefaultUncaughtExceptionHandler
    try {
      KesMain.installCrashReporter(Map.empty)
      assert(Thread.getDefaultUncaughtExceptionHandler eq prev, "no env, no hook")
      var delegated = false
      Thread.setDefaultUncaughtExceptionHandler(
        new Thread.UncaughtExceptionHandler {
          override def uncaughtException(t: Thread, e: Throwable): Unit = delegated = true
        })
      KesMain.installCrashReporter(Map("CRASH_DIR" -> dir.toString))
      val before = Files.list(dir).count()
      Thread.getDefaultUncaughtExceptionHandler
        .uncaughtException(Thread.currentThread(), new RuntimeException("hook"))
      assert(Files.list(dir).count() == before + 1, "handler must write a report")
      assert(delegated, "handler must delegate to the previous handler")
    } finally Thread.setDefaultUncaughtExceptionHandler(prev)
  }
}
