package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.KubeEventOps
import graft.sources.KubeEventSource

/** The reference binary, re-expressed: ingest k8s Events (a real
  * list-then-watch of the API server, or a directory of JSON lines),
  * derive time + cache key, dedup within the cache TTL, emit one JSON
  * line per new event (`{"time":…,"kubernetes_event":…}`) —
  * cisco-open/event-stream-for-k8s's main loop as one Structured
  * Streaming query.
  *
  *   runMain graft.KesMain <in> <outDir> [checkpointDir] [ttl] [--once]
  *
  * `<in>` is either a directory of JSON-line files (the watch feed as
  * files) or `k8s://host:port[/namespace]` — a live API server consumed
  * through the `k8s-events` DataSourceV2 source (list, then watch from
  * the bookmarked resourceVersion, backoff on error — reference
  * src/tasks.rs:150-182).
  *
  * Env-var config, matching reference src/config.rs:20-28 (CLI args
  * take precedence):
  *   CACHE_TTL     dedup-state TTL in seconds (reference default 3600)
  *   CACHE_DB      checkpoint directory (the reference's sled path —
  *                 both are "where the dedup state survives restarts")
  *   METRICS_PORT  serve Prometheus /metrics on this port; defaults
  *                 to 9000 like the reference's unconditional
  *                 0.0.0.0:9000 server (src/main.rs:63); 0 disables
  *                 (an extension — the reference has no off switch)
  *
  * `--once` processes the backlog and exits (Trigger.AvailableNow),
  * otherwise it runs as the daemon the reference is.
  */
object KesMain {

  /** Config resolution, injectable for tests: CLI args override env. */
  private[graft] def resolve(args: Array[String], env: Map[String, String])
      : (String, String, String, String, Boolean) = {
    val pos = args.filterNot(_.startsWith("--"))
    val in = pos(0)
    val out = pos(1)
    // reference default: config.rs:12 falls back to `events-db` when
    // CACHE_DB is unset — a relative path in the working directory
    val checkpoint = pos.lift(2).orElse(env.get("CACHE_DB")).getOrElse("events-db")
    val ttl = pos.lift(3)
      .orElse(env.get("CACHE_TTL").map(s => s"${s.toLong} seconds"))
      .getOrElse("3600 seconds")
    (in, out, checkpoint, ttl, args.contains("--once"))
  }

  /** `k8s://host:port[/namespace]` (plain HTTP — kubectl proxy, tests)
    * or `k8ss://host:port[/namespace]` (HTTPS — a real API server; the
    * source's service-account defaults supply the bearer token and
    * cluster-CA trust from the in-cluster mount) → the live watch
    * source; anything else → a directory of JSON-line files. Both yield
    * the same parsed `kubernetes_event` struct for the pipeline.
    */
  private[graft] def input(spark: org.apache.spark.sql.SparkSession, in: String): DataFrame = {
    val scheme = Seq("k8s://" -> "http", "k8ss://" -> "https")
      .find { case (p, _) => in.startsWith(p) }
    scheme match {
      case Some((prefix, proto)) =>
        val rest = in.stripPrefix(prefix)
        val (hostPort, ns) = rest.indexOf('/') match {
          case -1 => (rest, None)
          case i  => (rest.take(i), Some(rest.drop(i + 1)).filter(_.nonEmpty))
        }
        val reader = spark.readStream.format("k8s-events")
          .option("endpoint", s"$proto://$hostPort")
        KubeEventSource.parsed(ns.fold(reader)(n => reader.option("namespace", n)).load())
      case None => KubeEventSource.streamJsonLines(spark, in)
    }
  }

  /** Orderly stop — the reference's term_request broadcast
    * (src/main.rs:71-96): stop the streaming query (finishing the
    * in-flight micro-batch and committing its checkpoint), stop the
    * metrics endpoint, then stop Spark. Every step is idempotent and
    * failure-isolated so a half-dead JVM still releases what it can.
    * Called from the SIGINT/SIGTERM shutdown hook and directly by
    * tests (a JVM shutdown can't be triggered in-process).
    */
  private[graft] def orderlyStop(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      server: Option[com.sun.net.httpserver.HttpServer],
      spark: Option[org.apache.spark.sql.SparkSession]): Unit = {
    scala.util.Try(if (q.isActive) q.stop())
    scala.util.Try(server.foreach(_.stop(0)))
    scala.util.Try(spark.foreach(_.stop()))
  }

  /** Checkpoint-corruption recovery — the reference recreates a corrupt
    * sled DB and continues instead of crash-looping (src/main.rs:103-113,
    * get_db). Moves the unusable checkpoint dir aside (kept for
    * forensics, like sled's corrupt-db rename) so a fresh one can be
    * written. The file sink's `_spark_metadata` in the output dir is
    * part of the same state contract — it maps committed batchIds from
    * the OLD checkpoint, so a fresh query restarting at batchId 0 would
    * silently skip every batch the old log already lists — and is moved
    * aside with it. Dedup state restarts empty: duplicates within the
    * TTL window may re-emit once, the same trade the reference makes;
    * pre-recovery output files stay on disk under the moved-aside
    * metadata.
    *
    * Ordering is the safety argument: the SINK LOG moves first. If the
    * process dies between the two moves, the survivor state is
    * old-checkpoint + no sink log + the moved-aside log. A
    * CACHE_RECREATE restart recognizes that exact combination
    * (interruptedRecovery) and completes the move — fresh state
    * re-emits everything into a fresh sink log. Until then,
    * metadata-aware readers of the output dir don't see the pre-crash
    * files (the committed-batch log is aside), but nothing is ever
    * recorded as committed and then skipped. The REVERSE order has a
    * true silent-loss window: checkpoint gone + stale sink log in
    * place means a fresh query at batchId 0 silently skips every batch
    * the stale log already lists — loss that no restart can detect.
    */
  /** The recovery-in-progress marker: written before the moves, deleted
    * only after BOTH complete, so its presence identifies an
    * interrupted recovery EXACTLY. (The earlier inference from leftover
    * `.corrupt-*` names misfired: those are forensic artifacts that are
    * never cleaned up, so after any COMPLETED recovery, a later crash
    * before the fresh query's first sink commit re-created the inferred
    * combination and the next CACHE_RECREATE start discarded a healthy
    * checkpoint — dedup state lost repeatedly.)
    */
  private[graft] def recoveryMarker(out: String): java.nio.file.Path =
    java.nio.file.Paths.get(out, "_graft_recovery_in_progress")

  private[graft] def moveCheckpointAside(checkpoint: String, out: String): java.nio.file.Path = {
    def aside(p: java.nio.file.Path): java.nio.file.Path = {
      val dst = p.resolveSibling(p.getFileName.toString + ".corrupt-" + System.nanoTime())
      java.nio.file.Files.move(p, dst)
      dst
    }
    val marker = recoveryMarker(out)
    java.nio.file.Files.createDirectories(marker.getParent)
    if (!java.nio.file.Files.exists(marker)) java.nio.file.Files.createFile(marker)
    val sinkLog = java.nio.file.Paths.get(out, "_spark_metadata")
    if (java.nio.file.Files.exists(sinkLog)) aside(sinkLog)
    val dst = aside(java.nio.file.Paths.get(checkpoint))
    java.nio.file.Files.deleteIfExists(marker)
    dst
  }

  /** True iff a prior recovery started its moves and died before
    * finishing them (the marker outlived the process).
    */
  private[graft] def interruptedRecovery(out: String): Boolean =
    java.nio.file.Files.exists(recoveryMarker(out))

  /** The inverse orphan: NO checkpoint but a committed sink log — an
    * operator lost/deleted the checkpoint dir out-of-band. A fresh
    * query starting at batchId 0 against that stale log would see its
    * batchIds already committed and silently skip writing them (the
    * silent-loss direction moveCheckpointAside's ordering exists to
    * avoid). Under CACHE_RECREATE the stale log moves aside so the
    * fresh query re-emits everything.
    */
  private[graft] def moveStaleSinkLogAside(out: String): Option[java.nio.file.Path] = {
    val sinkLog = java.nio.file.Paths.get(out, "_spark_metadata")
    if (java.nio.file.Files.exists(sinkLog)) {
      val dst = sinkLog.resolveSibling("_spark_metadata.corrupt-" + System.nanoTime())
      java.nio.file.Files.move(sinkLog, dst)
      Some(dst)
    } else None
  }

  /** Pre-flight checkpoint validation — the recovery TRIGGER. Mirrors
    * the reference, which recovers only when *opening the cache DB*
    * fails (src/main.rs:103-113), never on downstream errors: a
    * transient sink/source failure must not cost the dedup state.
    * Checks the artifacts the engine reads at restart: the query
    * `metadata` file parses as JSON, and every offsets/commits log
    * entry carries the HDFSMetadataLog version header. Returns None
    * when usable (or absent — a fresh start needs no recovery), or the
    * defect description.
    */
  private[graft] def checkpointDefect(checkpoint: String): Option[String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(checkpoint)
    if (!Files.isDirectory(root)) return None
    val meta = root.resolve("metadata")
    if (Files.exists(meta)) {
      try new ObjectMapper().readTree(Files.readString(meta))
      catch { case e: Exception => return Some(s"metadata unreadable: ${e.getMessage}") }
    }
    for (log <- Seq("offsets", "commits")) {
      val dir = root.resolve(log)
      if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val bad =
          try listing.iterator().asScala
            .filter(p => p.getFileName.toString.forall(_.isDigit))
            .find { p =>
              try !Files.readString(p).startsWith("v")
              catch { case _: Exception => true }
            }
          finally listing.close()
        bad.foreach(p => return Some(s"$log/${p.getFileName} lacks the version header"))
      }
    }
    None
  }

  /** LOG_JSON=1 → Spark 4 structured logging: driver logs switch to the
    * bundled JsonTemplateLayout (timestamp/level/logger/thread/message
    * + MDC context as JSON), the engine-side analog of the reference's
    * JSON tracing subscriber with file/line/thread (src/main.rs:38-49).
    * Must run before the session is built — the log4j2 context picks
    * its default config at first logger use.
    */
  private[graft] def configureLogging(env: Map[String, String]): Unit =
    if (env.get("LOG_JSON").exists(v => v == "1" || v.equalsIgnoreCase("true"))) {
      org.apache.spark.graftbridge.LoggingBridge.enableJsonLogs()
      System.setProperty("spark.log.structuredLogging.enabled", "true")
    }

  /** One JSON crash report: wall time, version stamp, thread,
    * exception chain and stack — the payload the reference ships to
    * its crash-telemetry service. Returns the written path.
    */
  private[graft] def crashReport(dir: java.nio.file.Path,
      t: Thread, e: Throwable): java.nio.file.Path = {
    val sw = new java.io.StringWriter()
    e.printStackTrace(new java.io.PrintWriter(sw))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "").replace("\t", "\\t")
    val json = s"""{"ts":"${java.time.Instant.now()}","version":"${esc(versionStamp)}","thread":"${esc(t.getName)}","exception":"${esc(e.toString)}","stack":"${esc(sw.toString)}"}"""
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve(s"crash-${System.nanoTime()}.json")
    java.nio.file.Files.writeString(f, json)
    f
  }

  /** Crash-telemetry hook — the reference wires its crash reporter
    * before anything else runs (main.rs:27) so a panic anywhere leaves
    * a report; the neutral zero-dependency analog: `CRASH_DIR=<dir>`
    * installs a default uncaught-exception handler writing one JSON
    * report per crash, then DELEGATES to the previously installed
    * handler so Spark's own fatal-error path (and the JVM's default
    * stderr dump) still runs. Off unless the env opts in — a library
    * must not globally hook the JVM by default.
    */
  private[graft] def installCrashReporter(env: Map[String, String]): Unit =
    env.get("CRASH_DIR").filter(_.nonEmpty).foreach { d =>
      val prev = Thread.getDefaultUncaughtExceptionHandler
      Thread.setDefaultUncaughtExceptionHandler(new Thread.UncaughtExceptionHandler {
        override def uncaughtException(t: Thread, e: Throwable): Unit = {
          scala.util.Try(crashReport(java.nio.file.Paths.get(d), t, e))
          if (prev != null) prev.uncaughtException(t, e)
        }
      })
    }

  /** Reference parity: the build stamps its version into startup logs
    * and crash reports (build.rs:1, main.rs:22,29). The jar manifest's
    * Implementation-Version is the Scala analog of the compiled-in
    * cargo version; "dev" when running unpackaged.
    */
  private[graft] def versionStamp: String = {
    val v = Option(getClass.getPackage.getImplementationVersion).getOrElse("dev")
    s"graft $v (spark ${org.apache.spark.SPARK_VERSION})"
  }

  /** METRICS_PORT resolution: unset → the reference's unconditional
    * port 9000; explicit 0 → disabled.
    */
  private[graft] def metricsPort(env: Map[String, String]): Option[Int] =
    env.get("METRICS_PORT").map(_.toInt).orElse(Some(9000)).filter(_ != 0)

  /** Bind /metrics, surviving an occupied port: a metrics endpoint is
    * observability, not correctness — the pipeline must not die
    * because something else holds 9000 (divergence from the reference,
    * which would crash; logged loudly instead).
    */
  private[graft] def startMetrics(env: Map[String, String],
      metrics: graft.streaming.GraftMetricsListener): Option[com.sun.net.httpserver.HttpServer] =
    metricsPort(env).flatMap { p =>
      try Some(metrics.serve(p))
      catch {
        case e: java.io.IOException =>
          System.err.println(
            s"[kes] metrics port $p unavailable (${e.getMessage}); continuing without /metrics")
          None
      }
    }

  private[graft] def run(args: Array[String], env: Map[String, String]): Unit = {
    val (in, out, checkpoint, ttl, once) = resolve(args, env)
    configureLogging(env)
    installCrashReporter(env)
    val spark = GraftSession.local()
    // CACHE_RECREATE mirrors the reference's corrupt-cache-DB handling
    // (off by default: silently discarding state must be opted into)
    val recreate = env.get("CACHE_RECREATE").exists(v => v == "1" || v.equalsIgnoreCase("true"))

    System.err.println(s"[kes] $versionStamp starting")
    val metrics = new graft.streaming.GraftMetricsListener
    spark.streams.addListener(metrics)
    val server = startMetrics(env, metrics)

    // TIME_FALLBACK=1 → the reference's types.rs:38 behavior: events
    // with no timestamp at all continue at processing time (counted via
    // graft_time_missing_total) instead of being dropped
    val timeFallback = env.get("TIME_FALLBACK").exists(v => v == "1" || v.equalsIgnoreCase("true"))

    def attempt(): Unit = {
      val lines = KubeEventOps
        .streamPipeline(input(spark, in), cacheTtl = ttl, processingTimeFallback = timeFallback)
        .select(col("line").as("value"))
      val writer = lines.writeStream
        .format("text")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
      val q = (if (once) writer.trigger(Trigger.AvailableNow()) else writer).start()
      val hook = new Thread(() => orderlyStop(q, server, Some(spark)), "graft-shutdown")
      Runtime.getRuntime.addShutdownHook(hook)
      try q.awaitTermination()
      finally scala.util.Try(Runtime.getRuntime.removeShutdownHook(hook))
    }

    try {
      // recovery is gated on pre-flight VALIDATION, not on catching the
      // failure: a transient sink/source error must never destroy a
      // healthy checkpoint (the reference recovers only when opening
      // its cache DB fails, not on downstream errors)
      if (recreate) checkpointDefect(checkpoint) match {
        case Some(defect) =>
          val aside = moveCheckpointAside(checkpoint, out)
          System.err.println(s"[kes] checkpoint unusable ($defect); moved to $aside, starting fresh")
        case None if interruptedRecovery(out) =>
          // a previous recovery started its moves and died partway:
          // complete whichever remain, so fresh state re-emits into a
          // fresh sink log instead of resuming with pre-crash output
          // invisible to metadata-aware readers
          if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(checkpoint))) {
            val aside = moveCheckpointAside(checkpoint, out)
            System.err.println(s"[kes] completing interrupted recovery; checkpoint moved to $aside")
          } else {
            moveStaleSinkLogAside(out)
            java.nio.file.Files.deleteIfExists(recoveryMarker(out))
            System.err.println("[kes] completing interrupted recovery; checkpoint already aside")
          }
        case None if !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(checkpoint)) =>
          moveStaleSinkLogAside(out).foreach { dst =>
            System.err.println(s"[kes] checkpoint missing but sink log committed; " +
              s"moved stale log to $dst — the fresh query re-emits instead of " +
              "silently skipping already-listed batchIds")
          }
        case None => ()
      }
      attempt()
    } finally {
      scala.util.Try(server.foreach(_.stop(0)))
      spark.streams.removeListener(metrics)
    }
  }

  def main(args: Array[String]): Unit = {
    run(args, sys.env)
    // only returns when the query terminated (--once backlog done)
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(_.stop())
  }
}
