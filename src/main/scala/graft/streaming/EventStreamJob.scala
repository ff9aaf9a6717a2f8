package graft.streaming

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{EmittedEv, Ev, EvVal}

/** Structured-Streaming re-expression of the reference pipeline
  * (SURVEY §2.A12–A15): watch stream → TTL-cache dedup → JSON to sink,
  * plus windowed label counts (the Prometheus side).
  *
  * All transforms are source-agnostic (take the event stream as a
  * Dataset/DataFrame) so they compose over any readStream source — the
  * k8s watch feed would arrive via a custom source or Kafka in
  * production; tests drive them with MemoryStream, which is exactly the
  * list-then-watch shape of the reference's watcher (tasks.rs:150).
  */
object EventStreamJob {

  /** Composite key, as in the batch ops (types.rs:21 analog). */
  private def evKey = concat(col("user_id").cast("string"), lit(":"), col("event_type"))

  /** A13: streaming exact dedup — dropDuplicatesWithinWatermark on the
    * composite key: state is bounded by the watermark delay (the
    * CACHE_TTL analog), exactly the reference's bounded sled cache.
    */
  def streamDedupWatermark(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("key", evKey)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("key")

  /** A14: streaming windowed label counts (Prometheus events_count as a
    * time series) — tumbling 1h windows, append once the watermark
    * closes a window.
    */
  def streamWindowedCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** A37-online: streaming SLIDING-window counts (1 h windows every
    * 15 min) — the burst detector live: each event lands in len/slide
    * windows (same narrow ×4 Expand as the batch ev_sliding_rate), a
    * window emits once the watermark passes its END, so state is the
    * open-window counts only (O(types · windows-in-flight), not
    * history).
    */
  def streamSlidingCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** A30: live anomaly flagging — A29's MAD thresholds applied over
    * the stream: the per-type (median, mad) relation is trained
    * OFFLINE on history (EventOps.evAnomalyMad's stats) and broadcast
    * onto the watermarked hourly counts; a window closing above
    * median + k·mad is flagged the moment the watermark passes. The
    * offline-train / online-apply split is the deployment shape — the
    * stream never recomputes percentiles, so its state stays the
    * windowed-count state only.
    */
  def streamAnomalyFlags(events: DataFrame, thresholds: DataFrame,
      k: Double = 3.0, watermarkDelay: String = "30 minutes"): DataFrame =
    streamWindowedCounts(events, watermarkDelay)
      .join(broadcast(thresholds), "event_type")
      .select(col("event_type"), col("window_start"), col("n"),
        col("med"), col("mad"),
        (col("n") > col("med") + lit(k) * col("mad")).cast("int").as("is_anomaly"))

  /** A19: streaming session windows — the engine-native form of the
    * batch sessionization (EventOps.evSessionize): sessions close when
    * the watermark passes start + gap.
    */
  /** A28: streaming count-min sketch — the B21 frequency summary kept
    * live over the event stream. A global typed aggregation in update
    * mode: each micro-batch's positions merge into the one d×w buffer
    * (CountMinAgg.merge is associative + commutative, so partial
    * buffers combine map-side within a batch and the state store holds
    * ONE 16 KiB sketch — per-key frequency questions over an unbounded
    * streaming keyspace with constant state, where exact streaming
    * top-k state would grow with the keyspace).
    */
  def streamCountMin(events: DataFrame): DataFrame = {
    import graft.functions.{CountMin, CountMinAgg}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(CountMin.positions(col("user_id").cast("string")).as("pos"))
      .as[Array[Long]]
      .select(new CountMinAgg(CountMin.D, CountMin.W).toColumn)
      .toDF("sketch")
  }

  def streamSessionWindows(events: DataFrame, gap: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** A20: stream-stream interval join — attach each purchase to the
    * same user's click within the preceding hour. Both sides
    * watermarked; the time-bound condition lets the engine expire join
    * state (bounded memory at 100 TB/day rates).
    */
  def streamClickToPurchase(events: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Per-user attribution buffer: touches and purchases still inside
    * the watermark, as (tsMicros, event_id, event_type) triples.
    */
  final case class AttrState(buf: Seq[(Long, Long, String)])

  final case class AttrCredit(user_id: Long, purchase_id: Long,
      touch_type: String, credit_micro: Long)

  /** A48 ONLINE: linear multi-touch attribution as it becomes FINAL.
    * A purchase's credit split is only correct once no touch can still
    * arrive before it, so both sides buffer per user until the
    * watermark passes the purchase — then its preceding-hour touches
    * each emit an exact integer micro-share (10⁶ div n), the same
    * arithmetic as the batch operator, so a downstream rollup equals
    * `evAttribution` exactly. State per user: the ≤(window + delay)
    * span of touches (a touch is evicted once no future purchase can
    * reach back to it) plus unfinalized purchases — rate-bounded, not
    * history. Event-time timeout flushes tails without waiting for
    * the user's next arrival.
    */
  def streamAttribution(events: Dataset[Ev], windowHours: Long = 1,
      watermarkDelay: String = "30 minutes"): Dataset[AttrCredit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = windowHours * 3600L * 1000000L
    val touchTypes = Set("click", "view", "signup")

    def fn(user: Long, it: Iterator[Ev],
        state: GroupState[AttrState]): Iterator[AttrCredit] = {
      val st0 = state.getOption.getOrElse(AttrState(Nil))
      val incoming = it
        .filter(e => touchTypes(e.event_type) || e.event_type == "purchase")
        .map(e => (ChronoUnit.MICROS.between(Instant.EPOCH, e.ts), e.event_id, e.event_type))
        .toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val buf = (st0.buf ++ incoming).sortBy(x => (x._1, x._2))
      val (donePurchases, rest) = buf.partition {
        case (ts, _, tp) => tp == "purchase" && ts <= wmUs
      }
      val out = donePurchases.flatMap { case (pts, pid, _) =>
        val touches = buf.filter { case (ts, _, tp) =>
          touchTypes(tp) && ts >= pts - windowUs && ts < pts
        }
        val n = touches.size
        touches.map { case (_, _, tp) => AttrCredit(user, pid, tp, 1000000L / n) }
      }
      // a touch is dead once even a watermark-boundary purchase can't
      // reach back to it; unfinalized purchases stay whole
      val keep = rest.filter {
        case (ts, _, tp) => tp == "purchase" || ts + windowUs > wmUs
      }
      state.update(AttrState(keep))
      val pendingPurchases = keep.collect { case (ts, _, "purchase") => ts }
      if (pendingPurchases.nonEmpty)
        state.setTimeoutTimestamp(pendingPurchases.min / 1000L + 1L)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Per-user funnel: finalized stage times (µs; MinValue = unset) +
    * the not-yet-watermark-final event buffer.
    */
  final case class FunnelState(t1: Long, t2: Long, t3: Long,
      buf: Seq[(Long, String)])

  final case class FunnelStage(user_id: Long, stage: Int, ts_us: Long)

  /** A56 ONLINE: funnel stage progression as it becomes FINAL. The
    * batch cascade (A24/A56: t1 = min signup, t2 = min click > t1,
    * t3 = min purchase > t2) is prefix-monotone: each stage time
    * depends only on events at-or-before it, so a stage is emitted
    * exactly when the watermark passes its candidate time — an
    * out-of-order earlier event can then no longer arrive and change
    * it. Unfinalized events buffer per user (bounded by the watermark
    * delay — rate×delay, not history); finalized events FOLD into the
    * three stage longs in timestamp order and are dropped, so
    * long-lived users cost 3 longs, not their event history. A
    * downstream rollup of the emitted stage rows equals the batch
    * funnel exactly (StreamingSpec law). Event-time timeout flushes
    * buffered tails without waiting for the user's next arrival.
    */
  def streamEvFunnel(events: Dataset[Ev],
      watermarkDelay: String = "30 minutes"): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val UNSET = Long.MinValue
    val stages = Set("signup", "click", "purchase")

    def fn(user: Long, it: Iterator[Ev],
        state: GroupState[FunnelState]): Iterator[FunnelStage] = {
      val st0 = state.getOption.getOrElse(FunnelState(UNSET, UNSET, UNSET, Nil))
      val incoming = it
        .filter(e => stages(e.event_type))
        .map(e => (ChronoUnit.MICROS.between(Instant.EPOCH, e.ts), e.event_type))
        .toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (fin, pend) = (st0.buf ++ incoming).partition(_._1 <= wmUs)
      var (t1, t2, t3) = (st0.t1, st0.t2, st0.t3)
      val out = Seq.newBuilder[FunnelStage]
      fin.sortBy(x => (x._1, x._2)).foreach { case (ts, tp) =>
        if (tp == "signup" && t1 == UNSET) {
          t1 = ts; out += FunnelStage(user, 1, ts)
        } else if (tp == "click" && t1 != UNSET && t2 == UNSET && ts > t1) {
          t2 = ts; out += FunnelStage(user, 2, ts)
        } else if (tp == "purchase" && t2 != UNSET && t3 == UNSET && ts > t2) {
          t3 = ts; out += FunnelStage(user, 3, ts)
        }
      }
      if (t3 != UNSET) {
        // cascade complete: nothing left to learn for this user
        state.update(FunnelState(t1, t2, t3, Nil))
      } else {
        state.update(FunnelState(t1, t2, t3, pend))
        if (pend.nonEmpty) state.setTimeoutTimestamp(pend.map(_._1).min / 1000L + 1L)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  final case class TtlState(lastEmitMicros: Long)

  /** A12: the reference's TTL cache as streaming state
    * (flatMapGroupsWithState): emit iff no same-key event was emitted
    * within the TTL (tasks.rs:98); idle state evicted via event-time
    * timeout (the clean_cache loop, tasks.rs:184). State per key is a
    * single long — O(keys) memory, watermark-bounded.
    */
  def streamTtlCache(events: Dataset[Ev], ttlHours: Long = 24,
      watermarkDelay: String = "1 hour"): Dataset[EmittedEv] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMicros = ttlHours * 3600L * 1000000L

    def micros(i: Instant): Long = ChronoUnit.MICROS.between(Instant.EPOCH, i)

    def fn(key: String, it: Iterator[Ev], state: GroupState[TtlState]): Iterator[EmittedEv] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var last = state.getOption.map(_.lastEmitMicros)
        val out = sorted.flatMap { e =>
          val m = micros(e.ts)
          if (last.forall(l => m >= l + ttlMicros)) {
            last = Some(m)
            Some(EmittedEv(key, e.ts, e.event_id))
          } else None
        }
        last.foreach { l =>
          state.update(TtlState(l))
          // evict once the watermark passes lastEmit + TTL — after that
          // point the cache entry can never suppress again (tasks.rs:196)
          state.setTimeoutTimestamp((l + ttlMicros) / 1000L)
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => s"${e.user_id}:${e.event_type}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Buffered per-user transition state: the last FLUSHED event (the
    * chain link into the next flush) plus events still inside the
    * watermark, as (tsMicros, event_id, event_type) triples.
    */
  final case class TransState(lastType: String, lastTsMicros: Long,
      buffered: Seq[(Long, Long, String)])

  final case class TransitionRec(user_id: Long, from_type: String,
      to_type: String, gap_us: Long, to_ts: Instant)

  /** A34 ONLINE: per-user state transitions emitted as they become
    * FINAL. A transition (A → B) is only correct once no event can
    * still arrive between A and B, so arrivals buffer in state until
    * the watermark passes them (the session-window discipline — an
    * unbuffered lag()-per-batch would emit wrong pairs under
    * cross-batch disorder and could never retract them). On every
    * invocation the watermark-cleared prefix of the (sorted) buffer is
    * chained off the last flushed event and emitted; an event-time
    * timeout fires when the watermark passes the newest buffered event
    * so tail transitions flush without waiting for the user's next
    * arrival.
    *
    * State per user: last flushed (type, ts) + the ≤ watermark-delay
    * window of buffered events — O(users · rate · delay), the same
    * bound as the session-window operator, NOT unbounded history. The
    * downstream transition-matrix aggregate is a plain streaming
    * groupBy over these append-mode records.
    */
  def streamEvStateTransitions(events: Dataset[Ev],
      watermarkDelay: String = "1 hour"): Dataset[TransitionRec] = {
    val spark = events.sparkSession
    import spark.implicits._

    def micros(i: Instant): Long = ChronoUnit.MICROS.between(Instant.EPOCH, i)

    def fn(user: Long, it: Iterator[Ev],
        state: GroupState[TransState]): Iterator[TransitionRec] = {
      val st0 = state.getOption.getOrElse(TransState(null, Long.MinValue, Nil))
      val incoming = it.map(e => (micros(e.ts), e.event_id, e.event_type)).toSeq
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      val all = (st0.buffered ++ incoming).sortBy(x => (x._1, x._2))
      val (flush, keep) = all.partition(_._1 <= wmMicros)
      var last = Option(st0.lastType).map(tp => (tp, st0.lastTsMicros))
      val out = flush.flatMap { case (ts, _, tp) =>
        val rec = last.map { case (lt, lts) =>
          TransitionRec(user, lt, tp, ts - lts,
            Instant.EPOCH.plus(ts, ChronoUnit.MICROS))
        }
        last = Some((tp, ts))
        rec
      }
      state.update(TransState(last.map(_._1).orNull,
        last.map(_._2).getOrElse(Long.MinValue), keep))
      // flush the buffer tail once the watermark passes it (+1 ms:
      // the timeout timestamp must exceed the current watermark)
      if (keep.nonEmpty) state.setTimeoutTimestamp(keep.map(_._1).max / 1000L + 1L)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** A44 ONLINE: exact daily-active-users — two CHAINED stateful
    * operators (Spark ≥3.4 multi-stateful append support): per-(user,
    * day) dedup within the watermark, then a tumbling 1-day count of
    * the surviving first-sightings. State is the open days' distinct
    * user sets + open window counts — calendar-bounded like the batch
    * relation, not event-volume. A day's DAU emits once the watermark
    * closes it; StreamingSpec pins every closed day ≡ the batch
    * evActiveUsers dau column.
    */
  def streamDailyActive(events: DataFrame, graceDelay: String = "30 minutes"): DataFrame =
    events
      .withColumn("day", date_trunc("day", col("ts")))
      // the watermark rides the DAY column, not ts: a (user, day) key
      // recurs across the whole day, so its dedup state must live until
      // the day itself is closed (day + 1 day + grace), not one
      // ts-disorder window — dropDuplicatesWithinWatermark on a
      // ts-watermark evicts mid-day and re-emits the same user
      // (measured: +6 DAU on a 15-user day). Day-quantized watermark =
      // state is evicted exactly when the day can no longer change.
      .withWatermark("day", s"1 day $graceDelay")
      .dropDuplicates("user_id", "day")
      .groupBy(window(col("day"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").as("day"), col("dau"))

  final case class DayTypeShare(day: java.sql.Timestamp, event_type: String,
      n: Long, day_tot: Long, share_r: Double)

  /** A55 ONLINE: day-final event-type mix — the input relation of the
    * drift monitor as it closes. Two chained stateful operators (the
    * A47 discipline): a day-quantized-watermark windowed aggregate
    * collapses raw events to (day, type, n) with map-side partials —
    * the per-day reducer sees partial counts, never raw events — and
    * emits each closed day exactly once; a day-keyed
    * flatMapGroupsWithState then fans the day's ≤#types rows back out
    * with the day total and r6'd shares. Because a closed window's
    * rows all arrive in ONE micro-batch, the second stage is
    * stateless-per-group (emit and clear); its group cardinality is
    * days-in-flight, and its input volume is #days×#types rows.
    * Downstream, the batch baseline join (A55) turns shares into
    * drift. StreamingSpec pins emitted rows ≡ the batch day-share
    * relation.
    */
  def streamTypeShares(events: DataFrame,
      graceDelay: String = "30 minutes"): Dataset[DayTypeShare] = {
    val spark = events.sparkSession
    import spark.implicits._
    val closed = events
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("day", s"1 day $graceDelay")
      .groupBy(window(col("day"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)]
    closed
      .groupByKey(_._1.getTime)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[(java.sql.Timestamp, String, Long)],
            state: GroupState[Boolean]) =>
          val rows = it.toSeq
          val tot = rows.map(_._3).sum
          state.remove()
          rows.sortBy(_._2).iterator.map { case (d, ty, n) =>
            DayTypeShare(d, ty, n, tot,
              math.floor(n.toDouble / tot * 1e6 + 0.5) / 1e6)
          }
      }
  }

  final case class KmvEstimate(event_type: String, n_kept: Long,
      est_distinct_r: Double)

  /** A66 (B47 online): streaming distinct-users estimate per type via
    * the PORTABLE KMV sketch — state per group is functions.KmvSketch's
    * ≤k-long sorted array (the bounded-cardinality counter the
    * reference's unbounded per-key cache can't be at 100 TB/day), and
    * because "k smallest distinct hashes" is a SET property — order-
    * and batching-insensitive — the stream's final estimate equals the
    * batch B47 operator BIT-FOR-BIT (StreamingSpec law), not merely
    * approximately. Emits the running (n_kept, estimate) per type per
    * micro-batch (Update mode); the same state array is exactly what
    * G15-style persistence would checkpoint for cross-run merging
    * (KmvSketch.merge is the union).
    */
  def streamEvDistinctKmv(events: Dataset[Ev], k: Int = 64): Dataset[KmvEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sk = graft.functions.KmvSketch(k)
    events
      .map(e => (e.event_type, graft.functions.Hashing.md5_60Jvm("kmv:" + e.user_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (ty: String, it: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val cur = it.foldLeft(state.getOption.getOrElse(sk.zero)) {
            (b, r) => sk.reduce(b, r._2)
          }
          state.update(cur)
          val est =
            if (cur.length < k) cur.length.toDouble
            else (k - 1).toDouble * 1152921504606846976.0d / cur.last.toDouble
          Iterator.single(KmvEstimate(ty, cur.length.toLong,
            math.floor(est * 1e6 + 0.5) / 1e6))
      }
  }

  final case class QuantileSample(event_type: String, n_sample: Long,
      q25: Double, q50: Double, q75: Double, q90: Double)

  /** A85 (B62 online): streaming VALUE-quantile estimate per type via
    * the portable bottom-k row sample — state per group is the ≤k
    * sorted (md5_60(event_id), value) pair buffer
    * ([[graft.functions.BottomKSample]] shared with the batch card),
    * quantiles are PICKED sample order statistics (nearest rank,
    * never interpolated). Because "the k smallest distinct pairs" is
    * a set property, the stream's sample — and hence every emitted
    * quantile — equals the batch computation BIT-FOR-BIT under any
    * batching or arrival order (StreamingSpec feeds reverse-time
    * batches), and the same pairs are what G25's sample-shard sink
    * persists for cross-run merge. Emits the running card per type
    * per micro-batch (Update mode).
    */
  def streamEvQuantileSample(events: Dataset[EvVal],
      k: Int = 256): Dataset[QuantileSample] = {
    val spark = events.sparkSession
    import spark.implicits._
    val s = graft.functions.BottomKSample(k)
    events
      .map(e => (e.event_type,
        graft.functions.Hashing.md5_60Jvm("qsample:" + e.event_id), e.value))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (ty: String, it: Iterator[(String, Long, Double)],
            state: GroupState[(Array[Long], Array[Double])]) =>
          val cur = it.foldLeft(state.getOption.getOrElse(s.zero)) {
            (b, r) => s.reduce(b, (r._2, r._3))
          }
          state.update(cur)
          val sv = cur._2.sorted
          val m = sv.length
          def pick(p: Double): Double =
            sv(math.floor(p * (m - 1).toDouble + 0.5).toInt)
          Iterator.single(QuantileSample(ty, m.toLong,
            pick(0.25), pick(0.50), pick(0.75), pick(0.90)))
      }
  }

  final case class TopKState(event_type: String, rnk: Long,
      event_id: Long, value: Double)

  /** A86 (B63 online): streaming per-type top-k events by value —
    * the TopKRows aggregator's ≤k-pair buffer as
    * flatMapGroupsWithState state, completing the online twin set
    * (A66 KMV, A80 HLL, A85 sample, stream CMS). "The k largest
    * (value DESC, id ASC) pairs" is a set property, so the stream's
    * kept set equals the batch aggregator BIT-FOR-BIT under any
    * batching or arrival order. Emits the running ranked top-k per
    * type per micro-batch (Update mode).
    */
  def streamEvTopK(events: Dataset[EvVal], k: Int = 3): Dataset[TopKState] = {
    val spark = events.sparkSession
    import spark.implicits._
    val s = graft.functions.TopKRows(k)
    events
      .map(e => (e.event_type, e.value, e.event_id))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (ty: String, it: Iterator[(String, Double, Long)],
            state: GroupState[(Array[Double], Array[Long])]) =>
          val cur = it.foldLeft(state.getOption.getOrElse(s.zero)) {
            (b, r) => s.reduce(b, (r._2, r._3))
          }
          state.update(cur)
          cur._1.indices.iterator.map { i =>
            TopKState(ty, (i + 1).toLong, cur._2(i), cur._1(i))
          }
      }
  }

  final case class HllEstimate(event_type: String, n_zero: Long, est_r: Double)

  /** A80 (B59 online): streaming distinct-users estimate per type via
    * the PORTABLE HLL — state per group is the 256-register array
    * (256 ints, CONSTANT regardless of cardinality: the KMV state
    * grows to k longs, HLL's never grows at all), updated by
    * per-register MAX. Because max is commutative/associative/
    * idempotent, the stream's registers — and hence the estimate —
    * equal the batch B59 card BIT-FOR-BIT under any batching or
    * arrival order (StreamingSpec feeds reverse-time batches), and
    * the same array is exactly what G24's shard sink persists for
    * cross-run union. Emits the running (n_zero, est_r) per type per
    * micro-batch (Update mode).
    *
    * The JVM-side rho/estimate arithmetic mirrors the batch Column
    * ladder exactly: rho = nlz(w) − 11 on the 52-bit word (equals
    * 53 − bitlen), capped at 52; S as the integer Σ2^(52−reg);
    * the same left-associated α·m²·2⁵²/S and linear-counting branch.
    */
  def streamEvHllDistinct(events: Dataset[Ev]): Dataset[HllEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .map(e => (e.event_type,
        graft.functions.Hashing.md5_60Jvm("hll:" + e.user_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (ty: String, it: Iterator[(String, Long)], state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(new Array[Int](256))
          it.foreach { case (_, h0) =>
            val bucket = (h0 % 256L).toInt
            val w = h0 / 256L
            val rho = if (w == 0L) 52
              else math.min(java.lang.Long.numberOfLeadingZeros(w) - 11, 52)
            if (rho > regs(bucket)) regs(bucket) = rho
          }
          state.update(regs)
          val v = regs.count(_ == 0)
          var s = 0L
          regs.foreach(r => s += (1L << (52 - r)))
          val eraw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
            4503599627370496.0 / s.toDouble
          val est = if (eraw <= 640.0 && v > 0) 256.0 * math.log(256.0 / v)
            else eraw
          Iterator.single(HllEstimate(ty, v.toLong,
            math.floor(est * 1e6 + 0.5) / 1e6))
      }
  }

  /** Per-type CUSUM state: hourly counts still open under the
    * watermark; finalized-but-unscored hours (waiting for the baseline
    * window to fill); and once the baseline is frozen, (mu, sigma, s).
    */
  final case class CusumState(open: Seq[(Long, Long)],
      pending: Seq[(Long, Long)], baselineReady: Boolean,
      mu: Double, sigma: Double, s: Double)

  final case class CusumRec(event_type: String, hour: Instant, n: Long,
      cusum_sigmas_r: Double, flagged: Boolean)

  /** A52-online: streaming SLO burn-rate alerts — the multi-window
    * burn alert (1 h fast / 6 h slow over the error budget) evaluated
    * per 15-min frame AS FRAMES CLOSE. Both trailing horizons ride
    * ONE aggregation: each event explodes into the 24 future frames
    * its 6 h horizon touches (each exploded row tagged whether the
    * frame is also inside the 1 h horizon and whether it is the
    * event's DIRECT frame), rows carry the frame-END timestamp, and
    * watermark + groupBy run on that derived frame time — a frame's
    * counters close once the watermark passes its end, so state is
    * the open-frame counters only (≤ ~28 frames × 5 longs per
    * in-flight frame), never history.
    *
    * The watermark delay MUST exceed the 6 h 15 min explosion horizon
    * (an event's earliest exploded frame lies that far behind its
    * latest): the default 7 h = horizon + 45 min true lateness
    * allowance, so a frame finalizes 45 min of event time after its
    * end — the burn-alert freshness a 6 h window can honestly give.
    * Frames with no DIRECT event are suppressed (sum(direct) = 0),
    * matching the batch ev_slo_burn relation frame for frame.
    */
  def streamEvSloBurn(events: DataFrame, budget: Double = 0.1,
      watermarkDelay: String = "7 hours"): DataFrame = {
    val exploded = events
      .select((col("event_type") === "error").cast("long").as("is_err"),
        expr("unix_micros(ts) div 900000000").as("f"))
      .select(col("is_err"), col("f"),
        explode(sequence(col("f"), col("f") + lit(23L))).as("tf"))
      .select(col("is_err"),
        (col("tf") < col("f") + 4).cast("long").as("in_1h"),
        (col("tf") === col("f")).cast("long").as("direct"),
        timestamp_micros((col("tf") + 1) * lit(900000000L)).as("frame_end_ts"))
    exploded
      .withWatermark("frame_end_ts", watermarkDelay)
      .groupBy(window(col("frame_end_ts"), "15 minutes"))
      .agg(
        sum(col("is_err") * col("in_1h")).as("err_1h"),
        sum(col("in_1h")).as("tot_1h"),
        sum(col("is_err")).as("err_6h"),
        count(lit(1)).as("tot_6h"),
        sum(col("direct")).as("n_direct"))
      .filter(col("n_direct") > 0)
      .select(col("window.start").as("frame_end"),
        col("err_1h"), col("tot_1h"),
        r6s(col("err_1h").cast("double") / col("tot_1h").cast("double") / lit(budget)).as("burn_1h_r"),
        col("err_6h"), col("tot_6h"),
        r6s(col("err_6h").cast("double") / col("tot_6h").cast("double") / lit(budget)).as("burn_6h_r"))
      .withColumn("alert", col("burn_1h_r") > 2.0 && col("burn_6h_r") > 1.5)
  }

  /** The shared 6-dp parity rounding (operators/package.scala r6). */
  private def r6s(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1e6 + 0.5) / 1e6

  /** A42 ONLINE: streaming CUSUM change-point twin of
    * `EventOps.evCusumChangepoint`. Hourly counts accumulate in state
    * (counters, not events — O(types · hours-in-flight)); an hour is
    * scored only once the watermark passes its END, in hour order, so
    * the emitted series is exactly the batch recursion replayed
    * online. The first `baselineHours` finalized hours freeze (mu,
    * sigma); hours finalized before the freeze buffer in `pending` and
    * emit in one burst when the baseline completes — after that the
    * operator is fully incremental: state carries three doubles plus
    * the open counters, never history. An event-time timeout closes
    * tail hours without waiting for the type's next arrival.
    */
  def streamEvCusum(events: Dataset[Ev], baselineHours: Int = 48,
      kSigma: Double = 0.5, hSigma: Double = 5.0,
      watermarkDelay: String = "30 minutes"): Dataset[CusumRec] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L

    def fn(ty: String, it: Iterator[Ev],
        state: GroupState[CusumState]): Iterator[CusumRec] = {
      val st0 = state.getOption.getOrElse(
        CusumState(Nil, Nil, baselineReady = false, 0.0, 0.0, 0.0))
      val incoming = it.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val h = ChronoUnit.MICROS.between(Instant.EPOCH, e.ts) / hourUs * hourUs
        m.updated(h, m.getOrElse(h, 0L) + 1L)
      }
      val open0 = st0.open.foldLeft(incoming) { case (m, (h, n)) =>
        m.updated(h, m.getOrElse(h, 0L) + n)
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (closed, open) = open0.toSeq.partition { case (h, _) => h + hourUs <= wmUs }
      var pending = st0.pending ++ closed.sortBy(_._1)
      var (ready, mu, sigma, s) = (st0.baselineReady, st0.mu, st0.sigma, st0.s)
      val out = scala.collection.mutable.ArrayBuffer.empty[CusumRec]
      if (!ready && pending.length >= baselineHours) {
        val base = pending.take(baselineHours).map(_._2.toDouble)
        mu = base.sum / base.length
        sigma = math.max(
          math.sqrt(base.map(x => (x - mu) * (x - mu)).sum / base.length), 1e-9)
        ready = true
      }
      if (ready) {
        pending.foreach { case (h, n) =>
          s = math.max(0.0, s + (n.toDouble - mu - kSigma * sigma))
          out += CusumRec(ty, Instant.EPOCH.plus(h, ChronoUnit.MICROS), n,
            math.floor(s / sigma * 1e6 + 0.5) / 1e6, s > hSigma * sigma)
        }
        pending = Nil
      }
      state.update(CusumState(open.sortBy(_._1), pending, ready, mu, sigma, s))
      if (open.nonEmpty)
        state.setTimeoutTimestamp((open.map(_._1).min + hourUs) / 1000L + 1L)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Per-type Holt state: hourly counters still open under the
    * watermark, plus the UNROUNDED (level, trend) recursion state.
    */
  final case class HoltState(open: Seq[(Long, Long)], started: Boolean,
      level: Double, trend: Double)

  final case class HoltRec(event_type: String, hour: Instant, n: Long,
      level_r: Double, trend_r: Double, resid_r: Option[Double])

  /** A67 ONLINE: streaming Holt level+trend forecaster, the twin of
    * `EventOps.evHoltForecast`. Hourly counters accumulate in state
    * (counters, not events — O(types · hours-in-flight)); an hour is
    * scored only once the watermark passes its END, in hour order, so
    * the emitted series is exactly the batch recursion replayed
    * online: state carries TWO unrounded doubles (level, trend) and
    * the open counters, never history. An event-time timeout closes
    * tail hours without waiting for the type's next arrival. The
    * residual column is the live trend-aware anomaly signal (the
    * streaming complement of A42's CUSUM level shifts).
    */
  def streamEvHoltForecast(events: Dataset[Ev], alpha: Double = 0.5,
      beta: Double = 0.25,
      watermarkDelay: String = "30 minutes"): Dataset[HoltRec] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

    def fn(ty: String, it: Iterator[Ev],
        state: GroupState[HoltState]): Iterator[HoltRec] = {
      val st0 = state.getOption.getOrElse(HoltState(Nil, started = false, 0.0, 0.0))
      val incoming = it.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val h = ChronoUnit.MICROS.between(Instant.EPOCH, e.ts) / hourUs * hourUs
        m.updated(h, m.getOrElse(h, 0L) + 1L)
      }
      val open0 = st0.open.foldLeft(incoming) { case (m, (h, n)) =>
        m.updated(h, m.getOrElse(h, 0L) + n)
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (closed, open) = open0.toSeq.partition { case (h, _) => h + hourUs <= wmUs }
      var (started, level, trend) = (st0.started, st0.level, st0.trend)
      val out = closed.sortBy(_._1).map { case (h, n) =>
        val x = n.toDouble
        val hourI = Instant.EPOCH.plus(h, ChronoUnit.MICROS)
        if (!started) {
          started = true; level = x; trend = 0.0
          HoltRec(ty, hourI, n, r6d(level), r6d(trend), None)
        } else {
          val forecast = level + trend
          val prevLevel = level
          level = alpha * x + (1.0 - alpha) * (level + trend)
          trend = beta * (level - prevLevel) + (1.0 - beta) * trend
          HoltRec(ty, hourI, n, r6d(level), r6d(trend), Some(r6d(x - forecast)))
        }
      }
      state.update(HoltState(open.sortBy(_._1), started, level, trend))
      if (open.nonEmpty)
        state.setTimeoutTimestamp((open.map(_._1).min + hourUs) / 1000L + 1L)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Per-type burst-run state: open hourly counters, the pre-freeze
    * pending buffer, the frozen (mu, sigma), and the current maximal
    * above-threshold run (start/end epoch-µs hours, peak, total). */
  final case class BurstState(open: Seq[(Long, Long)],
      pending: Seq[(Long, Long)], baselineReady: Boolean,
      mu: Double, sigma: Double,
      runOpen: Boolean, runStart: Long, runEnd: Long,
      peak: Long, total: Long, nHours: Long)

  final case class BurstRec(event_type: String, start_hour: Instant,
      end_hour: Instant, n_hours: Long, peak_n: Long, total_n: Long)

  /** A68 ONLINE: streaming burst-window (gaps-and-islands) incidents —
    * maximal runs of consecutive above-threshold hours emitted AS
    * INCIDENTS when they close (a below-threshold hour, an empty
    * hour, or the event-time timeout ends the run). The batch A68
    * flags hours against full-corpus (mu + k·sigma); online the
    * baseline freezes on the first `baselineHours` finalized present
    * hours (the A42 discipline — pre-freeze hours buffer and replay
    * in one burst), after which state is the open counters plus ONE
    * in-flight run — never incident history.
    *
    * Run closure without new arrivals is watermark-driven: the hour
    * after `runEnd` is provably empty once the watermark passes
    * `runEnd + 2h` (had it held events they would be open or closed
    * counters), so the run closes then — on the next batch or on the
    * event-time timeout armed at that instant.
    */
  def streamEvBurstWindows(events: Dataset[Ev], baselineHours: Int = 48,
      kSigma: Double = 2.0,
      watermarkDelay: String = "30 minutes"): Dataset[BurstRec] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L

    def fn(ty: String, it: Iterator[Ev],
        state: GroupState[BurstState]): Iterator[BurstRec] = {
      val st0 = state.getOption.getOrElse(
        BurstState(Nil, Nil, baselineReady = false, 0.0, 0.0,
          runOpen = false, 0L, 0L, 0L, 0L, 0L))
      val incoming = it.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val h = ChronoUnit.MICROS.between(Instant.EPOCH, e.ts) / hourUs * hourUs
        m.updated(h, m.getOrElse(h, 0L) + 1L)
      }
      val open0 = st0.open.foldLeft(incoming) { case (m, (h, n)) =>
        m.updated(h, m.getOrElse(h, 0L) + n)
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (closed, open) = open0.toSeq.partition { case (h, _) => h + hourUs <= wmUs }
      var pending = st0.pending ++ closed.sortBy(_._1)
      var (ready, mu, sigma) = (st0.baselineReady, st0.mu, st0.sigma)
      var (runOpen, runStart, runEnd) = (st0.runOpen, st0.runStart, st0.runEnd)
      var (peak, total, nHours) = (st0.peak, st0.total, st0.nHours)
      val out = scala.collection.mutable.ArrayBuffer.empty[BurstRec]
      def closeRun(): Unit = if (runOpen) {
        out += BurstRec(ty, Instant.EPOCH.plus(runStart, ChronoUnit.MICROS),
          Instant.EPOCH.plus(runEnd, ChronoUnit.MICROS), nHours, peak, total)
        runOpen = false
      }
      if (!ready && pending.length >= baselineHours) {
        // integer-moment baseline — the batch operator's exact stats
        val base = pending.take(baselineHours).map(_._2)
        val cnt = base.length.toDouble
        mu = base.sum.toDouble / cnt
        val sumsq = base.map(n => n * n).sum.toDouble
        sigma = math.sqrt(math.max(sumsq / cnt - mu * mu, 0.0))
        ready = true
      }
      if (ready) {
        pending.foreach { case (h, n) =>
          if (runOpen && h > runEnd + hourUs) closeRun() // empty-hour gap
          if (n.toDouble > mu + kSigma * sigma) {
            if (runOpen) {
              runEnd = h; peak = math.max(peak, n); total += n; nHours += 1
            } else {
              runOpen = true; runStart = h; runEnd = h
              peak = n; total = n; nHours = 1
            }
          } else closeRun()
        }
        pending = Nil
        // the hour after runEnd is final-and-empty: close the run
        if (runOpen && wmUs >= runEnd + 2 * hourUs) closeRun()
      }
      state.update(BurstState(open.sortBy(_._1), pending, ready, mu, sigma,
        runOpen, runStart, runEnd, peak, total, nHours))
      val timeouts =
        open.map(_._1 + hourUs).toSeq ++
          (if (runOpen) Seq(runEnd + 2 * hourUs) else Nil)
      if (timeouts.nonEmpty)
        state.setTimeoutTimestamp(timeouts.min / 1000L + 1L)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Per-user token-bucket state: the recursion pair (tokens, prevT)
    * plus the watermark-delay buffer of unfinalized events. */
  final case class TbState(tokens: Long, prevTs: Long, started: Boolean,
      buffered: Seq[(Long, Long)])

  final case class TbDecision(user_id: Long, event_id: Long, ts: Instant,
      allowed: Boolean, tokens_after: Long)

  /** A72 ONLINE: the token-bucket throttle as a LIVE stream — each
    * event gets its admit/drop decision as soon as the watermark
    * proves nothing earlier can still arrive (the recursion is
    * order-sensitive, so the A34b buffering discipline applies:
    * unfinalized events wait in state, the cleared prefix folds
    * through the bucket in (ts, event_id) order, an event-time
    * timeout flushes tails). This is the reference's cache-throttle
    * deployed as an operator: the allowed sub-stream IS the throttled
    * output, the flags are the audit.
    *
    * State per user: two longs + the watermark-delay buffer window
    * (rate·delay-bounded, never history). StreamingSpec pins the
    * streamed per-user decision rollup ≡ the batch (oracle-gated)
    * `EventOps.evTokenBucket` on the same corpus.
    */
  def streamTokenBucket(events: Dataset[Ev], capTokens: Int = 2,
      usPerMicroToken: Long = 43200L,
      watermarkDelay: String = "1 hour"): Dataset[TbDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    val cap = capTokens * 1000000L

    def fn(user: Long, it: Iterator[Ev],
        state: GroupState[TbState]): Iterator[TbDecision] = {
      val st0 = state.getOption.getOrElse(TbState(cap, 0L, started = false, Nil))
      val incoming = it.map(e =>
        (ChronoUnit.MICROS.between(Instant.EPOCH, e.ts), e.event_id)).toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = (st0.buffered ++ incoming).sortBy(identity)
      val (flush, keep) = all.partition(_._1 <= wmUs)
      var (tokens, prevT, started) = (st0.tokens, st0.prevTs, st0.started)
      val out = flush.map { case (tus, eid) =>
        if (started) tokens = math.min(cap, tokens + (tus - prevT) / usPerMicroToken)
        started = true
        prevT = tus
        val allowed = tokens >= 1000000L
        if (allowed) tokens -= 1000000L
        TbDecision(user, eid, Instant.EPOCH.plus(tus, ChronoUnit.MICROS),
          allowed, tokens)
      }
      // idle-user eviction (r11 soak fix — this state previously lived
      // forever): once the buffer is drained, the only information the
      // state carries is a not-yet-full bucket, and that information
      // EXPIRES — integer refill means the bucket is indistinguishable
      // from a fresh one once tus − prevT ≥ (cap − tokens)·usPerToken.
      // So: buffered → timeout at the newest buffered event (flush);
      // drained but refilling → timeout at the refill instant;
      // drained and full → remove now. State is O(users active within
      // their refill horizon), never O(users ever seen).
      if (keep.nonEmpty) {
        state.update(TbState(tokens, prevT, started, keep))
        state.setTimeoutTimestamp(keep.map(_._1).max / 1000L + 1L)
      } else if (!started || tokens >= cap) {
        if (state.exists) state.remove()
      } else {
        val refillMs = (prevT + (cap - tokens) * usPerMicroToken) / 1000L + 1L
        if (refillMs <= state.getCurrentWatermarkMs()) { if (state.exists) state.remove() }
        else {
          state.update(TbState(tokens, prevT, started, keep))
          state.setTimeoutTimestamp(refillMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Keyed upsert target for streamUpsertCounts. Implementations MUST
    * make the replay check and the merge atomic *in the store* (a JDBC
    * MERGE plus an applied-batch log row in the same transaction, an
    * ELK bulk request with deterministic doc ids, …): a driver-memory
    * batch-id guard does not survive restarts, which is exactly the
    * replay case the guard exists for.
    */
  trait UpsertStore extends Serializable {
    /** Merge one partition of ((window_start, event_type), count) rows
      * for micro-batch `batchId`; must be a transactional no-op if
      * (batchId, partitionId) was already applied.
      */
    def merge(batchId: Long, partitionId: Int,
        rows: Iterator[((java.sql.Timestamp, String), Long)]): Unit
  }

  /** In-JVM reference UpsertStore (tests / local runs). State lives in
    * a static registry keyed by store name, so executor-side closure
    * copies address the same store in local mode; the applied
    * (batchId, partitionId) log is checked and written atomically with
    * the data — the transactional shape a JDBC/ELK implementation
    * mirrors durably.
    */
  final class InMemoryUpsertStore(val name: String) extends UpsertStore {
    override def merge(batchId: Long, partitionId: Int,
        rows: Iterator[((java.sql.Timestamp, String), Long)]): Unit = {
      val st = InMemoryUpsertStore.state(name)
      val staged = rows.toVector // stage outside the critical section
      st.synchronized {
        if (!st.applied.add((batchId, partitionId))) return // replayed partition → no-op
        staged.foreach { case (k, v) => st.data.put(k, v) }
      }
    }
    def snapshot: Map[(java.sql.Timestamp, String), Long] = {
      val st = InMemoryUpsertStore.state(name)
      st.synchronized { st.data.toMap }
    }
    def appliedKeys: Set[(Long, Int)] = {
      val st = InMemoryUpsertStore.state(name)
      st.synchronized { st.applied.toSet }
    }
  }
  object InMemoryUpsertStore {
    final class State {
      val data = scala.collection.mutable.Map.empty[(java.sql.Timestamp, String), Long]
      val applied = scala.collection.mutable.Set.empty[(Long, Int)]
    }
    private val registry = new java.util.concurrent.ConcurrentHashMap[String, State]()
    private def state(name: String): State =
      registry.computeIfAbsent(name, _ => new State)
    def reset(name: String): Unit = registry.remove(name)
  }

  /** A25: idempotent keyed upsert sink — the ELK-indexing pattern: the
    * windowed counts stream in update mode, each micro-batch MERGEd
    * into a keyed store partition-by-partition *on the executors*
    * (nothing is collected to the driver), with the (batchId,
    * partitionId) replay guard living in the store's own transaction
    * so re-delivered batches after a driver restart apply exactly once.
    */
  def streamUpsertCounts(events: DataFrame, store: UpsertStore,
      watermarkDelay: String = "30 minutes"): org.apache.spark.sql.streaming.StreamingQuery =
    streamWindowedCounts(events, watermarkDelay)
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          store.merge(batchId, org.apache.spark.TaskContext.getPartitionId(),
            rows.map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2))))
        }
      }
      .start()

  /** A15: the stdout-JSON sink (tasks.rs:105) — each emitted event as
    * one JSON line, pushed per-partition from the executors to the
    * downstream (ELK-style) store; the driver never materializes a
    * batch.
    *
    * Delivery is AT-LEAST-ONCE: a mid-partition task retry or a batch
    * replay after restart re-emits lines. The sink therefore receives
    * (batchId, partitionId, lines) — the same replay-guard handle as
    * UpsertStore.merge — so a store that can be idempotent (dedup on a
    * deterministic doc id, or a transactional applied-log) has what it
    * needs; a store that can't should use streamJsonFileSink, whose
    * file-commit protocol is exactly-once. A sink that ignores the ids
    * accepts at-least-once.
    */
  def streamJsonSink(emitted: Dataset[EmittedEv], queryName: String)(
      sink: (Long, Int, Iterator[String]) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    emitted.toDF()
      .select(to_json(struct(col("key"), col("ts"), col("event_id"))).as("line"))
      .writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          sink(batchId, org.apache.spark.TaskContext.getPartitionId(),
            rows.map(_.getString(0)))
        }
      }
      .start()

  /** A15 (file landing zone): one JSON line per emitted event, written
    * by the engine's partitioned text sink with its own exactly-once
    * file commit protocol — the deploy form of streamJsonSink.
    */
  def streamJsonFileSink(emitted: Dataset[EmittedEv], outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    emitted.toDF()
      .select(to_json(struct(col("key"), col("ts"), col("event_id"))).as("value"))
      .writeStream
      .format("text")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .start()
}
