package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Semantic invariants of the TTL-cache family (the DuckDB oracle
  * checks exact equality at sf0.01; these check the *laws* hold).
  */
class EventOpsSpec extends SparkSpec {

  test("ttl cache: first event per key always emitted; no same-key emissions within TTL") {
    val ttlH = 24L
    val emitted = EventOps.evTtlCache(tables, ttlH).collect()
    assert(emitted.nonEmpty)
    val byKey = emitted.groupBy(_.getString(0))
    val firstPerKey = EventOps.evDedupExact(tables).collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    byKey.foreach { case (key, rows) =>
      val times = rows.map(_.getTimestamp(1)).sortBy(_.getTime)
      assert(times.head == firstPerKey(key), s"first event for $key must be emitted")
      times.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getTime - a.getTime >= ttlH * 3600 * 1000,
            s"$key emitted twice within TTL: $a, $b")
        case _ =>
      }
    }
  }

  test("ttl cache emissions are a subset of throttle-lag emissions' keys universe") {
    val ttl = EventOps.evTtlCache(tables).select("key").distinct().count()
    val all = EventOps.evDedupExact(tables).count()
    assert(ttl == all, "every key must emit at least once")
  }

  test("cache stats: hits + misses == total") {
    EventOps.evCacheStats(tables).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
  }

  test("sessionize: session bounds ordered and counts positive") {
    val s = EventOps.evSessionize(tables).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      assert(!r.getTimestamp(2).after(r.getTimestamp(3)))
      assert(r.getLong(4) > 0)
    }
  }
}
