package graft

import org.apache.spark.sql.functions._

import graft.plans.SaltedJoin

/** Laws for the skew-salting join (plans/SaltedJoin.scala): result
  * identity vs the plain equi-join, and — with broadcasting disabled,
  * the regime salting exists for — the physical join really keys on
  * (key, _salt) and the hot key's rows really spread across salt
  * buckets.
  */
class SaltedJoinSpec extends SparkSpec {

  private def sides = {
    val t = tables
    val userOrders = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("o_count"))
    val ev = t.events.select(col("event_type"), col("user_id"))
    (ev, userOrders)
  }

  test("salted join == plain join, row for row") {
    val (ev, userOrders) = sides
    val salted = SaltedJoin.saltedJoin(ev, userOrders, "user_id", "o_custkey", 8)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = ev.join(userOrders, ev("user_id") === userOrders("o_custkey"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain,
      s"salted≠plain: only-salted=${(salted.keySet -- plain.keySet).take(2)} " +
        s"only-plain=${(plain.keySet -- salted.keySet).take(2)}")
  }

  test("under shuffle join, the physical join keys include the salt") {
    val (ev, userOrders) = sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = SaltedJoin.saltedJoin(ev, userOrders, "user_id", "o_custkey", 8)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), s"join must key on the salt:\n${plan.take(900)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a hot key's rows spread across salt buckets") {
    val (ev, _) = sides
    // the busiest user at this SF stands in for the power-law hot key
    val hot = ev.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).limit(1)
      .collect().head.getLong(0)
    val salts = ev.filter(col("user_id") === hot)
      .withColumn("_salt", SaltedJoin.saltExpr(ev, 8))
      .select(col("_salt")).distinct().count()
    assert(salts > 4, s"hot key hit only $salts of 8 salt buckets")
  }

  test("DUPLICATED rows of a hot key spread too (value-only salt would collapse them)") {
    import spark.implicits._
    // degenerate worst case: one (key, payload) row duplicated 512× —
    // zero column entropy, the exact population a value-hashed salt
    // sends to a single reducer
    val dup = Seq.fill(512)(("click", 7L)).toDF("event_type", "user_id")
      .repartition(4)
    val salts = dup.withColumn("_salt", SaltedJoin.saltExpr(dup, 8))
      .select(col("_salt")).distinct().count()
    assert(salts == 8, s"identical rows hit only $salts of 8 salt buckets")
    // and the join over the duplicated left is still row-exact
    val right = Seq((7L, 99L)).toDF("k", "payload")
    val out = SaltedJoin.saltedJoin(dup, right, "user_id", "k", 8)
    assert(out.count() == 512L, "each duplicate row must match exactly once")
  }
}
