package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class SketchSpec extends SparkSpec {

  test("HLL approx distinct within configured 2% rsd (allow 3 sigma) of exact") {
    val approx = Analytics.qApproxDistinct(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = tables.lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (o, p)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - o).toDouble / o < 0.06, s"$k orders: $ao vs $o")
      assert(math.abs(ap - p).toDouble / p < 0.06, s"$k parts: $ap vs $p")
    }
  }
}
