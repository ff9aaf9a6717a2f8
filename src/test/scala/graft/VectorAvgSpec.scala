package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorAvg

/** Per-label embedding centroids via the typed Aggregator must equal
  * the posexplode + groupBy formulation.
  */
class VectorAvgSpec extends SparkSpec {

  test("VectorAvg centroids == explode-based means") {
    import spark.implicits._
    val e = tables.embeddings
      .select(col("label"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val viaAgg = e.as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAvg.toColumn.name("centroid"))
      .collect().toMap
    assert(viaAgg.nonEmpty)
    val viaExplode = tables.embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x").cast("double")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray).toMap
    viaAgg.foreach { case (label, centroid) =>
      val expected = viaExplode(label)
      assert(centroid.length == expected.length)
      centroid.zip(expected).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label=$label $a vs $b")
      }
    }
  }
}
