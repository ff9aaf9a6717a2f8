package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector mean as a typed Aggregator — the centroid
  * computation behind IVF/k-means-style coarse quantizers, expressed
  * through Spark's user-facing typed aggregation API (the third
  * extension tier next to native Expressions and custom plans).
  *
  * The buffer is a mutable (sums, count) pair; merge is element-wise —
  * associative + commutative, so Spark applies it map-side first and
  * the shuffle carries one buffer per group per partition.
  */
object VectorAvg extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    if (b._2 == 0L) (v.clone(), 1L)
    else {
      val s = b._1
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      val s = a._1
      var i = 0
      while (i < s.length && i < b._1.length) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.empty[Double] else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
