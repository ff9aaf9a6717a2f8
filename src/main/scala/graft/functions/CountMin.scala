package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed Aggregator — the fixed-size frequency
  * summary behind heavy-hitter queries over unbounded keyspaces (the
  * CMS analog of B12's HLL distinct-count): d×w long counters, each
  * key incrementing one counter per row via independent hashes;
  * a key's estimate is the MIN of its d counters — never an
  * undercount, overcount bounded by collisions (≤ 2N/w with
  * probability 1 − 2^−d, Cormode & Muthukrishnan).
  *
  * The buffer is one flat d·w long array; merge is element-wise sum —
  * associative + commutative, so the shuffle carries one 16 KiB sketch
  * per partition instead of the keyspace (the point at 100 TB: exact
  * top-k needs a corpus-keyed shuffle; the sketch pass needs a
  * constant-size reduce).
  */
class CountMinAgg(d: Int, w: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], pos: Array[Long]): Array[Long] = {
    var r = 0
    while (r < d) { buf(r * w + pos(r).toInt) += 1L; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Default geometry: 4 rows × 512 buckets = 16 KiB of longs. */
  val D = 4
  val W = 512

  /** Row-r bucket of a string key: the same affine-permutation family
    * as the MinHash signatures (Hashing.Perms over md5_60's low 30
    * bits) reduced mod w — pure codegen'd Columns, no UDF.
    */
  def bucket(r: Int, key: Column, w: Int = W): Column = {
    val base = pmod(Hashing.md5_60(key), lit(Hashing.M30))
    pmod((lit(Hashing.Perms(r)._1) * base + lit(Hashing.Perms(r)._2)) % lit(Hashing.P), lit(w.toLong))
  }

  /** All d bucket positions as one array column. */
  def positions(key: Column, d: Int = D, w: Int = W): Column =
    array((0 until d).map(r => bucket(r, key, w)): _*)

  /** The min-of-d-counters estimate for `key` against a `sketch`
    * array column (flat d×w, 1-based element_at).
    */
  def estimate(sketch: Column, key: Column, d: Int = D, w: Int = W): Column =
    least((0 until d).map(r =>
      element_at(sketch, (bucket(r, key, w) + lit(r.toLong * w) + lit(1L)).cast("int"))): _*)
}
