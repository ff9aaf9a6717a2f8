package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the classic remedy when one
  * join key is hot enough that its single reducer becomes the
  * straggler (a power-law user, a null-ish default key). AQE's skew
  * split (`spark.sql.adaptive.skewJoin`) handles most cases at
  * runtime; explicit salting remains the deterministic, planner-level
  * form — it also works under static planning, on aggregation-free
  * shapes AQE won't split, and its fan-out is a declared constant
  * rather than a runtime heuristic.
  *
  * Mechanics: the skewed left side gets a deterministic per-ROW salt
  * in [0, saltFactor), spreading a hot key's rows over `saltFactor`
  * reducers; the right side is replicated `saltFactor`× (a narrow
  * explode — no shuffle added), once per salt value, so every
  * (key, salt) bucket still finds its match. The join then runs on
  * (key, salt): same rows out as the plain key join, hot key's work
  * split `saltFactor` ways. Cost: right side shuffles `saltFactor`×
  * its size — use for large-left ⋈ medium-right where the right is
  * too big to broadcast but cheap to replicate.
  */
object SaltedJoin {

  /** The per-row salt: hash of (every left column, the row's position
    * id). The position id is load-bearing — a salt hashed from COLUMN
    * VALUES alone sends all copies of a duplicated row to ONE reducer,
    * so exactly the low-entropy hot rows the salt exists to split
    * (a power-law user whose rows collapse to a handful of distinct
    * values) survive as a single hot bucket. monotonically_increasing_id
    * is per-row-unique and deterministic for a deterministic input
    * partitioning (it encodes partition index + offset — a task retry
    * recomputes the identical ids, unlike `rand()`); it never reaches
    * the output, so plan-reordering sensitivity of the id cannot leak
    * into results — only into which reducer a row lands on.
    */
  private[graft] def saltExpr(left: DataFrame, saltFactor: Int) =
    pmod(hash((left.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
      lit(saltFactor))

  /** Equi-join `left ⋈ right` on `leftKey == rightKey`, salted
    * `saltFactor` ways. Row-identical to the plain inner equi-join
    * (PlanSpec law); both input relations are returned unchanged plus
    * the join — no salt column survives in the output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltExpr(left, saltFactor))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
