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
  * in [0, saltFactor) (hash of the whole row — NOT `rand()`, which
  * breaks retry/replay reproducibility), spreading a hot key's rows
  * over `saltFactor` reducers; the right side is replicated
  * `saltFactor`× (a narrow explode — no shuffle added), once per salt
  * value, so every (key, salt) bucket still finds its match. The join
  * then runs on (key, salt): same rows out as the plain key join, hot
  * key's work split `saltFactor` ways. Cost: right side shuffles
  * `saltFactor`× its size — use for large-left ⋈ medium-right where
  * the right is too big to broadcast but cheap to replicate.
  */
object SaltedJoin {

  /** Equi-join `left ⋈ right` on `leftKey == rightKey`, salted
    * `saltFactor` ways. Row-identical to the plain inner equi-join
    * (PlanSpec law); both input relations are returned unchanged plus
    * the join — no salt column survives in the output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
