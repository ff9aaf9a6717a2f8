package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join: for every left row, attach the right row with the same
  * key and the greatest right-time ≤ left-time (LEFT semantics: null-
  * extended when none exists). Optional `tolerance` (micros) bounds
  * the lookback — a match older than left-time − tolerance is treated
  * as absent (pandas merge_asof / kdb wj semantics): an event should
  * not be "enriched" by state from arbitrarily far in the past.
  *
  * Spark has no native as-of join; composing one from built-ins
  * (equi-join → filter time ≤ → argmax per left row) materializes
  * O(|left| × matches-per-key) intermediate rows. This operator is the
  * classic linear sort-merge pass instead: both sides hash-partitioned
  * by key and sorted by (key, time) — the same distribution/ordering
  * contract SortMergeJoinExec declares — then one streaming scan per
  * partition with O(1) state (the current candidate row). At 100 TB:
  * one shuffle per side, no blow-up, no per-key buffering.
  *
  * Keys must evaluate to LongType; times to TimestampType/LongType
  * (micros) — enforced by the public wrapper (graft.plans.GraftPlans).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(allOutput, leftOutput ++ rightOutput)
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      var candKey = 0L
      var candTime = 0L
      var candRow: InternalRow = null
      val tol = tolerance.getOrElse(Long.MaxValue)

      lIt.map { lrow =>
        val kAny = lkB.eval(lrow)
        val tAny = ltB.eval(lrow)
        if (kAny == null || tAny == null) {
          proj(joined(lrow, nullRight))
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rkAny = rkB.eval(head)
            val rtAny = rtB.eval(head)
            if (rkAny == null || rtAny == null) { rBuf.next() } // skip null keys
            else {
              val rk = rkAny.asInstanceOf[Long]
              val rt = rtAny.asInstanceOf[Long]
              if (rk < k || (rk == k && rt <= t)) {
                candKey = rk
                candTime = rt
                candRow = rBuf.next().copy()
              } else advancing = false
            }
          }
          // tolerance gates the MATCH, not the scan: the candidate is
          // still the latest right row <= t for the key (any earlier
          // row is older still), it just may be too stale to attach
          if (candRow != null && candKey == k && t - candTime <= tol)
            proj(joined(lrow, candRow))
          else proj(joined(lrow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
