package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions._
import graft.plans.AsOfJoinStrategy

/** SparkSessionExtensions entry point — deploy-time registration of
  * everything graft adds to a session:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (Library code paths also self-register through Tables/GraftPlans,
  * so embedded use needs no config.)
  *
  * The function list mirrors VectorExprs.ensureRegistered exactly — a
  * config-registered cluster session must resolve every graft_*
  * function the library path does (SqlSurfaceSpec cross-checks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(e: SparkSessionExtensions, name: String, className: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      // the EXPRESSION class, not this registrar: DESCRIBE FUNCTION
      // surfaces it as the implementing class
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(className, name),
      builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    VectorExprs.functions.foreach { case (name, cls, builder) => inject(e, name, cls, builder) }
  }
}
