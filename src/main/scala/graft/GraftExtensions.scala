package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{DotProduct, Md5Prefix60}
import graft.plans.AsOfJoinStrategy

/** SparkSessionExtensions entry point — deploy-time registration of
  * everything graft adds to a session:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (Library code paths also self-register through Tables/GraftPlans,
  * so embedded use needs no config.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_md5_60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Md5Prefix60].getName, "graft_md5_60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(exprs.head)))
  }
}
