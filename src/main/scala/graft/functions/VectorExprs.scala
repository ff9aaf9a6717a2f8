package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot-product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*))`)
  * allocates an intermediate array and evaluates a lambda per element —
  * interpreted, not codegen'd. This expression generates a tight
  * primitive loop inside whole-stage codegen instead (~10× on the
  * all-pairs cosine workload). Summation is the same sequential
  * ascending-index fold, so results stay bit-identical to the
  * `list_reduce` DuckDB oracle.
  *
  * Null contract (registered as `graft_dot` for arbitrary user arrays):
  * a null ELEMENT contributes 0 to the sum (the pair at that index is
  * skipped) — defined output, never a read of a null slot. The
  * per-element null check is only EMITTED when an input's ArrayType
  * says `containsNull`; the embedding hot path (containsNull = false)
  * keeps the branch-free loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<double> by construction (withNorm casts); no
  // ExpectsInputTypes — AbstractDataType is private[sql] in Spark 4
  override def dataType: DataType = DoubleType

  private def mayHaveNullElements: Boolean =
    Seq(left, right).exists(e => e == null || (e.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (mayHaveNullElements) {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val body =
        if (mayHaveNullElements)
          s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) $s += $a.getDouble($i) * $b.getDouble($i);"
        else
          s"$s += $a.getDouble($i) * $b.getDouble($i);"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $body
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private val FnName = "graft_dot"

  /** (name, implementing class, builder) for EVERY graft native
    * function — the single registration list consumed by both the
    * library path (ensureRegistered, via Tables) and the deploy
    * extension point (GraftExtensions.injectFunction). One list means
    * the two paths cannot drift: a cluster session configured with
    * spark.sql.extensions resolves exactly what embedded use does. The
    * class name feeds ExpressionInfo so DESCRIBE FUNCTION reports the
    * actual expression class, not the registrar.
    */
  val functions: Seq[(String, String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (FnName, classOf[DotProduct].getName, exprs => DotProduct(exprs.head, exprs(1))),
    ("graft_md5_60", classOf[Md5Prefix60].getName, exprs => Md5Prefix60(exprs.head)),
    ("graft_simhash60", classOf[SimHash60].getName, exprs => SimHash60(exprs.head)),
    ("graft_simhash_grams", classOf[SimHashGrams].getName, exprs => SimHashGrams(exprs.head)),
    ("graft_gram3_hashes", classOf[GramHashes].getName,
      exprs => GramHashes(exprs.head, 3, distinct = true)),
    ("graft_gram4_hashes", classOf[GramHashes].getName,
      exprs => GramHashes(exprs.head, 4, distinct = false)),
    ("graft_gram5_hashes", classOf[GramHashes].getName,
      exprs => GramHashes(exprs.head, 5, distinct = false)),
    ("graft_rolling_min", classOf[RollingHashMin].getName,
      exprs => RollingHashMin(exprs.head, 16)),
    ("graft_winnow8_mins", classOf[WinnowMins].getName,
      exprs => WinnowMins(exprs.head, 8)),
    ("graft_bigram_strings", classOf[WordGrams].getName,
      exprs => WordGrams(exprs.head, 2, distinct = false)),
    ("graft_bigram_strings_distinct", classOf[WordGrams].getName,
      exprs => WordGrams(exprs.head, 2, distinct = true)),
    ("graft_intersect_count", classOf[IntersectCount].getName,
      exprs => IntersectCount(exprs.head, exprs(1))))

  /** Register the native expressions in the session's function registry
    * (the public extension point — same mechanism
    * SparkSessionExtensions' injectFunction uses) and expose them as
    * Columns.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
