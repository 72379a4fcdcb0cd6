package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The embedding-math hot loop as a native codegen expression.
  *
  * Every similarity op scores vectors with `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` — but Catalyst higher-order functions are interpreted: one
  * lambda-variable rebind and one boxed arithmetic step PER ELEMENT. At
  * pair volume (probes × corpus × d multiplies in n1/n4) that constant is
  * the whole query: the sf1 sweep measured brute-force ANN at ~8.5M
  * multiply-adds/sec — a plain JVM loop does this >50× faster.
  *
  * [[DotProduct]] is the same arithmetic as the higher-order form —
  * left-to-right summation over doubles, so results are BIT-IDENTICAL
  * (oracle hashes unchanged) — evaluated by one static call from
  * whole-stage codegen into a tight loop over the unsafe array.
  * Null semantics also match the zip_with/aggregate composition exactly:
  * null array → null, length mismatch → null (zip_with pads with null,
  * null poisons the sum), null element → null, empty arrays → 0.0.
  */
object VectorMath {

  /** Dot product loop over two double arrays; boxed so the null cases can
    * propagate exactly like the higher-order composition it replaces.
    */
  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Integer variant — the n4 int8-code prefilter (`array<bigint>` codes,
    * exact integer arithmetic). Same wrapping add as Spark's non-ANSI
    * `Add` over longs.
    */
  def dotLL(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column form: codegen'd dot product of two `array<double>` or two
    * `array<bigint>` columns (callers cast float embeddings first —
    * exactly what the higher-order form required too).
    */
  def fast_dot(x: Column, y: Column): Column =
    column(DotProduct(expression(x), expression(y)))
}

/** `dot(array<double>, array<double>) -> double` (or `array<bigint>` →
  * `bigint`) as one static call inside whole-stage codegen — see
  * [[VectorMath]] for why this beats the `aggregate(zip_with(...))`
  * composition it is value-identical to.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = elementType

  // a length mismatch or null element nulls the result even when both
  // array inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<double> or two array<bigint>, got ($l, $r)")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    elementType match {
      case DoubleType =>
        VectorMath.dotDD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      case LongType =>
        VectorMath.dotLL(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (boxedType, helper, unbox) = elementType match {
      case DoubleType => ("java.lang.Double", "dotDD", "doubleValue")
      case LongType   => ("java.lang.Long", "dotLL", "longValue")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |$boxedType $boxed = graft.functions.VectorMath.$helper($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.$unbox();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
