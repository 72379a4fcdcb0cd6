package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprinting: the polynomial hash
  * `h ← (h·131 + codepoint) mod (2³¹−1)` folded over the text's unicode
  * codepoints from a fixed seed. Engine-portable by construction (all
  * intermediate values < 2³⁸, exact in any int64) — DuckDB reproduces it
  * with `list_reduce` over `unicode(substr(...))`, which is what the oracle
  * for the fingerprint query does.
  *
  * Implemented as a codegen'd Catalyst [[UnaryExpression]] (not a UDF), so
  * the fold stays inside whole-stage codegen like the rest of the scalar
  * layer.
  */
object HashFunctions {

  val Mod: Long = 2147483647L // 2^31 - 1
  val Mult: Long = 131L
  val Seed: Long = 7L

  /** Pure model (unit tests, property specs). */
  def rollingHash(s: String): Long = {
    var h = Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def rollingHashUTF8(s: UTF8String): Long =
    rollingHash(if (s == null) "" else s.toString)

  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column form. */
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
}

/** Catalyst expression for [[HashFunctions.rollingHash]]. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashFunctions.rollingHashUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.rollingHashUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}
