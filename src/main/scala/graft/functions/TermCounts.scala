package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-match occurrence counts of a FIXED term list over a token array,
  * in ONE pass — the fused form of k parallel
  * `size(toks) - size(array_remove(toks, term))` columns, which each
  * allocate a filtered copy of the array per term per row. With the BM25
  * term set that was five array copies per chunk on the h5/t11 hot path;
  * here it is one scan with k UTF8String equality checks per token (k is
  * a handful — linear probing beats hashing at that size). Counts are
  * value-identical to the per-term composition, so the BM25 oracles are
  * unchanged.
  */
object TermCounts {

  def data(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
           terms: Array[UTF8String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val counts = new Array[Long](terms.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(t)) counts(j) += 1L
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** Column form. */
  def token_term_counts(tokens: Column, terms: Seq[String]): Column =
    column(TokenTermCounts(expression(tokens), terms))
}

case class TokenTermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term list must be non-empty")

  @transient private lazy val utf8Terms: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_term_counts expects array<string> tokens, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.data(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      utf8Terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // JAVA SOURCE syntax for the reference cast — `classOf[Array[_]].getName`
    // yields the JVM binary name (`[Lorg...UTF8String;`), which Janino
    // rejects ("Unexpected token [ in primary") and the WHOLE projection
    // silently fell back to interpreter mode on every BM25-family query
    // (review r20; the fallback WARN only surfaces at log level WARN)
    val ref = ctx.addReferenceObj("termList", utf8Terms,
      s"${classOf[UTF8String].getName}[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.data($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenTermCounts = copy(child = newChild)

  override def prettyName: String = "token_term_counts"
}
