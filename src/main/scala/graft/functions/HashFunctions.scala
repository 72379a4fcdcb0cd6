package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.bridge.AbstractType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nBytes` of the md5 digest as an unsigned big-endian long —
    * value-identical to `conv(substring(md5(s), 1, 2·nBytes), 16, 10)` (and
    * DuckDB's `CAST('0x' || substr(md5(s), 1, 2n) AS BIGINT)`) but without
    * materializing the 32-char hex string or parsing base-16 per row. The
    * digest instance is thread-local: no `getInstance` per row.
    */
  def md5PrefixUTF8(s: UTF8String, nBytes: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(if (s == null) Array.emptyByteArray else s.getBytes)
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Column form: md5-prefix integer hash (`nBytes` ≤ 7 keeps it exact and
    * non-negative in int64).
    */
  def md5_prefix(c: Column, nBytes: Int): Column =
    column(Md5Prefix(expression(c), nBytes))
}

/** Catalyst expression for [[HashFunctions.md5PrefixUTF8]] — the integer
  * hash family under minhash/simhash/LSH, kept inside whole-stage codegen
  * with no hex-string intermediate (the `md5 → substring → conv`
  * composition it replaces allocated and parsed a 32-char string per row).
  */
case class Md5Prefix(child: Expression, nBytes: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(nBytes >= 1 && nBytes <= 7, s"nBytes $nBytes outside [1,7]")
  // Non-string children (e.g. SQL `md5_prefix(123, 4)`) are implicitly cast
  // to string at analysis time, matching the conv(substring(md5(x),…))
  // composition this expression replaced.
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashFunctions.md5PrefixUTF8(v.asInstanceOf[UTF8String], nBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.md5PrefixUTF8($c, $nBytes)")
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
  override def prettyName: String = "md5_prefix"
}

/** Catalyst expression for [[HashFunctions.rollingHash]]. */
case class RollingHash(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashFunctions.rollingHashUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.rollingHashUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}
