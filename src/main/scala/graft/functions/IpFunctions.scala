package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IP extraction + normalization scalars.
  *
  * Re-expresses the reference's one nontrivial scalar: pull the local IP out
  * of a sidestream basename and normalize the malformed-IPv6 quirk
  * (`/root/reference/filename_parser.go:17-29`; spec cases in
  * `/root/reference/filename_parser_test.go:9-35`):
  *
  *   - IP = substring between the FIRST `_` and the LAST `_`; empty string
  *     when there is no such well-formed span (old-format names).
  *   - sidestream emits a malformed `:::` inside some IPv6 literals
  *     (`2001:4c08:2003:3f:::230` → `2001:4c08:2003:3f::230`); collapse it.
  *   - anything that then fails IPv4/IPv6 validation → empty string.
  *
  * Implemented as pure static functions (unit-testable, no Spark) wrapped by
  * a codegen-capable Catalyst [[UnaryExpression]] so the scalar stays inside
  * whole-stage codegen instead of falling back to a black-box Scala UDF.
  */
object IpFunctions {

  /** True iff `s` is a dotted-quad IPv4 literal (each octet 0-255, 1-3 digits). */
  def isValidIpv4(s: String): Boolean = {
    val parts = s.split("\\.", -1)
    parts.length == 4 && parts.forall { p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) && p.toInt <= 255
    }
  }

  /** True iff `s` is an IPv6 literal: at most one `::`, hex groups of 1-4
    * digits, optional embedded IPv4 tail, exactly 8 groups (or fewer with `::`).
    */
  def isValidIpv6(s: String): Boolean = {
    if (s.isEmpty) return false
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return false

    // Counts 16-bit groups in a `:`-separated fragment, or -1 if malformed.
    def groups(part: String, allowV4Tail: Boolean): Int = {
      if (part.isEmpty) return 0
      val gs = part.split(":", -1)
      var count = 0
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        val isLast = i == gs.length - 1
        if (g.isEmpty) return -1
        if (isLast && allowV4Tail && g.contains('.')) {
          if (!isValidIpv4(g)) return -1
          count += 2
        } else {
          if (g.length > 4) return -1
          var j = 0
          while (j < g.length) {
            val c = g.charAt(j)
            val hex = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
            if (!hex) return -1
            j += 1
          }
          count += 1
        }
        i += 1
      }
      count
    }

    if (dc < 0) groups(s, allowV4Tail = true) == 8
    else {
      val l = groups(s.substring(0, dc), allowV4Tail = false)
      val r = groups(s.substring(dc + 2), allowV4Tail = true)
      l >= 0 && r >= 0 && l + r <= 7
    }
  }

  /** Collapse the sidestream `:::` quirk then validate; "" when invalid.
    * Mirrors the accept/reject behavior of the reference's normalize step
    * (`/root/reference/filename_parser.go:23-27`).
    */
  def normalizeIp(raw: String): String = {
    if (raw == null || raw.isEmpty) return ""
    val fixed = if (raw.contains(":::")) raw.replace(":::", "::") else raw
    if (fixed.indexOf(':') >= 0) { if (isValidIpv6(fixed)) fixed else "" }
    else if (isValidIpv4(fixed)) fixed
    else ""
  }

  /** Expand a VALID IPv6 literal to its 8 16-bit groups (v4 tail folded
    * into the last two groups).
    */
  private def ipv6Groups(s: String): Array[Int] = {
    def frag(part: String): Array[Int] =
      if (part.isEmpty) Array.empty
      else part.split(":", -1).flatMap { g =>
        if (g.indexOf('.') >= 0) {
          val o = g.split("\\.").map(_.toInt)
          Array((o(0) << 8) | o(1), (o(2) << 8) | o(3))
        } else Array(Integer.parseInt(g, 16))
      }
    val dc = s.indexOf("::")
    if (dc < 0) frag(s)
    else {
      val l = frag(s.substring(0, dc))
      val r = frag(s.substring(dc + 2))
      l ++ Array.fill(8 - l.length - r.length)(0) ++ r
    }
  }

  /** RFC 5952 canonical text of a VALID IPv6 literal: lowercase hex, no
    * leading zeros, the longest (leftmost on ties) run of ≥2 zero groups
    * collapsed to `::`; a v4-mapped address renders as its dotted quad —
    * exactly what Go's `net.IP.String()` (hence the reference's
    * `web100.NormalizeIPv6`, `/root/reference/filename_parser.go:23`) emits.
    */
  def canonicalizeIpv6(s: String): String = {
    val gs = ipv6Groups(s)
    if (gs.take(5).forall(_ == 0) && gs(5) == 0xffff)
      return s"${gs(6) >> 8}.${gs(6) & 0xff}.${gs(7) >> 8}.${gs(7) & 0xff}"
    var bestStart = -1
    var bestLen = 0
    var i = 0
    while (i < 8) {
      if (gs(i) == 0) {
        var j = i
        while (j < 8 && gs(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) gs.map(Integer.toHexString).mkString(":")
    else {
      val pre = gs.take(bestStart).map(Integer.toHexString).mkString(":")
      val post = gs.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      s"$pre::$post"
    }
  }

  /** Canonical comparable form of an IP literal: [[normalizeIp]] (the `:::`
    * collapse + validation) then RFC 5952 canonicalization for IPv6; ""
    * when invalid. This is the form whitelist MEMBERSHIP must compare on —
    * `2001:0DB8::1`, `2001:db8:0:0:0:0:0:1` and `2001:db8::1` are the same
    * server. [[extractLocalIp]] deliberately keeps the literal
    * (post-collapse) spelling for surfaced columns; joins canonicalize both
    * sides, so routing matches Go's canonical-form semantics either way.
    */
  def canonicalIp(raw: String): String = {
    val n = normalizeIp(raw)
    if (n.indexOf(':') >= 0) canonicalizeIpv6(n) else n
  }

  /** Substring between first and last `_` of a basename, normalized;
    * "" for old-format / malformed names
    * (`/root/reference/filename_parser.go:17-29`).
    */
  def extractLocalIp(name: String): String = {
    if (name == null) return ""
    val start = name.indexOf('_')
    val end = name.lastIndexOf('_')
    if (start < 0 || end < 0 || start >= end) return ""
    normalizeIp(name.substring(start + 1, end))
  }

  /** UTF8String shim so generated code avoids a per-row String round-trip
    * decision at the call site. Never returns null (empty string on miss).
    */
  def extractLocalIpUTF8(name: UTF8String): UTF8String =
    UTF8String.fromString(extractLocalIp(if (name == null) null else name.toString))

  def normalizeIpUTF8(raw: UTF8String): UTF8String =
    UTF8String.fromString(normalizeIp(if (raw == null) null else raw.toString))

  def canonicalIpUTF8(raw: UTF8String): UTF8String =
    UTF8String.fromString(canonicalIp(if (raw == null) null else raw.toString))

  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column form: extract + normalize the local IP from a basename column. */
  def local_ip(c: Column): Column = column(ExtractLocalIp(expression(c)))

  /** Column form: normalize an IP-literal column ("" when invalid). */
  def normalize_ip(c: Column): Column = column(NormalizeIp(expression(c)))

  /** Column form: canonical comparable IP ("" when invalid). */
  def canonical_ip(c: Column): Column = column(CanonicalIp(expression(c)))
}

/** Catalyst expression for [[IpFunctions.extractLocalIp]] — participates in
  * whole-stage codegen via a static call (no UDF serialization, null-safe).
  */
case class ExtractLocalIp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    IpFunctions.extractLocalIpUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpFunctions.extractLocalIpUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractLocalIp =
    copy(child = newChild)
  override def prettyName: String = "local_ip"
}

/** Catalyst expression for [[IpFunctions.canonicalIp]]. */
case class CanonicalIp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    IpFunctions.canonicalIpUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpFunctions.canonicalIpUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalIp =
    copy(child = newChild)
  override def prettyName: String = "canonical_ip"
}

/** Catalyst expression for [[IpFunctions.normalizeIp]]. */
case class NormalizeIp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    IpFunctions.normalizeIpUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpFunctions.normalizeIpUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeIp =
    copy(child = newChild)
  override def prettyName: String = "normalize_ip"
}
