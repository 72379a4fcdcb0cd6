package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.bridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  /** Column form: sorted distinct md5-prefix hashes of the word
    * `w`-shingles of a token array ([[WordShingleHashes]]).
    */
  def word_shingle_hashes(tokens: Column, w: Int, nBytes: Int): Column =
    column(WordShingleHashes(expression(tokens), w, nBytes))

  /** Column form: sorted distinct md5-prefix hashes of the char `n`-grams
    * of a string ([[CharGramHashes]]).
    */
  def char_gram_hashes(text: Column, n: Int, nBytes: Int): Column =
    column(CharGramHashes(expression(text), n, nBytes))

  private def digestPrefix(d: Array[Byte], nBytes: Int): Long = {
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Driver-side md5 `nBytes`-prefix of a string — the SAME big-endian
    * fold the gram-hash expressions use, for callers that build constant
    * lookup tables keyed by gram hash (the [[graft.ops.LangId]]
    * profiles). One source of truth: a basis change here and in the
    * expressions stays in lockstep.
    */
  def md5Prefix(s: String, nBytes: Int): Long =
    digestPrefix(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")), nBytes)

  private def sortedDistinct(hs: Array[Long], m: Int): Array[Long] = {
    java.util.Arrays.sort(hs, 0, m)
    var out = 0
    var i = 0
    while (i < m) {
      if (out == 0 || hs(out - 1) != hs(i)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    if (out == hs.length) hs else java.util.Arrays.copyOf(hs, out)
  }

  private val SpaceByte = ' '.toByte

  /** Native model for [[WordShingleHashes]]: the hash of shingle
    * `[from, until)` is md5 over exactly the bytes
    * `concat_ws(" ", tokens)` would produce (nulls skipped without a
    * separator), streamed into the digest with no intermediate string.
    */
  def wordShingleHashesData(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
                            w: Int, nBytes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = md5Local.get()
    val n = tokens.numElements()
    def hashWindow(from: Int, until: Int): Long = {
      md.reset()
      var wrote = false
      var i = from
      while (i < until) {
        if (!tokens.isNullAt(i)) {
          if (wrote) md.update(SpaceByte)
          md.update(tokens.getUTF8String(i).getBytes)
          wrote = true
        }
        i += 1
      }
      digestPrefix(md.digest(), nBytes)
    }
    val m = if (n < w) 1 else n - w + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = if (n < w) hashWindow(0, n) else hashWindow(i, i + w)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sortedDistinct(hs, m))
  }

  /** Odd 31-bit multipliers for the minhash permutation family
    * (`h*K mod 2^32`, odd `K` < 2^31 — a bijection on Z_2^32 with products
    * exact in int64). The formula is the single source of truth for both
    * the native banding expression and the DuckDB oracle mirrors
    * ([[graft.ops.Dedup.multipliers]] delegates here).
    */
  def minhashMultipliers(n: Int): Array[Long] =
    Array.tabulate(n)(i => ((2L * i + 1L) * 2654435761L) % (1L << 31) | 1L)

  private val multiplierCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]
  private def cachedMultipliers(n: Int): Array[Long] =
    multiplierCache.computeIfAbsent(n, k => minhashMultipliers(k))

  private val M32 = 4294967296L // 2^32

  /** Native model for [[MinhashBandKeys]]: all `numBands*rowsPerBand`
    * permutation minima over the shingle-hash array in ONE pass, folded
    * straight into the per-band join keys (`h` is the top 4 digest
    * bytes, `shingle >> 24`; each band key is the 64-bit polynomial fold
    * `k = k·1000003 + min_r` of its minima, replacing the comma-joined
    * decimal STRING the r10 version emitted). Two docs share a band key
    * iff all `rowsPerBand` minima agree — up to 2⁻⁶⁴-grade fold
    * collisions, which can only ADD candidates the exact verify rejects,
    * never lose a pair. The switch matters at the shuffle: the candidate
    * equi-join carries (band, int64, doc_id) rows instead of ~60-byte
    * deep-key strings — measured 8.1 → ~4 s on d2's sf1 pass, where the
    * band join (not the signature math) dominates. Evaluated per
    * document with no exchange: the signature aggregation was the only
    * shuffle in LSH candidate generation besides the band join itself.
    */
  def minhashBandKeysData(shingles: org.apache.spark.sql.catalyst.util.ArrayData,
                          numBands: Int, rowsPerBand: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val nSig = numBands * rowsPerBand
    val ks = cachedMultipliers(nSig)
    val mins = new Array[Long](nSig)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = shingles.getLong(i) >> 24
      var j = 0
      while (j < nSig) {
        val v = (h * ks(j)) % M32
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var k = 0L
      var r = 0
      while (r < rowsPerBand) {
        k = k * 1000003L + mins(b * rowsPerBand + r)
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  /** Column form: per-document LSH band join keys ([[MinhashBandKeys]]). */
  def minhash_band_keys(shingles: Column, numBands: Int, rowsPerBand: Int): Column =
    column(MinhashBandKeys(expression(shingles), numBands, rowsPerBand))

  /** Native model for [[Simhash48]]: 48-bit simhash over the DISTINCT
    * tokens of the array — per distinct token the 6-byte md5 prefix
    * ([[md5PrefixUTF8]] basis), each hash bit voting ±1 on its position,
    * positive sums setting the output bit. Equal by construction to the
    * `explode(array_distinct(tokens)) → md5_prefix(tok, 6) → 48
    * conditional sums → sign fold` composition it replaces (dedup is on
    * token STRINGS, as `array_distinct` did — two tokens colliding to one
    * hash still vote twice).
    */
  def simhash48Data(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val md = md5Local.get()
    val seen = new java.util.HashSet[UTF8String]()
    val sums = new Array[Int](48)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (seen.add(t)) {
          md.reset()
          md.update(t.getBytes)
          val h = digestPrefix(md.digest(), 6)
          var j = 0
          while (j < 48) {
            if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 48) { if (sums(j) > 0) sim |= 1L << j; j += 1 }
    sim
  }

  /** Column form: 48-bit document simhash from a token array. */
  def simhash48(tokens: Column): Column = column(Simhash48(expression(tokens)))

  /** Native model for [[CharGramHashes]]: gram `i` is
    * `substr(text, i, n)` in Spark's 1-based character semantics, hashed
    * like [[md5PrefixUTF8]]. Grams are taken as byte slices of one UTF-8
    * buffer via a precomputed char→byte offset table — a per-gram
    * `UTF8String.substringSQL` would re-walk the string from byte 0 to
    * find the i-th character every call, turning the pass quadratic in
    * document length (measured: the one LSH query that got SLOWER when
    * this expression was fused, BENCH_r06 d6 4.3→6.6 s).
    */
  def charGramHashesData(text: UTF8String, n: Int,
                         nBytes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = md5Local.get()
    val bytes = text.getBytes
    val blen = bytes.length
    // starts(i) = byte offset of char i; starts(numChars) = blen.
    // A UTF-8 char starts at every non-continuation byte (b & 0xC0) != 0x80.
    var numChars = 0
    var b = 0
    while (b < blen) { if ((bytes(b) & 0xC0) != 0x80) numChars += 1; b += 1 }
    val starts = new Array[Int](numChars + 1)
    var ci = 0
    b = 0
    while (b < blen) {
      if ((bytes(b) & 0xC0) != 0x80) { starts(ci) = b; ci += 1 }
      b += 1
    }
    starts(numChars) = blen
    val m = if (numChars < n) 1 else numChars - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = starts(i)
      val until = starts(math.min(i + n, numChars))
      md.reset()
      md.update(bytes, from, until - from)
      hs(i) = digestPrefix(md.digest(), nBytes)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sortedDistinct(hs, m))
  }
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

/** Sorted distinct md5-prefix hashes of the word `w`-shingles of a token
  * array — the fused, codegen'd form of
  * `array_distinct(transform(shinglesFromTokens(toks, w), g => md5_prefix(g, nBytes)))`,
  * value-identical per shingle (the digest consumes exactly the
  * `concat_ws(" ", window)` bytes) but one native pass instead of three
  * interpreted higher-order functions: HOF lambdas don't participate in
  * whole-stage codegen, and their per-element expression-tree walk
  * dominated the LSH pipelines' profile (SURVEY §2 D2/D5/D7/D8). Output
  * order is canonical (ascending) and every downstream consumer is
  * order-insensitive (explode→agg, set intersection, sort-keyed grouping).
  */
case class WordShingleHashes(child: Expression, w: Int, nBytes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, s"shingle width $w must be >= 1")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes $nBytes outside [1,7]")
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashFunctions.wordShingleHashesData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w, nBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashFunctions.wordShingleHashesData($c, $w, $nBytes)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

/** Sorted distinct md5-prefix hashes of the char `n`-grams of a string —
  * the fused, codegen'd form of
  * `array_distinct(transform(charShinglesFromCanon(text, n), g => md5_prefix(g, nBytes)))`
  * with identical per-gram values (grams via the same 1-based
  * `substringSQL` the `substr` column op lowers to).
  */
/** Per-document LSH band join keys from a shingle-hash array — the fused,
  * codegen'd form of the minhash-signature aggregation:
  * `explode(shingles) → groupBy(doc).agg(min((h*kᵢ) % 2^32) ∀i) →
  * concat_ws(",", row minima per band)`. Emitting the band keys inside the
  * document's own row removes the signature exchange entirely — LSH
  * candidate generation then shuffles exactly once (the band-key equi-join),
  * which at cluster scale is the difference between one and two full
  * corpus-wide shuffles per dedup pass. Keys are value-identical to the
  * aggregated composition (same multiplier family, same `h = shingle >> 24`
  * basis, same decimal rendering), pinned by `PropertySpec` against an
  * independent model.
  */
case class MinhashBandKeys(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numBands >= 1 && rowsPerBand >= 1,
    s"banding ${numBands}x$rowsPerBand must be >= 1x1")
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashFunctions.minhashBandKeysData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numBands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashFunctions.minhashBandKeysData($c, $numBands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_keys"
}

/** 48-bit simhash of a token array in one native pass — the fused,
  * codegen'd form of the explode → per-token `md5_prefix(tok, 6)` → 48
  * conditional-sum aggregate → sign fold composition: the explode
  * multiplied rows by distinct-token count and the aggregate was a
  * full shuffle on doc_id; emitting the signature inside the document's
  * own row removes both. Values are bit-identical to the composition
  * (same hash basis, same string-level dedup), pinned by `PropertySpec`
  * against an independent model.
  */
case class Simhash48(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashFunctions.simhash48Data(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.simhash48Data($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash48 =
    copy(child = newChild)
  override def prettyName: String = "simhash48"
}

case class CharGramHashes(child: Expression, n: Int, nBytes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"gram width $n must be >= 1")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes $nBytes outside [1,7]")
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashFunctions.charGramHashesData(v.asInstanceOf[UTF8String], n, nBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashFunctions.charGramHashesData($c, $n, $nBytes)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
  override def prettyName: String = "char_gram_hashes"
}
