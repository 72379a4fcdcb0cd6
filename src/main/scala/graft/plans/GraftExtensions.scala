package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CanonicalIp, CharGramHashes, ExtractLocalIp, Md5Prefix, MinhashBandKeys, NfcNormalize, NormalizeIp, RollingHash, Simhash48, StripAccents, WordShingleHashes}

/** SparkSessionExtensions hook: exposes graft's custom Catalyst expressions
  * to SQL (`SELECT local_ip(name) ...`) so the engine is usable from pure
  * `spark.sql` just like from the DataFrame API. Wire up with
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)  // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Extending via `injectFunction` (not a UDF registry) keeps the functions
  * codegen'd Catalyst expressions — no serialization wall in SQL either.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, clazz: Class[_], build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = {
      case Seq(child) => build(child)
      case args => throw new IllegalArgumentException(
        s"$name expects 1 argument, got ${args.length}")
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      builder)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(unary("local_ip", classOf[ExtractLocalIp], ExtractLocalIp))
    ext.injectFunction(unary("normalize_ip", classOf[NormalizeIp], NormalizeIp))
    ext.injectFunction(unary("canonical_ip", classOf[CanonicalIp], CanonicalIp))
    ext.injectFunction(unary("rolling_hash", classOf[RollingHash], RollingHash))
    ext.injectFunction(unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize))
    ext.injectFunction(unary("strip_accents", classOf[StripAccents], StripAccents))
    ext.injectFunction(unary("simhash48", classOf[Simhash48], Simhash48))
    ext.injectFunction(GraftExtensions.md5PrefixEntry)
    ext.injectFunction(GraftExtensions.wordShingleHashesEntry)
    ext.injectFunction(GraftExtensions.charGramHashesEntry)
    ext.injectFunction(GraftExtensions.minhashBandKeysEntry)
    ext.injectFunction(GraftExtensions.explodeTarEntry)
  }
}

object GraftExtensions {

  private[plans] val explodeTarEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("explode_tar"),
      new ExpressionInfo(classOf[ExplodeTar].getCanonicalName, "explode_tar"),
      { case Seq(p, c) => ExplodeTar(p, c)
        case args => throw new IllegalArgumentException(
          s"explode_tar expects (path, content), got ${args.length} args") })

  private[plans] val md5PrefixEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_prefix"),
      new ExpressionInfo(classOf[Md5Prefix].getCanonicalName, "md5_prefix"),
      { case Seq(c, n) if n.foldable =>
          Md5Prefix(c, n.eval().asInstanceOf[Number].intValue)
        case args => throw new IllegalArgumentException(
          s"md5_prefix expects (str, constant nBytes), got ${args.length} args") })

  private def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue

  private[plans] val wordShingleHashesEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getCanonicalName, "word_shingle_hashes"),
      { case Seq(toks, w, n) if w.foldable && n.foldable =>
          WordShingleHashes(toks, intArg(w), intArg(n))
        case args => throw new IllegalArgumentException(
          s"word_shingle_hashes expects (tokens, constant w, constant nBytes), got ${args.length} args") })

  private[plans] val charGramHashesEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getCanonicalName, "char_gram_hashes"),
      { case Seq(text, n, b) if n.foldable && b.foldable =>
          CharGramHashes(text, intArg(n), intArg(b))
        case args => throw new IllegalArgumentException(
          s"char_gram_hashes expects (text, constant n, constant nBytes), got ${args.length} args") })

  private[plans] val minhashBandKeysEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinhashBandKeys].getCanonicalName, "minhash_band_keys"),
      { case Seq(shingles, nb, rb) if nb.foldable && rb.foldable =>
          MinhashBandKeys(shingles, intArg(nb), intArg(rb))
        case args => throw new IllegalArgumentException(
          s"minhash_band_keys expects (shingles, constant numBands, constant rowsPerBand), got ${args.length} args") })

  /** Imperative registration for an existing session (tests, shells). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("local_ip"),
      new ExpressionInfo(classOf[ExtractLocalIp].getCanonicalName, "local_ip"),
      { case Seq(c) => ExtractLocalIp(c) })
    reg.registerFunction(FunctionIdentifier("normalize_ip"),
      new ExpressionInfo(classOf[NormalizeIp].getCanonicalName, "normalize_ip"),
      { case Seq(c) => NormalizeIp(c) })
    reg.registerFunction(FunctionIdentifier("canonical_ip"),
      new ExpressionInfo(classOf[CanonicalIp].getCanonicalName, "canonical_ip"),
      { case Seq(c) => CanonicalIp(c) })
    reg.registerFunction(FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getCanonicalName, "rolling_hash"),
      { case Seq(c) => RollingHash(c) })
    reg.registerFunction(FunctionIdentifier("simhash48"),
      new ExpressionInfo(classOf[Simhash48].getCanonicalName, "simhash48"),
      { case Seq(c) => Simhash48(c) })
    reg.registerFunction(FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName, "nfc_normalize"),
      { case Seq(c) => NfcNormalize(c) })
    reg.registerFunction(FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getCanonicalName, "strip_accents"),
      { case Seq(c) => StripAccents(c) })
    Seq(md5PrefixEntry, wordShingleHashesEntry, charGramHashesEntry,
      minhashBandKeysEntry, explodeTarEntry).foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
