package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar surface for the large-scale training-data pipeline
  * operators (dedup, quality scoring, language ID, fingerprinting).
  *
  * Everything here is built from codegen'd Spark built-ins (no UDFs) and is
  * deliberately mirror-able in ANSI/DuckDB SQL so every operator can be
  * oracle-checked: tokenization is regex-based, hashes are md5-derived
  * (md5 is bit-identical across engines, unlike murmur/xxhash variants).
  */
object TextFunctions {

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Canonical form for fingerprint/dedup: lowercase, collapsed whitespace. */
  def canonText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of trimmed text (the reference-free baseline). */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish tokens: `regexp_extract_all` over the lowered text. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  /** Word w-shingles (default 3) joined by a space: the minhash unit.
    * `transform(sequence(...))` keeps it inside codegen; short texts
    * collapse to a single whole-text shingle.
    *
    * PERFORMANCE: expressions referenced inside a `transform` lambda are
    * re-evaluated PER ELEMENT — pass a materialized token-array column
    * (see [[shinglesFromTokens]]), not a raw text column, on hot paths;
    * this convenience form re-splits the text once per emitted shingle.
    */
  def wordShingles(c: Column, w: Int = 3): Column =
    shinglesFromTokens(wsTokens(c), w)

  /** w-shingles over an (ideally already materialized) token array. */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column =
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))

  /** Char n-grams over an (ideally already materialized) canonical-text
    * column — see the per-element caveat on [[wordShingles]].
    */
  def charShinglesFromCanon(canon: Column, n: Int = 5): Column =
    when(length(canon) < n, array(canon))
      .otherwise(transform(sequence(lit(1), length(canon) - (n - 1)),
        i => canon.substr(i, lit(n))))

  /** Character n-grams (default 5) of the CANONICAL text — the char-level
    * jaccard unit, more robust to word-boundary edits than word shingles.
    * Texts shorter than `n` collapse to one whole-text gram. Convenience
    * form: materialize [[canonText]] first on hot paths (per-element
    * re-evaluation caveat on [[wordShingles]]).
    */
  def charShingles(c: Column, n: Int = 5): Column =
    charShinglesFromCanon(canonText(c), n)

  /** Count of alphabetic chars in the lowered text. */
  def alphaCount(c: Column): Column =
    length(regexp_replace(lower(c), "[^a-z]", ""))

  /** Count of punctuation (non-alnum, non-space) chars. */
  def punctCount(c: Column): Column =
    length(regexp_replace(lower(c), "[a-z0-9\\s]", ""))

  /** Tokens found in `words` (a small inline set), for stopword ratios and
    * marker-word language scoring.
    */
  def tokenHits(c: Column, words: Seq[String]): Column =
    size(filter(wsTokens(lower(c)), t => t.isin(words.map(lit(_)): _*)))

  /** 128-bit md5 fingerprint of the canonical text (F-fingerprint). */
  def fingerprint(c: Column): Column = md5(canonText(c))

  /** 32-bit integer fingerprint: the first 4 md5 digest bytes as a long —
    * the md5-derived hash family used anywhere an integer hash is needed
    * (minhash, simhash, LSH bucketing) so DuckDB can replicate it exactly
    * (`CAST('0x' || substr(md5(x),1,8) AS BIGINT)`). Computed by the
    * [[graft.functions.HashFunctions.md5_prefix]] codegen Expression —
    * value-identical to the `conv(substring(md5(x),1,8),16,10)`
    * composition but with no hex-string intermediate per row.
    */
  def hash32(c: Column): Column = graft.functions.HashFunctions.md5_prefix(c, 4)

  /** Seeded variant: hash32 of `seed || '|' || value`. */
  def hash32(c: Column, seed: Int): Column =
    hash32(concat(lit(s"$seed|"), c))

  /** 48-bit md5-derived hash (first 6 digest bytes) — wider simhash space;
    * still exact in int64 for both engines.
    */
  def hash48(c: Column): Column = graft.functions.HashFunctions.md5_prefix(c, 6)
}
