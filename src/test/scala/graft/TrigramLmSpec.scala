package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.wsTokens
import graft.ops.LmScore

/** T27 stupid-backoff properties the oracle grade cannot isolate: the
  * exact integer arm values, WORD-ORDER sensitivity on a document pair
  * the t13 char-bigram gate scores IDENTICALLY (bigram histograms are
  * order-blind; trigram context is not), partition invariance, and the
  * OOV floor.
  */
class TrigramLmSpec extends AnyFunSuite with SparkSuite {

  // every word starts and ends with 's', so ANY permutation of the
  // sentence has the SAME char-bigram histogram (word-internal bigrams
  // plus the identical ('s',' ')/(' ','s') boundaries) — the t13 model
  // cannot tell the permutations apart, by construction
  private val canonical = "sas ses sis sos sus"
  private val reversed = "sus sos sis ses sas"

  private def corpus = {
    import spark.implicits._
    // even ids train; odd ids are held out
    Seq((0L, canonical), (2L, canonical), (4L, canonical), (6L, canonical),
        (1L, canonical), (3L, reversed), (5L, "zzz qqq www"))
      .toDF("doc_id", "text")
  }

  private def t27(parts: Int): Map[Long, (Long, Long)] = {
    val toked = corpus
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))
      .filter(size(col("ts")) >= 3)
      .repartition(parts, col("doc_id"))
    LmScore.stupidBackoffScores(toked, col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("separates a permuted pair the char-bigram gate scores identically") {
    import spark.implicits._
    // t13: identical nll for the two permutations — exactly
    val d = corpus.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val model = LmScore.trainBigramModel(d.as[(Long, String)].toDF("doc_id", "t"))
    val nllA = LmScore.score(model, 1L, canonical)._2
    val nllB = LmScore.score(model, 3L, reversed)._2
    assert(nllA === nllB) // bit-equal: same bigram histogram
    // t27: the canonical order hits the trigram arm everywhere
    // (c123 = c12 = 4 → exactly 1e6 ppm); the reversal falls through to
    // the unigram arm: (160000 * ((1e6·4) div 20)) div 1e6 = 32000
    val got = t27(parts = 1)
    assert(got(1L) === ((3L, 1000000L)))
    assert(got(3L) === ((3L, 32000L)))
    // all-OOV document floors at 0
    assert(got(5L) === ((1L, 0L)))
  }

  test("integer scores are invariant under input partitioning") {
    assert(t27(parts = 1) === t27(parts = 13))
  }

  test("the bigram backoff arm fires between trigram and unigram") {
    import spark.implicits._
    // train: "a b c d"; held-out "x b c y": trigrams unseen, but (b,c)
    // is a seen bigram with c(b)=1 → s = (400000·((1e6·1) div 1)) div 1e6
    val toked = Seq((0L, "a b c d"), (1L, "x b c y"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))
    val got = LmScore.stupidBackoffScores(toked, col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 trigrams: (x,b,c) → bigram arm on (b,c) = 400000;
    // (b,c,y) → y unseen → 0. mean = 400000 div 2 = 200000
    assert(got(1L) === ((2L, 200000L)))
    assert(got(0L) === ((2L, 1000000L)))
  }

  test("a document shorter than 3 tokens fails loudly instead of scoring null pseudo-trigrams (r19 review)") {
    import spark.implicits._
    // sequence(0, size-3) DESCENDS for size < 3 — without the guard this
    // doc would silently contribute two null-word trigrams scored 0
    val toked = Seq((0L, "a b c d"), (1L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))
    val ex = intercept[Exception](
      LmScore.stupidBackoffScores(toked, col("doc_id") === 0).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("shorter than")))
  }

  test("empty training corpus fails loudly") {
    val toked = corpus
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))
      .filter(size(col("ts")) >= 3)
    intercept[IllegalArgumentException](
      LmScore.stupidBackoffScores(toked, lit(false)))
  }
}
