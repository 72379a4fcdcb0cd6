package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangId

/** T3b semantics the per-doc oracle cannot articulate: WHY the profile
  * classifier is stronger than t3's marker argmax — documents with zero
  * marker words still classify, via broad character statistics.
  */
class LangIdSpec extends AnyFunSuite with SparkSuite {

  private val t3Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  private def hashes(s: String): Array[Long] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.functions.HashFunctions.char_gram_hashes(col("t"), 3, 7))
      .collect()(0).getSeq[Long](0).toArray
  }

  test("markerless planted documents classify by profile, not keywords") {
    for ((txt, want) <- Seq(LangId.PlantedEs -> "es",
        LangId.PlantedDe -> "de", LangId.PlantedFr -> "fr")) {
      // the planted text contains NONE of its language's t3 marker words —
      // a marker argmax scores it zero for its own class
      val words = txt.split(" ").toSet
      assert(words.intersect(t3Markers(want).toSet).isEmpty,
        s"planted '$want' doc leaks marker words")
      val (guess, scores) = LangId.score(hashes(txt))
      assert(guess === want, s"planted $want text classified $guess " +
        s"(scores ${scores.mkString(",")})")
    }
  }

  test("gibberish with no seed gram classifies unknown; ties break by declaration") {
    val (guess, scores) = LangId.score(hashes(LangId.Gibberish))
    assert(guess === "unknown" && scores.forall(_ == 0L))
    // empty gram set is unknown too (degenerate doc)
    assert(LangId.score(Array.empty[Long])._1 === "unknown")
    // an unknown gram is a miss, not a crash
    assert(LangId.score(Array(0L))._1 === "unknown")
    // a REAL tie (injected model — the seeds can't stage one exactly):
    // gram 7 counts 1 in en and es, equal totals → normalized scores tie
    // and the FIRST-DECLARED language wins. This pins the cross-engine
    // seam: Scala's strict `>` replace-on-beat must stay equivalent to
    // the oracle's `>=` keep-on-not-beaten arms.
    val tieProfile = Map(7L -> Array(1L, 1L, 0L, 0L))
    val totals = Array(10L, 10L, 10L, 10L)
    assert(LangId.score(Array(7L), tieProfile, totals)._1 === "en")
    // and an asymmetric total breaks the tie toward the better-normalized
    // class even when raw scores are equal (es: 1/5 > en: 1/10)
    assert(LangId.score(Array(7L), tieProfile,
      Array(10L, 5L, 10L, 10L))._1 === "es")
  }

  test("base-vocabulary text classifies en (the unplanted corpus path)") {
    val base = "key agg row scan slow fast table value part hash merge " +
      "batch spark line sort window order data column join small query"
    assert(LangId.score(hashes(base))._1 === "en")
  }

  test("profile windowing matches the CharGramHashes expression on every edge") {
    // the profile builder re-states the expression's windowing rule in
    // Scala; this pins the two sides byte-for-byte — incl. the
    // whole-string-when-short case and multi-byte chars
    for (s <- Seq("a", "ab", "abc", "abcd", "the quick brown fox",
        LangId.Seeds.head._2.take(40))) {
      val fromProfileSide = LangId.grams3(s)
        .map(g => graft.functions.HashFunctions.md5Prefix(g, 7))
        .distinct.sorted
      assert(fromProfileSide === hashes(s).sorted.toSeq,
        s"windowing seam diverged for '$s'")
    }
  }

  test("profile is well-formed: per-class totals match seed gram counts") {
    assert(LangId.Totals.length === LangId.Langs.length)
    LangId.Seeds.zipWithIndex.foreach { case ((_, txt), i) =>
      assert(LangId.Totals(i) === (txt.length - 2).toLong,
        s"T_${LangId.Langs(i)} != #grams of its seed")
    }
    // column sums of the profile equal the totals (no count lost to the map)
    val sums = new Array[Long](LangId.Langs.length)
    LangId.Profile.values.foreach { cs =>
      var i = 0
      while (i < cs.length) { sums(i) += cs(i); i += 1 }
    }
    assert(sums.toSeq === LangId.Totals.toSeq)
  }
}
