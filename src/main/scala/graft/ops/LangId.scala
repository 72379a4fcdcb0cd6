package graft.ops

/** T3b — character-n-gram-profile language identification (the Cavnar &
  * Trenkle / fastText-family approach), replacing marker-word matching as
  * the langid component: per-language char-3-gram PROFILES are built from
  * labeled seed text, and a document is assigned the language whose
  * profile its own gram set matches best. Unlike t3's marker argmax, no
  * specific word needs to appear — classification rides the broad
  * character statistics of the language (stems, affixes, letter
  * transitions), so a document containing none of the classic function
  * words still classifies correctly (`LangIdSpec` pins exactly that).
  *
  * Cross-engine contract: everything is integer arithmetic. A profile is
  * the seed's gram → occurrence-count map; a document's score for a class
  * is the sum of profile counts over the document's DISTINCT grams; the
  * argmax compares seed-length-normalized scores `s_c / T_c` by integer
  * cross-multiplication (`s_a·T_b > s_b·T_a` — exact in int64, no
  * division anywhere), first-declared language winning ties; all-zero
  * scores yield `unknown`. DuckDB replays the identical derivation from
  * the same seed literals, so the oracle grades profile construction,
  * gram extraction, scoring, and the argmax.
  *
  * Scale shape (the t13 train-broadcast-score pattern): the profile is a
  * constant (seed literals — or, in a production fit, a per-class
  * histogram aggregated exactly like [[LmScore.trainBigramModel]]); the
  * score step is a scan → broadcast-map fold with ZERO exchanges — the
  * canonical broadcast-dictionary shape a 100 TB langid pass runs. Grams
  * come from the fused codegen expression
  * [[graft.functions.HashFunctions.char_gram_hashes]] (one native pass),
  * and the int64 gram hashes make the per-doc fold an integer map lookup
  * instead of string hashing.
  */
object LangId {

  /** Labeled seed text per language — canonical form (lowercase, single
    * spaces), ASCII-only so both engines see identical bytes. The English
    * seed deliberately shares vocabulary with the synthetic corpus so
    * unplanted documents have a real positive class.
    */
  val Seeds: Seq[(String, String)] = Seq(
    "en" -> ("the quick data table holds many rows and the scan reads each " +
      "value fast while sorting keys in order the stream joins lines and " +
      "groups them with care as the filter merges batches and the query " +
      "window orders columns by hash"),
    "es" -> ("el gato come pescado en la cocina y los ninos juegan con una " +
      "pelota que rueda por el jardin cada manana mientras cantan " +
      "canciones bonitas"),
    "de" -> ("der hund lauft schnell durch den wald und die kinder spielen " +
      "gerne mit dem ball im garten wenn morgen die sonne scheint und " +
      "vogel singen"),
    "fr" -> ("le chat mange du poisson dans la cuisine et les enfants " +
      "jouent avec une balle dans le jardin chaque matin pendant que la " +
      "chanson continue"))

  val Langs: Seq[String] = Seeds.map(_._1)

  /** Planted test documents — same languages, DIFFERENT sentences from
    * the seeds (shared stems, not shared strings), and free of every t3
    * marker word, so classifying them right requires profile statistics,
    * not keyword spotting.
    */
  val PlantedEs = "gatos comen pescados frescos mientras ninas juegan " +
    "pelotas rodando hacia jardines verdes cantando canciones cada manana"
  val PlantedDe = "hunde laufen schneller durch dunkle walder wenn kinder " +
    "gerne im garten spielen morgens sonnig singen vogel"
  val PlantedFr = "chats mangent poissons quand enfants jouent balles " +
    "dehors chaque matin pendant chansons jolies continuent"
  /** No 3-gram in common with any seed → must classify `unknown`. */
  val Gibberish = "zqxv wqjk xkzq vjqw qzkx jxqv kqzw xjvq"

  /** The gram-hash basis of [[graft.functions.CharGramHashes]] — shared
    * helper, not a re-implementation, so the profile keys can never
    * drift from the expression's output.
    */
  private def md5Prefix7(s: String): Long =
    graft.functions.HashFunctions.md5Prefix(s, 7)

  /** All (overlapping, multiplicity-kept) char-3-grams; whole string when
    * shorter — the [[graft.functions.CharGramHashes]] windowing,
    * re-stated driver-side for profile construction. `LangIdSpec` pins
    * the seam: hashed distinct grams of this function must equal the
    * expression's output for every window edge case, so a rule change on
    * either side fails loudly instead of silently emptying every lookup.
    */
  private[graft] def grams3(s: String): Seq[String] =
    if (s.length < 3) Seq(s)
    else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** gram-hash → per-class occurrence counts (dense, [[Langs]] order). */
  val Profile: Map[Long, Array[Long]] = {
    val m = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
    Seeds.zipWithIndex.foreach { case ((_, txt), li) =>
      grams3(txt).foreach { g =>
        val cs = m.getOrElseUpdate(md5Prefix7(g), new Array[Long](Langs.length))
        cs(li) += 1L
      }
    }
    m.toMap
  }

  /** Per-class total gram occurrences — the normalizer of the argmax. */
  val Totals: Array[Long] = Seeds.map { case (_, txt) => grams3(txt).size.toLong }.toArray

  /** Score one document's sorted-distinct gram hashes: `(guess, scores)`.
    * Scores stay far under int64 (≤ seed length); the cross-multiplied
    * comparison is exact. `profile`/`totals` default to the seed-trained
    * model; specs inject tiny models to pin edge semantics (ties) the
    * real seeds cannot stage exactly.
    */
  def score(grams: Array[Long],
            profile: Map[Long, Array[Long]] = Profile,
            totals: Array[Long] = Totals): (String, Array[Long]) = {
    val s = new Array[Long](Langs.length)
    var i = 0
    while (i < grams.length) {
      val cs = profile.getOrElse(grams(i), null)
      if (cs != null) {
        var j = 0
        while (j < s.length) { s(j) += cs(j); j += 1 }
      }
      i += 1
    }
    var allZero = true
    i = 0
    while (i < s.length) { if (s(i) != 0L) allZero = false; i += 1 }
    if (allZero) ("unknown", s)
    else {
      var best = 0
      i = 1
      while (i < s.length) {
        if (s(i) * totals(best) > s(best) * totals(i)) best = i
        i += 1
      }
      (Langs(best), s)
    }
  }
}
