package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training — the tokenizer-learning step of
  * an LLM data pipeline ("learn N merges from the corpus"; Sennrich et al.
  * 2016, the recipe GPT-2/RoBERTa-style tokenizers build on).
  *
  * Scale design: BPE trains on the WORD-FREQUENCY table, not the raw
  * corpus — the only corpus-scale pass is the initial wordcount (map-side
  * combined); every merge round then runs over the distinct-word table,
  * whose size is bounded by the language (not the data), and collects
  * exactly ONE row (the argmax pair) per round — a driver-side scalar, not
  * a data loop. Only the INITIAL vocab is checkpointed: each round adds
  * one literal replace, so the plan is an nMerges-deep chain over a
  * vocab-sized table — cheaper than per-round materialization at the
  * tokenizer-typical merge counts this query runs (measured in
  * [[train]]); for thousands of merges, reintroduce a periodic
  * checkpoint like the true fixpoints ([[Dedup.dupClusters]],
  * [[Similarity.trainCentroids]], whose plans reference the previous
  * round twice and MUST truncate).
  *
  * Determinism / engine portability: word states are parenthesized symbol
  * strings — `(a)(b)(c)` — so applying merge `x y` is the LITERAL string
  * replace `"(x)(y)" → "(xy)"`, which is non-overlapping left-to-right in
  * BOTH Spark (`UTF8String.replace`) and DuckDB (`replace`) — exactly
  * greedy BPE application, with symbol boundaries made unambiguous by the
  * parens (no space-sharing or substring false matches; holds because
  * [[wordFrequencies]] excludes paren-bearing words — [[trainableWord]]).
  * Pair counts are
  * exact integer sums; argmax ties break by pair string ascending (binary
  * collation both engines). The oracle replays every round as a chained
  * CTE stage over the same representation.
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

  /** Learn `nMerges` merges from the corpus' word-frequency table.
    * `words` must be `(w, freq)`. Returns `(rank, pair, n_occ)` — one row
    * per learned merge, rank 1-based in learn order, `pair` the two
    * symbols space-separated, `n_occ` the exact weighted occurrence count
    * that won the round.
    */
  def train(words: DataFrame, nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    var vocab = words.select(wordState(col("w")).as("s"), col("freq"))
      .localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var r = 1
    while (r <= nMerges) {
      val syms = regexp_extract_all(col("s"), lit(SymbolRe), lit(1))
      val pairs = vocab
        .select(col("freq"), syms.as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("sy")) - 1),
          i => concat(element_at(col("sy"), i), lit(" "),
            element_at(col("sy"), i + 1)))).as("p"))
      val top = pairs.groupBy("p").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("p").asc).limit(1)
        .collect() // ONE row: the round's argmax — a driver-side scalar
      if (top.isEmpty) { r = nMerges + 1 } // no pairs left: stop early
      else {
        val best = top(0)
        val p = best.getString(0)
        picks += ((r.toLong, p, best.getLong(1)))
        val Array(x, y) = p.split(" ", 2)
        // no per-round checkpoint: unlike the k-means/label-propagation
        // fixpoints (whose plans reference the previous round twice), each
        // round here adds ONE literal replace on a vocab-sized table — an
        // 8-deep replace chain over the initial checkpoint is cheaper to
        // re-run than 8 materializations (measured: t16 1.42 → 1.20 s at
        // sf0.1 dropping them)
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s"($x)($y)"), lit(s"(${x}${y})")))
        r += 1
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("rank", "pair", "n_occ")
  }

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
                       nMerges: Int): DataFrame =
    train(wordFrequencies(docs, textCol), nMerges)
}
