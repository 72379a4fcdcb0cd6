package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-length training-sequence packing — the concat-and-chunk step of
  * LLM pretraining data prep (the GPT/T5 recipe): walk the corpus in a
  * deterministic order, concatenate every document's tokens into one
  * virtual stream, and cut that stream every `seqLen` tokens. Documents
  * SPLIT across sequence boundaries (unlike [[Scale.packByWeight]],
  * which keeps rows whole) — each output row is the span of one document
  * that lands in one training sequence.
  *
  * Scale shape: the global token offsets come from [[Scale.prefixSum]]
  * (two-level — the only single-partition step is the O(#buckets) offset
  * window), and the span explode is per-row narrow work: a document of
  * `n` tokens emits `ceil(n / seqLen) + 1` spans at most, so output
  * volume tracks corpus tokens / seqLen. Nothing corpus-sized ever
  * sorts globally and nothing shuffles beyond the prefix sum's
  * broadcast-back — the plan a 100 TB tokenize-and-pack run needs.
  */
object SequencePack {

  /** Span table `(doc_id, seq_id, tok_start, tok_end)` for cutting the
    * concatenated token stream (docs walked in `idCol` order, zero-token
    * docs contribute nothing) into `seqLen`-token training sequences:
    * `[tok_start, tok_end)` of the document's own tokens belong to
    * `seq_id`. Deterministic, content-defined, and resumable — a
    * sequence's manifest is a contiguous run of this table.
    */
  def sequenceSpans(toks: DataFrame, idCol: String, weightCol: String,
                    seqLen: Long, bucketWidth: Long = 1000): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    Scale.prefixSum(toks, idCol, weightCol, "__start", bucketWidth)
      // zero-token docs have an empty span everywhere; dropping them also
      // guards the sequence() below (last < first would walk DESCENDING)
      .filter(col(weightCol) > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div ${seqLen}L"),
        expr(s"(__start + $weightCol - 1) div ${seqLen}L"))))
      .select(col(idCol), col("seq_id"),
        greatest(lit(0L), col("seq_id") * seqLen - col("__start"))
          .as("tok_start"),
        least(col(weightCol).cast("long"),
          (col("seq_id") + 1) * seqLen - col("__start")).as("tok_end"))
  }
}
