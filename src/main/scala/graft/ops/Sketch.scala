package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketches for the 100 TB frequency path.
  *
  * [[MisraGries]] is the mergeable heavy-hitter summary (Misra & Gries
  * 1982; merge rule from Agarwal et al., "Mergeable Summaries", PODS
  * 2012): k counters, arbitrary merge order, and after summarizing n
  * items every key's count is underestimated by at most n/(k+1) — so any
  * key with true frequency above n/(k+1) is GUARANTEED to survive in the
  * summary, whatever the partitioning. That guarantee is what makes the
  * two-pass heavy-hitter query deterministic: the sketch's per-key
  * estimates depend on merge order (and are never emitted), but the
  * candidate SET provably contains every θ-heavy key for θ ≥ 1/(k+1),
  * and the exact second pass filters it to a unique answer.
  *
  * An exact groupBy over 100 TB of tokens shuffles the full distinct
  * keyspace; the sketch pass shuffles k counters per partition and the
  * exact pass counts only the ≤ k candidate keys (broadcast back into a
  * scan predicate) — the q7/a4b/a5 posture applied to frequency.
  */
object Sketch {

  /** Misra-Gries summary: the counter map (≤ k entries) plus the total
    * item count, so one aggregation pass yields both the candidate set
    * and the θ-threshold denominator.
    */
  final case class MgSummary(counters: Map[String, Long], n: Long)

  /** Misra-Gries summary aggregator. The per-key counter values depend on
    * merge order and are never a public estimate — see [[heavyHitters]].
    */
  class MisraGries(k: Int) extends Aggregator[String, MgSummary, MgSummary] {
    require(k > 0, "k must be positive")

    def zero: MgSummary = MgSummary(Map.empty, 0L)

    def reduce(b: MgSummary, key: String): MgSummary = {
      val m = b.counters
      val next = m.get(key) match {
        case Some(c) => m.updated(key, c + 1)
        case None if m.size < k => m.updated(key, 1L)
        case None =>
          // decrement-all step: drop zeroed counters (O(k), amortized O(1))
          m.flatMap { case (s, c) => if (c > 1) Some(s -> (c - 1)) else None }
      }
      MgSummary(next, b.n + 1)
    }

    def merge(a: MgSummary, b: MgSummary): MgSummary = {
      val sum = b.counters.foldLeft(a.counters) { case (m, (s, c)) =>
        m.updated(s, m.getOrElse(s, 0L) + c)
      }
      val trimmed =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all, keep positives —
          // at most k survive and the n/(k+1) bound is preserved (PODS '12)
          val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (s, c) => if (c > d) Some(s -> (c - d)) else None }
        }
      MgSummary(trimmed, a.n + b.n)
    }

    def finish(r: MgSummary): MgSummary = r

    def bufferEncoder: org.apache.spark.sql.Encoder[MgSummary] =
      org.apache.spark.sql.Encoders.kryo[MgSummary]
    def outputEncoder: org.apache.spark.sql.Encoder[MgSummary] =
      org.apache.spark.sql.Encoders.kryo[MgSummary]
  }

  /** Two-pass exact heavy hitters over a key column: keys whose exact
    * count is ≥ ⌈n/θinv⌉, for θinv ≤ k+1 (so the sketch provably misses
    * none). Pass 1 reduces to one ≤ k-entry summary (map-side combined,
    * one job — the total rides in the buffer); the candidate set (≤ k
    * strings, a legitimate bounded collect) rides back as a scan
    * predicate for the exact pass — only candidate keys are ever grouped.
    */
  def heavyHitters(keys: Dataset[String], k: Int, thetaInv: Long): DataFrame = {
    require(thetaInv <= k + 1,
      s"theta 1/$thetaInv below the sketch guarantee 1/${k + 1}")
    val summary = keys.select(new MisraGries(k).toColumn).head()
    val candidates = summary.counters.keys.toSeq
    val floor = (summary.n + thetaInv - 1) / thetaInv // ceil(n / thetaInv)
    keys.toDF("key")
      .filter(col("key").isin(candidates: _*))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= floor)
  }
}
