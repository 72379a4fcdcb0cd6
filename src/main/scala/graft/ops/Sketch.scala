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
    * and the θ-threshold denominator. The map is MUTATED in place by the
    * aggregator (kryo-encoded buffer, never code-generated against), so
    * the per-token hot path allocates nothing — an immutable Map paid a
    * path-copy per element and a full rebuild per decrement, real GC
    * pressure at token-stream volume.
    */
  final case class MgSummary(counters: java.util.HashMap[String, Long], var n: Long)

  /** Misra-Gries summary aggregator. The per-key counter values depend on
    * merge order and are never a public estimate — see [[heavyHitters]].
    */
  class MisraGries(k: Int) extends Aggregator[String, MgSummary, MgSummary] {
    require(k > 0, "k must be positive")

    def zero: MgSummary = MgSummary(new java.util.HashMap[String, Long], 0L)

    def reduce(b: MgSummary, key: String): MgSummary = {
      val m = b.counters
      if (m.containsKey(key)) m.put(key, m.get(key) + 1)
      else if (m.size < k) m.put(key, 1L)
      else {
        // decrement-all step: drop zeroed counters (O(k), amortized O(1))
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > 1) e.setValue(e.getValue - 1) else it.remove()
        }
      }
      b.n += 1
      b
    }

    def merge(a: MgSummary, b: MgSummary): MgSummary = {
      val m = a.counters
      b.counters.forEach { (s, c) => m.put(s, m.getOrDefault(s, 0L) + c) }
      if (m.size > k) {
        // subtract the (k+1)-th largest count from all, keep positives —
        // at most k survive and the n/(k+1) bound is preserved (PODS '12)
        val vals = new Array[Long](m.size)
        var i = 0
        m.forEach { (_, c) => vals(i) = c; i += 1 }
        java.util.Arrays.sort(vals)
        val d = vals(vals.length - (k + 1))
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > d) e.setValue(e.getValue - d) else it.remove()
        }
      }
      a.n += b.n
      a
    }

    def finish(r: MgSummary): MgSummary = r

    def bufferEncoder: org.apache.spark.sql.Encoder[MgSummary] =
      org.apache.spark.sql.Encoders.kryo[MgSummary]
    def outputEncoder: org.apache.spark.sql.Encoder[MgSummary] =
      org.apache.spark.sql.Encoders.kryo[MgSummary]
  }

  /** Two-pass exact heavy hitters over a key column: keys whose exact
    * count is ≥ ⌈n/θinv⌉, for θinv ≤ k (strictly inside the sketch's
    * `> n/(k+1)` survival guarantee — at the θinv = k+1 boundary a key
    * sitting exactly on the inclusive threshold can be legally evicted,
    * so the boundary is rejected rather than silently lossy). Pass 1
    * reduces to one ≤ k-entry summary (map-side combined, one job — the
    * total rides in the buffer); the candidate set (≤ k strings, a
    * legitimate bounded collect) rides back as a scan predicate for the
    * exact pass — only candidate keys are ever grouped.
    */
  def heavyHitters(keys: Dataset[String], k: Int, thetaInv: Long): DataFrame = {
    require(thetaInv <= k,
      s"theta 1/$thetaInv not strictly inside the sketch guarantee 1/${k + 1}")
    val summary = keys.select(new MisraGries(k).toColumn).head()
    val candidates = summary.counters.keySet().toArray(Array.empty[String]).toSeq
    val floor = (summary.n + thetaInv - 1) / thetaInv // ceil(n / thetaInv)
    keys.toDF("key")
      .filter(col("key").isin(candidates: _*))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= floor)
  }
}
