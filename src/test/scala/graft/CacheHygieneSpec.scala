package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session-cache hygiene: a long-lived engine session runs many queries —
  * none may leave an entry in the session cache manager behind (the r9
  * audit found eight `MEMORY_AND_DISK` persists with no paired release).
  * The ops now lean on exchange reuse (the d4 pattern) or an eagerly
  * released localCheckpoint instead; these pins hold both properties:
  * cache empty after every formerly-persisting query, and the shared
  * exchange actually REUSED at runtime (a silent canonicalization
  * mismatch would recompute the expensive subtree instead).
  */
class CacheHygieneSpec extends AnyFunSuite with SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private val formerlyPersisting = Seq(
    "d2_minhash_neardup", "d3_simhash_neardup", "d5_clean_corpus",
    "d6_ngram_jaccard", "d7_dup_clusters", "d10_incremental_neardup",
    "d11_containment", "n2_ann_ivf",
    // round-10 additions with materialization inside (localCheckpoints,
    // bloom collect): must stay cache-manager-clean too
    "d13_bloom_decontaminate", "n6_ann_ivfpq", "m6_shot_detect")

  test("no query leaves an entry in the session cache manager") {
    formerlyPersisting.foreach { q =>
      SparkEntry.queries(q)(spark, sf).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q left cached plans in the session cache manager")
    }
  }

  test("shared shingle/simhash subtrees are served by ReusedExchange") {
    Seq("d2_minhash_neardup", "d3_simhash_neardup", "d11_containment",
      "d10_incremental_neardup").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // AQE reuse is a runtime property: execute, then read
      val p = df.queryExecution.executedPlan.toString
      assert(p.startsWith("AdaptiveSparkPlan isFinalPlan=true"),
        s"$q did not finalize adaptively:\n${p.linesIterator.next()}")
      assert(p.contains("ReusedExchange"),
        s"$q executed without exchange reuse — the expensive subtree ran " +
          s"more than once:\n$p")
    }
  }
}
