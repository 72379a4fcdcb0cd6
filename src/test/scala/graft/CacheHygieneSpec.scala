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

  test("shared shingle/simhash subtrees are computed exactly once") {
    // The r10 form pinned `ReusedExchange` — too weak: reuse engaged on
    // SOME branch while others silently recomputed (divergent column
    // pruning canonicalizes the shared exchange differently per branch;
    // measured 34 exchanges / 0 reused / 60 parquet scans in the d7 pair
    // plan). The ops now materialize the shared subtree with an eager
    // localCheckpoint, so the STRONGER pin holds: the serving plan reads
    // the checkpointed RDDs and never re-scans the source parquet — zero
    // FileScans downstream means the gram/simhash pipeline cannot have run
    // more than its one checkpoint job.
    // (d10/d5 are deliberately NOT here: their shared sets have only two
    // consumers each over already-materialized inputs, where one recompute
    // measures cheaper than a checkpoint round-trip — see
    // incrementalNearDups / the collapseIdentical=false branch.)
    Seq("d2_minhash_neardup", "d3_simhash_neardup", "d11_containment").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Scan ExistingRDD"),
        s"$q does not read a materialized subtree:\n$p")
      assert(!p.split("== Initial Plan ==")(0).contains("Scan parquet"),
        s"$q re-scans source parquet past the checkpoint — the expensive " +
          s"subtree ran more than once:\n$p")
    }
  }
}
