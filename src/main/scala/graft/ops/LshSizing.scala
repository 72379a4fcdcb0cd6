package graft.ops

/** Corpus-stat-driven sizing for the LSH granularity knobs.
  *
  * Every banded/bucketed candidate generator has a knob that must GROW
  * with the corpus or buckets flood: sign-LSH's hyperplane count (d4's
  * `bits`), banded minhash's rows-per-band (d2/d6's band-key length).
  * The op docs said "grow it with the corpus"; these helpers compute it,
  * so the default path self-sizes from a cheap corpus `count()` and a
  * 1000× data scale-up changes the knob instead of the bucket occupancy.
  *
  * All outputs are deterministic in the count, so two engines (or two
  * runs) agree; results stay verify-exact regardless — the knobs trade
  * candidate volume against recall, and every candidate passes an exact
  * jaccard/cosine verify.
  */
object LshSizing {

  private def clamp(v: Long, lo: Int, hi: Int): Int =
    math.max(lo, math.min(hi, v)).toInt

  /** Sign-LSH hyperplane count: enough bits that the EXPECTED occupancy
    * of a bucket of random directions stays ≤ `targetPerBucket`
    * (`2^bits ≥ n / target`), clamped to [minBits, maxBits]. 1e9 vectors
    * at the default target → 25 bits; the floor keeps tiny corpora from
    * degenerating to a handful of buckets.
    */
  def sizeBits(n: Long, targetPerBucket: Int = 32,
               minBits: Int = 8, maxBits: Int = 30): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetPerBucket)) / math.log(2.0))
    clamp(needed.toLong, minBits, maxBits)
  }

  /** Banded-minhash shape `(numBands, rowsPerBand)` for a jaccard
    * threshold — RECALL-FIRST: the guarantee held at every output is
    * that a STRONG pair (jaccard ≥ `jStrong` = min(0.9, threshold+0.3),
    * the planted-duplicate regime the exhaustive oracles grade) misses
    * every band with probability ≤ `missProb`; occupancy is then
    * optimized under that budget.
    *
    * Rows per band is the bucket-occupancy knob: an unrelated pair at
    * background jaccard `jBg` collides in one band with probability
    * `jBg^r`, so `r = ln(n/target)/ln(1/jBg)` keeps expected random
    * collisions per document ≤ `targetPerBucket`. But deeper keys need
    * more bands for the same recall — `(1-jStrong^r)^b ≤ missProb` — so
    * if the occupancy-ideal `r` would need more than `maxBands` bands,
    * `r` SHRINKS until the recall budget fits (the earlier version
    * silently clamped `b` instead, which voided the documented miss
    * bound exactly when the corpus got large — the one regime the knob
    * exists for). At web scale that trades verify-stage volume for
    * recall, which is the right default when the verify is exact.
    */
  /** Band-side doc-frequency pruning fraction for the banded-minhash
    * candidate stage ([[Dedup.pruneFrequentShingles]]): `frac` once the
    * corpus is big enough that document frequency means "boilerplate"
    * (n ≥ enableAt), 1.0 (= off) below it. The hot-bucket tail the lever
    * removes is seeded by corpus-ubiquitous grams; on a corpus of a few
    * dozen documents a df cap of `frac·n` is a handful of docs, so the
    * "hot" set is topical noise, not boilerplate — pruning there risks
    * recall for nothing (the occupancy tail it exists for cannot form).
    * `frac = 0.1` is the measured knob: at sf3 it cut d6's candidate
    * volume 8.2× and full-pass wall 4.0× with a value-identical result
    * (SCALING.md "band-side doc-frequency pruning").
    */
  def dfPruneFrac(n: Long, enableAt: Long = 64, frac: Double = 0.1): Double =
    if (n >= enableAt) frac else 1.0

  def bandShape(n: Long, threshold: Double, jBg: Double = 0.25,
                targetPerBucket: Int = 32, maxRows: Int = 8,
                minBands: Int = 32, maxBands: Int = 96,
                missProb: Double = 1e-9): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold $threshold")
    require(jBg > 0.0 && jBg < 1.0, s"jBg $jBg")
    val jStrong = math.min(0.9, threshold + 0.3)
    def bandsFor(r: Int): Long = math.ceil(
      math.log(missProb) / math.log(1.0 - math.pow(jStrong, r.toDouble))).toLong
    val rOcc = clamp(math.ceil(
      math.log(math.max(1.0, n.toDouble / targetPerBucket)) /
        math.log(1.0 / jBg)).toLong, 2, maxRows)
    var r = rOcc
    while (r > 2 && bandsFor(r) > maxBands) r -= 1
    // the recall bound is NEVER sold: if even the shallowest keys (r=2)
    // need more than maxBands bands for the miss budget, b exceeds the
    // budget rather than silently violating the documented guarantee —
    // maxBands caps the occupancy-driven DEPTH tradeoff, not recall
    val b =
      if (bandsFor(r) > maxBands) bandsFor(r).toInt
      else math.min(maxBands.toLong, math.max(minBands.toLong, bandsFor(r))).toInt
    (b, r)
  }
}
