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
    * threshold.
    *
    * Rows per band is the bucket-occupancy knob: an unrelated pair at
    * background jaccard `jBg` collides in one band with probability
    * `jBg^r`, so expected random collisions per document ≈ `n·jBg^r`;
    * `r = ln(n/target)/ln(1/jBg)` keeps that ≤ `targetPerBucket`,
    * clamped to [2, maxRows] (band keys longer than ~8 minhashes buy
    * little and cost signature width).
    *
    * Bands then buy back recall: a true pair at the threshold misses all
    * bands with probability `(1-t^r)^b ≤ missProb`, clamped to
    * [minBands, maxBands] (the cap bounds signature cost; at the cap the
    * miss probability for pairs WELL above the threshold — the planted-
    * duplicate regime — stays astronomically small).
    */
  def bandShape(n: Long, threshold: Double, jBg: Double = 0.25,
                targetPerBucket: Int = 32, maxRows: Int = 8,
                minBands: Int = 8, maxBands: Int = 32): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold $threshold")
    require(jBg > 0.0 && jBg < 1.0, s"jBg $jBg")
    val r = clamp(math.ceil(
      math.log(math.max(1.0, n.toDouble / targetPerBucket)) /
        math.log(1.0 / jBg)).toLong, 2, maxRows)
    val perBand = math.pow(threshold, r.toDouble)
    val b = clamp(math.ceil(
      math.log(1e-9) / math.log(1.0 - perBand)).toLong, minBands, maxBands)
    (b, r)
  }
}
