package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal}

/** M8/D15 spec: the integer pHash (fixed-point DCT, rank median, bit
  * layout) against an independent analytic replay, the generalized
  * hamming banding at its pigeonhole bound, and banded-vs-exhaustive
  * equivalence on the pair query.
  */
class PHashSpec extends AnyFunSuite with SparkSuite {

  /** Render the m8 sawtooth pattern (pair id `pid`, `variant` 0/1) as a
    * WxH grayscale PNG through the REAL encode path.
    */
  private def patternPng(pid: Long, variant: Int, scale: Int = 1): Array[Byte] = {
    val n = Multimodal.PHashGrid * scale
    val img = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until n; y <- 0 until n) {
      val l = lumaAt(pid, variant, x / scale, y / scale)
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def lumaAt(pid: Long, variant: Int, gx: Int, gy: Int): Int = {
    val a = 1 + (pid % 7).toInt
    val b = 2 + (pid % 5).toInt
    val c = ((pid * 37) % 256).toInt
    val l = (a * gx + b * gy + c) % 256
    if (variant >= 1 && gx < 4 && gy < 4) math.min(l + 8 * variant, 255) else l
  }

  /** Independent analytic pHash of the pattern: flat double-sum DCT (the
    * oracle's order, NOT pHash64's separable factorization), straight
    * from the luma formula — never touches PNG bytes or pixels.
    */
  private def analyticHash(pid: Long, variant: Int): Long = {
    val n = Multimodal.PHashGrid
    val g = Array.ofDim[Long](8, 8)
    for (u <- 0 until 8; v <- 0 until 8) {
      var s = 0L
      for (gx <- 0 until n; gy <- 0 until n)
        s += lumaAt(pid, variant, gx, gy).toLong *
          Multimodal.DctCos(u)(gx) * Multimodal.DctCos(v)(gy)
      g(u)(v) = s
    }
    val ac = (for (u <- 0 until 8; v <- 0 until 8 if (u | v) != 0) yield g(u)(v))
      .toArray
    val med = ac.sorted.apply(31)
    (for (u <- 0 until 8; v <- 0 until 8 if (u | v) != 0 && g(u)(v) > med)
      yield 1L << (u * 8 + v - 1)).foldLeft(0L)(_ | _)
  }

  test("M8: pHash64 through PNG encode+decode equals the analytic replay") {
    for (pid <- Seq(0L, 1L, 7L, 34L, 83L); variant <- Seq(0, 1, 2)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(patternPng(pid, variant)))
      assert(Multimodal.pHash64(img) === analyticHash(pid, variant),
        s"pid=$pid variant=$variant")
    }
  }

  test("M8: the hash never sets the sign/DC bit") {
    for (pid <- 0L until 20L)
      assert((analyticHash(pid, 0) & (1L << 63)) === 0L)
  }

  test("M8: integer area downscale makes the hash exact-scale-invariant") {
    // a 2x upscale of the same pattern block-averages back to the
    // identical 32x32 grid, so the hash must match bit-for-bit — the
    // property that makes pHash a RESOLUTION-independent fingerprint
    for (pid <- Seq(3L, 11L)) {
      val h1 = Multimodal.pHash64(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(patternPng(pid, 0))))
      val h2 = Multimodal.pHash64(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(patternPng(pid, 0, scale = 2))))
      assert(h1 === h2, s"pid=$pid upscale changed the hash")
    }
  }

  test("D15: bandPartition is pigeonhole-lossless at 63 bits") {
    val rng = new scala.util.Random(1913)
    for (h <- Seq(0, 1, 3, 10, 16)) {
      val bands = Dedup.bandPartition(63, h)
      assert(bands.size === h + 1)
      assert(bands.map(_._2).sum === 63)
      assert(bands.map(_._2).forall(_ >= 1))
      for (_ <- 0 until 300) {
        val v = rng.nextLong() & ((1L << 63) - 1)
        val flips = rng.shuffle((0 until 63).toList).take(h)
        val w = flips.foldLeft(v)((acc, b) => acc ^ (1L << b))
        val collide = bands.exists { case (off, wd) =>
          ((v >> off) & ((1L << wd) - 1)) === ((w >> off) & ((1L << wd) - 1))
        }
        assert(collide, s"h=$h v=$v flips=$flips escaped every band")
      }
    }
  }

  test("ST9: batch-vs-corpus matcher equals the exhaustive cross-set scan") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val corpus = (1L to 30L).map(i => i -> (rng.nextLong() & ((1L << 63) - 1)))
    // arrivals: near-copies of corpus ids 1/2 (hamming 3 and 0) + noise
    val cm = corpus.toMap
    val batch = Seq(
      101L -> (cm(1L) ^ (1L << 2) ^ (1L << 17) ^ (1L << 44)),
      102L -> cm(2L)) ++
      (103L to 110L).map(i => i -> (rng.nextLong() & ((1L << 63) - 1)))
    val got = Dedup.hammingMatchesAgainst(
        batch.toDF("doc_id", "simhash"), corpus.toDF("doc_id", "simhash"),
        bits = 63, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (b, hb) <- batch; (c, hc) <- corpus
      d = java.lang.Long.bitCount(hb ^ hc) if d <= 10
    } yield (b, c, d)).toSet
    assert(got === want)
    assert(got.contains((101L, 1L, 3)))
    assert(got.contains((102L, 2L, 0)))
  }

  test("D15: banded near-dup equals the exhaustive scan") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // random hashes plus planted close pairs (ids 100/101 at hamming 2,
    // 102/103 identical) — banding must find exactly what a full scan does
    val base = (1L to 40L).map(i => i -> (rng.nextLong() & ((1L << 63) - 1)))
    val h0 = rng.nextLong() & ((1L << 63) - 1)
    val all = base ++ Seq(100L -> h0, 101L -> (h0 ^ (1L << 5) ^ (1L << 40)),
      102L -> h0, 103L -> h0)
    val df = all.toDF("doc_id", "simhash")
    val got = Dedup.hammingNearDups(df, bits = 63, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val m = all.toMap
    val want = (for {
      a <- all.map(_._1); b <- all.map(_._1) if a < b
      d = java.lang.Long.bitCount(m(a) ^ m(b)) if d <= 10
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(got.contains((100L, 101L, 2)))
    assert(got.contains((102L, 103L, 0)))
  }
}
