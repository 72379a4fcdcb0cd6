package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashFunctions, IpFunctions}
import graft.ops.Dedup

/** Property tests (SURVEY §5d): parse/normalize invariants of the scalar
  * layer and algebraic invariants of the hash families, on generated input
  * (scalacheck Gens sampled directly — no scalatestplus bridge in the
  * offline dependency set).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private def modelMd5Prefix(s: String, nBytes: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until nBytes).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xffL))
  }

  test("WordShingleHashes matches the join-digest-distinct-sort model") {
    import org.apache.spark.unsafe.types.UTF8String
    val tok = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("ü±"))
    val toksGen = for { n <- Gen.choose(0, 12); ts <- Gen.listOfN(n, tok) } yield ts
    for (w <- Seq(1, 3, 8); toks <- samples(toksGen, 120)) {
      val shingles =
        if (toks.length < w) Seq(toks.mkString(" "))
        else toks.sliding(w).map(_.mkString(" ")).toSeq
      val expected = shingles.map(modelMd5Prefix(_, 7)).distinct.sorted
      val got = HashFunctions.wordShingleHashesData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(UTF8String.fromString).toArray[Any]), w, 7).toLongArray().toSeq
      assert(got === expected, s"w=$w toks=$toks")
    }
  }

  test("CharGramHashes matches the substring-digest-distinct-sort model") {
    import org.apache.spark.unsafe.types.UTF8String
    val strGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(20)),
      Gen.const(""), Gen.const("ab"), Gen.const("héllo wörld ünïcode"))
    for (n <- Seq(2, 5); s <- samples(strGen, 120)) {
      val u = UTF8String.fromString(s)
      val len = u.numChars()
      val grams =
        if (len < n) Seq(s)
        else (1 to (len - n + 1)).map(i => u.substringSQL(i, n).toString)
      val expected = grams.map(modelMd5Prefix(_, 7)).distinct.sorted
      val got = HashFunctions.charGramHashesData(u, n, 7).toLongArray().toSeq
      assert(got === expected, s"n=$n s=$s")
    }
  }

  test("Simhash48 matches the distinct-token bit-vote model") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val tok = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const("ü±"), Gen.const("dup"))
    val toksGen = for { n <- Gen.choose(0, 25); ts <- Gen.listOfN(n, tok) } yield ts
    for (toks <- samples(toksGen, 200)) {
      val sums = new Array[Int](48)
      toks.distinct.foreach { t =>
        val h = modelMd5Prefix(t, 6)
        (0 until 48).foreach(j =>
          if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1)
      }
      val expected = (0 until 48).foldLeft(0L)((acc, j) =>
        if (sums(j) > 0) acc | (1L << j) else acc)
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      assert(HashFunctions.simhash48Data(arr) === expected, s"toks=$toks")
    }
  }

  test("MinhashBandKeys matches the per-permutation-min model") {
    val shinglesGen = for {
      n <- Gen.choose(1, 40)
      hs <- Gen.listOfN(n, Gen.choose(0L, (1L << 56) - 1)) // 7-byte hash range
    } yield hs
    for ((nb, rb) <- Seq((32, 3), (16, 4), (1, 1)); hs <- samples(shinglesGen, 80)) {
      val ks = Dedup.multipliers(nb * rb)
      // independent model: min over shingles of (h*k) mod 2^32, h = top 4
      // bytes; band key = 64-bit polynomial fold of the band's minima
      val mins = ks.map(k => hs.map(s => ((s >> 24) * k) % 4294967296L).min)
      val expected = (0 until nb).map(b =>
        (0 until rb).foldLeft(0L)((acc, r) => acc * 1000003L + mins(b * rb + r)))
      val got = HashFunctions.minhashBandKeysData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray), nb, rb)
      val gotKeys = (0 until nb).map(i => got.getLong(i))
      assert(gotKeys === expected, s"nb=$nb rb=$rb hs=$hs")
    }
  }

  test("TokenTermCounts matches the per-term count model") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val terms = Seq("table", "scan", "join", "vector", "stream")
    val tok = Gen.oneOf(Gen.oneOf(terms), Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""), Gen.const("ü±"))
    val toksGen = for { n <- Gen.choose(0, 30); ts <- Gen.listOfN(n, tok) } yield ts
    for (toks <- samples(toksGen, 200)) {
      val expected = terms.map(t => toks.count(_ == t).toLong)
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = graft.functions.TermCounts.data(
        arr, terms.map(UTF8String.fromString).toArray).toLongArray().toSeq
      assert(got === expected, s"toks=$toks")
    }
    // null tokens are skipped, not counted or crashed on
    val withNull = new GenericArrayData(
      Array[AnyRef](UTF8String.fromString("table"), null))
    assert(graft.functions.TermCounts.data(withNull,
      terms.map(UTF8String.fromString).toArray).toLongArray().toSeq ===
      Seq(1L, 0L, 0L, 0L, 0L))
  }

  test("TokenTermCounts GENERATED code compiles (no interpreter fallback — r20 array-cast regression)") {
    // drive the codegen path DIRECTLY: CodeGeneratorWithInterpretedFallback
    // swallows Janino errors into a WARN + interpreter fallback, so a plan
    // assertion can't catch a broken doGenCode — generate() throws. The
    // original bug: `classOf[Array[UTF8String]].getName` emits the JVM
    // binary name `[L...;` into the reference cast, which Janino rejects.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val expr = graft.functions.TokenTermCounts(
      BoundReference(0, ArrayType(StringType), nullable = true),
      Seq("table", "scan"))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad codegen
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[AnyRef](org.apache.spark.unsafe.types.UTF8String.fromString("table"),
          org.apache.spark.unsafe.types.UTF8String.fromString("scan"),
          org.apache.spark.unsafe.types.UTF8String.fromString("table"))))
    assert(proj(row).getArray(0).toLongArray().toSeq === Seq(2L, 1L))
  }

  test("normalizeIp is idempotent and only ever returns valid or empty") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val n = IpFunctions.normalizeIp(s)
      assert(IpFunctions.normalizeIp(n) === n, s"input: $s")
      assert(n.isEmpty || IpFunctions.isValidIpv4(n) || IpFunctions.isValidIpv6(n),
        s"input: $s -> $n")
    }
  }

  test("valid dotted quads survive normalizeIp unchanged") {
    val octet = Gen.choose(0, 255)
    val quad = for { a <- octet; b <- octet; c <- octet; d <- octet } yield s"$a.$b.$c.$d"
    samples(quad).foreach(ip => assert(IpFunctions.normalizeIp(ip) === ip))
  }

  test("extractLocalIp finds the span between first and last underscore") {
    val octet = Gen.choose(0, 255)
    val g = for { seq <- Gen.choose(0, 99); a <- octet; b <- octet } yield (seq, a, b)
    samples(g).foreach { case (seq, a, b) =>
      val name = s"20170315T01:00:00Z_10.0.$a.${b}_$seq.web100"
      assert(IpFunctions.extractLocalIp(name) === s"10.0.$a.$b")
    }
  }

  test("canonicalIp: all spellings of one address canonicalize identically (seeded)") {
    val rnd = new scala.util.Random(11)
    def spell(gs: Array[Int]): String =
      gs.map { g =>
        val h = Integer.toHexString(g)
        val padded = ("0" * rnd.nextInt(3)) + (if (rnd.nextBoolean()) h.toUpperCase else h)
        padded.takeRight(math.max(h.length, math.min(4, padded.length)))
      }.mkString(":")
    for (i <- 1 to 500) {
      val gs = Array.fill(8)(rnd.nextInt(0x10000))
      if (i % 3 == 0) { // plant a zero run so :: compression paths are hit
        val s = rnd.nextInt(7)
        val l = 1 + rnd.nextInt(8 - s)
        (s until s + l).foreach(gs(_) = 0)
      }
      val a = IpFunctions.canonicalIp(spell(gs))
      val b = IpFunctions.canonicalIp(spell(gs)) // independent random spelling
      assert(a.nonEmpty && a === b, s"groups ${gs.mkString(":")}: $a vs $b")
      assert(IpFunctions.canonicalIp(a) === a, s"not idempotent: $a")
    }
  }

  test("rollingHash: stays in range, order-sensitive, matches fold model") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val h = HashFunctions.rollingHash(s)
      assert(h >= 0 && h < HashFunctions.Mod)
      val model = s.foldLeft(HashFunctions.Seed) {
        (acc, ch) => (acc * HashFunctions.Mult + ch.toLong) % HashFunctions.Mod
      }
      assert(h === model) // ascii: codepoints == chars
    }
    assert(HashFunctions.rollingHash("ab") !== HashFunctions.rollingHash("ba"))
  }

  test("md5Prefix equals the hex-prefix composition both engines agree on (seeded)") {
    import org.apache.spark.unsafe.types.UTF8String
    def hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      val h = hex(s)
      assert(HashFunctions.md5PrefixUTF8(UTF8String.fromString(s), 4) ===
        java.lang.Long.parseLong(h.take(8), 16), s"input: $s")
      assert(HashFunctions.md5PrefixUTF8(UTF8String.fromString(s), 6) ===
        java.lang.Long.parseLong(h.take(12), 16), s"input: $s")
    }
    assert(HashFunctions.md5PrefixUTF8(null, 4) ===
      java.lang.Long.parseLong(hex("").take(8), 16))
  }

  test("AdpcmCodec round-trip: exact length, exact format, bounded drift (seeded)") {
    import graft.ops.Multimodal.AdpcmCodec
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(1500)          // crosses the 505-sample block edge
      val rate = 4000 + rnd.nextInt(44100)
      // band-limited random walk (|step| <= 700, inside the quantizer's
      // tracking range — white noise has no codec-representable structure)
      var v = rnd.nextInt(8192) - 4096
      val pcm = Array.fill(n) {
        v = math.max(-30000, math.min(30000, v + rnd.nextInt(1401) - 700))
        v.toShort
      }
      val a = AdpcmCodec.parse(AdpcmCodec.build(pcm, rate)).get
      assert(a.sampleRate === rate && a.channels === 1)
      assert(a.samples.length === n, s"n=$n decoded ${a.samples.length}")
      val maxErr = pcm.zip(a.samples).map { case (x, y) => math.abs(x - y) }.max
      assert(maxErr <= 1024, s"n=$n maxErr=$maxErr")
    }
  }

  test("minhash multipliers are bijections mod 2^32 (odd) and distinct") {
    val ks = Dedup.multipliers(200)
    assert(ks.distinct.size === 200)
    // odd k is invertible mod 2^32 -> h*k mod 2^32 is a permutation
    assert(ks.forall(k => k % 2 === 1 && k > 0 && k < (1L << 31)))
    val k = ks.head
    val sample = (0L until 1000L).map(h => (h * k) % 4294967296L)
    assert(sample.distinct.size === 1000)
  }
}
