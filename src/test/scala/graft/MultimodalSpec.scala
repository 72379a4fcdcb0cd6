package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal plumbing spec: binary columns flow through the typed
  * mapPartitions decode and the frame-sampling flatMap; the stub codec is
  * deterministic arithmetic (the oracle-checked m1/m2 queries cover the
  * sf-scale path).
  */
class MultimodalSpec extends AnyFunSuite with SparkSuite {

  test("decodeFeatures: mapPartitions stub decode is deterministic") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", Array.fill[Byte](650)('x')),
      MediaRow(2L, "video", Array.fill[Byte](250)('y')),
      MediaRow(3L, "audio", Array.emptyByteArray)
    ).toDS()
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L) === MediaFeatures(1L, "image", 650L, 10, 2, 1, 'x'.toInt))
    assert(f(2L) === MediaFeatures(2L, "video", 250L, 250, 1, 3, 'y'.toInt))
    assert(f(3L) === MediaFeatures(3L, "audio", 0L, 0, 1, 1, 0))
  }

  test("real PNG payloads decode to true dimensions via ImageIO") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val media = Seq(
      MediaRow(1L, "image", png), // real image: true 7x5
      MediaRow(2L, "image", Array.fill[Byte](650)('x')), // not an image: stub math
      MediaRow(3L, "audio", png) // image bytes but audio kind: stub (honest)
    ).toDS()
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width === 7 && f(1L).height === 5 && f(1L).n_frames === 1)
    assert(f(1L).byte_len === png.length.toLong)
    assert(f(2L) === MediaFeatures(2L, "image", 650L, 10, 2, 1, 'x'.toInt))
    assert(f(3L).width === (png.length % 640)) // stub arithmetic, not 7
  }

  test("resize: real pixels scale to fit, small images pass through, junk drops") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      MediaRow(1L, "image", png(100, 40)),          // long side 100 -> 64x25
      MediaRow(2L, "image", png(30, 20)),           // inside the bound: untouched
      MediaRow(3L, "image", Array.fill[Byte](99)('x')) // not an image: dropped
    ).toDS()
    val out = Multimodal.resizeStage(media, maxSide = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((100, 40, 64, 25)))  // 40*64/100 = 25 (integer div)
    assert(out(2L) === ((30, 20, 30, 20)))
    // the resized bytes are a real decodable PNG with the target dims
    val resized = Multimodal.resizeImage(png(100, 40), 64).get
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth === 64 && back.getHeight === 25)
  }

  test("real WAV payloads decode rate/channels/frames via javax.sound") {
    import spark.implicits._
    // synthesize a genuine 16-bit stereo WAV: 8000 Hz, 400 PCM frames
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = Array.fill[Byte](400 * fmt.getFrameSize)(0x11)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 400L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val media = Seq(
      MediaRow(1L, "audio", wav), // real WAV: true rate/channels/frames
      MediaRow(2L, "audio", Array.fill[Byte](250)('y')), // not WAV: stub math
      MediaRow(3L, "video", wav) // WAV bytes but video kind: stub (honest)
    ).toDS()
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width === 8000 && f(1L).height === 2 && f(1L).n_frames === 400)
    assert(f(2L) === graft.ops.Multimodal.FakeCodec.decode(
      MediaRow(2L, "audio", Array.fill[Byte](250)('y'))))
    assert(f(3L).width === (wav.length % 640)) // stub arithmetic, not 8000
  }

  test("sampleFrames: every Nth frame, one row per frame") {
    import spark.implicits._
    val media = Seq(MediaRow(2L, "video", Array.fill[Byte](701)('z'))).toDS()
    val frames = Multimodal.sampleFrames(Multimodal.decodeFeatures(media), stride = 3)
      .collect().map(_.getAs[Int]("frame_idx")).sorted
    assert(frames.toSeq === Seq(0, 3, 6)) // n_frames = 8 -> 0,3,6
  }

  /** Encode one solid-gray baseline JPEG. */
  private def grayJpeg(w: Int, h: Int, lum: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(lum, lum, lum))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AviCodec: build/parse round-trips header dims and every frame byte-exact") {
    import Multimodal.AviCodec
    val frames = Seq(grayJpeg(24, 16, 64), grayJpeg(24, 16, 128), grayJpeg(24, 16, 200))
    val avi = AviCodec.build(frames, width = 24, height = 16, fps = 5)
    assert(AviCodec.looksLikeAvi(avi))
    val parsed = AviCodec.parse(avi).get
    assert(parsed.width === 24 && parsed.height === 16)
    assert(parsed.usecPerFrame === 200000) // 1e6 / 5
    assert(parsed.frameCount === 3)
    parsed.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want)) // frame payloads survive untouched
    }
    // odd-length frames exercise the RIFF even-padding rule
    val odd = grayJpeg(9, 7, 50)
    val aviOdd = AviCodec.build(Seq(odd, odd), 9, 7)
    assert(AviCodec.parse(aviOdd).get.frameCount === 2)
    // malformed inputs drop, never throw
    assert(AviCodec.parse(Array.fill[Byte](100)('x')).isEmpty)
    assert(AviCodec.parse(avi.take(30)).isEmpty) // truncated mid-header
    val corrupt = avi.clone(); corrupt(20) = 0x7f // blow up a chunk size
    assert(AviCodec.parse(corrupt).isEmpty)
  }

  test("videoFrames: real per-frame JPEG decode — dims and mean luma") {
    import spark.implicits._
    import Multimodal.AviCodec
    val lums = Seq(48, 112, 176)
    val avi = AviCodec.build(lums.map(grayJpeg(32, 24, _)), 32, 24)
    val media = Seq(
      MediaRow(7L, "video", avi),
      MediaRow(8L, "video", Array.fill[Byte](500)('q')) // not an AVI: dropped
    ).toDS()
    val rows = Multimodal.videoFrames(media).collect().sortBy(_.frame_idx)
    assert(rows.map(_.media_id).toSeq === Seq(7L, 7L, 7L))
    assert(rows.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(rows.forall(r => r.frame_w === 32 && r.frame_h === 24))
    // a solid gray survives JPEG's DC quantization to within ~1 luma level
    rows.zip(lums).foreach { case (r, lum) =>
      assert(math.abs(r.mean_luma - lum) <= 2.0, s"frame ${r.frame_idx}: ${r.mean_luma} vs $lum")
    }
  }

  test("decode: video kind with a real AVI payload reports true dims and frame count") {
    import spark.implicits._
    val avi = Multimodal.AviCodec.build(Seq.fill(4)(grayJpeg(40, 30, 90)), 40, 30)
    val media = Seq(
      MediaRow(1L, "video", avi),
      MediaRow(2L, "image", avi) // AVI bytes but image kind: stub (honest)
    ).toDS()
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width === 40 && f(1L).height === 30 && f(1L).n_frames === 4)
    assert(f(2L).width === (avi.length % 640)) // stub arithmetic, not 40
  }

  private def sine(n: Int, amp: Int, period: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * i / period)).toInt.toShort)

  test("AdpcmCodec: build/parse round-trips format fields and tracks the signal") {
    import Multimodal.AdpcmCodec
    // 1237 samples: not a multiple of 505, so the last block is partial —
    // the fact-chunk trim must return exactly n samples, not block padding
    val pcm = sine(1237, 8000, 100)
    val wav = AdpcmCodec.build(pcm, 16000)
    val a = AdpcmCodec.parse(wav).get
    assert(a.sampleRate === 16000 && a.channels === 1)
    val got = a.toPcm
    assert(got.length === 1237)
    val maxErr = pcm.zip(got).map { case (x, y) => math.abs(x - y) }.max
    // 4-bit quantization of a ±8000 sine: adaptation error stays well
    // under the coarsest step the slope needs
    assert(maxErr <= 512, s"ADPCM round-trip max error $maxErr")
  }

  test("AdpcmCodec: stereo round-trip — interleaved frames, per-channel tracking") {
    import Multimodal.AdpcmCodec
    // L and R carry different signals; 1003 frames → partial last block
    val l = sine(1003, 9000, 80)
    val r = sine(1003, 5000, 33)
    val interleaved = new Array[Short](2006)
    var i = 0
    while (i < 1003) { interleaved(2 * i) = l(i); interleaved(2 * i + 1) = r(i); i += 1 }
    val a = AdpcmCodec.parse(AdpcmCodec.build(interleaved, 22050, channels = 2)).get
    assert(a.sampleRate === 22050 && a.channels === 2)
    val got = a.toPcm
    assert(got.length === 2006)
    val errL = (0 until 1003).map(i => math.abs(l(i) - got(2 * i))).max
    val errR = (0 until 1003).map(i => math.abs(r(i) - got(2 * i + 1))).max
    // per-channel quantizers must track independently — a channel-state
    // mixup would blow one channel's error by orders of magnitude
    assert(errL <= 512, s"left channel max error $errL")
    assert(errR <= 512, s"right channel max error $errR")
  }

  test("PcmCodec: build/parse round-trips samples; windowed features are exact") {
    import org.apache.spark.sql.functions.col
    // square wave, period 8, amp 100: analytic per-window features
    val n = 1000
    val sq = Array.tabulate(n)(i => (if ((i / 4) % 2 == 0) 100 else -100).toShort)
    val wav = Multimodal.PcmCodec.build(sq, 16000)
    val a = Multimodal.PcmCodec.parse(wav).get
    assert(a.sampleRate === 16000 && a.sampleCount === n)
    assert(a.samples.toArray === sq)
    import spark.implicits._
    val media = Seq((1L, "audio", wav)).toDF("media_id", "kind", "content")
    val rows = Multimodal.audioWindowFeatures(Multimodal.asMedia(media), window = 100)
      .collect().sortBy(_.win)
    assert(rows.length === 10)
    // every window: 100 samples at |x| = 100 -> energy 100 * 100^2; the
    // square flips sign every 4 samples -> 25 crossings per window except
    // the first (24: the first sample has no predecessor)
    rows.foreach { w =>
      assert(w.n_samples === 100L && w.energy === 100L * 100L * 100L, s"$w")
      assert(w.zero_crossings === (if (w.win == 0L) 24L else 25L), s"$w")
    }
    // format isolation + never-throw: ADPCM payloads are not PCM and vice
    // versa, truncated bytes drop
    val adpcm = Multimodal.AdpcmCodec.build(sq, 16000)
    assert(Multimodal.PcmCodec.parse(adpcm).isEmpty)
    assert(Multimodal.AdpcmCodec.parse(wav).isEmpty)
    assert(Multimodal.PcmCodec.parse(wav.take(30)).isEmpty)
    assert(Multimodal.PcmCodec.parse(Array[Byte]()).isEmpty)
  }

  test("shotBoundaries cuts on the luma jump, ignores small motion") {
    import spark.implicits._
    import Multimodal.AviCodec
    // lumas 40,48,200,208: one 152-level cut at frame 2, small motion
    // elsewhere — the detector must flag exactly frame 2
    val frames = Seq(40, 48, 200, 208).map(l => grayJpeg(16, 16, l))
    val avi = Seq((7L, "video", AviCodec.build(frames, 16, 16)))
      .toDF("media_id", "kind", "content")
    val cuts = Multimodal.shotBoundaries(
        Multimodal.videoFrames(Multimodal.asMedia(avi)), threshold = 100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cuts === Set((7L, 2L)))
  }

  test("codecs decode incrementally: work happens at iteration, not parse") {
    import Multimodal.{AdpcmCodec, AviCodec}
    // AVI: a many-frame video parses to spans only — frame N's bytes are
    // sliced when the iterator REACHES frame N. Proof: parse, read frame
    // 0, then corrupt the tail of the source buffer; the not-yet-visited
    // last frame reflects the corruption (a parse-time copy could not)
    val frames = (0 until 200).map(i => grayJpeg(8, 8, i % 255))
    val aviBytes = AviCodec.build(frames, 8, 8)
    val avi = AviCodec.parse(aviBytes).get
    assert(avi.frameCount === 200)
    val it = avi.frames
    assert(java.util.Arrays.equals(it.next(), frames(0)))
    // locate + flip a byte inside the LAST frame's payload in the source
    val lastOff = {
      var off = -1
      var from = 0
      while ({ val i = indexOf(aviBytes, frames(199), from); if (i >= 0) { off = i; from = i + 1 }; i >= 0 }) ()
      off
    }
    assert(lastOff > 0)
    aviBytes(lastOff) = (aviBytes(lastOff) ^ 0x55).toByte
    val last = it.drop(198).next()
    assert(!java.util.Arrays.equals(last, frames(199)),
      "last frame was copied at parse time — decode is not incremental")
    // ADPCM: same — parse validates structure only; block N decodes when
    // the walk reaches it
    val pcm = sine(505 * 40, 8000, 100) // 40 full blocks
    val wav = AdpcmCodec.build(pcm, 16000)
    val a = AdpcmCodec.parse(wav).get
    val bIt = a.blocks
    val firstBlock = bIt.next()
    assert(firstBlock.length === 505)
    wav(wav.length - 10) = (wav(wav.length - 10) ^ 0x55).toByte
    val lastBlock = bIt.drop(38).next()
    val cleanLast = AdpcmCodec.parse(AdpcmCodec.build(pcm, 16000)).get
      .blocks.drop(39).next()
    assert(!java.util.Arrays.equals(lastBlock.map(_.toInt), cleanLast.map(_.toInt)),
      "last block was decoded at parse time — decode is not incremental")
  }

  /** First index of `needle` in `hay` at/after `from`; -1 if absent. */
  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  test("AdpcmCodec: a genuinely compressed format — the stock JDK cannot read it") {
    val wav = Multimodal.AdpcmCodec.build(sine(600, 4000, 50), 8000)
    // javax.sound handles PCM/u-law/a-law WAVs only; fmt 0x11 must be
    // rejected — proving this path decodes something AudioSystem cannot
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }
    assert(Multimodal.AdpcmCodec.parse(wav).isDefined)
  }

  test("AdpcmCodec: non-ADPCM and malformed payloads drop to None, never throw") {
    import Multimodal.AdpcmCodec
    assert(AdpcmCodec.parse(Array.fill[Byte](64)('x')).isEmpty)
    assert(AdpcmCodec.parse("RIFF1234WAVE".getBytes("US-ASCII")).isEmpty)
    // a PCM WAV (fmt tag 1) must be left to the AudioSystem path
    val pcmWav = {
      val samples = sine(200, 1000, 40)
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16).putShort(1).putShort(1).putInt(8000).putInt(16000)
      bb.putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array
    }
    assert(AdpcmCodec.parse(pcmWav).isEmpty)
    // truncated ADPCM (data chunk cut mid-block) must also drop
    val wav = AdpcmCodec.build(sine(600, 4000, 50), 8000)
    assert(AdpcmCodec.parse(java.util.Arrays.copyOf(wav, wav.length - 100)).isEmpty)
  }

  test("ADPCM rejects consistent-looking headers whose words overrun the block") {
    // blockAlign=6, spb=5 satisfies the spb equation but (spb-1)=4 is not
    // a whole 8-sample word — the walk would read past a file-ending data
    // chunk. Must drop, not throw.
    val bb = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(54).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
    bb.putShort(0x11).putShort(1).putInt(8000).putInt(8000)
    bb.putShort(6).putShort(4).putShort(2).putShort(5) // blockAlign=6, spb=5
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(5)
    bb.put("data".getBytes("US-ASCII")).putInt(6).put(Array.fill[Byte](6)(0x11))
    assert(Multimodal.AdpcmCodec.parse(bb.array).isEmpty)
  }

  test("RIFF parsers survive a crafted chunk size near Int.MaxValue") {
    // `off + 8 + size` must not wrap negative and sneak past the bounds
    // check — one such payload would fail a whole mapPartitions task
    def evil(form: String, cc: String): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put(form.getBytes("US-ASCII"))
      bb.put(cc.getBytes("US-ASCII")).putInt(0x7ffffff0)
      bb.array
    }
    assert(Multimodal.AdpcmCodec.parse(evil("WAVE", "fmt ")).isEmpty)
    assert(Multimodal.AviCodec.parse(evil("AVI ", "avih")).isEmpty)
  }

  test("shotKeyframes: shots split at cuts, keyframe is each shot's first frame") {
    import spark.implicits._
    // luma walk: 10,20,30 | 200,210 | 40 — cuts at frames 3 and 5
    val frames = Seq(
      (1L, 0, 8, 8, 10.0), (1L, 1, 8, 8, 20.0), (1L, 2, 8, 8, 30.0),
      (1L, 3, 8, 8, 200.0), (1L, 4, 8, 8, 210.0), (1L, 5, 8, 8, 40.0),
      (2L, 0, 8, 8, 50.0) // single-frame video: one shot, keyframe 0
    ).toDF("media_id", "frame_idx", "frame_w", "frame_h", "mean_luma")
      .as[Multimodal.VideoFrame]
    val got = Multimodal.shotKeyframes(frames, threshold = 100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 0L, 0L, 3L), (1L, 1L, 3L, 2L), (1L, 2L, 5L, 1L),
      (2L, 0L, 0L, 1L)))
  }

  test("audioSegments: islands are maximal, widths consistent, pattern matches the gate") {
    val out = graft.queries.MultimodalQueries
      .audioSegments(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, segs) =>
      val sorted = segs.sortBy(_._2)
      sorted.foreach { case (_, s, e, nw) =>
        assert(nw === e - s + 1, s"media $id segment [$s,$e] width $nw")
        // every window inside a segment must be gate-active, and the
        // windows flanking it gate-quiet (maximality of the island)
        (s to e).foreach(w => assert((w * 37 + id) % 5 < 3,
          s"media $id window $w in-segment but gate-quiet"))
        if (s > 0) assert((((s - 1) * 37 + id) % 5) >= 3,
          s"media $id segment [$s,$e] not maximal on the left")
      }
      // segments never touch (else the island merge failed)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"media $id adjacent segments [$e1]/[$s2]")
        case _ => ()
      }
    }
  }

  test("imageStats: analytic statistics of a crafted image; non-images drop") {
    import spark.implicits._
    // 2x2: lumas (r+g+b)/3 = 0, 60, 200, 255 — exercises every statistic
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)            // luma 0   (dark)
    img.setRGB(1, 0, (60 << 16) | (60 << 8) | 60)   // luma 60 (dark)
    img.setRGB(0, 1, (200 << 16) | (200 << 8) | 200) // luma 200 (bright)
    img.setRGB(1, 1, 0xffffff)            // luma 255 (bright)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, "image", bos.toByteArray),
      (2L, "image", "not a png".getBytes("UTF-8")))
      .toDF("media_id", "kind", "content")
    val got = Multimodal.imageStats(Multimodal.asMedia(media)).collect()
    assert(got.length === 1) // the undecodable payload drops, never throws
    val s = got.head
    assert(s.media_id === 1L && s.n_px === 4L)
    assert(s.sum_l === 515L && s.min_l === 0L && s.max_l === 255L)
    assert(s.n_distinct_l === 4L && s.n_dark === 2L && s.n_bright === 2L)
  }
}
