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
}
