package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def media = {
    val s = spark
    import s.implicits._
    Multimodal.asMedia(
      Seq((1L, "a" * 100), (2L, "hello world of binary columns"),
        (3L, "")).toDF("id", "payload"),
      "id", "payload")
  }

  behavior of "extractMeta"

  it should "carry byte length, deterministic dims, and a header hash" in {
    val out = media.collect().map(m => m.id -> m).toMap
    val metas = Multimodal.extractMeta(media).collect().map(m => m.id -> m)
      .toMap
    metas.keySet shouldBe Set(1L, 2L, 3L)
    metas(1L).nBytes shouldBe 100L
    metas(3L).nBytes shouldBe 0L
    metas(1L).width should (be >= 64 and be < 96)
    metas(1L).height should (be >= 64 and be < 96)
    // deterministic: same bytes → same meta
    val again = Multimodal.extractMeta(media).collect().map(m => m.id -> m)
      .toMap
    metas shouldBe again
    metas(1L).headerHash shouldBe Multimodal.headerHash(out(1L).bytes)
    // text blobs are NOT decodable images → fallback path, flagged
    all(metas.values.map(_.decoded)) shouldBe false
  }

  it should "REALLY decode an actual PNG via ImageIO and flag it" in {
    val img = new java.awt.image.BufferedImage(
      37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = spark
    import s.implicits._
    val ds = Seq(MediaFile(42L, "image/png", bos.toByteArray)).toDS()
    val meta = Multimodal.extractMeta(ds).collect().head
    meta.decoded shouldBe true
    meta.width shouldBe 37
    meta.height shouldBe 23
    meta.nFrames shouldBe 1
    // and the direct function agrees
    Multimodal.decode(bos.toByteArray) shouldBe ((37, 23, 1, true))
  }

  it should "REALLY decode an actual WAV via javax.sound and flag it" in {
    // 1000 frames of 16-bit mono PCM at 8 kHz, written as a genuine WAV
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](2000)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1000)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val s = spark
    import s.implicits._
    val ds = Seq(MediaFile(7L, "audio/wav", bos.toByteArray)).toDS()
    val meta = Multimodal.extractAudioMeta(ds).collect().head
    meta.decoded shouldBe true
    meta.sampleRate shouldBe 8000
    meta.channels shouldBe 1
    meta.frames shouldBe 1000L
    // non-audio bytes take the deterministic fallback
    val fb = Multimodal.extractAudioMeta(media).collect()
    all(fb.map(_.decoded)) shouldBe false
    fb.map(_.id).toSet shouldBe Set(1L, 2L, 3L)
  }

  behavior of "probeVideo"

  it should "read dimensions from an MP4 box tree and an AVI header, " +
    "and reject non-video bytes" in {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le32(v: Long): Array[Byte] = be32(v).reverse
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    // minimal ISO-BMFF: ftyp + moov{trak{tkhd v0 with 640x360 16.16}}
    val tkhdBody = new Array[Byte](84)
    be32(640L << 16).copyToArray(tkhdBody, 76)
    be32(360L << 16).copyToArray(tkhdBody, 80)
    val tkhd = be32(92) ++ cc("tkhd") ++ tkhdBody
    val trak = be32(8 + tkhd.length) ++ cc("trak") ++ tkhd
    val moov = be32(8 + trak.length) ++ cc("moov") ++ trak
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("isom") ++ be32(0)
    val mp4 = ftyp ++ moov
    Multimodal.probeVideo(mp4) shouldBe Some(("mp4", 640, 360))

    // minimal AVI: RIFF/AVI LIST hdrl avih with 320x240 at body+32/36
    val avihBody = new Array[Byte](40)
    le32(320).copyToArray(avihBody, 32)
    le32(240).copyToArray(avihBody, 36)
    val avi = cc("RIFF") ++ le32(100) ++ cc("AVI ") ++ cc("LIST") ++
      le32(60) ++ cc("hdrl") ++ cc("avih") ++ le32(40) ++ avihBody
    Multimodal.probeVideo(avi) shouldBe Some(("avi", 320, 240))

    Multimodal.probeVideo("not a video at all".getBytes) shouldBe None
    Multimodal.probeVideo(Array.emptyByteArray) shouldBe None
  }

  behavior of "sampleFrames"

  it should "REALLY decode MJPEG frames from a genuine AVI container" in {
    // Build a real 3-frame MJPEG AVI: handcrafted RIFF chunks around
    // JPEG frames written by ImageIO — the same layout probeVideo reads.
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpeg(40), jpeg(128), jpeg(220))
    val bb = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def s(x: String): Array[Byte] = x.getBytes("US-ASCII")
    val avih = new Array[Byte](56)
    System.arraycopy(le32(16), 0, avih, 32, 4) // dwWidth
    System.arraycopy(le32(12), 0, avih, 36, 4) // dwHeight
    val hdrl = s("hdrl") ++ s("avih") ++ le32(56) ++ avih
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(s("movi"))
      frames.foreach { f =>
        b.write(s("00dc")); b.write(le32(f.length)); b.write(f)
        if (f.length % 2 == 1) b.write(0)
      }
      b.toByteArray
    }
    bb.write(s("RIFF"))
    val body = s("AVI ") ++ s("LIST") ++ le32(hdrl.length) ++ hdrl ++
      s("LIST") ++ le32(movi.length) ++ movi
    bb.write(le32(body.length)); bb.write(body)
    val avi = bb.toByteArray

    // container probe still reads the header dims
    Multimodal.probeVideo(avi) shouldBe Some(("avi", 16, 12))
    // and the frames REALLY decode
    val decoded = Multimodal.decodeMjpegFrames(avi)
    decoded.map(_._1) shouldBe Seq(0, 1, 2)
    all(decoded.map(_._2)) shouldBe 16
    all(decoded.map(_._3)) shouldBe 12
    // luminance orders with the painted shades (JPEG is lossy; order
    // and rough magnitude survive)
    val lumas = decoded.map(_._4)
    lumas(0) should be < lumas(1)
    lumas(1) should be < lumas(2)
    val px = 16L * 12 * 3
    lumas(0) should (be > px * 20 and be < px * 60)
    lumas(2) should (be > px * 200 and be < px * 240)
    // non-AVI bytes → empty, never a throw
    Multimodal.decodeMjpegFrames("not a video".getBytes) shouldBe empty
  }

  it should "decode MJPEG samples out of a QuickTime/ISO-BMFF container " +
    "through the real stsd/stsc/stsz/stco tables" in {
    val mov = Multimodal.buildMjpegMov(16, 12, Seq(40, 128, 220))
    // the ISO-BMFF walker reads the tkhd 16.16 dims
    Multimodal.probeVideo(mov) shouldBe Some(("mp4", 16, 12))
    val decoded = Multimodal.decodeMovJpegFrames(mov)
    decoded.map(_._1) shouldBe Seq(0, 1, 2)
    all(decoded.map(_._2)) shouldBe 16
    all(decoded.map(_._3)) shouldBe 12
    val lumas = decoded.map(_._4)
    lumas(0) should be < lumas(1)
    lumas(1) should be < lumas(2)
    // the two containers carry the SAME JPEG payloads → identical lumas
    val aviLumas = Multimodal
      .decodeMjpegFrames(Multimodal.buildMjpegAvi(16, 12, Seq(40, 128, 220)))
      .map(_._4)
    lumas shouldBe aviLumas
    // non-BMFF bytes → empty, never a throw
    Multimodal.decodeMovJpegFrames("not a video".getBytes) shouldBe empty
    // a BMFF file with no jpeg track → empty
    val noTrack = mov.clone()
    // corrupt the stsd's sample-entry fourcc so no track matches
    val idx = {
      var i = -1
      var p = 0
      while (i < 0 && p + 4 <= noTrack.length) {
        if (noTrack(p) == 'j' && noTrack(p + 1) == 'p' &&
          noTrack(p + 2) == 'e' && noTrack(p + 3) == 'g') i = p
        p += 1
      }
      i
    }
    idx should be > 0
    noTrack(idx) = 'x'.toByte
    Multimodal.decodeMovJpegFrames(noTrack) shouldBe empty
  }

  it should "emit k evenly spaced frames and skip empty blobs" in {
    val frames = Multimodal.sampleFrames(media, k = 4, frameSize = 8)
      .collect()
    frames.filter(_.id == 3L) shouldBe empty
    val f1 = frames.filter(_.id == 1L).sortBy(_.frameIdx)
    f1.map(_.frameIdx).toSeq shouldBe Seq(0, 1, 2, 3)
    f1.map(_.offset).toSeq shouldBe Seq(0L, 25L, 50L, 75L)
    all(f1.map(_.bytes.length)) shouldBe 8
  }

  behavior of "resizeStub"

  it should "bound payloads at targetBytes, passing small blobs through" in {
    val out = Multimodal.resizeStub(media, targetBytes = 16)
      .collect().map(m => m.id -> m.bytes.length).toMap
    out(1L) shouldBe 16
    out(2L) shouldBe 16
    out(3L) shouldBe 0
    // deterministic content
    val a = Multimodal.resizeStub(media, 16).collect()
      .find(_.id == 1L).get.bytes.toSeq
    val b = Multimodal.resizeStub(media, 16).collect()
      .find(_.id == 1L).get.bytes.toSeq
    a shouldBe b
  }
}
