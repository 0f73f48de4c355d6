package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One media object: opaque bytes + typed envelope. `kind` is a MIME-ish
  * discriminator ("image/fake", "audio/fake", ...); real pipelines carry
  * the original container bytes here.
  */
case class MediaFile(id: Long, kind: String, bytes: Array[Byte])

/** Typed metadata extracted from a media blob. `decoded` is true when a
  * real codec produced the dimensions, false when the deterministic
  * fallback did (non-media bytes).
  */
case class MediaMeta(id: Long, kind: String, nBytes: Long, headerHash: Long,
                     width: Int, height: Int, nFrames: Int,
                     decoded: Boolean)

/** A sampled "frame": a deterministic byte-range slice of the source. */
case class MediaFrame(id: Long, frameIdx: Int, offset: Long,
                      bytes: Array[Byte])

/** One audio blob's typed metadata. `decoded` as in [[MediaMeta]]. */
case class AudioMeta(id: Long, nBytes: Long, sampleRate: Int,
                     channels: Int, frames: Long, decoded: Boolean)

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, processed
  * per-partition so decode libraries initialize once per task (the Spark
  * pattern for heavyweight codecs).
  *
  * Image decode is REAL (the JDK's ImageIO — PNG/JPEG/GIF/BMP, zero
  * external dependencies); bytes that are not a decodable image fall
  * back to a deterministic fake (`decodeStub`) and are flagged
  * `decoded = false` — which is what the current testdata produces,
  * since its "media" blobs are documents re-encoded as bytes. Audio /
  * video codecs are the remaining genuinely-stubbed surface (no
  * libraries in this container); they slot into the same
  * partition-wise plumbing.
  *
  * Scale: `mapPartitions` keeps the decode streaming (no per-row setup,
  * no driver collect); binary columns are dictionary-free parquet pages,
  * so filters on the metadata columns still prune row groups while blob
  * pages are only read for surviving rows.
  */
object Multimodal {

  /** Wrap a (id, text) table as fake media blobs — the test harness for
    * the binary path (documents stand in for a blob store).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String = "image/fake"): Dataset[MediaFile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
        encode(col(payloadCol), "UTF-8").as("bytes"))
      .as[MediaFile]
  }

  /** Fallback decoder — deterministic fake dimensions from the header
    * bytes, used when the blob is not a decodable image (the testdata
    * reality: documents re-encoded as blobs).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b2 = if (bytes.length > 2) bytes(2) & 0xff else 0
    val width = 64 + (b0 % 32)
    val height = 64 + (b2 % 32)
    val nFrames = 1 + bytes.length % 16
    (width, height, nFrames)
  }

  /** Decode: REAL image decode first via the JDK's ImageIO (PNG / JPEG /
    * GIF / BMP — zero external dependencies; the reader is selected by
    * container signature, so non-image bytes fail fast with a null
    * reader), falling back to [[decodeStub]]. Returns
    * (width, height, nFrames, decoded). Audio/video containers would
    * slot in the same way with their libraries on the classpath; the
    * partition-wise plumbing above this function is codec-agnostic.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Boolean) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img != null) (img.getWidth, img.getHeight, 1, true)
    else {
      val (w, h, f) = decodeStub(bytes)
      (w, h, f, false)
    }
  }

  /** Decode audio: REAL container parse via the JDK's
    * javax.sound.sampled (WAV / AIFF / AU — zero external dependencies);
    * non-audio bytes fall back to deterministic fake parameters flagged
    * `decoded = false`. Returns (sampleRate, channels, frames, decoded).
    */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Boolean) = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in != null) {
      // getFrameLength is AudioSystem.NOT_SPECIFIED (-1) for formats with
      // unknown length — clamp to 0 rather than emitting frames=-1 with
      // decoded=true; close in finally so a throwing getFormat/
      // getFrameLength can't leak the stream.
      try {
        val f = in.getFormat
        val frames = math.max(in.getFrameLength, 0L)
        (f.getSampleRate.toInt, f.getChannels, frames, true)
      } finally in.close()
    } else {
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (8000 + (b1 % 8) * 1000, 1 + bytes.length % 2,
        bytes.length.toLong, false)
    }
  }

  /** Build a genuine 16-bit LE mono WAV of a square wave: amplitude
    * `amp`, half-period `halfPeriod` samples, `n` samples at
    * `sampleRate` Hz — written by javax.sound, so the bytes are a real
    * WAV file, and PCM is lossless, so every sample survives the round
    * trip exactly (unlike the JPEG path, the oracle can pin EXACT
    * integer features).
    */
  def buildSquareWav(n: Int, halfPeriod: Int, amp: Int,
                     sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i / halfPeriod) % 2 == 0) amp else -amp
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio sample decode: read the full PCM stream via
    * javax.sound, return 16-bit LE mono samples. Empty for undecodable
    * bytes (same honest-fallback contract as [[decodeAudio]]).
    */
  def decodeAudioSamples(bytes: Array[Byte]): Array[Short] = {
    import javax.sound.sampled._
    val in =
      try AudioSystem.getAudioInputStream(new java.io.BufferedInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) return Array.emptyShortArray
    try {
      val f = in.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
        f.isBigEndian) return Array.emptyShortArray
      val raw = in.readAllBytes()
      val out = new Array[Short]((raw.length / 2))
      var i = 0
      while (i < out.length) {
        out(i) = (((raw(i * 2 + 1) & 0xff) << 8) |
          (raw(i * 2) & 0xff)).toShort
        i += 1
      }
      out
    } finally in.close()
  }

  /** Audio metadata extraction, partition-wise like [[extractMeta]]. */
  def extractAudioMeta(media: Dataset[MediaFile]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (sr, ch, fr, dec) = decodeAudio(m.bytes)
        AudioMeta(m.id, m.bytes.length.toLong, sr, ch, fr, dec)
      }
    }
  }

  /** Byte-level video CONTAINER probe — no codec, just header parsing,
    * which is what a corpus pipeline actually needs from video at ingest
    * (decoding frames happens much later, on GPU boxes). Pure-JVM
    * parsers for the two classic layouts:
    *
    *   - MP4/ISO-BMFF: walk the box tree (size + fourcc headers) to
    *     `moov/trak/tkhd` and read the 16.16 fixed-point width/height
    *     at the end of the tkhd box (version 0: offset 76, version 1:
    *     offset 88 from the box header).
    *   - AVI/RIFF: `RIFF....AVI LIST....hdrlavih`, width/height at
    *     offsets 32/36 into the avih chunk body (little-endian).
    *
    * Returns Some((container, width, height)) or None for anything else.
    */
  def probeVideo(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def be32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def le32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else ((bytes(o + 3) & 0xffL) << 24) | ((bytes(o + 2) & 0xffL) << 16) |
        ((bytes(o + 1) & 0xffL) << 8) | (bytes(o) & 0xffL)
    def fourcc(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    // ISO-BMFF: find tkhd inside moov/trak, depth-first box walk
    def walkBoxes(start: Int, end: Int, depth: Int): Option[(Int, Int)] = {
      var o = start
      while (o + 8 <= end && depth < 8) {
        val size = be32(o)
        val typ = fourcc(o + 4)
        if (size < 8 || o + size > end) return None
        val bodyEnd = o + size.toInt
        typ match {
          case "tkhd" =>
            val ver = if (o + 8 < bytes.length) bytes(o + 8) & 0xff else 0
            val dimOff = o + 8 + (if (ver == 1) 88 else 76)
            val w = (be32(dimOff) >> 16).toInt
            val h = (be32(dimOff + 4) >> 16).toInt
            if (w > 0 && h > 0) return Some((w, h))
          case "moov" | "trak" =>
            val r = walkBoxes(o + 8, bodyEnd, depth + 1)
            if (r.isDefined) return r
          case _ => ()
        }
        o = bodyEnd
      }
      None
    }

    if (fourcc(4) == "ftyp" || fourcc(4) == "moov")
      walkBoxes(0, bytes.length, 0).map { case (w, h) => ("mp4", w, h) }
    else if (fourcc(0) == "RIFF" && fourcc(8) == "AVI " &&
      fourcc(12) == "LIST" && fourcc(20) == "hdrl" && fourcc(24) == "avih") {
      val body = 32 // avih chunk body start: 24 fourcc + 4 size + ...
      val w = le32(body + 32).toInt
      val h = le32(body + 36).toInt
      if (w > 0 && h > 0) Some(("avi", w, h)) else None
    } else None
  }

  /** REAL video FRAME decode for the one codec the bare JDK can handle:
    * Motion-JPEG in AVI — every `..dc` chunk in the `movi` LIST carries
    * a complete JPEG image, decodable with ImageIO. Walks the RIFF
    * chunk stream (no index needed), decodes each video-data chunk, and
    * returns one tuple per decoded frame: (frameIdx, width, height,
    * lumaSum) where lumaSum = Σ(r+g+b) over all pixels — an exact
    * integer, so downstream aggregates hash-stably. Non-AVI bytes or
    * undecodable chunks yield an empty result (same honest-fallback
    * contract as [[decode]]). Inter-frame codecs (H.264, VP9, AV1)
    * genuinely require external decoder libraries; with this, the
    * environment boundary narrows to "MJPEG decodes for real,
    * compressed codecs are container-probed only".
    */
  def decodeMjpegFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var idx = 0
    mjpegFrameBytes(bytes).foreach { chunk =>
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(chunk))
      catch { case _: Throwable => null }
      if (img != null) {
        var luma = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            luma += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out += ((idx, img.getWidth, img.getHeight, luma))
        idx += 1
      }
    }
    out.toSeq
  }

  /** The raw still-frame payloads ("..dc" chunk bodies, in stream
    * order) of an MJPEG AVI — the container walk of
    * [[decodeMjpegFrames]] without the decode, for callers that hash or
    * re-mux frames ([[VideoHash.frameHashes]]). Nil for non-AVI bytes.
    */
  def mjpegFrameBytes(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else ((bytes(o + 3) & 0xffL) << 24) | ((bytes(o + 2) & 0xffL) << 16) |
        ((bytes(o + 1) & 0xffL) << 8) | (bytes(o) & 0xffL)
    def fourcc(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var o = start
      while (o + 8 <= end && depth < 8) {
        val id = fourcc(o)
        val size = le32(o + 4).toInt
        if (size < 0 || o + 8 + size > end) return
        if (id == "LIST") {
          val bodyType = fourcc(o + 8)
          if (bodyType == "movi" || bodyType == "hdrl" || bodyType == "rec ")
            walk(o + 12, o + 8 + size, depth + 1)
        } else if (id.length == 4 && id.endsWith("dc")) {
          out += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
        }
        o += 8 + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length, 0)
    out.toSeq
  }

  /** Build a genuine MJPEG-in-AVI byte stream: `shades.length` frames
    * of solid gray at `w`x`h`, each encoded as a real JPEG by ImageIO
    * and wrapped in the minimal RIFF layout [[probeVideo]] and
    * [[decodeMjpegFrames]] read. Deterministic for fixed inputs — the
    * registry gate uses it to exercise the REAL decode path end to end
    * on synthetic-but-genuine video bytes.
    */
  def buildMjpegAvi(w: Int, h: Int, shades: Seq[Int]): Array[Byte] = {
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (shade << 16) | (shade << 8) | shade); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    buildMjpegAviFromJpegs(w, h, shades.map(jpeg))
  }

  /** The RIFF/AVI wrapper of [[buildMjpegAvi]] for caller-supplied JPEG
    * payloads (one "00dc" chunk each) — [[VideoHash]] feeds it
    * quality-controlled staircase frames.
    */
  def buildMjpegAviFromJpegs(w: Int, h: Int,
                             jpegs: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def s(x: String): Array[Byte] =
      x.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(w), 0, avih, 32, 4)
    System.arraycopy(le32(h), 0, avih, 36, 4)
    val hdrl = s("hdrl") ++ s("avih") ++ le32(56) ++ avih
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(s("movi"))
      jpegs.foreach { f =>
        b.write(s("00dc")); b.write(le32(f.length)); b.write(f)
        if (f.length % 2 == 1) b.write(0)
      }
      b.toByteArray
    }
    val body = s("AVI ") ++ s("LIST") ++ le32(hdrl.length) ++ hdrl ++
      s("LIST") ++ le32(movi.length) ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write(s("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  /** REAL frame decode for the SECOND codec-free container: Motion-JPEG
    * in QuickTime/ISO-BMFF (.mov/.mp4 with a `jpeg` sample entry — every
    * sample is a complete JPEG). Unlike AVI's flat chunk stream, ISO-BMFF
    * locates media through the sample tables, so this walks the box tree
    * to the `stbl` whose `stsd` declares `jpeg`, then reconstructs each
    * sample's (offset, size) from the REAL table machinery —
    * `stco` chunk offsets × `stsc` samples-per-chunk runs × `stsz`
    * sizes — and ImageIO-decodes the `mdat` slices. Same output shape
    * and honest-fallback contract as [[decodeMjpegFrames]]; inter-frame
    * codecs (H.264, VP9, AV1) still genuinely require external decoder
    * libraries.
    */
  def decodeMovJpegFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Long)] = {
    def be32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def fourcc(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(4) != "ftyp" && fourcc(4) != "moov") return Nil

    // Locate the jpeg track's sample tables: one stbl holding an stsd
    // whose first sample entry is 'jpeg', plus its stsz/stco/stsc.
    // 64-bit table machinery (co64 chunk offsets, size==1 largesize
    // boxes) is declared unsupported EXPLICITLY: a file authored with
    // 64-bit tables returns Nil instead of decoding misread byte slices.
    var stsz: Option[Int] = None; var stco: Option[Int] = None
    var stsc: Option[Int] = None
    var unsupported64 = false
    def walk(start: Int, end: Int, depth: Int, inJpegStbl: Boolean): Unit = {
      var o = start
      while (o + 8 <= end && depth < 10) {
        val size = be32(o)
        val typ = fourcc(o + 4)
        if (size == 1) { unsupported64 = true; return } // 64-bit largesize
        if (size < 8 || o + size > end) return
        val bodyEnd = o + size.toInt
        typ match {
          case "moov" | "trak" | "mdia" | "minf" =>
            walk(o + 8, bodyEnd, depth + 1, inJpegStbl = false)
          case "stbl" =>
            // peek this stbl's stsd first: is it the jpeg track?
            var p = o + 8
            var isJpeg = false
            while (p + 8 <= bodyEnd) {
              val sz = be32(p)
              if (sz < 8 || p + sz > bodyEnd) { p = bodyEnd }
              else {
                if (fourcc(p + 4) == "stsd" &&
                  be32(p + 12) >= 1 && fourcc(p + 20) == "jpeg")
                  isJpeg = true
                p += sz.toInt
              }
            }
            if (isJpeg && stsz.isEmpty)
              walk(o + 8, bodyEnd, depth + 1, inJpegStbl = true)
          case "stsz" if inJpegStbl && stsz.isEmpty => stsz = Some(o)
          case "stco" if inJpegStbl && stco.isEmpty => stco = Some(o)
          case "co64" if inJpegStbl => unsupported64 = true
          case "stsc" if inJpegStbl && stsc.isEmpty => stsc = Some(o)
          case _ => ()
        }
        o = bodyEnd
      }
    }
    walk(0, bytes.length, 0, inJpegStbl = false)
    if (unsupported64) return Nil
    (stsz, stco, stsc) match {
      case (Some(szO), Some(coO), Some(scO)) =>
        val fixedSize = be32(szO + 12)
        val nSamples = be32(szO + 16).toInt
        if (nSamples <= 0 || nSamples > (1 << 20)) return Nil
        val sizes = (0 until nSamples).map(i =>
          if (fixedSize > 0) fixedSize.toInt else be32(szO + 20 + 4 * i).toInt)
        val nChunks = be32(coO + 12).toInt
        if (nChunks <= 0 || nChunks > (1 << 20)) return Nil
        // stco offsets stay Long throughout: 32-bit unsigned offsets in
        // a buffer we index with Int are only safe after the explicit
        // off + sz <= bytes.length bound below — never via truncation.
        val offsets = (0 until nChunks).map(i => be32(coO + 16 + 4 * i))
        val nRuns = be32(scO + 12).toInt
        if (nRuns <= 0 || nRuns > (1 << 16)) return Nil
        // (first_chunk, samples_per_chunk) runs, 1-based chunks
        val runs = (0 until nRuns).map(i =>
          (be32(scO + 16 + 12 * i).toInt, be32(scO + 20 + 12 * i).toInt))
        val out = scala.collection.mutable
          .ArrayBuffer.empty[(Int, Int, Int, Long)]
        var sample = 0
        var chunk = 0
        while (chunk < nChunks && sample < nSamples) {
          val perChunk = runs.takeWhile(_._1 <= chunk + 1).lastOption
            .map(_._2).getOrElse(1)
          var off: Long = offsets(chunk)
          var k = 0
          while (k < perChunk && sample < nSamples) {
            val sz = sizes(sample)
            if (off >= 0 && sz > 0 && off + sz <= bytes.length) {
              val in = new java.io.ByteArrayInputStream(bytes, off.toInt, sz)
              val img = try javax.imageio.ImageIO.read(in)
                catch { case _: Throwable => null }
              if (img != null) {
                var luma = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    luma += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                      (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                out += ((out.size, img.getWidth, img.getHeight, luma))
              }
            }
            off += sz
            sample += 1; k += 1
          }
          chunk += 1
        }
        out.toSeq
      case _ => Nil
    }
  }

  /** Build a genuine MJPEG-in-QuickTime (ISO-BMFF) byte stream: real
    * JPEG samples in `mdat`, located by REAL sample tables (`stsd` with
    * a `jpeg` visual sample entry, `stts`/`stsc`/`stsz`/`stco`) inside
    * `moov/trak/mdia/minf/stbl`, plus a spec-layout `tkhd` carrying the
    * 16.16 fixed-point dimensions [[probeVideo]] reads. One chunk per
    * sample (stsc 1:1 — [[decodeMovJpegFrames]] handles general runs).
    * ftyp+mdat precede moov so chunk offsets don't depend on moov size.
    */
  def buildMjpegMov(w: Int, h: Int, shades: Seq[Int]): Array[Byte] = {
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def s(x: String): Array[Byte] =
      x.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ s(typ) ++ body
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (shade << 16) | (shade << 8) | shade); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = shades.map(jpeg)
    val ftyp = box("ftyp", s("qt  ") ++ be32(0) ++ s("qt  "))
    val mdat = box("mdat", frames.flatten.toArray)
    // absolute chunk offsets: ftyp, then mdat header (8), then samples
    val offsets = frames.scanLeft(ftyp.length + 8)(_ + _.length).init
    // tkhd v0: 84-byte body, width/height 16.16 at body offsets 76/80
    val tkhdBody = new Array[Byte](84)
    System.arraycopy(be32(w << 16), 0, tkhdBody, 76, 4)
    System.arraycopy(be32(h << 16), 0, tkhdBody, 80, 4)
    // stsd: ver/flags + entry_count=1 + 86-byte 'jpeg' VisualSampleEntry
    val entry = {
      val e = new Array[Byte](86)
      System.arraycopy(be32(86), 0, e, 0, 4)
      System.arraycopy(s("jpeg"), 0, e, 4, 4)
      e(15) = 1 // data_reference_index = 1
      e(32) = ((w >> 8) & 0xff).toByte; e(33) = (w & 0xff).toByte
      e(34) = ((h >> 8) & 0xff).toByte; e(35) = (h & 0xff).toByte
      e
    }
    val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
    val stts = box("stts", be32(0) ++ be32(1) ++
      be32(frames.length) ++ be32(1))
    val stsc = box("stsc", be32(0) ++ be32(1) ++
      be32(1) ++ be32(1) ++ be32(1))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    val stco = box("stco", be32(0) ++ be32(offsets.length) ++
      offsets.flatMap(be32).toArray)
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", box("tkhd", tkhdBody) ++ mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  /** FNV-1a over the first `n` bytes — a cheap header fingerprint. */
  def headerHash(bytes: Array[Byte], n: Int = 16): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val end = math.min(n, bytes.length)
    while (i < end) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Decode / feature-extract: one `MediaMeta` per blob, partition-wise. */
  def extractMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition: heavyweight codec state initializes here, once
      it.map { m =>
        val (w, h, f, dec) = decode(m.bytes)
        MediaMeta(m.id, m.kind, m.bytes.length.toLong, headerHash(m.bytes),
          w, h, f, dec)
      }
    }
  }

  /** Frame-sample: `k` evenly-spaced fixed-size byte slices per blob
    * (stand-in for video frame extraction; offsets are deterministic).
    */
  def sampleFrames(media: Dataset[MediaFile], k: Int,
                   frameSize: Int = 32): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = m.bytes.length
      if (n == 0) Iterator.empty
      else (0 until k).iterator.map { i =>
        val off = (n.toLong * i) / k
        val end = math.min(off + frameSize, n).toInt
        MediaFrame(m.id, i, off, m.bytes.slice(off.toInt, end))
      }
    }
  }

  /** "Resize": deterministic downsample of the blob to `targetBytes` by
    * stride sampling (stand-in for image resize; keeps the byte-level
    * contract testable).
    */
  def resizeStub(media: Dataset[MediaFile],
                 targetBytes: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val n = m.bytes.length
      if (n <= targetBytes) m
      else {
        val out = new Array[Byte](targetBytes)
        var i = 0
        while (i < targetBytes) {
          out(i) = m.bytes((n.toLong * i / targetBytes).toInt)
          i += 1
        }
        m.copy(bytes = out)
      }
    }
  }
}
