package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One media object: opaque bytes + typed envelope. `kind` is a MIME-ish
  * discriminator ("image/fake", "audio/fake", ...); real pipelines carry
  * the original container bytes here.
  */
case class MediaFile(id: Long, kind: String, bytes: Array[Byte])

/** Typed metadata extracted from a media blob. */
case class MediaMeta(id: Long, kind: String, nBytes: Long, headerHash: Long,
                     width: Int, height: Int, nFrames: Int)

/** A sampled "frame": a deterministic byte-range slice of the source. */
case class MediaFrame(id: Long, frameIdx: Int, offset: Long,
                      bytes: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, processed
  * per-partition so decode libraries initialize once per task (the Spark
  * pattern for heavyweight codecs).
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake decoder (`decodeStub`) so the
  * Spark-side contract (schema, partitioning, batch iteration, typed
  * Datasets) is real and tested end-to-end. Swapping in a real decoder
  * changes only the function body marked below.
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

  /** STUB decoder — deterministic fake dimensions from the header bytes.
    * Replace the body with a real codec (e.g. TwelveMonkeys/ImageIO for
    * images) to productionize; the signature and the surrounding
    * partition-wise plumbing stay unchanged.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b2 = if (bytes.length > 2) bytes(2) & 0xff else 0
    val width = 64 + (b0 % 32)
    val height = 64 + (b2 % 32)
    val nFrames = 1 + bytes.length % 16
    (width, height, nFrames)
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
      // per-partition: a real impl would initialize the codec here, once
      it.map { m =>
        val (w, h, f) = decodeStub(m.bytes)
        MediaMeta(m.id, m.kind, m.bytes.length.toLong, headerHash(m.bytes),
          w, h, f)
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
