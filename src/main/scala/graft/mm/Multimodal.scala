package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded-media feature row. */
final case class MediaFeatures(url: String, kind: String, byte_len: Long,
                               content_hash: String, width: Int, height: Int,
                               features: Array[Float])

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary` columns
  * with typed metadata; decode / feature-extract runs as a batched per-partition map
  * (the Scala analog of `mapInPandas` — one reusable decoder per task, rows streamed
  * through it in batches).
  *
  * ==== STUB BOUNDARY ====
  * This container ships no image/audio codecs, so [[StubDecoder]] is a clearly-marked
  * deterministic fake: "decoding" hashes the bytes into a fixed-dim feature vector and
  * fakes dimensions from the byte length. Everything AROUND the stub is real and
  * tested: the schema, the binary column handling, the batched partition processing,
  * the feature-vector shape, and the downstream joins. A real deployment swaps
  * [[Decoder]] for a JNI/ONNX-backed implementation with the same signature.
  */
object Multimodal {

  trait Decoder extends Serializable {
    def decode(url: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decode — see STUB BOUNDARY above. */
  final class StubDecoder(dim: Int) extends Decoder {
    override def decode(url: String, bytes: Array[Byte]): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hash = md.map(b => f"${b & 0xff}%02x").mkString
      val features = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // feature i = signed byte of the rolling digest, normalized — deterministic
        features(i) = (md((i * 7) % md.length).toInt + (i * 13 % 31)) / 128.0f
        i += 1
      }
      val kind =
        if (bytes.length >= 5 && new String(bytes, 0, 5, "ISO-8859-1") == "<html") "html"
        else "binary"
      MediaFeatures(url, kind, bytes.length.toLong, hash,
        width = 16 + (bytes.length % 1024).toInt, height = 16 + (bytes.length % 768).toInt,
        features = features)
    }
  }

  /** Batched decode over a binary column: one Decoder instance per partition (the
    * expensive init — model load, codec setup — amortizes across the partition),
    * rows streamed through. Input needs (url string, bin binary) columns.
    */
  def decodeFeatures(df: DataFrame, urlCol: String, binCol: String,
                     decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol), col(binCol)).as[(String, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-task instance; real impl would init codecs here
        it.map { case (url, bytes) => d.decode(url, if (bytes == null) Array.empty else bytes) }
      }
  }

  /** Frame-sampling plan for video-like payloads: deterministic sample offsets per
    * row (every `stride` bytes, up to `maxFrames`), as a pure column expression —
    * the real frame grab happens inside the Decoder at those offsets.
    */
  def frameSampleOffsets(binCol: String, stride: Int, maxFrames: Int) =
    slice(sequence(lit(0L), greatest(length(col(binCol)).cast("long") - 1, lit(0L)),
      lit(stride.toLong)), 1, maxFrames)

  /** Stub "resize": deterministic byte-level downsample standing in for a real
    * image resize (STUB BOUNDARY above — a real deployment swaps the sampling
    * loop for a codec call with the same signature). Output byte i = input byte
    * ⌊i·len/m⌋ with m = min(targetW·targetH/16, len); metadata carries the target
    * dims. The Spark-side plumbing is the real part: batched binary→binary
    * per-partition map, BinaryType in and out.
    */
  def resizeBinary(df: DataFrame, urlCol: String, binCol: String,
                   targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = math.max(1, targetW * targetH / 16)
    df.select(col(urlCol), col(binCol)).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (url, bytesRaw) =>
          val bytes = if (bytesRaw == null) Array.empty[Byte] else bytesRaw
          val m = if (bytes.isEmpty) 0 else math.min(n, bytes.length)
          val out = new Array[Byte](m)
          var i = 0
          while (i < m) { out(i) = bytes(((i.toLong * bytes.length) / m).toInt); i += 1 }
          (url, out, targetW, targetH)
        }
      }.toDF(urlCol, "resized", "width", "height")
  }

  /** Feature table keyed for downstream ANN joins (url → features). */
  def featureTable(spark: SparkSession, pages: DataFrame, dim: Int = 32): DataFrame =
    decodeFeatures(pages, "url", "html", new StubDecoder(dim)).toDF()
}
