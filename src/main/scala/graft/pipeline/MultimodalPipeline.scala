package graft.pipeline

import graft.core.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset plumbing: opaque `binary` payload column + typed
  * metadata, processed with mapPartitions in per-partition batches — the
  * exact shape a real image/audio decode stage needs (schema,
  * partitioning, batch iteration).
  *
  * The container ships no image/audio codec LIBRARIES, but three real
  * container formats are pure-JVM parseable from their public layouts, so
  * the decode stage is REAL, not a stub:
  *   - PPM P6 (netpbm: ASCII "P6\n<w> <h>\n255\n" + w·h·3 RGB bytes),
  *   - BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp uncompressed),
  *   - WAV (RIFF/WAVE, "fmt " PCM chunk + "data" chunk).
  * Assets are SYNTHESIZED deterministically from the documents table
  * (dims/rates derived from doc_id, pixel bytes from a seeded hash), then
  * decoded by parsing the actual container headers — the round-trip
  * (encode on one side, header-parse on the other) is what q22 gates.
  * Swapping in a JPEG/PNG/OPUS decoder changes only `decode`.
  */
object MultimodalPipeline extends Serializable {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features; `ok=false` rows carry the parse error in `err`
    * (one bad asset must not kill the job — it surfaces in the output). */
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      checksum: Long, ok: Boolean, err: String)

  // deterministic dimension/rate formulas (shared by the generator and
  // the q22 expectation columns — the decode must reproduce these by
  // PARSING, never by recomputing)
  def widthOf(id: Long): Int = 16 + (id % 16).toInt
  def heightOf(id: Long): Int = 16 + ((id / 16) % 16).toInt
  def sampleCountOf(id: Long): Int = 256 + (id % 256).toInt
  def channelsOf(id: Long): Int = 1 + (id % 2).toInt
  def sampleRateOf(id: Long): Int = 8000 + 1000 * (id % 3).toInt
  def kindOf(id: Long): String = (id % 3) match {
    case 0 => "ppm"
    case 1 => "bmp"
    case _ => "wav"
  }

  @inline private def pix(id: Long, i: Int): Byte =
    (Hashing.xxHash64Long(id * 0x10001L + i, 0x4D4DL) & 0xff).toByte

  // ------------------------------------------------------------ encoders
  private def encodePpm(id: Long): Array[Byte] = {
    val (w, h) = (widthOf(id), heightOf(id))
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) { out(header.length + i) = pix(id, i); i += 1 }
    out
  }

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  /** 24bpp bottom-up BMP with the standard 54-byte header; rows padded
    * to 4-byte boundaries per the format. */
  private def encodeBmp(id: Long): Array[Byte] = {
    val (w, h) = (widthOf(id), heightOf(id))
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length) // bfSize
    putIntLE(out, 10, 54) // bfOffBits
    putIntLE(out, 14, 40) // biSize (BITMAPINFOHEADER)
    putIntLE(out, 18, w)
    putIntLE(out, 22, h)
    putShortLE(out, 26, 1) // planes
    putShortLE(out, 28, 24) // bpp
    putIntLE(out, 34, dataSize)
    var i = 0
    while (i < dataSize) { out(54 + i) = pix(id, i); i += 1 }
    out
  }

  /** PCM 16-bit RIFF/WAVE with one fmt + one data chunk. */
  private def encodeWav(id: Long): Array[Byte] = {
    val ch = channelsOf(id)
    val n = sampleCountOf(id)
    val rate = sampleRateOf(id)
    val dataSize = n * ch * 2
    val out = new Array[Byte](44 + dataSize)
    def tag(off: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); putIntLE(out, 4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); putIntLE(out, 16, 16)
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, ch)
    putIntLE(out, 24, rate)
    putIntLE(out, 28, rate * ch * 2) // byte rate
    putShortLE(out, 32, ch * 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    tag(36, "data"); putIntLE(out, 40, dataSize)
    var i = 0
    while (i < dataSize) { out(44 + i) = pix(id, i); i += 1 }
    out
  }

  /** documents → deterministic real-container assets (format rotates by
    * doc_id; the text itself is not the payload — the documents table
    * just provides the stable id universe). */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.spark.TableSource.parquetDir(sfDir).table(spark, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val payload = kindOf(id) match {
          case "ppm" => encodePpm(id)
          case "bmp" => encodeBmp(id)
          case _ => encodeWav(id)
        }
        Asset(id, kindOf(id), payload)
      }
  }

  // ------------------------------------------------------------- decoders
  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def decodePpm(b: Array[Byte]): (Int, Int, Int, Int) = {
    // header: "P6" ws width ws height ws maxval single-ws — parse the
    // ASCII fields exactly as netpbm defines them (comments not emitted
    // by our encoder but tolerated)
    var pos = 0
    def token(): String = {
      while (pos < b.length && (b(pos) == ' ' || b(pos) == '\n' || b(pos) == '\t' ||
        b(pos) == '\r' || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      val start = pos
      while (pos < b.length && b(pos) > ' ') pos += 1
      new String(b, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a P6 PPM")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"unsupported maxval $maxv")
    pos += 1 // the single whitespace after maxval
    require(b.length - pos == w * h * 3,
      s"PPM payload ${b.length - pos} != ${w * h * 3}")
    (w, h, 3, 0)
  }

  private def decodeBmp(b: Array[Byte]): (Int, Int, Int, Int) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    require(readIntLE(b, 14) == 40, "unsupported DIB header")
    val w = readIntLE(b, 18)
    val h = readIntLE(b, 22)
    val bpp = readShortLE(b, 28)
    require(bpp == 24, s"unsupported bpp $bpp")
    require(readIntLE(b, 2) == b.length, "bfSize mismatch")
    require(readIntLE(b, 10) + (w * 3 + 3) / 4 * 4 * h == b.length, "pixel array size mismatch")
    (w, h, 3, 0)
  }

  private def decodeWav(b: Array[Byte]): (Int, Int, Int, Int) = {
    require(b.length >= 44, "truncated WAV")
    def tag(off: Int): String = new String(b, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE")
    require(tag(12) == "fmt " && readIntLE(b, 16) == 16, "unsupported fmt chunk")
    require(readShortLE(b, 20) == 1, "not PCM")
    val ch = readShortLE(b, 22)
    val rate = readIntLE(b, 24)
    val bits = readShortLE(b, 34)
    require(bits == 16, s"unsupported bit depth $bits")
    require(tag(36) == "data", "missing data chunk")
    val dataSize = readIntLE(b, 40)
    require(44 + dataSize == b.length, "data chunk size mismatch")
    val nSamples = dataSize / (ch * 2)
    (nSamples, 1, ch, rate)
  }

  /** REAL decode: parse the container header and cross-check its size
    * fields against the payload. Width/height/channels come from the
    * BYTES, never from the asset id. */
  def decode(a: Asset): AssetFeatures = {
    val checksum = Hashing.xxHash64(a.payload, 0L)
    try {
      val (w, h, ch, rate) = a.kind match {
        case "ppm" => decodePpm(a.payload)
        case "bmp" => decodeBmp(a.payload)
        case "wav" => decodeWav(a.payload)
        case other => throw new IllegalArgumentException(s"unknown kind $other")
      }
      AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong, w, h, ch, rate,
        checksum, ok = true, err = null)
    } catch {
      case e: Exception =>
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong, -1, -1, -1, -1,
          checksum, ok = false, err = e.getMessage)
    }
  }

  /** The batch stage: mapPartitions so a real codec could amortize
    * per-batch setup (decoder contexts, model load) across the partition. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup would go here (decoder init / model load)
      it.map(decode)
    }
  }

  /** REAL frame/pixel sampling (round 4 — replaces the byte-stride
    * placeholder): the 1:N explode shape of media sampling, with every
    * offset computed from the PARSED container layout rather than raw
    * byte position:
    *   - wav: every `stride`-th PCM FRAME; value = channel-0 signed
    *     16-bit sample read little-endian at 44 + frame·blockAlign;
    *   - ppm: every `stride`-th PIXEL in row-major order; value = the
    *     RED byte at headerLen + 3·pixel (headerLen from the parsed
    *     ASCII header);
    *   - bmp: every `stride`-th pixel in TOP-LEFT row-major order;
    *     value = the RED byte — BMP stores BOTTOM-UP BGR rows padded to
    *     4-byte boundaries, so logical pixel (x, y) reads
    *     54 + (h−1−y)·rowBytes + 3x + 2. Identical logical semantics
    *     ("k-th pixel's red value") across both image formats even
    *     though their byte layouts differ — that is the point.
    * Malformed payloads yield zero frames rather than killing the job
    * (the same per-asset isolation as [[decode]]; the bad asset still
    * surfaces through extractFeatures' ok=false row). */
  def sampleFrames(assets: Dataset[Asset], stride: Int): DataFrame = {
    import assets.sparkSession.implicits._
    val k = math.max(1, stride)
    assets.flatMap { a =>
      try {
        a.kind match {
          case "wav" =>
            val (n, _, ch, _) = decodeWav(a.payload)
            val block = ch * 2
            (0 until n by k).map { f =>
              val off = 44 + f * block
              val v = (((a.payload(off) & 0xff) | (a.payload(off + 1) << 8)).toShort).toInt
              (a.asset_id, a.kind, f, v)
            }
          case "ppm" =>
            val (w, h, _, _) = decodePpm(a.payload)
            val headerLen = a.payload.length - w * h * 3
            (0 until w * h by k).map { p =>
              (a.asset_id, a.kind, p, a.payload(headerLen + 3 * p).toInt & 0xff)
            }
          case "bmp" =>
            val (w, h, _, _) = decodeBmp(a.payload)
            val rowBytes = (w * 3 + 3) / 4 * 4
            // pixel array starts at the PARSED bfOffBits, not a
            // hardcoded 54: decodeBmp accepts any header gap whose
            // offset + rowBytes·h matches the payload length
            val offBits = readIntLE(a.payload, 10)
            (0 until w * h by k).map { p =>
              val x = p % w
              val y = p / w
              val off = offBits + (h - 1 - y) * rowBytes + 3 * x + 2
              (a.asset_id, a.kind, p, a.payload(off).toInt & 0xff)
            }
          case _ => Seq.empty
        }
      } catch { case _: Exception => Seq.empty }
    }.toDF("asset_id", "kind", "frame_idx", "sample_value")
  }
}
