package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BinaryType
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark side — schema, partitioning, batch shape (mapPartitions with
  * per-partition initialization, the Scala analogue of mapInPandas'
  * batch iterator), encoders — is real and tested. IMAGE decode is real
  * (the JDK's ImageIO reads PNG/GIF/BMP/JPEG headers+pixels) and so is
  * AUDIO header decode for WAV/AIFF/AU (the JDK's javax.sound.sampled) —
  * zero extra dependencies for either. The video decoder, compressed
  * audio, and the embedding model are STUBS by design (no AV libraries
  * in this container): `decodeStub`/`featureStub` derive deterministic
  * values from the payload bytes. A real deployment replaces only the
  * stub functions; every signature, schema, and plan stays identical.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte],
                        meta: Map[String, String])

  /** Decoded header info (width/height for images, frames for video,
    * samples for audio — one shape for all kinds). */
  case class MediaInfo(asset_id: Long, kind: String, byte_size: Int,
                       width: Int, height: Int, n_frames: Int)

  case class MediaFeature(asset_id: Long, kind: String, feature: Array[Float])

  case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  // ----------------------------------------------------- real decoders --

  /** Real image decode via the JDK's ImageIO (PNG/GIF/BMP/JPEG): actual
    * width/height from the actual bytes, no external dependency. Returns
    * None when the payload is not a decodable image (ImageIO signals
    * that as a null reader result), letting the caller fall back. */
  private[graft] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    // NonFatal, not just IOException: JDK image plugins throw
    // RuntimeExceptions (IllegalArgumentException, CMMException,
    // ArrayIndexOutOfBounds) on truncated/fuzzed payloads, and a corrupt
    // asset must fall back to the stub, not fail the Spark task
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth, img.getHeight, 1))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real audio header decode via the JDK's javax.sound.sampled
    * (WAV/AIFF/AU): (sample rate Hz, channels, frame count) mapped onto
    * the shared (width, height, n_frames) MediaInfo shape. None for
    * formats the JDK cannot parse (mp3/ogg — those stay stubbed). */
  private[graft] def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        // getFrameLength is a long and may be AudioSystem.NOT_SPECIFIED
        // (-1, e.g. a streamed AU with no declared length) — map unknown
        // to 0 and saturate counts beyond Int range (a fuzzed header can
        // declare any data-chunk size) instead of letting .toInt wrap to
        // a negative/garbage frame count on a "successful" decode
        val fl = ais.getFrameLength
        val frames =
          if (fl < 0L) 0 else math.min(fl, Int.MaxValue.toLong).toInt
        Some((fmt.getSampleRate.toInt, fmt.getChannels, frames))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None } // incl. corrupt-payload RuntimeExceptions

  // ------------------------------------------------------------- STUBS --
  // Deterministic fakes standing in for real codecs (marked per contract).

  /** STUB: real impl = av header decode (audio/video), and the fallback
    * for image payloads ImageIO cannot parse (synthetic fixtures).
    * Derives plausible dims deterministically from payload bytes. */
  private[graft] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    val frames = kind match {
      case "video" => 1 + math.floorMod(h >> 20, 240)
      case "audio" => 1 + math.floorMod(h >> 20, 48000)
      case _ => 1
    }
    (w, ht, frames)
  }

  /** STUB: real impl = vision/audio embedding model. Deterministic
    * pseudo-embedding from a rolling hash of the payload. */
  private[graft] def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 7L
    var i = 0
    while (i < payload.length) {
      acc = (acc * 31 + (payload(i) & 0xff)) % 2147483647L
      out(math.floorMod(i, dim).toInt) += ((acc % 2003).toFloat / 2003f) - 0.5f
      i += 1
    }
    out
  }

  // -------------------------------------------------------- operators --

  /** Header decode over a Dataset[MediaAsset]. mapPartitions so a real
    * decoder initializes once per partition (the expensive part with real
    * codecs), then streams the partition through — same batch shape a
    * Pandas-UDF/mapInPandas implementation would have. Image assets
    * decode for real through ImageIO, audio through javax.sound.sampled;
    * video — and payloads the real decoders cannot parse (synthetic
    * fixtures, compressed audio) — fall back to the deterministic stub. */
  def decode(assets: Dataset[MediaAsset]): Dataset[MediaInfo] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // once per partition: ImageIO plugin scanning is registry-global
      // and lazy; touching it here keeps per-row work pure decode (the
      // same slot where a heavy AV codec would initialize)
      javax.imageio.ImageIO.getUseCache
      it.map { a =>
        val real = a.kind match {
          case "image" => decodeImage(a.payload)
          case "audio" => decodeAudio(a.payload)
          case _ => None
        }
        val (w, h, f) = real.getOrElse(decodeStub(a.kind, a.payload))
        MediaInfo(a.asset_id, a.kind, a.payload.length, w, h, f)
      }
    }
  }

  /** Feature extraction (fake embedding, real plumbing). */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 64): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => MediaFeature(a.asset_id, a.kind, featureStub(a.payload, dim)))
    }
  }

  /** Sample up to n evenly spaced "frames" (payload slices — STUB for real
    * frame extraction; the explode shape and per-frame rows are real). */
  def frameSample(assets: Dataset[MediaAsset], n: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val len = a.payload.length
      if (len == 0) Iterator.empty
      else {
        val k = math.min(n, len)
        (0 until k).iterator.map { i =>
          val from = (i.toLong * len / k).toInt
          val until = ((i + 1).toLong * len / k).toInt
          Frame(a.asset_id, i, java.util.Arrays.copyOfRange(a.payload, from, until))
        }
      }
    }
  }

  /** Build a media table from any (id, string) source — test/dev helper
    * that manufactures payloads without external files. */
  def syntheticAssets(spark: SparkSession, src: DataFrame,
                      idCol: String, textCol: String): Dataset[MediaAsset] = {
    import spark.implicits._
    src.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      map(lit("origin"), lit("synthetic")).as("meta"))
      .as[MediaAsset]
  }
}
