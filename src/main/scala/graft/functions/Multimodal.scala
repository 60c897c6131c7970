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
  * (the JDK's ImageIO reads PNG/GIF/BMP/JPEG headers+pixels), AUDIO
  * header decode is real for WAV/AIFF/AU (the JDK's
  * javax.sound.sampled), and VIDEO decode is real for animated GIF —
  * multi-frame ImageIO: true frame count in [[decode]] and true
  * per-frame pixels (PNG-encoded) in [[frameSample]] — zero extra
  * dependencies for any of them. Compressed-container video (mp4/webm),
  * compressed audio (mp3/ogg), and the embedding model are STUBS by
  * design (no AV libraries in this container): `decodeStub`/
  * `featureStub` derive deterministic values from the payload bytes. A
  * real deployment replaces only the stub functions; every signature,
  * schema, and plan stays identical.
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

  /** Open a multi-frame ImageIO reader over the payload and hand it to
    * `body`; None when no installed reader recognizes the container or
    * decoding throws (corrupt payload → caller falls back to the stub,
    * never a task failure). Covers animated GIF with the stock JDK;
    * deployments that register additional ImageIO plugins (TIFF is
    * in-JDK too) get them through the same path. */
  private def withFrameReader[A](payload: Array[Byte])
                                (body: javax.imageio.ImageReader => Option[A]): Option[A] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); body(r) } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Logical screen size from the container's stream metadata (GIF:
    * LogicalScreenDescriptor). None for readers without one — caller
    * falls back to frame-0 raster dims. */
  private def logicalScreen(r: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val md = r.getStreamMetadata
      if (md == null) None
      else {
        val tree = md.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val kids = tree.getChildNodes
        (0 until kids.getLength).iterator
          .map(kids.item(_).asInstanceOf[javax.imageio.metadata.IIOMetadataNode])
          .collectFirst {
            case n if n.getNodeName == "LogicalScreenDescriptor" =>
              (n.getAttribute("logicalScreenWidth").toInt,
                n.getAttribute("logicalScreenHeight").toInt)
          }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame placement + disposal from GIF image metadata: (left, top,
    * disposalMethod). (0, 0, "none") when absent — full-frame containers
    * and non-GIF readers degrade to plain frame stacking. */
  private def frameMeta(r: javax.imageio.ImageReader, i: Int): (Int, Int, String) =
    try {
      val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      var x = 0; var y = 0; var disposal = "none"
      val kids = tree.getChildNodes
      (0 until kids.getLength).foreach { j =>
        val c = kids.item(j).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        c.getNodeName match {
          case "ImageDescriptor" =>
            x = c.getAttribute("imageLeftPosition").toInt
            y = c.getAttribute("imageTopPosition").toInt
          case "GraphicControlExtension" =>
            disposal = c.getAttribute("disposalMethod")
          case _ => ()
        }
      }
      (x, y, disposal)
    } catch { case scala.util.control.NonFatal(_) => (0, 0, "none") }

  /** Real video header decode for containers ImageIO can enumerate
    * (animated GIF in a stock JDK): (width, height, TRUE frame count).
    * Width/height are the LOGICAL SCREEN when declared — an inter-frame-
    * optimized GIF stores later frames as changed-rect patches, whose
    * raster dims are not the video's. getNumImages(true) walks every
    * frame block — exact, at the cost of reading the stream once; that
    * is the point of a header decode. */
  private[graft] def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Int)] =
    withFrameReader(payload) { r =>
      val n = r.getNumImages(true)
      if (n <= 0) None
      else {
        val (w, h) = logicalScreen(r).getOrElse((r.getWidth(0), r.getHeight(0)))
        Some((w, h, n))
      }
    }

  /** Real frame extraction for multi-frame ImageIO containers: up to `n`
    * evenly spaced frames, each re-encoded as a standalone PNG (the
    * interchange shape a downstream vision model consumes). Frames are
    * COMPOSITED, not raw-stored rasters: an optimized GIF's later frames
    * are changed-rect patches at an (x, y) offset, so each sampled frame
    * is drawn onto a running logical-screen canvas honoring the prior
    * frames' placement and disposal (none / restoreToBackgroundColor /
    * restoreToPrevious) — every emitted PNG has the video's dims and the
    * fully-composed pixels a vision model expects. None when the payload
    * is not a decodable multi-frame container. */
  private[graft] def videoFrames(payload: Array[Byte], n: Int): Option[Seq[Array[Byte]]] =
    withFrameReader(payload) { r =>
      val total = r.getNumImages(true)
      if (total <= 0 || n <= 0) None
      else {
        val k = math.min(n, total)
        val wanted = (0 until k).map(i => (i.toLong * total / k).toInt)
        val wantedSet = wanted.toSet
        val (cw, ch) = logicalScreen(r).getOrElse((r.getWidth(0), r.getHeight(0)))
        val canvas = new java.awt.image.BufferedImage(
          cw, ch, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        def snapshot(): java.awt.image.BufferedImage = {
          val c = new java.awt.image.BufferedImage(cw, ch, canvas.getType)
          c.createGraphics().drawImage(canvas, 0, 0, null)
          c
        }
        val captured = scala.collection.mutable.Map.empty[Int, Array[Byte]]
        try {
          (0 to wanted.last).foreach { i =>
            val (x, y, disposal) = frameMeta(r, i)
            val before =
              if (disposal == "restoreToPrevious") Some(snapshot()) else None
            val img = r.read(i)
            g.drawImage(img, x, y, null)
            if (wantedSet(i)) {
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(snapshot(), "png", out)
              captured(i) = out.toByteArray
            }
            // disposal prepares the canvas for the NEXT frame
            disposal match {
              case "restoreToBackgroundColor" =>
                g.setComposite(java.awt.AlphaComposite.Clear)
                g.fillRect(x, y, img.getWidth, img.getHeight)
                g.setComposite(java.awt.AlphaComposite.SrcOver)
              case "restoreToPrevious" =>
                before.foreach { b =>
                  g.setComposite(java.awt.AlphaComposite.Src)
                  g.drawImage(b, 0, 0, null)
                  g.setComposite(java.awt.AlphaComposite.SrcOver)
                }
              case _ => ()
            }
          }
        } finally g.dispose()
        Some(wanted.map(captured))
      }
    }

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

  /** REAL audio signal features from decoded PCM: [rms, zero-crossing
    * rate, peak amplitude], each in [0, 1]. The payload is decoded to
    * 16-bit signed PCM through javax.sound.sampled (WAV/AIFF/AU), and the
    * stats are exact over every sample: RMS and peak over the full
    * stream, ZCR counted per channel (interleaving-aware) and normalized
    * by per-channel sample transitions. None when the JDK cannot decode
    * the payload to PCM — the caller falls back to the stub, mirroring
    * [[decodeAudio]]'s real/stub split. These are the quality-gating
    * signals an audio corpus pipeline filters on (silence → rms ~ 0,
    * clipping → peak = 1, noise → high zcr); a real embedding model
    * replaces them by swapping this function, not the plumbing. */
  private[graft] def audioSignalFeatures(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val base = ais0.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          2 * base.getChannels, base.getSampleRate, false)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais0)
        // closing the converted stream also closes ais0 underneath, but
        // the decoder chain can allocate its own resources — close BOTH.
        val bytes = try ais.readAllBytes() finally ais.close()
        val ch = math.max(target.getChannels, 1)
        val nSamples = bytes.length / 2
        if (nSamples == 0) None
        else {
          var i = 0
          var j = 0
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0L
          val prevSign = new Array[Int](ch)
          while (i + 1 < bytes.length) {
            val s = (((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort
            val v = s / 32768.0
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            val c = j % ch
            val sign = java.lang.Integer.signum(s.toInt)
            if (sign != 0) {
              if (prevSign(c) != 0 && sign != prevSign(c)) crossings += 1
              prevSign(c) = sign
            }
            i += 2
            j += 1
          }
          val transitions = math.max(nSamples - ch, 1)
          Some(Array(
            math.sqrt(sumSq / nSamples).toFloat,
            (crossings.toDouble / transitions).toFloat,
            peak.toFloat))
        }
      } finally ais0.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image signal features from decoded pixels: [width, height,
    * mean luminance, luminance std] with luminance = Rec.601
    * (0.299 R + 0.587 G + 0.114 B) / 255 per pixel and a population std
    * — the blur/blank/exposure gating stats an image corpus pipeline
    * filters on. None when ImageIO cannot decode (caller stubs). */
  private[graft] def imageSignalFeatures(payload: Array[Byte]): Option[Array[Float]] =
    decodeImagePixels(payload).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var sumSq = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)) / 255.0
          sum += lum
          sumSq += lum * lum
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val mean = sum / n
      val varPop = math.max(sumSq / n - mean * mean, 0.0)
      Array(w.toFloat, h.toFloat, mean.toFloat, math.sqrt(varPop).toFloat)
    }

  private def decodeImagePixels(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

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
    * decode for real through ImageIO, audio through javax.sound.sampled,
    * video through multi-frame ImageIO (animated GIF); payloads the real
    * decoders cannot parse (synthetic fixtures, compressed containers)
    * fall back to the deterministic stub. */
  def decode(assets: Dataset[MediaAsset]): Dataset[MediaInfo] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // once per partition: ImageIO plugin scanning is registry-global
      // and lazy; touching it here keeps per-row work pure decode (the
      // same slot where a heavy AV codec would initialize)
      javax.imageio.ImageIO.getUseCache
      it.map(decodeInfo)
    }
  }

  /** One asset's decoded header — the per-row kernel of [[decode]],
    * shared with [[mediaProbeQuery]]'s single-pass report so the two
    * cannot drift. */
  private[graft] def decodeInfo(a: MediaAsset): MediaInfo = {
    val real = a.kind match {
      case "image" => decodeImage(a.payload)
      case "audio" => decodeAudio(a.payload)
      case "video" => decodeVideo(a.payload)
      case _ => None
    }
    val (w, h, f) = real.getOrElse(decodeStub(a.kind, a.payload))
    MediaInfo(a.asset_id, a.kind, a.payload.length, w, h, f)
  }

  /** Feature extraction. Payloads the JDK can genuinely decode get REAL
    * signal features — audio: [rms, zcr, peak] from the full PCM stream;
    * image: [width, height, mean luminance, luminance std] from the
    * pixels — written into the leading dims of a fixed-width vector
    * (trailing dims zero, so the schema and every downstream cosine/ANN
    * operator are unchanged when a real embedding model replaces the
    * signal stats). Everything else falls back to the deterministic
    * stub, mirroring [[decode]]'s real/stub split. */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 64): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val real = a.kind match {
          case "audio" => audioSignalFeatures(a.payload)
          case "image" => imageSignalFeatures(a.payload)
          case _ => None
        }
        val feat = real match {
          case Some(sig) =>
            val out = new Array[Float](dim)
            sig.copyToArray(out, 0, math.min(sig.length, dim))
            out
          case None => featureStub(a.payload, dim)
        }
        MediaFeature(a.asset_id, a.kind, feat)
      }
    }
  }

  /** Sample up to n evenly spaced frames. For `kind="video"` payloads a
    * multi-frame ImageIO reader recognizes (animated GIF), the frames
    * are REAL: decoded pixels re-encoded as standalone PNGs. Everything
    * else falls back to evenly spaced payload slices (STUB for codecs
    * not in this container; the explode shape and per-frame rows are
    * identical either way, so swapping a real codec in changes bytes,
    * not plans). */
  def frameSample(assets: Dataset[MediaAsset], n: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap(a =>
      sampleFrames(a, n).iterator.map { case (i, b) => Frame(a.asset_id, i, b) })
  }

  /** One asset's sampled frames — the per-row kernel of [[frameSample]],
    * shared with [[mediaProbeQuery]]'s single-pass report so the two
    * cannot drift. */
  private[graft] def sampleFrames(a: MediaAsset, n: Int): Seq[(Int, Array[Byte])] = {
    val real = if (a.kind == "video") videoFrames(a.payload, n) else None
    real match {
      case Some(frames) => frames.zipWithIndex.map { case (b, i) => (i, b) }
      case None =>
        val len = a.payload.length
        if (len == 0) Seq.empty
        else {
          val k = math.min(n, len)
          (0 until k).map { i =>
            val from = (i.toLong * len / k).toInt
            val until = ((i + 1).toLong * len / k).toInt
            (i, java.util.Arrays.copyOfRange(a.payload, from, until))
          }
        }
    }
  }

  /** x51: the multimodal pipeline as a driver-checkable query — REAL
    * decodes of the four committed fixtures (PNG, WAV, animated GIF,
    * inter-frame-optimized GIF) unioned with synthetic payloads built
    * from the documents table, through [[decode]] and [[frameSample]].
    * Output is deterministic integers only (dims, frame counts, byte
    * sizes), so the row set is stable; rows-only at the oracle gate
    * (DuckDB cannot decode media), with the pixel/PCM-level assertions
    * in the Multimodal specs. */
  def mediaProbeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def bytes(p: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val fixtures = spark.createDataset(Seq(
      MediaAsset(9000001L, "image", bytes(graft.Fixtures.tinyPng),
        Map("origin" -> "fixture")),
      MediaAsset(9000002L, "audio", bytes(graft.Fixtures.tinyWav),
        Map("origin" -> "fixture")),
      MediaAsset(9000003L, "video", bytes(graft.Fixtures.tinyGif),
        Map("origin" -> "fixture")),
      MediaAsset(9000004L, "video", bytes(graft.Fixtures.tinyGifPatch),
        Map("origin" -> "fixture"))))
    val synth = syntheticAssets(spark,
      graft.core.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") < 100), "doc_id", "text")
    val assets = fixtures.unionByName(synth)
    // ONE pass over the assets: decode and frame-sample per asset inside
    // a single mapPartitions — referencing `assets` from two operators
    // would run the documents scan + payload build once per reference
    // (Catalyst does not dedupe a multiply-referenced subtree)
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.getUseCache // once-per-partition decoder touch
      it.map { a =>
        val info = decodeInfo(a)
        val frames = sampleFrames(a, 4)
        (info.asset_id, info.kind, info.byte_size, info.width, info.height,
          info.n_frames, frames.length.toLong,
          frames.map(_._2.length.toLong).sum)
      }
    }.toDF("asset_id", "kind", "byte_size", "width", "height", "n_frames",
        "n_sampled", "sampled_bytes")
      .orderBy(col("asset_id"))
  }

  // ------------------------------------------------ resize (x129) ----

  /** One resized image: PNG bytes of the output raster plus a rolling
    * hash over its ARGB ints (row-major, base 31 mod 2^31−1 — the x11
    * fingerprint arithmetic on pixels), so a spec can pin the exact
    * pixel content without a golden blob. `real=false` marks payloads
    * ImageIO could not decode (stub: empty bytes, hash of the payload
    * instead — plans and schema identical either way). */
  case class Resized(asset_id: Long, kind: String, out_w: Int, out_h: Int,
                     real: Boolean, px_hash: Long, png: Array[Byte])

  /** REAL nearest-neighbor resample of a decoded raster: source index
    * sx = ⌊x·w/ow⌋, sy = ⌊y·h/oh⌋ — pure integer math, so the output
    * raster is bit-deterministic for a given decode (no interpolation,
    * no float rounding). The standard thumbnail/preprocess step before
    * a vision encoder with a fixed input size; swapping in area-average
    * or a GPU kernel changes this function, not the plumbing. */
  private[graft] def resizeNearest(img: java.awt.image.BufferedImage,
                                   ow: Int, oh: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / ow).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  private[graft] def pixelHash(img: java.awt.image.BufferedImage): Long = {
    var acc = 7L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        acc = (acc * 31 + (img.getRGB(x, y) & 0xffffffffL)) % 2147483647L
        x += 1
      }
      y += 1
    }
    acc
  }

  private[graft] def payloadHash(payload: Array[Byte]): Long = {
    var acc = 7L
    var i = 0
    while (i < payload.length) {
      acc = (acc * 31 + (payload(i) & 0xff)) % 2147483647L
      i += 1
    }
    acc
  }

  /** Resize every decodable image asset to a fixed (ow, oh) — the
    * vision-encoder preprocessing stage, completing the
    * decode / feature-extract / frame-sample / RESIZE quartet.
    * mapPartitions (the [[decode]] batch shape); undecodable payloads
    * keep their row with `real=false` and a payload hash, so the
    * output is total over the input and the quarantine leg is a
    * filter. */
  def resize(assets: Dataset[MediaAsset], ow: Int, oh: Int): Dataset[Resized] = {
    require(ow > 0 && oh > 0, s"resize: ${ow}x$oh")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.getUseCache
      it.map { a =>
        decodeImagePixels(a.payload) match {
          case Some(img) =>
            val r = resizeNearest(img, ow, oh)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(r, "png", bos)
            Resized(a.asset_id, a.kind, ow, oh, real = true,
              pixelHash(r), bos.toByteArray)
          case None =>
            Resized(a.asset_id, a.kind, ow, oh, real = false,
              payloadHash(a.payload), Array.emptyByteArray)
        }
      }
    }
  }

  /** x129: the resize stage as a driver-checkable query — the committed
    * image fixtures plus synthetic payloads through [[resize]] at 8×8.
    * Deterministic integers only (the PNG bytes stay out of the
    * output: PNG encoding is deflate-parameterized and not pinned
    * cross-JVM; the pixel hash IS pinned because the raster is).
    * Rows-only at the oracle gate (DuckDB cannot decode), pixel-exact
    * assertions in MultimodalSpec. */
  def mediaResizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def bytes(p: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val fixtures = spark.createDataset(Seq(
      MediaAsset(9000001L, "image", bytes(graft.Fixtures.tinyPng),
        Map("origin" -> "fixture")),
      MediaAsset(9000003L, "video", bytes(graft.Fixtures.tinyGif),
        Map("origin" -> "fixture"))))
    val synth = syntheticAssets(spark,
      graft.core.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") < 100), "doc_id", "text")
    resize(fixtures.unionByName(synth), 8, 8)
      .select(col("asset_id"), col("kind"), col("out_w"), col("out_h"),
        col("real"), col("px_hash"))
      .orderBy(col("asset_id"))
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
