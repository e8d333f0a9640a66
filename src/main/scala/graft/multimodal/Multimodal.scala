package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata, partition-wise batch decode / feature-extract /
  * frame-sample plumbing.
  *
  * ALL THREE modalities decode for real with JDK-only codecs: IMAGE via
  * `javax.imageio` (PNG/BMP/GIF/JPEG — [[ImageIoDecoder]], dimensions +
  * grayscale histogram from actual pixels); AUDIO via
  * `javax.sound.sampled` (WAV/AIFF/AU — [[WavDecoder]], sample rate /
  * frame count / amplitude histogram from actual PCM); VIDEO via
  * [[AviDecoder]] — an MJPEG-in-AVI RIFF container parser (AVI framing
  * is plain RIFF chunk arithmetic; the per-frame payloads are JPEGs,
  * which ImageIO decodes), yielding frame count, fps and frame-0
  * dimensions/histogram from the actual bitstream. Payloads no codec
  * can parse map to the [[Quarantine]] sentinel (width/height -1,
  * zero frames) so the decode stays a total function — a 100 TB decode
  * job must quarantine, not crash on or invent data for, the one
  * corrupt file in a billion. Everything around the kernels — the
  * schema, the typed Dataset surface, the mapPartitions batch shape,
  * and the pure-Column metadata operators — is the Spark plumbing any
  * production codec (JNI, Python worker via Arrow batches) plugs into,
  * partition-by-partition.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("path", StringType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("size_bytes", LongType),
      StructField("duration_ms", LongType))))))

  final case class MediaMeta(format: String, size_bytes: Long, duration_ms: Long)
  final case class MediaFile(
      media_id: Long, path: String, media_type: String,
      content: Array[Byte], meta: MediaMeta)
  final case class Decoded(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** Decode kernel signature a real codec implements. */
  type Decoder = MediaFile => Decoded

  /** ImageIO's default stream cache is FILE-backed: every encode/decode
    * pays a temp-file create/delete plus a synchronized cache-dir hit,
    * which measurably serializes 32 concurrent codec tasks (observed in
    * BENCH: CPU inflation at high parallelism). Byte-array codecs never
    * want that — switch the JVM to in-memory stream caching once.
    * Referenced at the top of every partition kernel so the setting
    * lands on each executor JVM before its first codec call.
    */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** r14: the audio analogue of the JPEG-writer cache below.
    * `AudioSystem.getAudioInputStream` / `AudioSystem.write` re-run a
    * SYNCHRONIZED ServiceLoader provider scan on EVERY call
    * (`JDK13Services.getProviders` re-instantiates the providers under a
    * global lock), which serializes all 32 concurrent codec tasks
    * JVM-wide — tdp_audio_fingerprint measured wall ~= executor-CPU
    * (parallelism ~1) despite an up-front repartition. Resolving the
    * public SPI providers ONCE and dispatching over the cached list is
    * the identical lookup minus the lock; the providers themselves
    * (WaveFileReader etc.) are stateless and thread-safe. Only the WAV
    * reader accepts WAV bytes, so provider order cannot change results.
    */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
  }

  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toList
  }

  /** Decode via the cached readers — same dispatch contract as
    * `AudioSystem.getAudioInputStream(stream)`: first provider that does
    * not reject the bytes wins; all rejecting = UnsupportedAudioFile.
    */
  private def readAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no cached provider accepts the stream")
  }

  /** Encode via the cached writers — same dispatch contract as
    * `AudioSystem.write(ais, WAVE, out)`.
    */
  private def writeWav(
      ais: javax.sound.sampled.AudioInputStream,
      out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(t, ais)) match {
      case Some(w) => w.write(ais, t, out)
      case None => // unreachable on a stock JDK; keep the public fallback
        javax.sound.sampled.AudioSystem.write(ais, t, out)
    }
  }

  /** Per-thread reusable JPEG writer: `ImageIO.write()` re-runs the
    * provider-registry scan and allocates a fresh writer per call —
    * measurable when the payloads are 16–64 px MJPEG frames encoded
    * hundreds of thousands of times per bench pass (synthAvi emits one
    * JPEG per frame per doc). One writer per codec thread amortizes the
    * lookup; writers are not thread-safe, so ThreadLocal is the correct
    * sharing granularity.
    */
  private val jpegWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
  }

  /** Encode with the thread's reused writer (bit-identical output to
    * `ImageIO.write(img, "jpg", out)` — same provider, default params).
    */
  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    imageIoInMemory
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val w = jpegWriter.get()
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), null)
    ios.flush()
    out.toByteArray
  }

  /** Quarantine sentinel for payloads no codec can parse: negative
    * dimensions, zero frames, all-zero features. A total decode function
    * must emit SOMETHING for corrupt bytes, and an honest "unparseable"
    * marker (filterable downstream with `width < 0`) beats inventing
    * deterministic pseudo-content.
    */
  def Quarantine(f: MediaFile): Decoded =
    Decoded(f.media_id, -1, -1, 0, new Array[Float](8))

  /** REAL image decode kernel via the JDK's `javax.imageio` — PNG, BMP,
    * GIF and JPEG parse without any external library. Width/height come
    * from the decoded raster and `features` is the 8-bin normalized
    * grayscale histogram of the pixels. Non-image media and payloads
    * ImageIO cannot parse map to the [[Quarantine]] sentinel so the kernel is
    * total (a 100 TB decode job must quarantine, not crash on, the one
    * corrupt file in a billion).
    */
  val ImageIoDecoder: Decoder = { f =>
    val img =
      if (f.media_type != "image") null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.content))
        catch { case _: Throwable => null }
    if (img == null) Quarantine(f)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          hist(g >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Decoded(f.media_id, w, h, 1, hist.map(c => c / n))
    }
  }

  /** REAL audio decode kernel via the JDK's `javax.sound.sampled` — WAV,
    * AIFF and AU parse without any external library. The Decoded mapping
    * for audio: `width` = sample rate (Hz), `height` = bits per sample,
    * `n_frames` = PCM frame count, `features` = 8-bin normalized
    * histogram of |sample| (16-bit full scale split into 4096-wide bins).
    * Non-audio media and payloads AudioSystem cannot parse fall back to
    * the [[Quarantine]] sentinel so the kernel stays a total function.
    */
  val WavDecoder: Decoder = { f =>
    val ais =
      if (f.media_type != "audio") null
      else
        try readAudio(f.content)
        catch { case _: Throwable => null }
    if (ais == null) Quarantine(f)
    else {
      // The whole body is guarded: a header can declare NOT_SPECIFIED (-1)
      // or more frames than the payload holds, and the decode must stay a
      // total function — clamp to what the bytes actually contain and
      // quarantine anything that still throws.
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          Quarantine(f) // 16-bit signed PCM only; re-encode upstream otherwise
        else {
          val bytes = ais.readAllBytes()
          val fs = fmt.getFrameSize // bytes per frame (all channels)
          val n = math.max(0L, math.min(ais.getFrameLength,
            if (fs > 0) bytes.length.toLong / fs else 0L)).toInt
          val big = fmt.isBigEndian
          val hist = new Array[Long](8)
          var i = 0
          while (i < n) {
            val off = i * fs // channel 0 of the frame
            val s =
              if (big) (bytes(off).toInt << 8) | (bytes(off + 1) & 0xff)
              else (bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)
            hist(math.min(7, math.abs(s) >> 12)) += 1
            i += 1
          }
          Decoded(f.media_id, fmt.getSampleRate.toInt,
            fmt.getSampleSizeInBits, n,
            hist.map(c => if (n == 0) 0f else c.toFloat / n))
        }
      } catch { case _: Throwable => Quarantine(f) }
    }
  }

  /** Parsed AVI: stream timing from `strh`, frame payloads from `movi`. */
  final case class AviStream(
      scale: Int, rate: Int, declaredFrames: Int, frames: Seq[Array[Byte]])

  /** Minimal RIFF/AVI container walk: `RIFF('AVI ')` wrapping
    * `LIST(hdrl)` (with the `strh` video-stream header carrying
    * dwScale/dwRate/dwLength) and `LIST(movi)` (with one `##dc`
    * compressed-frame chunk per frame). Chunk framing is fourcc +
    * little-endian size + payload + odd-byte pad — pure arithmetic, no
    * codec. Returns null for anything that is not a well-formed AVI.
    */
  def parseAvi(bytes: Array[Byte]): AviStream = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return null
      var scale = 0
      var rate = 0
      var declared = -1
      val frames = Seq.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val cc = fourcc(off)
          val sz = le32(off + 4)
          val body = off + 8
          if (body + sz > end) return
          if (cc == "LIST") walk(body + 4, body + sz) // skip the list type
          else if (cc == "strh" && sz >= 36 && fourcc(body) == "vids") {
            scale = le32(body + 20)
            rate = le32(body + 24)
            declared = le32(body + 32)
          } else if (cc.endsWith("dc"))
            frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
          off = body + sz + (sz & 1) // chunks pad to even offsets
        }
      }
      walk(12, 12 + math.min(le32(4) - 4, bytes.length - 12))
      val fs = frames.result()
      if (rate <= 0 || scale <= 0 || fs.isEmpty) null
      else AviStream(scale, rate, declared, fs)
    } catch { case _: Throwable => null }
  }

  /** REAL video decode kernel: [[parseAvi]] walks the container, ImageIO
    * decodes frame 0's JPEG payload. The Decoded mapping for video:
    * width/height from the DECODED first frame, `n_frames` = movi chunk
    * count, `features` = frame 0's 8-bin grayscale histogram. Non-video
    * media and malformed containers/frames map to [[Quarantine]].
    */
  val AviDecoder: Decoder = { f =>
    val avi = if (f.media_type != "video") null else parseAvi(f.content)
    if (avi == null) Quarantine(f)
    else {
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(avi.frames.head))
        catch { case _: Throwable => null }
      if (img == null) Quarantine(f)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            hist(g >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        Decoded(f.media_id, w, h, avi.frames.length, hist.map(c => c / n))
      }
    }
  }

  /** Media-type dispatch: a real JDK-only codec per modality. */
  val RealDecoder: Decoder = { f =>
    f.media_type match {
      case "image" => ImageIoDecoder(f)
      case "audio" => WavDecoder(f)
      case "video" => AviDecoder(f)
      case _ => Quarantine(f)
    }
  }

  /** Partition-wise batch decode: the hot path stays an iterator pipeline
    * (one decoder instance per partition, no per-row setup), which is the
    * shape a JNI/Arrow-batch decoder needs at 100 TB. All three
    * modalities decode for real ([[ImageIoDecoder]], [[WavDecoder]],
    * [[AviDecoder]]).
    */
  def decodePartitions(
      media: Dataset[MediaFile],
      decoder: Decoder = RealDecoder): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real impl: initialize the codec once here, then stream the batch.
      imageIoInMemory
      it.map(decoder)
    }
  }

  final case class ImageMeta(
      media_id: Long, width: Int, height: Int, mean_gray: Double)

  /** Deterministic solid-gray PNG: dimensions and fill level are pure
    * arithmetic on the id, so an engine that never touches pixels (the
    * DuckDB oracle) can predict exactly what a REAL ImageIO decode of
    * these bytes must return — which is what makes the codec round trip
    * hash-checkable.
    */
  def synthPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 48).toInt
    val h = 16 + ((id * 7) % 48).toInt
    val g = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    java.util.Arrays.fill(img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Per-partition PNG encode -> ImageIO decode round trip: emits the
    * decoded raster's true dimensions and exact mean gray level (integer
    * pixel sums, so bit-stable). PNG is lossless, so the decoded values
    * equal the synthesis arithmetic — the oracle contract of
    * `tdp_image_meta`.
    */
  def pngRoundTripMeta(ids: Dataset[Long]): Dataset[ImageMeta] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(synthPng(id)))
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        ImageMeta(id, w, h, sum.toDouble / (w.toLong * h))
      }
    }
  }

  /** Deterministic TWO-TONE PNG: left half (x < w/2) gray `gl`, right half
    * gray `gr` — all four values pure arithmetic on the id. Unlike the
    * solid [[synthPng]], a resample of this image has a mean that depends
    * on exactly WHICH source pixels the kernel picks, so the resize round
    * trip below is a real pixel-level oracle check, not just a dims check.
    */
  def synthPng2(id: Long): Array[Byte] = {
    val w = 16 + (id % 48).toInt
    val h = 16 + ((id * 7) % 48).toInt
    val gl = (id % 256).toInt
    val gr = ((id * 13 + 31) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val pl = (gl << 16) | (gl << 8) | gl
    val pr = (gr << 16) | (gr << 8) | gr
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        data(row + x) = if (x < w / 2) pl else pr
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL nearest-neighbor resample in pure integer arithmetic
    * (`sx = x * w / nw`, floor division) — every JVM picks the identical
    * source pixel, which is what lets an engine that never touches pixels
    * (the DuckDB oracle) replicate the resampled image's statistics
    * exactly. Images already within `maxSide` pass through untouched.
    */
  def resizeNearest(
      img: java.awt.image.BufferedImage,
      maxSide: Int): java.awt.image.BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val mx = math.max(w, h)
    if (mx <= maxSide) img
    else {
      val nw = math.max(1, w * maxSide / mx)
      val nh = math.max(1, h * maxSide / mx)
      val out = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) {
        val sy = (y.toLong * h / nh).toInt
        var x = 0
        while (x < nw) {
          out.setRGB(x, y, img.getRGB((x.toLong * w / nw).toInt, sy))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  final case class ResizedMeta(
      media_id: Long, width: Int, height: Int,
      target_width: Int, target_height: Int, mean_gray: Double)

  /** Encode -> decode -> nearest-neighbor resize -> pixel-stat round trip,
    * partition-wise: the full image kernel chain (synthesize PNG bytes,
    * ImageIO decode, integer NN resample, exact mean gray of the RESIZED
    * raster). The mean is an integer pixel sum divided once, so the
    * `tdp_image_resize` oracle predicts it bitwise from the synthesis +
    * resample arithmetic alone.
    */
  def resizeRoundTrip(
      ids: Dataset[Long], maxSide: Int = 16): Dataset[ResizedMeta] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(synthPng2(id)))
        val dst = resizeNearest(src, maxSide)
        val nw = dst.getWidth
        val nh = dst.getHeight
        var sum = 0L
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            val p = dst.getRGB(x, y)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        ResizedMeta(id, src.getWidth, src.getHeight, nw, nh,
          sum.toDouble / (nw.toLong * nh))
      }
    }
  }

  /** Deterministic FOUR-QUADRANT PNG: quadrant grays and dimensions are
    * pure arithmetic on the id, giving the perceptual hash genuinely
    * two-dimensional content (the two-tone [[synthPng2]] collapses an
    * 8x8 hash to one row repeated). The parameter periods are chosen so
    * the joint period is lcm(12, 64) = 192: ids 192 apart render the
    * IDENTICAL image, planting exact perceptual clones at every test
    * scale — what the hash's pairing stage exists to find.
    */
  def synthPng4(id: Long): Array[Byte] = {
    val w = 16 + (id % 12).toInt
    val h = 16 + ((id * 7) % 12).toInt
    def g(mul: Long, add: Long): Int = (((id * mul + add) % 64) * 4).toInt
    val gs = Array(g(1, 0), g(13, 31), g(29, 57), g(43, 89))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        val q = (if (y < h / 2) 0 else 2) + (if (x < w / 2) 0 else 1)
        val gq = gs(q)
        data(row + x) = (gq << 16) | (gq << 8) | gq
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class ImagePHash(media_id: Long, phash: Long, n_dark: Int)

  /** Average-hash (aHash) perceptual signature over a REAL ImageIO decode
    * of the quadrant PNGs: NN-resample to 8x8 with the same pure-integer
    * source-pixel rule as [[resizeNearest]] (`sx = x*w/8` floor), then
    * bit (y*8 + x) is set iff the cell is brighter than the 64-cell
    * average — compared as `gray*64 > sum` so no division (or double)
    * enters the signature and a pixel-free engine can replicate every
    * bit. `n_dark` counts unset bits (a brightness-balance diagnostic).
    */
  def pngAHash(ids: Dataset[Long]): Dataset[ImagePHash] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(synthPng4(id)))
        val w = img.getWidth
        val h = img.getHeight
        val cell = new Array[Int](64)
        var sum = 0L
        var y = 0
        while (y < 8) {
          val sy = (y.toLong * h / 8).toInt
          var x = 0
          while (x < 8) {
            val sx = (x.toLong * w / 8).toInt
            val gray = img.getRGB(sx, sy) & 0xff
            cell(y * 8 + x) = gray
            sum += gray
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var dark = 0
        var b = 0
        while (b < 64) {
          if (cell(b).toLong * 64 > sum) hash |= (1L << b) else dark += 1
          b += 1
        }
        ImagePHash(id, hash, dark)
      }
    }
  }

  /** Deterministic 16-bit mono WAV: sample rate, length and every PCM
    * sample are pure arithmetic on the id (`s_i = (i*a + id) mod 8193 -
    * 4096` with `a = 37 + id mod 12`), so an engine that never touches
    * audio bytes (the DuckDB oracle) can predict exactly what a REAL
    * javax.sound decode of these bytes must return — the audio twin of
    * [[synthPng]]. WAV PCM is lossless; the bytes go through a real
    * AudioSystem encode.
    */
  def synthWav(id: Long): Array[Byte] = {
    val sr = 8000 + (id % 5).toInt * 2000
    val n = 400 + ((id * 7) % 1200).toInt
    val a = 37 + (id % 12)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((i * a + id) % 8193L - 4096L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sr.toFloat, 16, 1, true, false) // 16-bit signed mono little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    writeWav(ais, out)
    out.toByteArray
  }

  /** Second WAV synthesis with a SMALL joint parameter period: n has
    * period 8, the slope period 12, the phase period 96 → ids 96 apart
    * produce byte-identical PCM, planting exact audio clones at every
    * test scale (the audio twin of [[synthPng4]]'s 192-period device).
    */
  def synthWav2(id: Long): Array[Byte] = {
    val n = 256 + ((id % 8) * 64).toInt
    val a = 3 + (id % 12)
    val phase = id % 96
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((i * a + phase) % 8193L - 4096L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    writeWav(ais, out)
    out.toByteArray
  }

  final case class AudioPrint(
      media_id: Long, fp: Int, full_hash: Long, n_samples: Long)

  /** Frame-energy audio fingerprint over a REAL javax.sound decode of
    * [[synthWav2]]: the stream splits into 16 frames (integer bounds
    * `f*n/16`), bit f is set iff the frame's summed |sample| exceeds its
    * share of the total (`energy_f * 16 > total`, no division), giving a
    * 16-bit signature for candidate pairing. `full_hash` is the
    * polynomial fold of the raw samples (`h*31 + s + 4096 mod P`) — the
    * exact-verify key: fingerprint matches are candidates, equal full
    * hashes are duplicates. Both are pure integer functions of the
    * decoded PCM, replayable by a byte-free oracle.
    */
  def wavFingerprint(ids: Dataset[Long]): Dataset[AudioPrint] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val ais = readAudio(synthWav2(id))
        val n = ais.getFrameLength.toInt
        val bytes = ais.readAllBytes()
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((bytes(2 * i + 1).toInt << 8) |
            (bytes(2 * i) & 0xff))
          i += 1
        }
        var total = 0L
        val energy = new Array[Long](16)
        var f = 0
        while (f < 16) {
          val lo = f * n / 16
          val hi = (f + 1) * n / 16
          var j = lo
          while (j < hi) {
            energy(f) += math.abs(samples(j))
            j += 1
          }
          total += energy(f)
          f += 1
        }
        var fp = 0
        f = 0
        while (f < 16) {
          if (energy(f) * 16 > total) fp |= (1 << f)
          f += 1
        }
        var h = 0L
        i = 0
        while (i < n) {
          h = (h * 31 + samples(i) + 4096L) % 1000000007L
          i += 1
        }
        AudioPrint(id, fp, h, n.toLong)
      }
    }
  }

  final case class AudioMeta(
      media_id: Long, sample_rate: Long, n_samples: Long,
      duration_ms: Long, rms_milli: Long)

  /** Per-partition WAV encode -> AudioSystem decode round trip: emits the
    * decoded stream's true sample rate, frame count, floor-division
    * duration and RMS amplitude in milli-units. The sum of squares is an
    * exact integer (&le; 1600 * 4096^2 &ll; 2^53) and the one divide/sqrt
    * is IEEE-identical across engines, so `tdp_audio_meta`'s oracle
    * predicts every value bitwise from the synthesis arithmetic — if the
    * encode->decode path corrupted a single sample the hash check fails.
    */
  def wavRoundTripMeta(ids: Dataset[Long]): Dataset[AudioMeta] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val ais = readAudio(synthWav(id))
        val fmt = ais.getFormat
        val sr = fmt.getSampleRate.toLong
        val n = ais.getFrameLength.toInt
        val bytes = ais.readAllBytes()
        var sumSq = 0L
        var i = 0
        while (i < n) {
          val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          sumSq += s.toLong * s
          i += 1
        }
        AudioMeta(id, sr, n.toLong, n.toLong * 1000L / sr,
          math.floor(math.sqrt(sumSq.toDouble / n) * 1000.0).toLong)
      }
    }
  }

  /** Deterministic MJPEG-in-AVI container: frame dimensions, frame count
    * and fps are pure arithmetic on the id (dims follow [[synthPng]]'s
    * formulas), so an engine that never touches the bitstream (the
    * DuckDB oracle) predicts exactly what a REAL container parse +
    * frame-0 decode of these bytes must return — the video twin of
    * [[synthPng]]/[[synthWav]]. The JPEG frame payloads are encoded with
    * the JDK's own ImageIO JPEG writer; JPEG is lossy, so the oracle
    * contract covers the container arithmetic (dims / frames / fps /
    * duration), which survives any codec bit-exactly.
    */
  def synthAvi(id: Long): Array[Byte] = {
    val w = 16 + (id % 48).toInt
    val h = 16 + ((id * 7) % 48).toInt
    val fps = 5 + (id % 6).toInt * 5
    val n = 1 + ((id * 3) % 8).toInt
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
    val avih = Array.concat(
      le32(1000000 / fps), le32(0), le32(0), le32(0), le32(n), le32(0),
      le32(1), le32(0), le32(w), le32(h), le32(0), le32(0), le32(0), le32(0))
    val strh = Array.concat(
      "vids".getBytes("US-ASCII"), "MJPG".getBytes("US-ASCII"),
      le32(0), le32(0), le32(0), le32(1) /* dwScale */ ,
      le32(fps) /* dwRate */ , le32(0), le32(n) /* dwLength */ ,
      le32(0), le32(0), le32(0),
      le32(0), le32((h << 16) | w) /* rcFrame right/bottom */ )
    val strf = Array.concat(
      le32(40), le32(w), le32(h), le32((24 << 16) | 1),
      "MJPG".getBytes("US-ASCII"), le32(w * h * 3),
      le32(0), le32(0), le32(0), le32(0))
    val frames = (0 until n).map { fi =>
      val g = ((id + fi * 17) % 256).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      // Fill through the backing int raster: per-pixel setRGB() runs a
      // colour-model conversion per call — at ~270k frames x ~1600 px
      // per bench pass that conversion dominated the kernel's CPU.
      java.util.Arrays.fill(img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb)
      chunk("00dc", encodeJpeg(img))
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.reduce(_ ++ _))
    "RIFF".getBytes("US-ASCII") ++ le32(4 + hdrl.length + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
  }

  final case class VideoMeta(
      media_id: Long, width: Int, height: Int, n_frames: Int, fps: Int,
      duration_ms: Long)

  /** Per-partition AVI encode -> container parse -> ImageIO frame-0
    * decode round trip: emits the DECODED first frame's true dimensions,
    * the movi chunk count, the stream fps (dwRate/dwScale) and the
    * floor-division duration — all container arithmetic the
    * `tdp_video_meta` oracle predicts exactly. A wrong chunk size, a
    * mis-framed list or a corrupted JPEG payload fails the hash check.
    */
  def aviRoundTripMeta(ids: Dataset[Long]): Dataset[VideoMeta] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val avi = parseAvi(synthAvi(id))
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(avi.frames.head))
        val fps = avi.rate / avi.scale
        VideoMeta(id, img.getWidth, img.getHeight, avi.frames.length, fps,
          avi.frames.length.toLong * 1000L / fps)
      }
    }
  }

  final case class SceneCuts(
      media_id: Long, n_frames: Int, n_cuts: Long, first_cut_frame: Long)

  /** Scene-change detection over the synthesized MJPEG-AVI: decode EVERY
    * frame (not just frame 0), compute each frame's mean luma from the
    * decoded pixels, and flag a cut wherever the frame-to-frame delta
    * exceeds 100 — the standard luma-delta shot detector. The synth's
    * gray ramp g = (id + fi·17) mod 256 makes consecutive deltas either
    * +17 (no cut) or −239 (the mod wrap = the planted scene cut), so the
    * 100 threshold is robust to MJPEG's ±few-LSB solid-frame decode
    * error while the oracle predicts every cut as pure id arithmetic —
    * a mis-decoded frame, a dropped chunk or a broken mean fails the
    * hash. Decode stays at the per-partition codec boundary.
    */
  def aviSceneCuts(ids: Dataset[Long]): Dataset[SceneCuts] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      imageIoInMemory
      it.map { id =>
        val avi = parseAvi(synthAvi(id))
        val means = avi.frames.map { fb =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(fb))
          val w = img.getWidth
          val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            i += 1
          }
          sum.toDouble / (3.0 * px.length)
        }
        var nCuts = 0L
        var firstCut = -1L
        var fi = 1
        while (fi < means.length) {
          if (math.abs(means(fi) - means(fi - 1)) > 100.0) {
            nCuts += 1
            if (firstCut < 0) firstCut = fi.toLong
          }
          fi += 1
        }
        SceneCuts(id, avi.frames.length, nCuts, firstCut)
      }
    }
  }

  /** Metadata-only operators are pure Column expressions — no decode needed,
    * so Catalyst prunes `content` out of the scan entirely.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("media_type").agg(
      count(lit(1)).as("n"),
      sum(col("meta.size_bytes")).as("total_bytes"),
      avg(col("meta.duration_ms")).as("avg_duration_ms"))

  /** Frame sampling plan: every `stride`-th frame index per video, as a
    * generated column (explode of a sequence) — row expansion happens in
    * Spark, only sampled frames would reach the decoder.
    */
  def sampleFrameIndexes(decoded: DataFrame, stride: Int = 30): DataFrame =
    decoded
      .filter(col("n_frames") > 1)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_index"))

  /** Resize spec: target dims preserving aspect ratio — pure arithmetic on
    * decoded metadata (the actual pixel resample belongs in the decoder).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(
      lit(maxSide) / col("width").cast(DoubleType),
      lit(maxSide) / col("height").cast(DoubleType),
      lit(1.0))
    decoded.select(col("media_id"), col("width"), col("height"),
      floor(col("width") * scale).cast(IntegerType).as("target_width"),
      floor(col("height") * scale).cast(IntegerType).as("target_height"))
  }

  /** Embedding-style feature distance on decoded features (cosine), for
    * dedup of near-identical media — same fold pattern as TdpQueries.
    */
  def featureCosine(decoded: DataFrame): DataFrame = {
    val a = decoded.select(col("media_id").as("id_a"), col("features").as("fa"))
    val b = decoded.select(col("media_id").as("id_b"), col("features").as("fb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(fa, fb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("na", expr(
        "sqrt(aggregate(transform(fa, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"))
      .withColumn("nb", expr(
        "sqrt(aggregate(transform(fb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"))
      .select(col("id_a"), col("id_b"),
        (col("dot") / (col("na") * col("nb"))).as("cosine"))
  }
}
