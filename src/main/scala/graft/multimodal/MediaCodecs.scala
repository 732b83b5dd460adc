package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioInputStream, AudioSystem}

/** Real media codecs over the JDK's built-in decoders — no external
  * libraries: `javax.imageio` reads PNG/JPEG/BMP/GIF/WBMP and
  * `javax.sound.sampled` reads WAV/AIFF/AU PCM. Video has no JDK codec,
  * so frame decode stays a declared stub ([[Multimodal.decodeStub]]);
  * everything else here decodes actual bytes.
  *
  * All functions are executor-side pure (no shared mutable state):
  * ImageIO's disk cache is disabled per call so partitions never
  * contend on temp files. */
object MediaCodecs {

  // AudioSystem.getAudioInputStream / AudioSystem.write funnel every
  // call through a synchronized JDK provider cache — at 32 decode
  // threads the monitor serializes the whole partition (measured 23×
  // per-clip degradation, 290 µs → 6.8 ms). The SPI itself is public:
  // resolve the installed readers/writers ONCE per JVM and call them
  // directly. The provider instances are stateless (every method takes
  // its own stream), so sharing across executor threads is safe.
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }
  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Preference rank within a container family: the plain-PCM reader
    * first (our corpus), then the float/extensible variants. */
  private val readerRank = Map(
    "WaveFileReader" -> 0, "WaveFloatFileReader" -> 1,
    "WaveExtensibleFileReader" -> 2)

  /** Lock-free analogue of `AudioSystem.getAudioInputStream(stream)`.
    * Readers are routed by container magic BEFORE probing: a failed
    * probe costs a filled-in `UnsupportedAudioFileException` (measured
    * ~3 ms-thread under 32 decode threads — 80× the successful read),
    * so the wrong-format readers must never see the common case. */
  private def openAudio(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    val magic = if (bytes.length >= 4)
      new String(bytes, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1) else ""
    val family = magic match {
      case "RIFF" => "Wave"
      case "FORM" => "Aiff"
      case ".snd" => "Au"
      case _ => ""
    }
    val preferred = audioReaders
      .filter(_.getClass.getSimpleName.startsWith(family))
      .sortBy(r => readerRank.getOrElse(r.getClass.getSimpleName, 9))
    val candidates = (preferred ++ audioReaders.filterNot(preferred.contains)).iterator
    while (candidates.hasNext) {
      val r = candidates.next()
      try return Some(r.getAudioInputStream(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => () }
    }
    None
  }

  /** Lock-free analogue of `AudioSystem.write(ais, WAVE, out)`. */
  def writeWav(ais: AudioInputStream, out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(t, ais)) match {
      case Some(w) => w.write(ais, t, out)
      case None => throw new IllegalStateException("no WAV writer installed")
    }
  }

  final case class ImageInfo(width: Int, height: Int,
      lumaHistogram: Array[Double], meanLuma: Double)

  final case class AudioInfo(sampleRate: Int, channels: Int, frames: Long,
      durationS: Double, rms: Double, peak: Double)

  /** Decode an encoded image (PNG/JPEG/BMP/GIF). Returns None for bytes
    * no installed reader accepts — a corrupt cell must degrade to a null
    * row, not fail the partition. */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      // ImageIO.read closes the stream it wraps — no finally needed
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Double](8)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 integer luma
            val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(luma >> 5) += 1.0
            sum += luma
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        Some(ImageInfo(w, h, hist.map(_ / n), sum / n))
      }
    }
  }

  /** Re-encode an image resized to `w`×`h` (PNG out). Bilinear-quality
    * Graphics2D scale — the real resize a training pipeline runs before
    * feature extraction. None when the input doesn't decode. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"bad target size ${w}x$h")
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    if (src == null) None
    else {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      Some(out.toByteArray)
    }
  }

  /** 64-bit perceptual difference hash (dHash) of an encoded image:
    * decode, area-average luma to a 9×8 grid (integer block boundaries —
    * deterministic, no resampling-kernel drift), then one bit per
    * horizontally adjacent cell pair (left < right). Near-duplicate
    * images (re-encodes, small edits, minor brightness shifts) land
    * within a few bits; unrelated images differ in ~32. None when the
    * bytes don't decode. */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w < 9 || h < 8) return None
      val grid = Array.ofDim[Double](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                (rgb & 0xFF) * 114) / 1000
              x += 1
            }
            y += 1
          }
          grid(gy)(gx) = sum.toDouble / ((y1 - y0) * (x1 - x0))
          gx += 1
        }
        gy += 1
      }
      var sig = 0L
      var i = 0
      while (i < 64) {
        val (gy, gx) = (i / 8, i % 8)
        if (grid(gy)(gx) < grid(gy)(gx + 1)) sig |= 1L << i
        i += 1
      }
      Some(sig)
    }
  }

  /** 64-bit audio energy-envelope hash ("eHash", the audio analogue of
    * [[dHash64]]): decode the container to PCM, split the signal into 65
    * equal windows, take each window's energy (sum of squared samples —
    * exact integer math over the decoded 16-bit PCM, so the hash is
    * bit-stable across encode/decode round trips), then one bit per
    * adjacent window pair (left < right). Invariant to uniform gain
    * (monotone), sensitive to envelope edits; clips shorter than 65
    * samples don't hash. */
  def eHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    openAudio(bytes).flatMap { ais =>
      scala.util.Try {
        try {
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        if (fmt.getSampleSizeInBits != 16) return None
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val sb = java.nio.ByteBuffer.wrap(data).order(order).asShortBuffer()
        val n = sb.remaining()
        if (n < 65) return None
        val energy = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val i0 = w * n / 65; val i1 = (w + 1) * n / 65
          var e = 0L
          var i = i0
          while (i < i1) {
            val v = sb.get(i).toLong
            e += v * v
            i += 1
          }
          // normalize by window length so the integer boundaries'
          // ±1-sample wobble can't masquerade as an energy step
          energy(w) = e / (i1 - i0)
          w += 1
        }
        var sig = 0L
        var i = 0
        while (i < 64) {
          if (energy(i) < energy(i + 1)) sig |= 1L << i
          i += 1
        }
          Some(sig)
        } finally ais.close()
      }.toOption.flatten
    }
  }

  /** Decode a WAV/AIFF/AU container to PCM stats: sample rate, channels,
    * frame count, duration, RMS and peak of the normalized signal
    * (16-bit PCM; 8-bit falls back to byte-domain). None for bytes the
    * audio system can't read. */
  def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] = {
    if (bytes == null || bytes.isEmpty) return None
    openAudio(bytes).flatMap { ais => scala.util.Try {
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val data = ais.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        var sumSq = 0.0
        var peak = 0.0
        var n = 0
        if (bits == 16) {
          val order =
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN
          val sb = java.nio.ByteBuffer.wrap(data).order(order).asShortBuffer()
          n = sb.remaining()
          var i = 0
          while (i < n) {
            val v = sb.get(i) / 32768.0
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
        } else {
          n = data.length
          var i = 0
          while (i < n) {
            val v = ((data(i) & 0xFF) - 128) / 128.0
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
        }
        AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels, frames,
          if (fmt.getSampleRate > 0) frames / fmt.getSampleRate.toDouble else 0.0,
          if (n == 0) 0.0 else math.sqrt(sumSq / n), peak)
      } finally ais.close()
    }.toOption }
  }

  // ------------------------------------------ MJPEG-in-AVI video codec

  /** The JDK ships no general video codec — but MJPEG-in-AVI needs
    * none: AVI is a RIFF container (PUBLIC spec — the same chunk
    * grammar as the WAV files above) whose '00dc' chunks are plain
    * JPEG frames, and JPEG decode is ImageIO. So ONE real video path
    * exists dependency-free, exactly as WAV is the real audio path;
    * every other video container stays the declared stub.
    *
    * Container layout written/read here:
    * {{{
    * RIFF <sz> 'AVI '
    *   LIST <sz> 'hdrl'
    *     'avih' <56>   µs/frame@0, totalFrames@16, width@32, height@36
    *     LIST <sz> 'strl'
    *       'strh' <56> 'vids'/'MJPG', scale@20=1, rate@24=fps, length@32
    *       'strf' <40> BITMAPINFOHEADER ('MJPG')
    *   LIST <sz> 'movi'
    *     '00dc' <sz> <jpeg bytes>   (chunks pad to even length)
    * }}} */
  final case class VideoInfo(width: Int, height: Int, frames: Int,
      fps: Double, durationS: Double)

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  private def chunk(out: ByteArrayOutputStream, id: String,
      payload: Array[Byte]): Unit = {
    cc(out, id); le32(out, payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0) // RIFF even padding
  }

  /** Encode frames as an MJPEG AVI. Deterministic given the frames. */
  def writeMjpegAvi(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "frames and fps required")
    val (w0, h0) = (frames.head.getWidth, frames.head.getHeight)
    val jpegs = frames.map { f =>
      val o = new ByteArrayOutputStream(); ImageIO.write(f, "jpg", o); o.toByteArray
    }
    def fixed(n: Int)(fill: ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new ByteArrayOutputStream(); fill(o)
      val b = o.toByteArray
      java.util.Arrays.copyOf(b, n) // zero-pad reserved tail fields
    }
    val avih = fixed(56) { o =>
      le32(o, 1000000 / fps); le32(o, 0); le32(o, 0); le32(o, 0)
      le32(o, jpegs.size) // dwTotalFrames @16
      le32(o, 0); le32(o, 1); le32(o, 0)
      le32(o, w0); le32(o, h0) // @32, @36
    }
    val strh = fixed(56) { o =>
      cc(o, "vids"); cc(o, "MJPG")
      le32(o, 0); le32(o, 0); le32(o, 0)
      le32(o, 1) // dwScale @20
      le32(o, fps) // dwRate @24
      le32(o, 0)
      le32(o, jpegs.size) // dwLength @32
    }
    val strf = fixed(40) { o =>
      le32(o, 40); le32(o, w0); le32(o, h0)
      o.write(1); o.write(0); o.write(24); o.write(0) // planes, bitcount
      cc(o, "MJPG")
      le32(o, w0 * h0 * 3)
    }
    def list(typ: String)(fill: ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new ByteArrayOutputStream(); cc(o, typ); fill(o); o.toByteArray
    }
    val strl = list("strl") { o => chunk(o, "strh", strh); chunk(o, "strf", strf) }
    val hdrl = list("hdrl") { o => chunk(o, "avih", avih); chunk(o, "LIST", strl) }
    val movi = list("movi") { o => jpegs.foreach(j => chunk(o, "00dc", j)) }
    val riff = list("AVI ") { o => chunk(o, "LIST", hdrl); chunk(o, "LIST", movi) }
    val out = new ByteArrayOutputStream()
    chunk(out, "RIFF", riff)
    out.toByteArray
  }

  private def rdLe32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def rdCc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk every chunk in [lo, hi), calling `f(id, payloadLo, payloadLen)`;
    * recurses into LISTs (passing the list type as the id for leaf-less
    * lists' children discovery). Malformed sizes end the walk — degrade,
    * never throw. */
  private def walk(b: Array[Byte], lo: Int, hi: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var i = lo
    while (i + 8 <= hi) {
      val id = rdCc(b, i)
      val len = rdLe32(b, i + 4)
      // overflow-free bound: hi - i - 8 cannot overflow (i + 8 <= hi),
      // while `i + 8 + len > hi` wraps negative for a crafted len near
      // Int.MaxValue and would walk past the array
      if (len < 0 || len > hi - i - 8) return
      if (id == "LIST" && len >= 4) walk(b, i + 12, i + 8 + len)(f)
      else f(id, i + 8, len)
      i += 8 + len + (len & 1)
    }
  }

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && rdCc(b, 0) == "RIFF" && rdCc(b, 8) == "AVI "

  /** Header-only video info (no frame decode). None for non-AVI bytes. */
  def videoInfo(bytes: Array[Byte]): Option[VideoInfo] = {
    if (!isAvi(bytes)) return None
    var info: Option[VideoInfo] = None
    walk(bytes, 12, bytes.length) { (id, lo, len) =>
      if (id == "avih" && len >= 40 && info.isEmpty) {
        val usPerFrame = rdLe32(bytes, lo)
        val frames = rdLe32(bytes, lo + 16)
        val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
        info = Some(VideoInfo(rdLe32(bytes, lo + 32), rdLe32(bytes, lo + 36),
          frames, fps, if (fps > 0) frames / fps else 0.0))
      }
    }
    info
  }

  /** The raw JPEG payloads of the video's frame chunks ('00dc'/'00db'),
    * in stream order — frame SAMPLING reads only the chunks it keeps,
    * never decoding the rest. */
  def videoFrameChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (!isAvi(bytes)) return Nil
    val out = Seq.newBuilder[Array[Byte]]
    walk(bytes, 12, bytes.length) { (id, lo, len) =>
      if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")))
        out += java.util.Arrays.copyOfRange(bytes, lo, lo + len)
    }
    out.result()
  }

  /** Full decode summary: header info + the mean luma histogram over
    * up to `sampleFrames` evenly-spaced decoded frames. None for
    * non-AVI bytes or an AVI whose sampled frames all fail JPEG
    * decode. */
  def decodeVideo(bytes: Array[Byte], sampleFrames: Int = 3)
      : Option[(VideoInfo, Array[Double])] = {
    val info = videoInfo(bytes).getOrElse(return None)
    val chunks = videoFrameChunks(bytes)
    if (chunks.isEmpty) return None
    val step = math.max(1, chunks.size / math.max(1, sampleFrames))
    val hists = chunks.indices.by(step).take(sampleFrames).toSeq
      .flatMap(i => decodeImage(chunks(i))).map(_.lumaHistogram)
    if (hists.isEmpty) None
    else {
      val avg = new Array[Double](8)
      hists.foreach { h => var i = 0; while (i < 8) { avg(i) += h(i); i += 1 } }
      Some((info, avg.map(_ / hists.size)))
    }
  }

  /** 64-bit perceptual hash of a video: the [[dHash64]] of its MIDDLE
    * frame — re-encodes and minor per-frame edits land within a few
    * bits, unrelated clips differ in ~32 (the m03/m04 signature
    * contract, extended to the video modality). */
  def vHash64(bytes: Array[Byte]): Option[Long] = {
    val chunks = videoFrameChunks(bytes)
    if (chunks.isEmpty) None else dHash64(chunks(chunks.size / 2))
  }
}
