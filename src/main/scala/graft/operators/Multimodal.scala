package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct. Format sniffing and header metadata are REAL, pure-JVM
  * parsers over magic bytes and container headers ([[MediaSniffer]]:
  * JPEG SOF scan, PNG IHDR, GIF logical screen, WAV RIFF/fmt/data,
  * MP4 ftyp/moov/mvhd), and [[Mp4Tracks]] parses full ISO-BMFF sample
  * tables (stsd/stts/stsc/stsz/stco) into real per-sample byte ranges
  * and timestamps — the container half of video frame-sampling. Only
  * the codec DECODE of a located sample remains a clearly-marked stub
  * ([[FakeCodec.frame]]/[[FakeCodec.resize]]) — the container has no
  * codec libraries; the swap-in point is those two functions
  * (JNI/javacv), and the `mapPartitions` batching pattern (init once
  * per partition, emit typed rows) is exactly what a real decoder
  * needs.
  */
object Multimodal {

  val mediaMetaStruct: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", mediaMetaStruct)))

  case class MediaMeta(format: String, width: Option[Int], height: Option[Int],
                       durationMs: Option[Long])

  /** Real magic-byte + header parsers. Pure JVM, zero dependencies. */
  object MediaSniffer {

    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u32le(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def u16le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def ascii(b: Array[Byte], i: Int, n: Int): String =
      if (i + n <= b.length) new String(b, i, n, StandardCharsets.US_ASCII) else ""

    /** JPEG: FF D8, then scan segments for SOF0/1/2 (height, width). */
    def jpeg(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) // EOI / SOS: no SOF seen
          return Some(MediaMeta("jpeg", None, None, None))
        val len = u16(b, i + 2)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          val h = u16(b, i + 5)
          val w = u16(b, i + 7)
          return Some(MediaMeta("jpeg", Some(w), Some(h), None))
        }
        i += 2 + len
      }
      Some(MediaMeta("jpeg", None, None, None))
    }

    /** PNG: 8-byte signature, IHDR width/height big-endian at 16/20. */
    def png(b: Array[Byte]): Option[MediaMeta] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (b.length < 24 || !sig.indices.forall(i => (b(i) & 0xff) == sig(i)))
        return None
      if (ascii(b, 12, 4) != "IHDR") return Some(MediaMeta("png", None, None, None))
      Some(MediaMeta("png", Some(u32(b, 16).toInt), Some(u32(b, 20).toInt), None))
    }

    /** GIF87a/89a: logical screen width/height little-endian at 6/8. */
    def gif(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 10 || ascii(b, 0, 4) != "GIF8") return None
      Some(MediaMeta("gif", Some(u16le(b, 6)), Some(u16le(b, 8)), None))
    }

    /** WAV: RIFF/WAVE; duration = data size over fmt byte-rate. */
    def wav(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 12 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
        return None
      var i = 12
      var byteRate = 0L
      var dataSize = -1L
      var corrupt = false
      while (!corrupt && i + 8 <= b.length && (byteRate == 0L || dataSize < 0)) {
        val id = ascii(b, i, 4)
        val size = u32le(b, i + 4)
        if (id == "fmt " && i + 16 + 8 <= b.length) byteRate = u32le(b, i + 16)
        else if (id == "data") dataSize = size
        // corrupt/adversarial sizes must not stall the walk (size is u32;
        // a huge value overflows toInt negative and would never advance)
        if (size < 0 || size > b.length) corrupt = true
        else i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      val dur = if (byteRate > 0 && dataSize >= 0)
        Some(dataSize * 1000L / byteRate) else None
      Some(MediaMeta("wav", None, None, dur))
    }

    /** MP4/ISO-BMFF: ftyp at top level; duration from moov/mvhd
      * (version-0 layout: timescale at +20, duration at +24 from box
      * start). */
    def mp4(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 12 || ascii(b, 4, 4) != "ftyp") return None
      def findBox(name: String, from: Int, until: Int): Int = {
        var i = from
        while (i + 8 <= until) {
          if (ascii(b, i + 4, 4) == name) return i
          val size = u32(b, i).toInt
          if (size < 8) return -1
          i += size
        }
        -1
      }
      val moov = findBox("moov", 0, b.length)
      val dur = if (moov >= 0) {
        val end = math.min(moov + u32(b, moov).toInt, b.length)
        val mvhd = findBox("mvhd", moov + 8, end)
        if (mvhd >= 0 && mvhd + 28 <= b.length) {
          val timescale = u32(b, mvhd + 20)
          val duration = u32(b, mvhd + 24)
          if (timescale > 0) Some(duration * 1000L / timescale) else None
        } else None
      } else None
      Some(MediaMeta("mp4", None, None, dur))
    }

    def sniff(b: Array[Byte]): MediaMeta =
      if (b == null || b.isEmpty) MediaMeta("empty", None, None, None)
      else jpeg(b).orElse(png(b)).orElse(gif(b)).orElse(wav(b)).orElse(mp4(b))
        .getOrElse(MediaMeta("unknown", None, None, None))
  }

  /** Deterministic REAL-header fixtures: minimal but spec-valid file
    * prefixes the sniffer must parse back exactly. Used by the synthetic
    * media table and the header specs. */
  object MediaFixtures {
    def jpegBytes(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(41 + payload.length)
      out.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
      out.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16) // APP0
      out.put("JFIF".getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
      out.put(Array[Byte](1, 1, 0)).putShort(1).putShort(1)
      out.put(Array[Byte](0, 0))
      out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17) // SOF0
      out.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      (1 to 3).foreach(c => out.put(c.toByte).put(0x11.toByte).put(0.toByte))
      out.put(Array(0xff, 0xd9).map(_.toByte)) // EOI
      out.put(payload)
      out.array()
    }

    def pngBytes(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(45 + payload.length)
      out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      out.putInt(13).put("IHDR".getBytes(StandardCharsets.US_ASCII))
      out.putInt(w).putInt(h)
      out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      out.putInt(0) // CRC (not validated by the sniffer)
      out.putInt(0).put("IEND".getBytes(StandardCharsets.US_ASCII)).putInt(0)
      out.put(payload)
      out.array()
    }

    /** 44-byte canonical WAV header; `dataSize` is the DECLARED data
      * chunk size (payload may be truncated — parsers read the header). */
    def wavBytes(sampleRate: Int, channels: Int, dataSize: Long,
                 payload: Array[Byte]): Array[Byte] = {
      val byteRate = sampleRate * channels * 2
      val out = ByteBuffer.allocate(44 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      out.putInt((36 + dataSize).toInt)
      out.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      out.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      out.putShort(1).putShort(channels.toShort).putInt(sampleRate)
      out.putInt(byteRate).putShort((channels * 2).toShort).putShort(16)
      out.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize.toInt)
      out.put(payload)
      out.array()
    }

    /** A minimal but structurally conformant single-video-track mp4:
      * ftyp + moov[mvhd, trak[tkhd, mdia[mdhd, hdlr('vide'),
      * minf[stbl[stsd('avc1' visual entry), stts(uniform delta),
      * stsc(one chunk), stsz(explicit sizes), stco]]]]] + mdat holding
      * the concatenated samples. Codec-config boxes (avcC) are omitted
      * — the sample-table parser reads container structure, not codec
      * config; like the .mmdb fixture encoder, muxer and parser are
      * independent spec derivations. Layout is deterministic: the mdat
      * payload (= sample 0) begins at byte 527 + 4·n for n samples
      * (only stsz varies with n), which the `mm_mp4_samples` oracle
      * replays. */
    def mp4TrackBytes(trackId: Long, width: Int, height: Int,
                      timescale: Long, sampleDelta: Long,
                      sampleSizes: Seq[Int],
                      samples: Array[Byte]): Array[Byte] = {
      val n = sampleSizes.length
      require(sampleSizes.sum == samples.length, "sizes must cover samples")
      val stszSize = 20 + 4 * n
      val stblSize = 8 + 102 + 24 + 28 + stszSize + 20
      val minfSize = 8 + stblSize
      val mdiaSize = 8 + 32 + 33 + minfSize
      val trakSize = 8 + 92 + mdiaSize
      val moovSize = 8 + 108 + trakSize
      val mdatStart = 20 + moovSize          // == 519 + 4n
      val out = ByteBuffer.allocate(mdatStart + 8 + samples.length)
      def fourcc(s: String) = out.put(s.getBytes(StandardCharsets.US_ASCII))
      // ftyp
      out.putInt(20); fourcc("ftyp"); fourcc("isom"); out.putInt(0); fourcc("isom")
      // moov / mvhd (v0; duration = n * delta in movie timescale)
      out.putInt(moovSize); fourcc("moov")
      out.putInt(108); fourcc("mvhd"); out.putInt(0)
      out.putInt(0).putInt(0) // ctime mtime
      out.putInt(timescale.toInt).putInt((n * sampleDelta).toInt)
      out.put(new Array[Byte](108 - 8 - 4 - 16))
      // trak / tkhd (v0): track_id at body+12, dims (16.16) at the tail
      out.putInt(trakSize); fourcc("trak")
      out.putInt(92); fourcc("tkhd"); out.putInt(7) // flags: enabled
      out.putInt(0).putInt(0)                  // ctime mtime
      out.putInt(trackId.toInt).putInt(0)      // track_id, reserved
      out.putInt((n * sampleDelta).toInt)      // duration
      out.put(new Array[Byte](8))              // reserved
      out.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/reserved
      out.put(new Array[Byte](36))             // identity matrix zeroed (not parsed)
      out.putInt(width << 16).putInt(height << 16)
      // mdia / mdhd (v0): timescale at body+12
      out.putInt(mdiaSize); fourcc("mdia")
      out.putInt(32); fourcc("mdhd"); out.putInt(0)
      out.putInt(0).putInt(0)
      out.putInt(timescale.toInt).putInt((n * sampleDelta).toInt)
      out.putShort(0x55c4.toShort).putShort(0) // lang 'und', predefined
      // hdlr('vide')
      out.putInt(33); fourcc("hdlr"); out.putInt(0); out.putInt(0)
      fourcc("vide"); out.put(new Array[Byte](12)); out.put(0.toByte)
      // minf / stbl
      out.putInt(minfSize); fourcc("minf")
      out.putInt(stblSize); fourcc("stbl")
      // stsd with one avc1 VisualSampleEntry (dims at entry+32/34)
      out.putInt(102); fourcc("stsd"); out.putInt(0); out.putInt(1)
      out.putInt(86); fourcc("avc1")
      out.put(new Array[Byte](6)).putShort(1)  // reserved, dref index
      out.putShort(0).putShort(0)              // pre_defined, reserved
      out.put(new Array[Byte](12))             // pre_defined[3]
      out.putShort(width.toShort).putShort(height.toShort)
      out.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      out.putInt(0).putShort(1)                // reserved, frame_count
      out.put(new Array[Byte](32))             // compressorname
      out.putShort(24).putShort(-1)            // depth, pre_defined
      // stts: one uniform run
      out.putInt(24); fourcc("stts"); out.putInt(0); out.putInt(1)
      out.putInt(n).putInt(sampleDelta.toInt)
      // stsc: all samples in one chunk
      out.putInt(28); fourcc("stsc"); out.putInt(0); out.putInt(1)
      out.putInt(1).putInt(n).putInt(1)
      // stsz: explicit per-sample sizes
      out.putInt(stszSize); fourcc("stsz"); out.putInt(0); out.putInt(0)
      out.putInt(n)
      sampleSizes.foreach(out.putInt)
      // stco: the one chunk starts right after the mdat header
      out.putInt(20); fourcc("stco"); out.putInt(0); out.putInt(1)
      out.putInt(mdatStart + 8)
      // mdat
      out.putInt(8 + samples.length); fourcc("mdat"); out.put(samples)
      out.array()
    }

    /** ftyp(20) + moov(8+mvhd(108)) = 136-byte prefix. */
    def mp4Bytes(timescale: Long, duration: Long, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(136 + payload.length)
      out.putInt(20).put("ftyp".getBytes(StandardCharsets.US_ASCII))
      out.put("isom".getBytes(StandardCharsets.US_ASCII)).putInt(0)
      out.put("isom".getBytes(StandardCharsets.US_ASCII))
      out.putInt(116).put("moov".getBytes(StandardCharsets.US_ASCII))
      out.putInt(108).put("mvhd".getBytes(StandardCharsets.US_ASCII))
      out.putInt(0) // version + flags
      out.putInt(0).putInt(0) // ctime, mtime
      out.putInt(timescale.toInt).putInt(duration.toInt)
      out.put(new Array[Byte](108 - 8 - 4 - 16)) // rate/volume/matrix/... zeroed
      out.put(payload)
      out.array()
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM
    * support ships with the JVM, zero extra dependencies). Samples
    * truncate to whole frames so results are deterministic against the
    * byte-level oracle; a declared data-chunk size larger than the
    * actual payload (our truncated fixtures) just ends the stream
    * early, exactly like a truncated upload would in production. */
  object AudioCodec {
    /** Decode 16-bit PCM: (sampleRateHz, channels, samples) — samples
      * interleaved, truncated to complete frames. None for non-audio or
      * unsupported encodings. */
    def pcmSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val frameSize = math.max(fmt.getFrameSize, 2)
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](math.max(frameSize, 4096 - 4096 % frameSize))
            var n = in.read(chunk)
            while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
            val raw = buf.toByteArray
            val usable = raw.length - raw.length % frameSize
            val bb = java.nio.ByteBuffer.wrap(raw, 0, usable).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val out = new Array[Short](usable / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort(); i += 1 }
            Some((fmt.getSampleRate.toInt, fmt.getChannels, out))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Audio feature extraction over the media table: REAL PCM decode of
    * the WAV rows ([[AudioCodec]]), one row per decodable audio file
    * with the stats a corpus-curation gate filters on (silence, clipping,
    * length). mapPartitions batch shape, same as [[extractMeta]]. */
  def audioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          AudioCodec.pcmSamples(bytes).map { case (rate, ch, ss) =>
            var sumSq = 0.0
            var peak = 0
            var i = 0
            while (i < ss.length) {
              val v = ss(i).toInt
              sumSq += v.toDouble * v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            val rms = if (ss.isEmpty) 0.0
              else BigDecimal(math.sqrt(sumSq / ss.length))
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            Row(r.getLong(0), rate, ch, ss.length.toLong, rms, peak)
          }
        }
      }(enc)
  }

  /** REAL image codec via the JDK's `javax.imageio` (ships with the JVM,
    * zero extra dependencies): PNG/JPEG encode, decode, and resize.
    * Pixels are materialized as packed RGB byte rasters (w*h*3), the
    * shape a feature extractor consumes. Compressed audio/video sample
    * decode has no JDK codec — WAV/PCM is real ([[AudioCodec]]); the
    * mp4 half stays in [[FakeCodec]]. */
  object ImageCodec {
    ImageIOInit
    private object ImageIOInit {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors
    }

    /** Deterministic test image: pixel = hash(seed, x, y). */
    private def pattern(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((seed + x * 31L + y * 131L) * 2654435761L) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      img
    }

    def encode(format: String, w: Int, h: Int, seed: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(pattern(w, h, seed), format, bos)
      bos.toByteArray
    }

    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch {
        // ImageIO readers throw RuntimeExceptions (IAE, AIOOBE,
        // CMMException) on truncated/corrupt data, not just IOException;
        // a malformed payload must fall back, not fail the task
        case scala.util.control.NonFatal(_) => None
      }

    def resize(img: java.awt.image.BufferedImage,
               w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null); ()
      } finally g.dispose()
      out
    }

    /** Packed RGB raster: 3 bytes per pixel, row-major — w*h*3 bytes. */
    def rgbBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val i = (y * w + x) * 3
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** STUB decode for audio/video samples: deterministic pure functions of
    * the payload bytes — the container has no audio/video codec libs.
    * Image decode is REAL ([[ImageCodec]]); the swap-in point for av is
    * these functions (JNI/javacv), and the `mapPartitions` batching
    * pattern is exactly what a real decoder needs. */
  object FakeCodec {
    /** "Decode" a frame at index i: deterministic byte slice. */
    def frame(bytes: Array[Byte], i: Int): Array[Byte] = {
      if (bytes.isEmpty) Array.emptyByteArray
      else {
        val start = (i * 7) % bytes.length
        java.util.Arrays.copyOfRange(bytes, start,
          math.min(start + 16, bytes.length))
      }
    }
    /** "Resize": deterministic downsample of the byte stream. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }.take(w * h)
  }

  /** Synthesize a media table from the documents table: REAL file headers
    * (format by doc_id%4, dimensions/rates derived from doc_id, payload =
    * the document's UTF-8 bytes), so extractMeta exercises the actual
    * parsers and an oracle can recompute every field from (doc_id, text). */
  def synthesize(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").cast(LongType), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getString(1)).getOrElse("")
            .getBytes(StandardCharsets.UTF_8)
          val w = (64 + id % 1024).toInt
          val h = (64 + (id * 7) % 1024).toInt
          val bytes = (id % 4) match {
            case 0 => MediaFixtures.jpegBytes(w, h, payload)
            case 1 => MediaFixtures.pngBytes(w, h, payload)
            case 2 => MediaFixtures.wavBytes(
              8000 + (id % 5).toInt * 8000, 1 + (id % 2).toInt,
              payload.length.toLong * 100, payload)
            case _ => MediaFixtures.mp4Bytes(1000L, payload.length.toLong * 50, payload)
          }
          Row(id, bytes, null)
        }
      }(enc)
  }

  /** Metadata extraction: mapPartitions batch over the binary column
    * (parser/codec state amortized per partition, not per row), REAL
    * header parsing via [[MediaSniffer]]. */
  def extractMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(mediaSchema.fields.map {
      case f if f.name == "meta" => f.copy(nullable = true)
      case f => f
    })
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          val m = MediaSniffer.sniff(bytes)
          Row(id, bytes, Row(m.format, m.width.map(Int.box).orNull,
            m.height.map(Int.box).orNull, m.durationMs.map(Long.box).orNull,
            bytes.length.toLong))
        }
      }(enc)
  }

  /** A decodable media table: REAL small PNG/JPEG images (deterministic
    * pixel pattern, dims derived from doc_id) for image rows, the header
    * fixtures for wav/mp4 (no JDK av codec). [[sampleFrames]] over this
    * table really decodes the image rows. Dims stay small (8..39 px):
    * the point is exercising the decode path, not shipping megapixel
    * rasters through the gate. */
  def synthesizeDecodable(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").cast(LongType), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getString(1)).getOrElse("")
            .getBytes(StandardCharsets.UTF_8)
          val w = (8 + id % 32).toInt
          val h = (8 + (id * 7) % 32).toInt
          val bytes = (id % 4) match {
            case 0 => ImageCodec.encode("jpg", w, h, id)
            case 1 => ImageCodec.encode("png", w, h, id)
            case 2 => MediaFixtures.wavBytes(
              8000 + (id % 5).toInt * 8000, 1 + (id % 2).toInt,
              payload.length.toLong * 100, payload)
            case _ => MediaFixtures.mp4Bytes(1000L, payload.length.toLong * 50, payload)
          }
          Row(id, bytes, null)
        }
      }(enc)
  }

  /** 64-bit difference hash (dHash) over REALLY decoded pixels: resize
    * to a 9×8 grayscale thumbnail, emit one bit per horizontal gradient
    * sign — the standard perceptual image-dedup fingerprint (resize/
    * re-encode/small-edit robust; near-identical images differ in few
    * bits). One row per DECODABLE image: (media_id, dhash). Pairing is
    * [[Dedup.fingerprintPairs]] — the same pigeonhole chunk-bucket join
    * text SimHash uses, so image dedup at 100 TB shuffles 16-byte
    * fingerprint rows, never pixels. */
  def imageDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          ImageCodec.decode(bytes).map { img =>
            val t = ImageCodec.resize(img, 9, 8)
            var h = 0L
            var bit = 0
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                def lum(px: Int): Int = {
                  val v = t.getRGB(px, y)
                  (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
                    (v & 0xff) * 114) / 1000
                }
                if (lum(x) > lum(x + 1)) h |= (1L << bit)
                bit += 1
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), h)
          }
        }
      }(enc)
  }

  /** Image table with planted PERCEPTUAL near-duplicates: for each
    * image doc, the original PNG and — at id+1000000 — the SAME image
    * brightness-shifted (+12 per channel, clamped) and re-encoded.
    * Different bytes, different exact hashes, same gradient structure:
    * what [[imageDHash]] + [[Dedup.fingerprintPairs]] must catch and
    * exact/byte dedup cannot (dHash is gradient-sign based, so a
    * uniform brightness shift flips bits only where clamping flattens
    * a gradient). */
  def synthesizeImageTwins(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").cast(LongType))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val w = (8 + id % 32).toInt
          val h = (8 + (id * 7) % 32).toInt
          val png = ImageCodec.encode("png", w, h, id)
          val img = ImageCodec.decode(png).get
          val shifted = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              def ch(s: Int): Int = math.min(255, ((v >> s) & 0xff) + 12)
              shifted.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(shifted, "png", out)
          Seq(Row(id, png, null),
            Row(id + 1000000L, out.toByteArray, null))
        }
      }(enc)
  }

  /** Frame sampling: one output row per sampled frame (UDTF shape).
    * Image rows (sniffed jpeg/png that actually decode) are REALLY
    * decoded via [[ImageCodec]]: frame 0 = the full packed-RGB raster,
    * frame 1 = a 16x16 resized thumbnail — the decode + resize a
    * training pipeline runs. Audio rows are REALLY decoded via
    * [[AudioCodec]]: up to `maxFrames` 16-sample PCM windows at sample
    * stride `everyN * 16` (windows past the decoded sample count are
    * not emitted). Only compressed a/v (mp4) and undecodable payloads
    * fall back to the [[FakeCodec]] slices. */
  def sampleFrames(media: DataFrame, everyN: Int = 4, maxFrames: Int = 3): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          val decoded = MediaSniffer.sniff(bytes).format match {
            case "jpeg" | "png" => ImageCodec.decode(bytes)
            case _ => None
          }
          decoded match {
            case Some(img) => Seq(
              Row(id, 0, ImageCodec.rgbBytes(img)),
              Row(id, 1, ImageCodec.rgbBytes(ImageCodec.resize(img, 16, 16))))
            case None =>
              AudioCodec.pcmSamples(bytes) match {
                case Some((_, _, ss)) =>
                  (0 until maxFrames).flatMap { f =>
                    val start = f * everyN * 16
                    if (start >= ss.length) Nil
                    else {
                      val len = math.min(16, ss.length - start)
                      val bb = java.nio.ByteBuffer.allocate(len * 2)
                        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                      var i = 0
                      while (i < len) { bb.putShort(ss(start + i)); i += 1 }
                      Seq(Row(id, f * everyN, bb.array()))
                    }
                  }
                case None =>
                  (0 until maxFrames).map(i => Row(id, i * everyN,
                    FakeCodec.frame(bytes, i * everyN)))
              }
          }
        }
      }(enc)
  }

  // ---- MP4 sample tables (ISO/IEC 14496-12 container structure) ------
  // Container-level video plumbing WITHOUT a codec: the sample tables
  // inside `moov` are what locate every frame's bytes in `mdat` —
  // stsd (codec fourcc + dims), stts (decode deltas), stsc
  // (samples-per-chunk runs), stsz (per-sample byte sizes), stco (chunk
  // offsets). Parsing them yields REAL per-sample byte ranges and
  // timestamps, which is everything a distributed frame-sampling
  // pipeline needs to route work (select every Nth sample, slice its
  // bytes, ship to a decoder); only the codec DECODE of a selected
  // sample's bytes stays out of scope (no JVM-builtin H.264).

  case class Mp4Sample(trackId: Long, codec: String, width: Int,
                       height: Int, sampleIdx: Int, offset: Long,
                       size: Long, ptsMs: Long)

  object Mp4Tracks {
    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)
    private def ascii(b: Array[Byte], i: Int, n: Int): String =
      new String(b, i, n, StandardCharsets.US_ASCII)

    /** All (start, end) ranges of top-level boxes named `name` inside
      * [from, until) — handles 64-bit `largesize` (size==1) and
      * to-end-of-file (size==0) boxes. */
    private def boxes(b: Array[Byte], name: String, from: Int,
                      until: Int): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var i = from
      while (i + 8 <= until) {
        val size32 = u32(b, i)
        val id = ascii(b, i + 4, 4)
        val (bodyStart, size) =
          if (size32 == 1L && i + 16 <= until) (i + 16, u64(b, i + 8))
          else if (size32 == 0L) (i + 8, (until - i).toLong)
          else (i + 8, size32)
        if (size < 8 || i + size > until) return out.result() // corrupt: stop
        if (id == name) out += ((bodyStart, i + size.toInt))
        i += size.toInt
      }
      out.result()
    }
    private def box(b: Array[Byte], name: String, from: Int,
                    until: Int): Option[(Int, Int)] =
      boxes(b, name, from, until).headOption

    /** Parse every track's sample table. Tolerant: tracks with missing
      * mandatory boxes are skipped, never thrown on. */
    def parse(b: Array[Byte]): Seq[Mp4Sample] = {
      if (b == null || b.length < 12 || ascii(b, 4, 4) != "ftyp")
        return Seq.empty
      val moov = box(b, "moov", 0, b.length).toSeq
      moov.flatMap { case (ms, me) =>
        boxes(b, "trak", ms, me).flatMap { case (ts, te) =>
          parseTrack(b, ts, te)
        }
      }
    }

    private def parseTrack(b: Array[Byte], ts: Int, te: Int): Seq[Mp4Sample] = {
      val trackId = box(b, "tkhd", ts, te).map { case (s, _) =>
        u32(b, s + 12) // v0: fullbox(4) ctime(4) mtime(4) -> track_id
      }.getOrElse(0L)
      (for {
        (mds, mde) <- box(b, "mdia", ts, te)
        (mhs, _) <- box(b, "mdhd", mds, mde)
        timescale = u32(b, mhs + 12) // v0: fullbox ctime mtime -> timescale
        (mis, mie) <- box(b, "minf", mds, mde)
        (sts, ste) <- box(b, "stbl", mis, mie)
        (sds, _) <- box(b, "stsd", sts, ste)
      } yield {
        // first sample entry: 4 fullbox + 4 entry_count, then a sample
        // entry box; video entries carry dims at +24/+26 past fourcc
        val entry = sds + 8
        val codec = ascii(b, entry + 4, 4)
        val w = u16(b, entry + 32)
        val h = u16(b, entry + 34)
        // stsz: per-sample sizes (or one fixed size)
        val sizes: IndexedSeq[Long] = box(b, "stsz", sts, ste).map {
          case (s, _) =>
            val fixed = u32(b, s + 4)
            val n = u32(b, s + 8).toInt
            if (fixed != 0) IndexedSeq.fill(n)(fixed)
            else (0 until n).map(k => u32(b, s + 12 + 4 * k))
        }.getOrElse(IndexedSeq.empty)
        // stts: (count, delta) runs -> per-sample decode timestamps
        val deltas: IndexedSeq[Long] = box(b, "stts", sts, ste).map {
          case (s, _) =>
            val n = u32(b, s + 4).toInt
            (0 until n).flatMap { k =>
              val cnt = u32(b, s + 8 + 8 * k).toInt
              val d = u32(b, s + 12 + 8 * k)
              IndexedSeq.fill(cnt)(d)
            }.toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
        // stsc runs + stco offsets -> per-sample absolute offsets
        val stscRuns: IndexedSeq[(Int, Int)] = box(b, "stsc", sts, ste).map {
          case (s, _) =>
            val n = u32(b, s + 4).toInt
            (0 until n).map(k =>
              (u32(b, s + 8 + 12 * k).toInt,        // first_chunk (1-based)
               u32(b, s + 12 + 12 * k).toInt))      // samples_per_chunk
        }.getOrElse(IndexedSeq.empty)
        val chunkOffsets: IndexedSeq[Long] = box(b, "stco", sts, ste).map {
          case (s, _) =>
            val n = u32(b, s + 4).toInt
            (0 until n).map(k => u32(b, s + 8 + 4 * k))
        }.getOrElse(IndexedSeq.empty)
        if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty ||
            timescale == 0L) Seq.empty
        else {
          // expand stsc runs into per-chunk sample counts
          val perChunk = chunkOffsets.indices.map { ci =>
            val run = stscRuns.reverse.find(_._1 <= ci + 1)
              .getOrElse(stscRuns.head)
            run._2
          }
          val out = Seq.newBuilder[Mp4Sample]
          var sidx = 0
          var pts = 0L
          chunkOffsets.indices.foreach { ci =>
            var off = chunkOffsets(ci)
            (0 until perChunk(ci)).foreach { _ =>
              if (sidx < sizes.length) {
                val dur = if (sidx < deltas.length) deltas(sidx) else 0L
                out += Mp4Sample(trackId, codec, w, h, sidx, off,
                  sizes(sidx), pts * 1000L / timescale)
                off += sizes(sidx)
                pts += dur
                sidx += 1
              }
            }
          }
          out.result()
        }
      }).getOrElse(Seq.empty)
    }

    /** Per-sample rows over a media table: (media_id, track_id, codec,
      * width, height, sample_idx, offset, size, pts_ms, first_byte) —
      * `first_byte` is read THROUGH the parsed offset, proving the byte
      * ranges really locate the samples in mdat. Opaque byte parsing =>
      * mapPartitions (the stated pattern for non-columnar surfaces). */
    def sampleTable(media: DataFrame, idCol: String = "media_id",
                    bytesCol: String = "media"): DataFrame = {
      val spark = media.sparkSession
      import spark.implicits._
      media.select(col(idCol).cast("long"), col(bytesCol))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          parse(bytes).map { sm =>
            (id, sm.trackId, sm.codec, sm.width, sm.height, sm.sampleIdx,
              sm.offset, sm.size,
              sm.ptsMs,
              if (sm.offset < bytes.length) bytes(sm.offset.toInt) & 0xff
              else -1)
          }
        })
        .toDF("media_id", "track_id", "codec", "width", "height",
          "sample_idx", "offset", "size", "pts_ms", "first_byte")
    }
  }
}
