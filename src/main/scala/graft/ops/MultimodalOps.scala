package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in partition-batched
  * passes. Pure-JVM REAL decodes (no external codec libraries needed):
  *
  *  - header dims for PNG/JPEG/BMP/GIF ([[imageDims]], hand-rolled — no
  *    allocation beyond the answer);
  *  - full-pixel statistics for ANY format the JDK's own `javax.imageio`
  *    decodes — PNG, JPEG, GIF, BMP ([[imagePixelStats]]); the 24-bit BMP
  *    fast path stays hand-rolled ([[bmpStats]]);
  *  - full-sample 16-bit-PCM RIFF/WAVE audio features ([[wavFeatures]]);
  *  - multi-frame decode for animated GIF ([[gifFrameStats]]) — the
  *    video-modality analogue: real frame counts and per-frame pixels;
  *  - real nearest-neighbor resize ([[resizeImages]]): decode → integer
  *    NN sample → PNG re-encode, deterministic by construction.
  *
  *  - real CONTAINER parses for the compressed-codec formats: MP3 frame
  *    walk ([[mp3Info]]), CRC-validated OGG/Vorbis page walk ([[oggInfo]]),
  *    MP4/ISO-BMFF box walk ([[mp4Info]]) — sample rates, channels, frame
  *    counts, durations and track dims are read from the actual structure.
  *
  * Only the SAMPLE/PIXEL level of codecs the JVM genuinely does not ship
  * (MP3/Vorbis PCM synthesis, AVC/HEVC frames) remains behind
  * [[decodeStub]], which derives deterministic fake features so the
  * pipeline shape stays testable; swap it for a real codec (e.g. a
  * JNI/pandas-UDF decode) without touching the plumbing.
  */
object MultimodalOps {

  /** Typed metadata attached to every media row. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  /** REAL image-header decode, pure JVM (no codec libraries): PNG IHDR
    * width/height (bytes 16-23 after the 8-byte signature + IHDR chunk
    * header) and JPEG SOF frame dimensions (marker scan to the first
    * start-of-frame segment: precision byte, then height, width as
    * big-endian u16). Returns None for payloads that are neither — those
    * fall back to [[decodeStub]] (audio/video codecs stay stubbed).
    */
  def imageDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null) return None
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e && u8(3) == 0x47 &&
        p(12) == 'I'.toByte && p(13) == 'H'.toByte && p(14) == 'D'.toByte && p(15) == 'R'.toByte)
      Some((be32(16), be32(20)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 <= p.length) {
        if (u8(i) != 0xff) return None // desynced — not a well-formed stream
        val marker = u8(i + 1)
        // standalone markers carry no length field
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) return Some((be16(i + 7), be16(i + 5))) // (width, height)
          i += 2 + len
        }
      }
      None
    } else if (p.length >= 30 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) {
      // BMP: BITMAPINFOHEADER width/height as s32le at offsets 18/22
      def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val w = le32(18); val h = math.abs(le32(22))
      if (w > 0 && h > 0) Some((w, h)) else None
    } else if (p.length >= 10 && p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
               p(3) == '8'.toByte && (p(4) == '7'.toByte || p(4) == '9'.toByte) && p(5) == 'a'.toByte) {
      // GIF: logical screen width/height as u16le at offsets 6/8
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val w = le16(6); val h = le16(8)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None
  }

  /** Synthesize a minimal valid-header PNG (signature + IHDR) for tests
    * and oracle queries — [[imageDims]] must parse back exactly (w, h).
    */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13) // IHDR data length
    b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(width).putInt(height)
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0) // CRC placeholder (not needed for header parsing)
    b.array()
  }

  /** Synthesize a minimal JPEG header: SOI, an APP0 stub, one SOF0. */
  def jpegHeader(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 4 + 2 + 2 + 2 + 9)
    b.put(0xff.toByte).put(0xd8.toByte)              // SOI
    b.put(0xff.toByte).put(0xe0.toByte).putShort(2)  // APP0, empty
    b.put(0xff.toByte).put(0xc0.toByte).putShort(11) // SOF0, len
    b.put(8.toByte)                                  // precision
    b.putShort(height.toShort).putShort(width.toShort)
    b.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    b.array()
  }

  /** Parsed WAV facts + REAL sample statistics (the samples are decoded,
    * not inferred from the header): `rms` is sqrt(mean of squared PCM
    * values) over every sample of every channel, `peak` = max |sample|.
    */
  final case class WavInfo(sampleRate: Int, channels: Int, nSamples: Int,
                           durationMs: Long, rms: Double, peak: Int)

  /** REAL audio decode, pure JVM: RIFF/WAVE chunk walk (chunks are
    * even-aligned — a chunk with odd size carries one pad byte) to `fmt `
    * (PCM format 1, 16-bit only) and `data`, then a full pass over the
    * s16le interleaved samples for RMS/peak. Anything that is not a
    * 16-bit-PCM RIFF/WAVE returns None (callers fall back to
    * [[decodeStub]]) — mirroring [[imageDims]]'s contract for images.
    */
  /** RIFF/WAVE chunk walk shared by the header-only and full decodes:
    * ((audioFormat, channels, sampleRate, bits), (dataOffset, dataLen)),
    * or None for anything that is not a well-formed 16-bit-PCM WAV.
    */
  private def wavChunks(p: Array[Byte]): Option[((Int, Int, Int, Int), (Int, Int))] = {
    if (p == null || p.length < 12) return None
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    var i = 12
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i); val len = le32(i + 4)
      // bounds in LONG: a crafted length near Int.MaxValue overflows the
      // int sum, sneaks past the guard, and crashes the task instead of
      // returning None (the documented contract for junk payloads)
      if (len < 0 || i.toLong + 8L + len > p.length) return None // torn chunk
      if (id == "fmt " && len >= 16)
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12), le16(i + 22)))
      else if (id == "data") data = Some((i + 8, len))
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    for {
      f @ (audioFormat, channels, sampleRate, bits) <- fmt
      d <- data
      if audioFormat == 1 && bits == 16 && channels > 0 && sampleRate > 0
    } yield (f, d)
  }

  /** Header-only WAV facts — (sampleRate, channels) without touching the
    * sample data. The right parse when a caller (e.g. [[decode]]) needs
    * format metadata only: [[wavFeatures]] pays a full O(payload) sample
    * pass for RMS/peak.
    */
  def wavFormat(p: Array[Byte]): Option[(Int, Int)] =
    wavChunks(p).map { case ((_, channels, sampleRate, _), _) => (sampleRate, channels) }

  def wavFeatures(p: Array[Byte]): Option[WavInfo] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    wavChunks(p).map { case ((_, channels, sampleRate, _), (off, dataLen)) =>
      val frameBytes = channels * 2
      val nFrames = dataLen / frameBytes
      val totalSamples = nFrames * channels
      var sumSq = 0L; var peak = 0
      var j = off
      val end = off + nFrames * frameBytes
      while (j < end) {
        val s = (le16(j) << 16) >> 16 // sign-extend s16le
        sumSq += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        j += 2
      }
      val rms = if (totalSamples == 0) 0.0 else math.sqrt(sumSq.toDouble / totalSamples)
      WavInfo(sampleRate, channels, nFrames,
        nFrames.toLong * 1000L / sampleRate, rms, peak)
    }
  }

  /** Synthesize a complete 16-bit PCM RIFF/WAVE payload for tests and
    * oracle queries — [[wavFeatures]] must decode back exactly.
    */
  def wavBytes(sampleRate: Int, channels: Int, frames: Array[Short]): Array[Byte] = {
    val dataLen = frames.length * channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    b.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(s => (0 until channels).foreach(_ => b.putShort(s)))
    b.array()
  }

  /** Parsed BMP facts + REAL pixel statistics: exact integer channel sums
    * over every decoded pixel (sums, not means, so a cross-engine oracle
    * compares exactly), plus the red-channel sum of the TOP image row —
    * BMP stores rows bottom-up, so a decoder that does not flip row order
    * reports the wrong top row. Dimensions are the image's (width,
    * |height|).
    */
  final case class BmpStats(width: Int, height: Int, sumR: Long, sumG: Long,
                            sumB: Long, topRowSumR: Long)

  /** REAL pixel decode, pure JVM: uncompressed 24-bit BMP
    * (BITMAPINFOHEADER, BI_RGB) — per-pixel BGR loop honoring the 4-byte
    * row stride padding and bottom-up row order (negative biHeight =
    * top-down, also handled). Non-BMP / compressed / non-24-bit payloads
    * return None.
    */
  def bmpStats(p: Array[Byte]): Option[BmpStats] = {
    if (p == null || p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val dataOff = le32(10)
    val hdrSize = le32(14)
    val width = le32(18)
    val rawHeight = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    // Int.MinValue has no positive abs — reject before math.abs returns
    // a negative height and fakes an empty-but-Some result
    if (hdrSize < 40 || bpp != 24 || compression != 0 || width <= 0 ||
        rawHeight == 0 || rawHeight == Int.MinValue) return None
    val height = math.abs(rawHeight)
    val topDown = rawHeight < 0
    // stride in LONG: 3*width overflows int for width > ~715M, turning the
    // bounds check below into a pass and the pixel loop into an OOB crash
    val strideL = ((3L * width + 3L) / 4L) * 4L
    if (dataOff < 0 || dataOff.toLong + strideL * height > p.length) return None
    val stride = strideL.toInt // fits: bounded by p.length above
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var topRowSumR = 0L
    var row = 0
    while (row < height) {
      // file row `row` is image row `row` when top-down, else `height-1-row`
      val y = if (topDown) row else height - 1 - row
      var off = dataOff + row * stride
      var x = 0
      while (x < width) {
        val b = u8(off); val g = u8(off + 1); val r = u8(off + 2)
        sumB += b; sumG += g; sumR += r
        if (y == 0) topRowSumR += r
        off += 3; x += 1
      }
      row += 1
    }
    Some(BmpStats(width, height, sumR, sumG, sumB, topRowSumR))
  }

  /** Synthesize an uncompressed bottom-up 24-bit BMP; `rgb(x, y)` uses
    * TOP-origin coordinates (y = 0 is the top image row) — the writer
    * stores rows bottom-up, so [[bmpStats]] must flip to decode correctly.
    */
  def bmp24(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val b = java.nio.ByteBuffer.allocate(54 + stride * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + stride * height)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (fileRow <- 0 until height) {
      val y = height - 1 - fileRow // bottom-up storage
      val rowStart = 54 + fileRow * stride
      for (x <- 0 until width) {
        val (r, g, bl) = rgb(x, y)
        b.position(rowStart + 3 * x)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
    }
    b.array()
  }

  /** Exact channel sums + top-row red sum over a decoded BufferedImage —
    * the shared accumulation behind [[imagePixelStats]]/[[gifFrameStats]].
    */
  private def imageToStats(img: java.awt.image.BufferedImage): BmpStats = {
    val w = img.getWidth; val h = img.getHeight
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var topRowSumR = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w) // one raster read per row, not per pixel
      var x = 0
      while (x < w) {
        val px = row(x)
        val r = (px >> 16) & 0xff
        sumR += r; sumG += (px >> 8) & 0xff; sumB += px & 0xff
        if (y == 0) topRowSumR += r
        x += 1
      }
      y += 1
    }
    BmpStats(w, h, sumR, sumG, sumB, topRowSumR)
  }

  /** Decompression-bomb guard: a decode allocates O(width*height) raster
    * regardless of payload size, so a 100-byte crafted header claiming
    * 60000x60000 would OOM the executor BEFORE any catch could help
    * (allocation failure is an Error, not an Exception). Bound = 16M
    * pixels (a 4096x4096 frame, 64 MB int raster) — fine for document
    * corpora; raise per-call if a pipeline really carries larger stills.
    */
  val MaxDecodePixels: Long = 1L << 24

  /** True iff the payload's SELF-DECLARED dims are present, positive and
    * within `maxPixels` — checked on the cheap header parse before any
    * raster allocation. Unknown containers fail the gate: the decoders
    * below deliberately accept only formats with a known header parse
    * (PNG/JPEG/BMP/GIF), never whatever extra readers the JRE registers.
    */
  private def dimsWithinBound(p: Array[Byte], maxPixels: Long): Boolean =
    imageDims(p).exists { case (w, h) => w > 0 && h > 0 && w.toLong * h <= maxPixels }

  /** REAL general pixel decode via the JDK's own `javax.imageio` (part of
    * `java.desktop` — PNG, JPEG, GIF and BMP readers ship with every JRE;
    * no external codec library, headless-safe). The hand-rolled 24-bit BMP
    * path ([[bmpStats]]) is tried first (no reader dispatch, no raster
    * allocation); anything else goes through ImageIO behind the
    * [[MaxDecodePixels]] bomb guard. Undecodable payloads yield None —
    * same contract as every other parser here.
    */
  def imagePixelStats(p: Array[Byte], maxPixels: Long = MaxDecodePixels): Option[BmpStats] = {
    if (p == null || p.length < 8) return None
    bmpStats(p).orElse {
      if (!dimsWithinBound(p, maxPixels)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
        .map(imageToStats)
      catch { case _: Exception => None } // torn/hostile container: None, never a task crash
    }
  }

  /** Synthesize a COMPLETE real PNG (JDK encoder) with `rgb(x, y)` pixels,
    * top-origin; PNG is lossless, so [[imagePixelStats]] round-trips the
    * exact channel values — the oracle-friendly twin of [[bmp24]].
    */
  def pngBytes(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a multi-frame (animated) GIF with GRAYSCALE `gray(frame,
    * x, y)` pixels (0-255, top-origin). Frames use an explicit 256-entry
    * gray palette (`IndexColorModel`), so the GIF encoder quantizes
    * nothing — [[gifFrameStats]] round-trips every value exactly. This is
    * the video-modality test payload: a real container with a real frame
    * count.
    */
  def gifBytes(width: Int, height: Int, nFrames: Int,
               gray: (Int, Int, Int) => Int): Array[Byte] = {
    val ramp = Array.tabulate(256)(_.toByte)
    val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, gray(f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** REAL multi-frame decode (animated GIF via the JDK reader): per-frame
    * exact pixel statistics, in stored frame order. None for anything
    * without a multi-frame-capable reader. The video-frame analogue of
    * [[imagePixelStats]]: `n_frames` comes from the actual container, not
    * a header field or stub.
    */
  def gifFrameStats(p: Array[Byte], maxPixels: Long = MaxDecodePixels): Option[Seq[BmpStats]] = {
    if (p == null || p.length < 6) return None
    if (!dimsWithinBound(p, maxPixels)) return None // logical-screen bomb guard
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true) // full scan — frame COUNT is a decode fact
            // zero decodable frames = a torn container wearing a valid
            // header, not a decode — None, like every other parser here
            // per-frame guard: a GIF frame descriptor carries its OWN
            // dims — a crafted frame can dwarf the logical screen, and
            // getWidth/getHeight read metadata only (no allocation)
            if (n <= 0 ||
                (0 until n).exists(i => r.getWidth(i).toLong * r.getHeight(i) > maxPixels))
              None
            else Some((0 until n).map(i => imageToStats(r.read(i))))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Frame COUNT of a GIF by hand-rolled block walk — no decompression,
    * no raster allocation, one O(payload) byte scan: header + logical
    * screen descriptor (+ global color table), then 0x2C image descriptors
    * (count one; skip local color table + LZW sub-blocks) and 0x21
    * extensions (skip sub-blocks) until the 0x3B trailer. The cheap count
    * for [[decode]]'s header-only pass; [[gifFrameStats]] pays the full
    * decode when pixels are needed. Torn/non-GIF payloads: None.
    */
  def gifFrameCount(p: Array[Byte]): Option[Int] = {
    if (p == null || p.length < 13) return None
    def u8(i: Int): Int = p(i) & 0xff
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
          (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    val packed = u8(10)
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0
    def skipSubBlocks(start: Int): Int = { // returns index past the 0 terminator, or -1
      var j = start
      while (j < p.length && u8(j) != 0) j += 1 + u8(j)
      if (j < p.length) j + 1 else -1
    }
    while (i < p.length) {
      u8(i) match {
        case 0x3b => return if (frames > 0) Some(frames) else None // trailer
        case 0x2c => // image descriptor: 9 fixed bytes, optional local CT,
          if (i + 10 > p.length) return None // LZW min-code byte, sub-blocks
          val lp = u8(i + 9)
          val lct = if ((lp & 0x80) != 0) 3 * (1 << ((lp & 7) + 1)) else 0
          i = skipSubBlocks(i + 10 + lct + 1)
          if (i < 0) return None
          frames += 1
        case 0x21 => // extension: label byte then sub-blocks
          i = skipSubBlocks(i + 2)
          if (i < 0) return None
        case _ => return None // desynced — not a well-formed stream
      }
    }
    None // ran off the end without a trailer: torn
  }

  // ---------------------------------------------------------------------
  // Compressed-audio / video CONTAINER parses, pure JVM. The JDK ships no
  // MP3/Vorbis/AVC decoders, so sample/pixel decode for these stays behind
  // [[decodeStub]] — but the container metadata (sample rate, channels,
  // frame counts, duration, dimensions) is a real byte-level parse of the
  // actual frame/page/box structure, same contract as [[wavFeatures]] /
  // [[gifFrameCount]]: torn or hostile payloads return None, never crash.
  // ---------------------------------------------------------------------

  /** Parsed MP3 facts from a full frame-header walk: every frame's length
    * is computed from its own header, so `nFrames`/`durationMs` are real
    * container facts (a VBR stream sums per-frame samples correctly).
    */
  final case class Mp3Info(sampleRate: Int, channels: Int, bitrateKbps: Int,
                           nFrames: Int, durationMs: Long)

  // MPEG-1/2/2.5 Layer III tables (ISO/IEC 11172-3 / 13818-3)
  private val Mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RatesV1 = Array(44100, 48000, 32000)
  private val Mp3RatesV2 = Array(22050, 24000, 16000)
  private val Mp3RatesV25 = Array(11025, 12000, 8000)

  /** One frame header at `i`: (frameLen, sampleRate, channels, bitrateKbps,
    * samplesPerFrame), or None if `p(i..i+3)` is not a valid Layer III
    * frame header.
    */
  private def mp3FrameHeader(p: Array[Byte], i: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (i + 4 > p.length) return None
    def u8(j: Int): Int = p(j) & 0xff
    if (u8(i) != 0xff || (u8(i + 1) & 0xe0) != 0xe0) return None
    val versionBits = (u8(i + 1) >> 3) & 3 // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
    val layerBits = (u8(i + 1) >> 1) & 3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val bitrateIdx = (u8(i + 2) >> 4) & 0xf
    val srIdx = (u8(i + 2) >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None // free/bad
    val padding = (u8(i + 2) >> 1) & 1
    val mode = (u8(i + 3) >> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val v1 = versionBits == 3
    val bitrateKbps = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)(bitrateIdx)
    val sampleRate = (versionBits match {
      case 3 => Mp3RatesV1; case 2 => Mp3RatesV2; case _ => Mp3RatesV25
    })(srIdx)
    val samplesPerFrame = if (v1) 1152 else 576
    // frameLen = samplesPerFrame/8 * bitrate / sampleRate + padding
    val frameLen = (samplesPerFrame / 8) * (bitrateKbps * 1000) / sampleRate + padding
    if (frameLen < 4) None
    else Some((frameLen, sampleRate, channels, bitrateKbps, samplesPerFrame))
  }

  /** REAL MP3 container parse: optional ID3v2 skip (syncsafe size), then a
    * strict frame walk to the end of the payload (an ID3v1 `TAG` trailer is
    * tolerated; any other trailing bytes = torn stream = None). Frames must
    * agree on sample rate; bitrate may vary (VBR) — `bitrateKbps` reports
    * the first frame's. Sample DECODE stays stubbed (the JVM ships no MDCT
    * synthesis); everything here is read from the actual frame headers.
    */
  def mp3Info(p: Array[Byte]): Option[Mp3Info] = {
    if (p == null || p.length < 4) return None
    def u8(j: Int): Int = p(j) & 0xff
    var i = 0
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      // syncsafe u28 — 7 bits per byte; bounds in LONG (crafted max bytes
      // sum past Int.MaxValue/4 only via the shift, not the add, but the
      // +10 below could wrap at the boundary)
      if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None // non-syncsafe: torn
      val tagLen = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      if (10L + tagLen >= p.length) return None
      i = 10 + tagLen
    }
    var nFrames = 0
    var totalSamples = 0L
    var sampleRate = 0
    var channels = 0
    var bitrateFirst = 0
    while (i < p.length) {
      // ID3v1 trailer: exactly 128 bytes of "TAG..." after the last frame
      if (p.length - i == 128 && p(i) == 'T' && p(i + 1) == 'A' && p(i + 2) == 'G')
        return if (nFrames > 0) Some(Mp3Info(sampleRate, channels, bitrateFirst,
          nFrames, totalSamples * 1000L / sampleRate)) else None
      mp3FrameHeader(p, i) match {
        case None => return None // desynced / torn
        case Some((frameLen, sr, ch, kbps, spf)) =>
          if (i.toLong + frameLen > p.length) return None // torn final frame
          if (nFrames == 0) { sampleRate = sr; channels = ch; bitrateFirst = kbps }
          else if (sr != sampleRate) return None // mid-stream rate change: not one stream
          nFrames += 1
          totalSamples += spf
          i += frameLen
      }
    }
    if (nFrames == 0) None
    else Some(Mp3Info(sampleRate, channels, bitrateFirst, nFrames,
      totalSamples * 1000L / sampleRate))
  }

  /** Header-only MP3 facts — (sampleRate, channels) from the FIRST frame
    * header (after any ID3v2 tag), no full-payload walk: the cheap parse
    * for [[decode]], mirroring [[wavFormat]].
    */
  def mp3Format(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 4) return None
    def u8(j: Int): Int = p(j) & 0xff
    var i = 0
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
      val tagLen = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      if (10L + tagLen >= p.length) return None
      i = 10 + tagLen
    }
    mp3FrameHeader(p, i).map { case (_, sr, ch, _, _) => (sr, ch) }
  }

  /** Synthesize a complete CBR MPEG-1 Layer III container (valid frame
    * headers + deterministic junk frame bodies — headers parse, samples
    * are noise) for tests and oracle queries. [[mp3Info]] must walk every
    * frame to reproduce (nFrames, durationMs) exactly.
    */
  def mp3Bytes(sampleRate: Int, bitrateKbps: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val srIdx = Mp3RatesV1.indexOf(sampleRate)
    val brIdx = Mp3BitrateV1.indexOf(bitrateKbps)
    require(srIdx >= 0, s"not an MPEG-1 sample rate: $sampleRate")
    require(brIdx > 0, s"not an MPEG-1 Layer III bitrate: $bitrateKbps")
    require(channels == 1 || channels == 2, s"channels must be 1 or 2: $channels")
    val frameLen = 144 * (bitrateKbps * 1000) / sampleRate // padding 0
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      out(base + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
      out(base + 3) = (if (channels == 1) 0xc0 else 0x00).toByte // mode
      var j = 4
      while (j < frameLen) { out(base + j) = ((j * 31 + f) & 0xff).toByte; j += 1 }
      f += 1
    }
    out
  }

  /** Parsed OGG/Vorbis facts from a full page walk with per-page CRC
    * validation: `nSamples` is the final page's granule position (total
    * PCM samples for Vorbis), `nPages` the real page count.
    */
  final case class OggInfo(sampleRate: Int, channels: Int, nSamples: Long,
                           durationMs: Long, nPages: Int)

  /** OGG page CRC: CRC-32 with polynomial 0x04c11db7, init 0, no final
    * xor, MSB-first, computed with the 4 CRC bytes zeroed (RFC 3533 §6).
    */
  private[graft] def oggCrc(p: Array[Byte], from: Int, len: Int, crcOffset: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      val b = if (i >= crcOffset && i < crcOffset + 4) 0 else p(from + i) & 0xff
      crc ^= b << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7 else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Header-only OGG format probe: (sampleRate, channels) from the FIRST
    * page's Vorbis identification header alone — O(first page) ≈ 60 bytes,
    * CRC-validating just that page. This is [[decode]]'s cheap path
    * (mirroring `wavFormat`/`mp3Format`); the O(payload) full-stream walk
    * with per-page CRC + EOS granule lives in [[oggInfo]] for the
    * feature-extraction consumers that need duration/sample counts.
    */
  def oggFormat(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 27) return None
    def u8(j: Int): Int = p(j) & 0xff
    def le32(j: Int): Long = u8(j) | (u8(j + 1) << 8) | (u8(j + 2) << 16) | (u8(j + 3).toLong << 24)
    if (!(p(0) == 'O' && p(1) == 'g' && p(2) == 'g' && p(3) == 'S') || u8(4) != 0) return None
    val headerType = u8(5)
    val nSegs = u8(26)
    if (27L + nSegs > p.length) return None
    var bodyLen = 0
    var s = 0
    while (s < nSegs) { bodyLen += u8(27 + s); s += 1 }
    val pageLen = 27 + nSegs + bodyLen
    if (pageLen.toLong > p.length) return None
    if (oggCrc(p, 0, pageLen, 22) != le32(22).toInt) return None
    // beginning-of-stream page carrying the Vorbis ident:
    // packet_type 0x01 + "vorbis" + version(4) + channels(1) + rate(4)
    val b = 27 + nSegs
    if ((headerType & 0x02) == 0 || bodyLen < 16 ||
        u8(b) != 0x01 || new String(p, b + 1, 6, "US-ASCII") != "vorbis") return None
    val channels = u8(b + 11)
    val sampleRate = le32(b + 12).toInt
    if (channels <= 0 || sampleRate <= 0) None else Some((sampleRate, channels))
  }

  /** REAL OGG container parse: strict "OggS" page walk (version 0, lacing
    * table, body), VALIDATING each page's CRC — a flipped byte anywhere in
    * the stream returns None, stronger than the other parsers' structural
    * checks. The first page must carry a Vorbis identification header
    * (channels, sample rate); the last page must be flagged end-of-stream
    * and its granule position is the total sample count. Sample decode
    * (the Vorbis MDCT) stays stubbed; all facts here come from the real
    * page structure.
    */
  def oggInfo(p: Array[Byte]): Option[OggInfo] = {
    if (p == null || p.length < 27) return None
    def u8(j: Int): Int = p(j) & 0xff
    def le32(j: Int): Long = u8(j) | (u8(j + 1) << 8) | (u8(j + 2) << 16) | (u8(j + 3).toLong << 24)
    def le64(j: Int): Long = le32(j) | (le32(j + 4) << 32)
    var i = 0
    var nPages = 0
    var sampleRate = 0
    var channels = 0
    var lastGranule = -1L
    var sawEos = false
    while (i < p.length) {
      if (sawEos) return None // bytes after the end-of-stream page: torn
      if (i.toLong + 27 > p.length) return None
      if (!(p(i) == 'O' && p(i + 1) == 'g' && p(i + 2) == 'g' && p(i + 3) == 'S') ||
          u8(i + 4) != 0) return None
      val headerType = u8(i + 5)
      val granule = le64(i + 6)
      val nSegs = u8(i + 26)
      if (i.toLong + 27 + nSegs > p.length) return None
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += u8(i + 27 + s); s += 1 }
      val pageLen = 27 + nSegs + bodyLen
      if (i.toLong + pageLen > p.length) return None
      if (oggCrc(p, i, pageLen, 22) != le32(i + 22).toInt) return None // corrupt page
      if (nPages == 0) {
        // beginning-of-stream page must carry the Vorbis ident header:
        // packet_type 0x01 + "vorbis" + version(4) + channels(1) + rate(4)
        val b = i + 27 + nSegs
        if ((headerType & 0x02) == 0 || bodyLen < 16 ||
            u8(b) != 0x01 || new String(p, b + 1, 6, "US-ASCII") != "vorbis")
          return None
        channels = u8(b + 11)
        sampleRate = le32(b + 12).toInt
        if (channels <= 0 || sampleRate <= 0) return None
      }
      if (granule >= 0) lastGranule = granule
      if ((headerType & 0x04) != 0) sawEos = true
      nPages += 1
      i += pageLen
    }
    if (!sawEos || lastGranule < 0) None // no end-of-stream page: torn
    else Some(OggInfo(sampleRate, channels, lastGranule,
      lastGranule * 1000L / sampleRate, nPages))
  }

  /** Synthesize a complete OGG/Vorbis-ident container (valid pages with
    * REAL CRCs; content-page bodies are deterministic junk) — [[oggInfo]]
    * must walk and CRC-check every page to reproduce the facts exactly.
    * Pages: 1 ident (BOS) + `contentPages` (the last flagged EOS, granule
    * = totalSamples).
    */
  def oggBytes(sampleRate: Int, channels: Int, totalSamples: Long,
               contentPages: Int): Array[Byte] = {
    require(contentPages >= 1, s"need at least one content page: $contentPages")
    val bos = new java.io.ByteArrayOutputStream()
    def page(headerType: Int, granule: Long, seq: Int, body: Array[Byte]): Unit = {
      require(body.length <= 255, "single-segment synthesizer")
      val page = java.nio.ByteBuffer.allocate(27 + 1 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      page.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(headerType.toByte)
      page.putLong(granule).putInt(0x6772616f).putInt(seq).putInt(0) // serial, seq, crc=0
      page.put(1.toByte).put(body.length.toByte).put(body)
      val arr = page.array()
      val crc = oggCrc(arr, 0, arr.length, 22)
      arr(22) = crc.toByte; arr(23) = (crc >> 8).toByte
      arr(24) = (crc >> 16).toByte; arr(25) = (crc >> 24).toByte
      bos.write(arr)
    }
    val ident = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ident.put(0x01.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
    ident.put(channels.toByte).putInt(sampleRate)
    ident.putInt(0).putInt(0).putInt(0).put(0xb8.toByte) // bitrates + blocksizes
    page(0x02, 0L, 0, ident.array()) // beginning of stream
    var pg = 0
    while (pg < contentPages) {
      val last = pg == contentPages - 1
      val granule = if (last) totalSamples else totalSamples * (pg + 1) / contentPages
      page(if (last) 0x04 else 0x00, granule, pg + 1,
        Array.tabulate(40)(j => ((j * 17 + pg) & 0xff).toByte))
      pg += 1
    }
    bos.toByteArray
  }

  /** Parsed MP4 (ISO-BMFF) facts from a real box walk: movie-header
    * timescale/duration, the video track's 16.16-fixed dimensions, and the
    * frame count summed from the sample-table `stts` entries.
    */
  final case class Mp4Info(width: Int, height: Int, timescale: Long,
                           durationMs: Long, nFrames: Int, brand: String)

  /** REAL MP4/ISO-BMFF container parse: top-level box walk (32-bit and
    * 64-bit box sizes; bounds in LONG so a crafted largesize cannot wrap),
    * requiring a leading `ftyp`, then `moov` → `mvhd` (v0/v1 timescale +
    * duration) and per-`trak` `tkhd` dims + `mdia/minf/stbl/stts` sample
    * counts. The video track = the first with nonzero tkhd dims. Pixel
    * decode of the actual AVC/HEVC samples stays stubbed; everything here
    * is read from the real box structure.
    */
  def mp4Info(p: Array[Byte]): Option[Mp4Info] = {
    if (p == null || p.length < 16) return None
    def u8(j: Int): Int = p(j) & 0xff
    def be32(j: Int): Long = (u8(j).toLong << 24) | (u8(j + 1) << 16) | (u8(j + 2) << 8) | u8(j + 3)
    def be64(j: Int): Long = (be32(j) << 32) | be32(j + 4)
    def tag(j: Int): String = new String(p, j, 4, "US-ASCII")
    // walk boxes in [from, to); call f(type, bodyFrom, bodyTo); false = torn
    def walk(from: Long, to: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = from
      while (i < to) {
        if (i + 8 > to) return false
        val size32 = be32(i.toInt)
        val (size, hdr) =
          if (size32 == 1) { if (i + 16 > to) return false; (be64(i.toInt + 8), 16L) }
          else if (size32 == 0) (to - i, 8L)
          else (size32, 8L)
        if (size < hdr || i + size > to) return false
        f(tag(i.toInt + 4), i + hdr, i + size)
        i += size
      }
      true
    }
    var brand: String = null
    var timescale = 0L; var duration = -1L
    var width = 0; var height = 0
    var nFrames = 0
    var sawMoov = false
    var first = true
    var torn = false
    val ok = walk(0L, p.length.toLong) { (typ, from, to) =>
      if (first) { if (typ != "ftyp" || to - from < 4) torn = true else brand = tag(from.toInt); first = false }
      else if (typ == "moov") {
        sawMoov = true
        if (!walk(from, to) { (t2, f2, t2e) =>
          if (t2 == "mvhd" && t2e - f2 >= 20) {
            val v = u8(f2.toInt)
            if (v == 0) { timescale = be32(f2.toInt + 12); duration = be32(f2.toInt + 16) }
            else if (t2e - f2 >= 32) { timescale = be32(f2.toInt + 20); duration = be64(f2.toInt + 24) }
          } else if (t2 == "trak") {
            var w = 0; var h = 0; var frames = 0
            if (!walk(f2, t2e) { (t3, f3, t3e) =>
              if (t3 == "tkhd") {
                val v = u8(f3.toInt)
                val dimOff = if (v == 0) 76 else 88
                if (t3e - f3 >= dimOff + 8) {
                  w = (be32(f3.toInt + dimOff) >> 16).toInt      // 16.16 fixed
                  h = (be32(f3.toInt + dimOff + 4) >> 16).toInt
                }
              } else if (t3 == "mdia") {
                // every nested walk's Boolean propagates: a malformed
                // child-box size anywhere under mdia is a torn payload
                // (→ None), same contract as the trak/moov levels
                if (!walk(f3, t3e) { (t4, f4, t4e) =>
                  if (t4 == "minf") { if (!walk(f4, t4e) { (t5, f5, t5e) =>
                    if (t5 == "stbl") { if (!walk(f5, t5e) { (t6, f6, t6e) =>
                      if (t6 == "stts" && t6e - f6 >= 8) {
                        val entries = be32(f6.toInt + 4)
                        if (8 + entries * 8 <= t6e - f6) {
                          var e = 0L
                          while (e < entries) {
                            frames += be32((f6 + 8 + e * 8).toInt).toInt
                            e += 1
                          }
                        } else torn = true
                      }
                    }) torn = true }
                  }) torn = true }
                }) torn = true
              }
            }) torn = true
            // video track = the first with nonzero tkhd dims
            if (w > 0 && h > 0 && width == 0) { width = w; height = h; nFrames = frames }
            else if (nFrames == 0) nFrames = frames
          }
        }) torn = true
      }
    }
    if (!ok || torn || !sawMoov || brand == null || timescale <= 0 || duration < 0) None
    else Some(Mp4Info(width, height, timescale, duration * 1000L / timescale, nFrames, brand))
  }

  /** Synthesize a complete minimal ISO-BMFF movie (`ftyp` + `moov{mvhd,
    * trak{tkhd, mdia{mdhd, hdlr(vide), minf{stbl{stts}}}}}` + stub `mdat`)
    * — [[mp4Info]] must walk the real box tree and sum the `stts` entries
    * to reproduce (width, height, durationMs, nFrames) exactly.
    */
  def mp4Bytes(width: Int, height: Int, timescale: Int, durationTicks: Long,
               sttsCounts: Seq[Int]): Array[Byte] = {
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(len)
      b.putInt(len).put(typ.getBytes("US-ASCII"))
      body.foreach(b.put)
      b.array()
    }
    def full(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](0, 0, 0, 0), payload) // version 0 + flags
    def be(vals: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(b.putInt); b.array()
    }
    val mvhd = full("mvhd", be(0, 0, timescale, durationTicks.toInt,
      0x00010000, 0x01000000) ++ new Array[Byte](52))
    // tkhd v0: ctime mtime trackId res duration res(8) layer/alt volume/res
    // matrix(36) width height (16.16)
    val tkhd = full("tkhd", be(0, 0, 1, 0, durationTicks.toInt, 0, 0, 0, 0) ++
      be(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000) ++
      be(width << 16, height << 16))
    val mdhd = full("mdhd", be(0, 0, timescale, durationTicks.toInt, 0x55c40000))
    val hdlr = full("hdlr", be(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12) ++
      Array[Byte]('g', 0))
    val stts = full("stts", be(sttsCounts.length) ++
      sttsCounts.toArray.flatMap(c => be(c, 512)))
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be(0x200),
      "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", Array.tabulate(16)(j => (j * 7).toByte))
    ftyp ++ moov ++ mdat
  }

  /** STUB decode for the SAMPLE/PIXEL level of codecs the JVM does not
    * ship (MP3/Vorbis PCM synthesis, AVC/HEVC video frames): deterministic
    * fake features from the payload bytes. A real implementation would
    * decode samples/frames here (???); the surrounding schema, batching
    * and partitioning are production-shaped. Images, WAV audio and the
    * CONTAINER facts of MP3/OGG/MP4 never reach this — their parses above
    * are real.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val len = if (payload == null) 0 else payload.length
    // ??? real codec goes here — deterministic fake keeps tests meaningful
    val width = 16 + (len % 64)
    val height = 16 + ((len / 64) % 64)
    val sampleRate = 8000 + (len % 3) * 4000
    val nFrames = 1 + (len % 30)
    (width, height, sampleRate, nFrames)
  }

  final case class MediaIn(media_id: Long, modality: String, payload: Array[Byte])
  final case class MediaOut(media_id: Long, modality: String, payload: Array[Byte],
                            width: Option[Int], height: Option[Int],
                            sample_rate: Option[Int], n_frames: Option[Int])

  /** Build a media table from any binary payload column — partition-batched
    * decode via typed mapPartitions (the Scala analogue of `mapInPandas`:
    * one iterator pass per partition, codec setup amortized per partition).
    */
  def decode(df: DataFrame, idCol: String, payloadCol: String, modalityCol: String): Dataset[MediaOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(modalityCol).as("modality"), col(payloadCol).as("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        // per-partition codec setup would happen once here
        it.map { m =>
          val (sw, sh, sr, nf) = decodeStub(m.payload)
          val visual = m.modality == "image" || m.modality == "video"
          // REAL container parse first (PNG/JPEG/BMP/GIF dims, MP4 track
          // dims, RIFF/WAVE + MP3 + OGG audio facts — header-only here;
          // the O(payload) passes live in audioFeatures/mp3Meta/oggMeta);
          // stub only for genuinely unrecognized containers
          lazy val mp4 = mp4Info(m.payload)
          val (w, h) = imageDims(m.payload)
            .orElse(mp4.filter(i => i.width > 0 && i.height > 0).map(i => (i.width, i.height)))
            .getOrElse((sw, sh))
          val realSr = wavFormat(m.payload).orElse(mp3Format(m.payload))
            .orElse(oggFormat(m.payload)).map(_._1)
          val realNf = gifFrameCount(m.payload) // block walk, no decompression
            .orElse(mp4.map(_.nFrames).filter(_ > 0))
          MediaOut(m.media_id, m.modality, m.payload,
            if (visual) Some(w) else None,
            if (visual) Some(h) else None,
            if (m.modality == "audio") Some(realSr.getOrElse(sr)) else None,
            if (m.modality == "video") Some(realNf.getOrElse(nf)) else None)
        }
      }
  }

  final case class AudioOut(media_id: Long, sample_rate: Option[Int], channels: Option[Int],
                            n_samples: Option[Int], duration_ms: Option[Long],
                            rms: Option[Double], peak: Option[Int])

  /** Audio feature extraction over a binary WAV payload column — real
    * per-sample decode (RMS/peak), partition-batched like [[decode]].
    * Unparseable payloads yield all-null feature columns (kept, not
    * dropped: a quality-filter step downstream decides).
    */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        wavFeatures(p) match {
          case Some(w) => AudioOut(id, Some(w.sampleRate), Some(w.channels),
            Some(w.nSamples), Some(w.durationMs), Some(w.rms), Some(w.peak))
          case None => AudioOut(id, None, None, None, None, None, None)
        }
      })
  }

  final case class Mp3Out(media_id: Long, sample_rate: Option[Int], channels: Option[Int],
                          bitrate_kbps: Option[Int], n_frames: Option[Int],
                          duration_ms: Option[Long])

  /** MP3 container metadata over a binary payload column — real full frame
    * walk per payload ([[mp3Info]]), partition-batched like [[decode]].
    * Unparseable payloads keep their row with null features.
    */
  def mp3Meta(df: DataFrame, idCol: String, payloadCol: String): Dataset[Mp3Out] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        mp3Info(p) match {
          case Some(i) => Mp3Out(id, Some(i.sampleRate), Some(i.channels),
            Some(i.bitrateKbps), Some(i.nFrames), Some(i.durationMs))
          case None => Mp3Out(id, None, None, None, None, None)
        }
      })
  }

  final case class OggOut(media_id: Long, sample_rate: Option[Int], channels: Option[Int],
                          n_samples: Option[Long], duration_ms: Option[Long],
                          n_pages: Option[Int])

  /** OGG/Vorbis container metadata over a binary payload column — real
    * CRC-validated page walk ([[oggInfo]]), partition-batched.
    */
  def oggMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[OggOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        oggInfo(p) match {
          case Some(i) => OggOut(id, Some(i.sampleRate), Some(i.channels),
            Some(i.nSamples), Some(i.durationMs), Some(i.nPages))
          case None => OggOut(id, None, None, None, None, None)
        }
      })
  }

  final case class Mp4Out(media_id: Long, width: Option[Int], height: Option[Int],
                          n_frames: Option[Int], duration_ms: Option[Long])

  /** MP4 container metadata over a binary payload column — real box walk
    * ([[mp4Info]]), partition-batched.
    */
  def mp4Meta(df: DataFrame, idCol: String, payloadCol: String): Dataset[Mp4Out] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        mp4Info(p) match {
          case Some(i) => Mp4Out(id, Some(i.width), Some(i.height),
            Some(i.nFrames), Some(i.durationMs))
          case None => Mp4Out(id, None, None, None, None)
        }
      })
  }

  final case class ImageStatsOut(media_id: Long, width: Option[Int], height: Option[Int],
                                 sum_r: Option[Long], sum_g: Option[Long],
                                 sum_b: Option[Long], top_row_sum_r: Option[Long])

  /** Pixel-statistics extraction over a binary image payload column — real
    * per-pixel decode (channel sums + top-row sum), partition-batched.
    * Accepts any format [[imagePixelStats]] decodes: 24-bit BMP on the
    * hand-rolled fast path, PNG/JPEG/GIF through the JDK reader.
    */
  def imageStats(df: DataFrame, idCol: String, payloadCol: String): Dataset[ImageStatsOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        imagePixelStats(p) match {
          case Some(s) => ImageStatsOut(id, Some(s.width), Some(s.height),
            Some(s.sumR), Some(s.sumG), Some(s.sumB), Some(s.topRowSumR))
          case None => ImageStatsOut(id, None, None, None, None, None, None)
        }
      })
  }

  final case class FrameStatsOut(media_id: Long, n_frames: Option[Int],
                                 first_frame_sum: Option[Long], last_frame_sum: Option[Long])

  /** REAL frame decode over a multi-frame (animated GIF) payload column:
    * actual container frame count plus the first/last frames' gray sums
    * (sum of all three channels — catches dropped frames AND wrong frame
    * order). Partition-batched like [[decode]]; undecodable payloads keep
    * their row with null features.
    */
  def videoFrameStats(df: DataFrame, idCol: String, payloadCol: String): Dataset[FrameStatsOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        gifFrameStats(p) match {
          case Some(frames) if frames.nonEmpty =>
            def gsum(s: BmpStats): Long = s.sumR + s.sumG + s.sumB
            FrameStatsOut(id, Some(frames.length),
              Some(gsum(frames.head)), Some(gsum(frames.last)))
          case _ => FrameStatsOut(id, None, None, None)
        }
      })
  }

  final case class ResizedOut(media_id: Long, width: Option[Int], height: Option[Int],
                              out_width: Option[Int], out_height: Option[Int],
                              payload: Array[Byte])

  /** REAL resize: decode ([[imagePixelStats]]'s reader), integer
    * nearest-neighbor sample (src = (dst * srcDim) / outDim, floor — no
    * float rounding, so the result is closed-form reproducible), PNG
    * re-encode. Out dims preserve aspect ratio via integer ceil:
    * out = (dim * maxSide + longest - 1) / longest; images already within
    * `maxSide` pass through with their original payload untouched.
    * Undecodable payloads keep their row with null dims and a null
    * payload (a downstream quality filter decides).
    */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
                   maxSide: Int): Dataset[ResizedOut] = {
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val decoded =
          if (p == null || !dimsWithinBound(p, MaxDecodePixels)) None // bomb guard
          else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
          catch { case _: Exception => None }
        decoded match {
          case None => ResizedOut(id, None, None, None, None, null)
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            val longest = math.max(w, h)
            if (longest <= maxSide) ResizedOut(id, Some(w), Some(h), Some(w), Some(h), p)
            else {
              val outW = ((w.toLong * maxSide + longest - 1) / longest).toInt
              val outH = ((h.toLong * maxSide + longest - 1) / longest).toInt
              val out = new java.awt.image.BufferedImage(outW, outH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < outH) {
                val sy = ((y.toLong * h) / outH).toInt
                var x = 0
                while (x < outW) {
                  out.setRGB(x, y, img.getRGB(((x.toLong * w) / outW).toInt, sy) & 0xffffff)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedOut(id, Some(w), Some(h), Some(outW), Some(outH), bos.toByteArray)
            }
        }
      })
  }

  /** Frame sampling plan for video payloads: one row per sampled frame
    * index (every `stride`-th frame) — explode(sequence), no UDF.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select("media_id", "frame_idx")

  /** Resize plan: pure-metadata transform computing target dims with
    * preserved aspect ratio — the cheap dims-only twin of the real
    * pixel-level [[resizeImages]].
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.filter(col("modality").isin("image", "video"))
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
      .select("media_id", "width", "height", "out_width", "out_height")
}
