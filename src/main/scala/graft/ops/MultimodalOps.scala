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
  * Only codecs the JVM genuinely does not ship (MP3/OGG samples, real
  * video containers like MP4) remain behind [[decodeStub]], which derives
  * deterministic fake features so the pipeline shape stays testable; swap
  * it for a real codec (e.g. a JNI/pandas-UDF decode) without touching
  * the plumbing.
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

  /** STUB decode for codecs the JVM does not ship (MP3/OGG samples, real
    * video containers): deterministic fake features from the payload
    * bytes. A real implementation would decode samples/frames here (???);
    * the surrounding schema, batching and partitioning are
    * production-shaped. Images and WAV audio never reach this — their
    * decodes above are real.
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
          // REAL container parse first (PNG/JPEG/BMP dims, RIFF/WAVE audio
          // facts — header-only here; the O(payload) sample pass lives in
          // audioFeatures); stub only for unrecognized containers
          val (w, h) = imageDims(m.payload).getOrElse((sw, sh))
          val realSr = wavFormat(m.payload).map(_._1)
          val realNf = gifFrameCount(m.payload) // block walk, no decompression
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
