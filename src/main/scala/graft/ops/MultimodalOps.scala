package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in partition-batched
  * passes. The Spark-side plumbing (schema, partitioning, batch shape) is
  * real; the codec itself is a STUB — this container ships no image/audio
  * libraries, so `decodeStub` derives deterministic fake features from the
  * bytes. Swap `decodeStub` for a real codec (e.g. a JNI/pandas-UDF decode)
  * without touching the pipeline shape.
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

  /** STUB decode: deterministic fake features from the payload bytes.
    * Real implementation would decode pixels/samples here (???); the
    * surrounding schema, batching and partitioning are production-shaped.
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
          // REAL header parse first (PNG/JPEG); stub only when the payload
          // is not a recognized image container
          val (w, h) = imageDims(m.payload).getOrElse((sw, sh))
          MediaOut(m.media_id, m.modality, m.payload,
            if (visual) Some(w) else None,
            if (visual) Some(h) else None,
            if (m.modality == "audio") Some(sr) else None,
            if (m.modality == "video") Some(nf) else None)
        }
      }
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
    * preserved aspect ratio (the actual pixel work lives behind the stub).
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
