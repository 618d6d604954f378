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
          val (w, h, sr, nf) = decodeStub(m.payload)
          val visual = m.modality == "image" || m.modality == "video"
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
