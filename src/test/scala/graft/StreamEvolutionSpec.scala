package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcStream

/** Mid-STREAM schema evolution (SURVEY §7.5 hard part 3): later WAL chunks
  * carry a new `tool_meta` column; the stream tails with the widened
  * schema, older chunks null-fill, and the table evolves while the stream
  * is running.
  */
class StreamEvolutionSpec extends SparkSpec {

  private def writeChunk(df: DataFrame, dir: String, idx: Int): Unit = {
    val tmp = Paths.get(s"$dir/.tmp-$idx")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val target = Paths.get(f"$dir/chunk-$idx%05d.parquet")
    Files.move(part, target)
    Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + idx * 1000L))
  }

  test("WAL grows a column mid-stream; table evolves during the run") {
    val dir = tmpDir("sevo")
    val cfg = WalGen.Config(numEvents = 8000, numConvs = 80)
    try {
      Files.createDirectories(Paths.get(s"$dir/wal"))
      // chunks 0-1: original schema; chunks 2-3: + tool_meta
      (0 until 2).foreach { c =>
        writeChunk(WalGen.events(spark, cfg, c * 2000L, (c + 1) * 2000L).toDF(), s"$dir/wal", c)
      }
      (2 until 4).foreach { c =>
        val df = WalGen.events(spark, cfg, c * 2000L, (c + 1) * 2000L).toDF()
          .withColumn("tool_meta", concat(lit("""{"v":"""), col("lsn"), lit("}")))
        writeChunk(df, s"$dir/wal", c)
      }
      val widened = org.apache.spark.sql.types.StructType(
        Schemas.changeEvent.fields :+ StructField("tool_meta",
          org.apache.spark.sql.types.StringType))
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      val q = CdcStream.start(spark, s"$dir/wal", table, s"$dir/cp",
        maxFilesPerTrigger = 1, walSchema = widened)
      q.awaitTermination()

      val snap = table.snapshot()
      assert(snap.columns.contains("tool_meta"))
      // rows whose winning event predates the evolution are null-filled
      val withMeta = snap.filter(col("tool_meta").isNotNull)
      val withoutMeta = snap.filter(col("tool_meta").isNull)
      assert(withMeta.count() > 0 && withoutMeta.count() > 0)
      // winning events with lsn >= 4000 must carry their stamped meta
      val bad = snap.filter(col("tool_meta").isNotNull &&
        !col("tool_meta").startsWith("{\"v\":")).count()
      assert(bad == 0)
      // per-turn text equality vs oracle still holds after evolution
      val oracle = WalGen.oracleState(cfg)
      val got = snap.select("conv_id", "turn_idx", "text").collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      assert(got.size == oracle.size)
      oracle.foreach { case (k, e) => assert(got(k) == e.text, s"mismatch at $k") }
    } finally rmrf(dir)
  }
}
