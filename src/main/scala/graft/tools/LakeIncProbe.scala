package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalDedup, LakeDedupStore}

/** Evidence for the round-4 store graduation: with the lake-backed
  * signature store, a CONSTANT-size refresh stays FLAT as the corpus
  * grows 10×, because the banded probe prunes to the batch's partitions
  * and partition size is bounded by compaction splits — whereas the
  * in-memory store's probe scans the whole store and its carry rewrites
  * it, so the same refresh grows with the corpus.
  *
  * Builds two lake stores from a replicated document corpus (S and 10S),
  * then times the SAME small batch against both; contrasts with the
  * in-memory refresh at both sizes. Wall-clock medians of `reps` plans
  * (probe leg) plus one committed refresh each.
  *
  * Usage: runMain graft.tools.LakeIncProbe [sfDir] [smallMult] [bigMult]
  *        [batchDocs] — prints one JSON line.
  */
object LakeIncProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val smallMult = args.lift(1).map(_.toInt).getOrElse(10)
    val bigMult = args.lift(2).map(_.toInt).getOrElse(100)
    val batchDocs = args.lift(3).map(_.toInt).getOrElse(32)
    val reps = 3
    val maxRowsPerPid = 512L
    val minJ = 0.95 // replicas carry distinct tags; keep pair volume tiny
    val spark = SparkSession.builder()
      .appName("graft-lake-inc-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("key"), col("text"))
      .localCheckpoint(true)

    /** Deterministic ×mult corpus, ScaleUp's replica rule: every token is
      * SUFFIXED with the replica id, so shingle sets are DISJOINT across
      * replicas (a trailing-tag replica would form mult-sized near-dup
      * cliques — quadratic candidate volume that no real corpus has)
      * while each replica keeps the source corpus's natural within-slice
      * similarity structure.
      */
    def corpus(mult: Int): DataFrame =
      docs.crossJoin(spark.range(mult).select(col("id").cast("int").as("rep")))
        .select(concat_ws("#", col("key"), col("rep")).as("key"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_r"), col("rep"))).as("text"))

    // the constant probe batch: fresh keys, near-dup twins of replica 1's
    // slice (one planted collision family per probe doc — bounded
    // candidates, like a real batch; present in both store sizes)
    val batch = docs.orderBy(xxhash64(col("key"))).limit(batchDocs)
      .select(concat(lit("probe#"), col("key")).as("key"),
        concat(regexp_replace(col("text"), lit("(\\S+)"), lit("$1_r1")),
          lit(" probetoken")).as("text"))
      .localCheckpoint(true)

    def buildLake(dir: String, mult: Int): (LakeDedupStore, Double, Long) = {
      val c = corpus(mult)
      val store = LakeDedupStore.create(spark, dir, numPids = 64)
      val (_, buildSec) = time {
        store.refresh(c, c.select("key").limit(0), watermark = 1L, minJaccard = minJ).count()
        store.maintain(maxRowsPerPid = maxRowsPerPid, vacuumGraceMs = 0L)
      }
      (store, buildSec, c.count())
    }

    def probeLake(store: LakeDedupStore): (Double, Double) = {
      val plans = (1 to reps).map { _ =>
        val (_, s) = time {
          store.planRefresh(batch, batch.select("key").limit(0), minJ).pairs.count()
        }
        s
      }
      val (_, committed) = time {
        store.refresh(batch, batch.select("key").limit(0),
          store.watermark + 1, minJ).count()
      }
      (median(plans), committed)
    }

    def probeMem(mult: Int): (Double, Double) = {
      val c = corpus(mult)
      val (st, buildSec) = time {
        val (s, _) = IncrementalDedup.refresh(IncrementalDedup.emptyStore(spark),
          c, "text", "key", minJaccard = minJ)
        s.count(); s
      }
      val refreshes = (1 to reps).map { _ =>
        val (_, s) = time {
          val (s2, p) = IncrementalDedup.refresh(st, batch, "text", "key", minJaccard = minJ)
          p.count(); s2.count()
        }
        s
      }
      (median(refreshes), buildSec)
    }

    val base = sys.env.getOrElse("GRAFT_BENCH_TMP",
      java.nio.file.Files.createTempDirectory("lakeinc").toString)
    val (smallStore, smallBuild, smallRows) = buildLake(s"$base/small", smallMult)
    val (smallPlan, smallCommit) = probeLake(smallStore)
    val (bigStore, bigBuild, bigRows) = buildLake(s"$base/big", bigMult)
    val (bigPlan, bigCommit) = probeLake(bigStore)
    val pidsSmall = smallStore.bandStore.numPids
    val pidsBig = bigStore.bandStore.numPids
    val (memSmall, _) = probeMem(smallMult)
    val (memBig, _) = probeMem(bigMult)

    println(
      f"""{"metric":"lake_incremental_flat","batch_docs":$batchDocs,""" +
      f""""small_docs":$smallRows,"big_docs":$bigRows,""" +
      f""""small_numPids":$pidsSmall,"big_numPids":$pidsBig,""" +
      f""""lake_build_small_sec":$smallBuild%.2f,"lake_build_big_sec":$bigBuild%.2f,""" +
      f""""lake_plan_small_sec":$smallPlan%.2f,"lake_plan_big_sec":$bigPlan%.2f,""" +
      f""""lake_refresh_small_sec":$smallCommit%.2f,"lake_refresh_big_sec":$bigCommit%.2f,""" +
      f""""lake_growth_ratio":${bigPlan / math.max(smallPlan, 1e-9)}%.2f,""" +
      f""""mem_refresh_small_sec":$memSmall%.2f,"mem_refresh_big_sec":$memBig%.2f,""" +
      f""""mem_growth_ratio":${memBig / math.max(memSmall, 1e-9)}%.2f}""")
    spark.stop()
  }
}
