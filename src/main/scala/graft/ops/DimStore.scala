package graft.ops

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Manifest

/** Persistent, single-source-of-truth dimension table with SERIALIZED id
  * minting — the stateful form of [[TableOps.lookupOrCreate]].
  *
  * The pure-transform lookupOrCreate mints ids relative to whatever dim
  * DataFrame it was handed, so two concurrent writers starting from the
  * same snapshot mint the SAME ids for different keys. This store routes
  * every append through a versioned commit with a compare-and-swap on the
  * `_current` pointer (the same protocol as [[graft.lake.LakeTable]]):
  * a losing writer re-reads the winner's dim, re-derives its still-missing
  * keys, and retries — minted ids are globally unique by construction.
  *
  * Reference analogue: `_get_and_create_entities_in_db`'s
  * select-then-insert race handling (owid-etl
  * `etl/grapher_helpers.py:320-399`), re-expressed as optimistic
  * concurrency instead of a DB unique-constraint retry.
  *
  * Scale shape: the dim itself is small (entities/countries — broadcast
  * class); the expensive part, finding which fact keys are MISSING, is a
  * distributed anti-join. Only the missing keys (new entities are rare in
  * steady state) are collected to the driver for minting.
  */
final class DimStore private (val root: Path, spark: SparkSession,
                              val naturalKey: String, val idCol: String) {

  private def currentPtr: Path = root.resolve("_current")

  def currentVersion: Long =
    new String(Files.readAllBytes(currentPtr)).trim.toLong

  private def versionDir(v: Long): Path = root.resolve(f"v$v%010d")

  /** The committed dim at `version`: (naturalKey, idCol). */
  def dimAt(version: Long): DataFrame =
    spark.read.parquet(versionDir(version).toString)

  def dim(): DataFrame = dimAt(currentVersion)

  /** Ensure every distinct `naturalKey` in `fact` has an id, minting new
    * ids under the CAS commit; returns (factWithIds, dimAfter). Safe to
    * call from concurrent writers — each retry re-reads the current dim,
    * so two writers minting overlapping key sets converge on one id per
    * key and disjoint ids for disjoint keys.
    */
  def lookupOrCreate(fact: DataFrame, maxRetries: Int = 20): (DataFrame, DataFrame) = {
    val keys = fact.select(col(naturalKey)).distinct()
    var attempt = 0
    while (attempt < maxRetries) {
      val v = currentVersion
      val d = dimAt(v)
      // distributed: only keys the current dim lacks come to the driver
      val missingRaw = keys.join(d.select(col(naturalKey)), Seq(naturalKey), "left_anti")
        .collect().map(_.get(0))
      // a NULL natural key always anti-joins as "missing" — refuse loudly
      // instead of NPE-ing in the sort or minting an id for the string
      // "null" (reference behavior: entities must have names)
      require(!missingRaw.contains(null),
        s"fact contains NULL $naturalKey rows — cannot mint an entity id for null")
      val missing = missingRaw.map(_.toString).sorted
      if (missing.isEmpty) {
        val joined = fact.join(broadcast(d), Seq(naturalKey), "left")
        return (joined, d)
      }
      val committed = DimStore.pathLock(root).synchronized {
        if (currentVersion != v) false // CAS lost: another writer committed
        else {
          val maxId = d.agg(coalesce(max(col(idCol)), lit(0L)).cast("long"))
            .collect()(0).getLong(0)
          val minted = missing.zipWithIndex.map { case (k, i) => (k, maxId + 1 + i) }
          import spark.implicits._
          val mintedDf = spark.createDataFrame(minted.map(t => (t._1.toString, t._2)).toSeq)
            .toDF(naturalKey, idCol)
          val next = d.select(col(naturalKey).cast("string"), col(idCol).cast("long"))
            .unionByName(mintedDf)
          next.coalesce(1).write.mode("overwrite").parquet(versionDir(v + 1).toString)
          Manifest.writeAtomic(currentPtr, (v + 1).toString)
          true
        }
      }
      if (!committed) attempt += 1 // retry against the winner's dim
      else {
        val d2 = dimAt(v + 1)
        return (fact.join(broadcast(d2), Seq(naturalKey), "left"), d2)
      }
    }
    throw new IllegalStateException(
      s"dim commit lost the CAS race $maxRetries times at $root — writer storm?")
  }
}

object DimStore {

  /** Same per-path JVM monitor pattern as LakeTable: any number of
    * DimStore instances over one directory serialize their
    * read-check-write commit sections.
    */
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private def pathLock(root: Path): Object =
    locks.getOrElseUpdate(root.toAbsolutePath.normalize.toString, new Object)

  def create(spark: SparkSession, dir: String, naturalKey: String, idCol: String,
             initial: Option[DataFrame] = None): DimStore = {
    val root = Paths.get(dir)
    require(!Files.exists(root.resolve("_current")), s"dim store already exists at $dir")
    Files.createDirectories(root)
    val s = new DimStore(root, spark, naturalKey, idCol)
    val init = initial.map(_.select(col(naturalKey).cast("string"), col(idCol).cast("long")))
      .getOrElse {
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField(naturalKey, StringType), StructField(idCol, LongType))))
      }
    init.coalesce(1).write.mode("overwrite").parquet(root.resolve(f"v${0L}%010d").toString)
    Manifest.writeAtomic(root.resolve("_current"), "0")
    s
  }

  def load(spark: SparkSession, dir: String, naturalKey: String, idCol: String): DimStore = {
    val root = Paths.get(dir)
    require(Files.exists(root.resolve("_current")), s"no dim store at $dir")
    new DimStore(root, spark, naturalKey, idCol)
  }
}
