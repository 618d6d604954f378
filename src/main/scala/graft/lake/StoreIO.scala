package graft.lake

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Directory-granularity persistence for maintenance stores (signature /
  * assignment DataFrames): parquet write into a temp sibling, then an
  * old-away / new-in swap. A crash can leave the target momentarily
  * absent (between the two moves) with the previous generation stranded
  * at an `.old-*` sibling — [[save]] SWEEPS stale `.tmp-*`/`.old-*`
  * siblings on entry, and [[load]] falls back to the newest stranded
  * `.old-*` when the target is missing, so no crash point loses a
  * committed generation or leaks copies unboundedly.
  */
object StoreIO {

  private def sweepSiblings(target: Path): Unit = {
    val dir = Option(target.getParent).getOrElse(Paths.get("."))
    val base = target.getFileName.toString
    if (!Files.isDirectory(dir)) return
    val s = Files.list(dir)
    try s.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith(base + ".tmp-") || n.startsWith(base + ".old-"))
        try graft.merge.CdcMerge.deleteRecursively(p) catch { case _: Throwable => () }
    } finally s.close()
  }

  def save(store: DataFrame, dir: String): Unit = {
    val target = Paths.get(dir)
    sweepSiblings(target) // reclaim any prior crash's leftovers FIRST
    val tmp = Paths.get(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    store.write.mode("overwrite").parquet(tmp.toString)
    val old = Paths.get(dir + ".old-" + java.util.UUID.randomUUID().toString.take(8))
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    if (Files.exists(old)) graft.merge.CdcMerge.deleteRecursively(old)
  }

  /** Load the store; when the target vanished mid-swap, the stranded
    * `.old-*` generation (there is at most one after a sweep+crash) is
    * read instead. Returns None when neither exists.
    */
  def loadOpt(spark: SparkSession, dir: String): Option[DataFrame] = {
    val target = Paths.get(dir)
    if (Files.isDirectory(target)) return Some(spark.read.parquet(dir))
    val parent = Option(target.getParent).getOrElse(Paths.get("."))
    val base = target.getFileName.toString
    if (!Files.isDirectory(parent)) return None
    val s = Files.list(parent)
    val stranded = try s.iterator().asScalaSeq
      .filter(_.getFileName.toString.startsWith(base + ".old-"))
      .sortBy(p => Files.getLastModifiedTime(p).toMillis).lastOption
    finally s.close()
    stranded.map(p => spark.read.parquet(p.toString))
  }

  def load(spark: SparkSession, dir: String): DataFrame =
    loadOpt(spark, dir).getOrElse(
      throw new IllegalStateException(s"no persisted store at $dir"))

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScalaSeq: Seq[T] = {
      val b = Seq.newBuilder[T]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
