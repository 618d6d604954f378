package graft.ops

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lake.LakeTable

/** Table catalog over a directory tree of channel/namespace/table data
  * (owid-etl `LocalCatalog.find/find_one`, frame-indexed search —
  * `lib/catalog/owid/catalog/catalogs.py:112-407`). Entries are either
  * plain parquet files/dirs or LakeTables (directory with `_current`).
  */
final class Catalog(spark: SparkSession, root: String) {

  final case class Entry(channel: String, namespace: String, table: String, path: String,
                         isLake: Boolean)

  /** Scan `root/channel/namespace/table` three-level layout; a one- or
    * two-level tree degrades gracefully (empty channel/namespace).
    */
  def entries: Seq[Entry] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Nil
    def isTable(p: Path): Boolean =
      Files.isRegularFile(p) && p.toString.endsWith(".parquet") ||
        (Files.isDirectory(p) && (Files.exists(p.resolve("_current")) ||
          Files.list(p).iterator().asScala.exists(c =>
            Files.isRegularFile(c) && c.toString.endsWith(".parquet"))))
    def name(p: Path): String = p.getFileName.toString.stripSuffix(".parquet")
    def walk(p: Path, parts: List[String]): Seq[Entry] = {
      if (isTable(p) && parts.nonEmpty) {
        val pad = parts.reverse.padTo(3, "")
        Seq(Entry(if (parts.size >= 3) pad(parts.size - 3) else "",
          if (parts.size >= 2) pad(parts.size - 2) else "",
          name(p), p.toString, Files.exists(p.resolve("_current"))))
      } else if (Files.isDirectory(p)) {
        Files.list(p).iterator().asScala.toSeq.sortBy(_.toString)
          .filterNot(_.getFileName.toString.startsWith("_"))
          .flatMap(c => walk(c, name(c) :: parts))
      } else Nil
    }
    walk(r, Nil)
  }

  /** Substring/exact filters like the reference's `find`. */
  def find(table: String = "", namespace: String = "", channel: String = ""): Seq[Entry] =
    entries.filter(e =>
      (table.isEmpty || e.table.contains(table)) &&
      (namespace.isEmpty || e.namespace == namespace) &&
      (channel.isEmpty || e.channel == channel))

  def findOne(table: String = "", namespace: String = "", channel: String = ""): Entry = {
    val hits = find(table, namespace, channel)
    require(hits.nonEmpty, s"no table matching table=$table namespace=$namespace channel=$channel")
    require(hits.size == 1, s"ambiguous: ${hits.map(_.path).mkString(", ")}")
    hits.head
  }

  /** Load an entry: LakeTable snapshot or parquet read (+ sidecar meta). */
  def load(e: Entry): DataFrame =
    if (e.isLake) LakeTable.load(spark, e.path).snapshot()
    else TableIO.readParquet(spark, e.path)._1
}
