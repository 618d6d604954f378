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
object Catalog {
  final case class Entry(channel: String, namespace: String, table: String, path: String,
                         isLake: Boolean)
}

final class Catalog(spark: SparkSession, root: String) {
  import Catalog.Entry

  /** Scan `root/channel/namespace/table` three-level layout; a one- or
    * two-level tree degrades gracefully (empty channel/namespace).
    */
  def entries: Seq[Entry] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Nil
    // Files.list streams hold an open directory handle until closed — a
    // walk over a large catalog tree must not rely on GC to release them
    def ls(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def isTable(p: Path): Boolean =
      Files.isRegularFile(p) && p.toString.endsWith(".parquet") ||
        (Files.isDirectory(p) && (Files.exists(p.resolve("_current")) ||
          ls(p).exists(c => Files.isRegularFile(c) && c.toString.endsWith(".parquet"))))
    def name(p: Path): String = p.getFileName.toString.stripSuffix(".parquet")
    def walk(p: Path, parts: List[String]): Seq[Entry] = {
      if (isTable(p) && parts.nonEmpty) {
        val pad = parts.reverse.padTo(3, "")
        Seq(Entry(if (parts.size >= 3) pad(parts.size - 3) else "",
          if (parts.size >= 2) pad(parts.size - 2) else "",
          name(p), p.toString, Files.exists(p.resolve("_current"))))
      } else if (Files.isDirectory(p)) {
        ls(p).sortBy(_.toString)
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

  /** Publish this catalog's index (see [[PublishedCatalog]]). The default
    * version is allocated via [[PublishedCatalog.freshVersion]] — never a
    * bare wall clock, which two same-millisecond publishes would share
    * (and then overwrite each other's frames under a held token).
    *
    * SYNTHETIC channels already published on this root — entries that do
    * not come from the directory walk, today the SQL registry's "sql"
    * channel ([[graft.sql.LakeCatalog]]) — are CARRIED FORWARD verbatim:
    * a re-scan of the data tree must not silently wipe registrations it
    * could never discover from disk.
    */
  def publish(version: Long = -1L): Long = {
    val v = if (version >= 0) version else PublishedCatalog.freshVersion(root)
    val scanned = entries.map(e => (e.channel, e.namespace, e.table, e.path, e.isLake))
    val scannedChannels = scanned.map(_._1).toSet
    val carried = PublishedCatalog.currentEntries(spark, root)
      .filter(e => PublishedCatalog.SYNTHETIC_CHANNELS.contains(e._1) &&
        !scannedChannels.contains(e._1))
    PublishedCatalog.publish(spark, root, scanned ++ carried, v)
  }
}

/** Published, frame-indexed catalog — the remote-catalog semantics of the
  * reference (`RemoteCatalog`, `lib/catalog/owid/catalog/catalogs.py:249-407`):
  * consumers search a PUBLISHED index frame, never walk the data tree.
  *
  * Why this matters at scale: a catalog over millions of published tables
  * on object storage cannot answer `find` by listing directories (S3
  * listing storms, eventual consistency); the reference solves it with a
  * per-channel feather frame downloaded once and searched locally. Same
  * design here: `publish` writes one parquet index per channel plus an
  * atomically swapped `_index/catalog.json` consistency token (version +
  * channel list), and readers load exactly the channels they ask for —
  * search is then a DataFrame filter, distributable and predicate-pushed.
  *
  * Concurrent publishes are last-writer-wins on the token swap, but a
  * reader holding an older token keeps reading its versioned channel
  * frames (they are never overwritten in place — version-suffixed files,
  * like manifest snapshots).
  */
object PublishedCatalog {

  /** The consistency token — typed, serialized with the same json4s
    * formats as every other metadata doc in the repo (a hand-rolled regex
    * parse would silently depend on field order and never-quoted channel
    * names; a typed decode fails loudly on drift instead).
    */
  final case class CatalogToken(version: Long, channels: List[String])
  private implicit val formats: org.json4s.Formats =
    org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)

  private def indexDir(root: String): Path = Paths.get(root, "_index")

  /** Channels whose entries are minted by APIs, not by walking the data
    * tree — a directory re-publish carries them forward instead of
    * silently dropping them (see [[Catalog.publish]]).
    */
  val SYNTHETIC_CHANNELS: Set[String] = Set("sql")

  /** All entries of the currently published index (empty when nothing is
    * published) — the read side of a carry-forward re-publish.
    */
  def currentEntries(spark: SparkSession, root: String): Seq[(String, String, String, String, Boolean)] =
    if (!Files.exists(indexDir(root).resolve("catalog.json"))) Nil
    else open(spark, root).index.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq

  /** Versions with any on-disk trace (a channel frame or the current
    * token) — the set [[publish]] refuses to reuse. Frame names are
    * `channel-<name>-<version>.parquet`; the version is the trailing
    * numeric segment (channel names themselves may contain '-').
    */
  private[ops] def publishedVersions(root: String): Set[Long] = {
    val dir = indexDir(root)
    val frameRe = "channel-.*-(\\d+)\\.parquet".r
    val fromFrames: Set[Long] =
      if (!Files.isDirectory(dir)) Set.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
          case frameRe(v) => Some(v.toLong)
          case _ => None
        }).toSet finally s.close()
      }
    val fromToken = scala.util.Try {
      org.json4s.jackson.Serialization.read[CatalogToken](
        new String(Files.readAllBytes(dir.resolve("catalog.json")))).version
    }.toOption
    fromFrames ++ fromToken
  }

  /** A version guaranteed unused: wall-clock now, bumped past anything
    * already published (covers two publishes in one millisecond and
    * callers replaying an old explicit version).
    */
  def freshVersion(root: String): Long = {
    val used = publishedVersions(root)
    val now = System.currentTimeMillis()
    if (used.isEmpty) now else math.max(now, used.max + 1)
  }

  /** Write the channel-sharded index frames + swap the consistency token.
    * Returns the published version.
    *
    * A version is IMMUTABLE once published: a reader holding a token
    * points at that version's frames, so re-publishing the same version
    * would overwrite frames in place under the reader. Publishing a
    * version for which any frame (or the current token) already exists
    * fails loudly — pick a fresh version (see [[freshVersion]], which
    * also covers the same-millisecond default-version race).
    */
  def publish(spark: SparkSession, root: String,
              entries: Seq[(String, String, String, String, Boolean)],
              version: Long): Long = {
    import spark.implicits._
    val dir = indexDir(root)
    Files.createDirectories(dir)
    require(!publishedVersions(root).contains(version),
      s"catalog version $version is already published at $root — versioned " +
      "frames are immutable; publish under a fresh version")
    val channels = entries.map(_._1).distinct.sorted
    channels.foreach { ch =>
      val rows = entries.filter(_._1 == ch)
      rows.toDF("channel", "namespace", "table", "path", "is_lake")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(dir.resolve(s"channel-$ch-$version.parquet").toString)
    }
    val doc = org.json4s.jackson.Serialization.write(
      CatalogToken(version, channels.toList))
    graft.lake.Manifest.writeAtomic(dir.resolve("catalog.json"), doc)
    version
  }

  /** Reader over the published index. `channels = Nil` loads all published
    * channels (the reference defaults to its channel subset the same way).
    */
  final class Reader private[PublishedCatalog] (spark: SparkSession, root: String,
                                               val version: Long, val index: DataFrame,
                                               val channels: Seq[String]) {
    import org.apache.spark.sql.functions.{col, lower}

    /** Frame search — substring on table, exact on namespace/channel, like
      * the reference's `find`. Returns the matching index slice.
      */
    def find(table: String = "", namespace: String = "", channel: String = ""): DataFrame = {
      var df = index
      if (table.nonEmpty) df = df.filter(lower(col("table")).contains(table.toLowerCase))
      if (namespace.nonEmpty) df = df.filter(col("namespace") === namespace)
      if (channel.nonEmpty) df = df.filter(col("channel") === channel)
      df
    }

    def findOne(table: String = "", namespace: String = "", channel: String = ""): (String, Boolean) = {
      val hits = find(table, namespace, channel).select("path", "is_lake").collect()
      require(hits.nonEmpty, s"no published table matching table=$table namespace=$namespace channel=$channel")
      require(hits.length == 1, s"ambiguous: ${hits.map(_.getString(0)).mkString(", ")}")
      (hits(0).getString(0), hits(0).getBoolean(1))
    }

    def load(path: String, isLake: Boolean): DataFrame =
      if (isLake) LakeTable.load(spark, path).snapshot()
      else TableIO.readParquet(spark, path)._1
  }

  /** The current token's version without touching any frame — the cheap
    * cache-validation read (None = nothing published).
    */
  def currentVersion(root: String): Option[Long] = {
    val tokenPath = indexDir(root).resolve("catalog.json")
    if (!Files.exists(tokenPath)) None
    else scala.util.Try(org.json4s.jackson.Serialization.read[CatalogToken](
      new String(Files.readAllBytes(tokenPath))).version).toOption
  }

  /** Open the published catalog at its current consistency token. */
  def open(spark: SparkSession, root: String, channels: Seq[String] = Nil): Reader = {
    val tokenPath = indexDir(root).resolve("catalog.json")
    require(Files.exists(tokenPath), s"no published catalog at $root (run publish first)")
    val token = org.json4s.jackson.Serialization.read[CatalogToken](
      new String(Files.readAllBytes(tokenPath)))
    val version = token.version
    val published = token.channels
    val want = if (channels.isEmpty) published else {
      val missing = channels.filterNot(published.contains)
      require(missing.isEmpty, s"channels not published: ${missing.mkString(", ")}")
      channels
    }
    val frames = want.map(ch => spark.read.parquet(
      indexDir(root).resolve(s"channel-$ch-$version.parquet").toString))
    // a published-but-empty catalog (zero tables) reads as an empty index,
    // not an error — find() then simply matches nothing
    val index =
      if (frames.nonEmpty) frames.reduce(_ unionByName _)
      else {
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("channel", StringType), StructField("namespace", StringType),
            StructField("table", StringType), StructField("path", StringType),
            StructField("is_lake", BooleanType))))
      }
    new Reader(spark, root, version, index, want)
  }
}
