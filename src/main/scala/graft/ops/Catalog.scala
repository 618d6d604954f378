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
    * version goes through [[PublishedCatalog.publishCas]] (current+1,
    * token-CAS-committed, retried on a lost race) — two concurrent
    * publishers can never overwrite each other's frames or drop each
    * other's synthetic entries.
    *
    * SYNTHETIC channels already published on this root — entries that do
    * not come from the directory walk, today the SQL registry's "sql"
    * channel ([[graft.sql.LakeCatalog]]) — are CARRIED FORWARD verbatim:
    * a re-scan of the data tree must not silently wipe registrations it
    * could never discover from disk.
    */
  def publish(version: Long = -1L): Long = {
    val scanned = entries.map(e => (e.channel, e.namespace, e.table, e.path, e.isLake))
    val scannedChannels = scanned.map(_._1).toSet
    def merge(cur: Seq[(String, String, String, String, Boolean)]) =
      scanned ++ cur.filter(e => PublishedCatalog.SYNTHETIC_CHANNELS.contains(e._1) &&
        !scannedChannels.contains(e._1))
    if (version >= 0)
      PublishedCatalog.publish(spark, root, merge(PublishedCatalog.currentEntries(spark, root)), version)
    else
      // default path is the cross-process CAS: version = current+1, retried
      // on a lost race with the winner's synthetic entries re-carried
      PublishedCatalog.publishCas(spark, root, merge)
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
  * Concurrency: a publish COMMITS by creating an immutable, version-named
  * token file (`token-<v>.json`) via hard-link creation — POSIX's atomic
  * create-exclusive — so exactly one publisher can commit a given version;
  * the current catalog is the highest-versioned token. Read-modify-publish
  * flows go through [[publishCas]]: merge against the current token's
  * entries, attempt version current+1, and on a CREATE_NEW collision
  * re-read and retry — a true cross-PROCESS compare-and-swap (two
  * processes registering different names both land; neither update is
  * lost). Frames carry a per-publish uid in their filename, so even two
  * racers writing the same version never overwrite each other's frames; a
  * reader holding an older token keeps reading its immutable frames.
  * `catalog.json` remains as a non-authoritative legacy hint (pre-token
  * catalogs are still readable through it).
  */
object PublishedCatalog {

  /** The consistency token — typed, serialized with the same json4s
    * formats as every other metadata doc in the repo (a hand-rolled regex
    * parse would silently depend on field order and never-quoted channel
    * names; a typed decode fails loudly on drift instead).
    * `uid` suffixes this publish's frame filenames ("" = legacy naming).
    */
  final case class CatalogToken(version: Long, channels: List[String], uid: String = "")

  /** A publish lost the token CAS: another publisher committed this
    * version first. Callers merge against the new current and retry
    * (see [[publishCas]]). */
  final class ConcurrentPublishException(msg: String) extends RuntimeException(msg)

  private implicit val formats: org.json4s.Formats =
    org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)

  private def indexDir(root: String): Path = Paths.get(root, "_index")

  private def tokenName(v: Long): String = f"token-$v%019d.json"
  private val tokenRe = "token-(\\d+)\\.json".r

  private def frameName(ch: String, version: Long, uid: String): String =
    if (uid.isEmpty) s"channel-$ch-$version.parquet"
    else s"channel-$ch-$version-u$uid.parquet"

  /** The current consistency token: the highest-versioned `token-*.json`,
    * falling back to the legacy `catalog.json` single-token form.
    */
  def currentToken(root: String): Option[CatalogToken] = {
    val dir = indexDir(root)
    val fromChain: Option[CatalogToken] =
      if (!Files.isDirectory(dir)) None
      else {
        val s = Files.list(dir)
        val versions = try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
          case tokenRe(v) => Some(v.toLong)
          case _ => None
        }).toSeq finally s.close()
        versions.sorted.lastOption.map(v =>
          org.json4s.jackson.Serialization.read[CatalogToken](
            new String(Files.readAllBytes(dir.resolve(tokenName(v))))))
      }
    fromChain.orElse {
      val legacy = dir.resolve("catalog.json")
      if (!Files.exists(legacy)) None
      else scala.util.Try(org.json4s.jackson.Serialization.read[CatalogToken](
        new String(Files.readAllBytes(legacy)))).toOption
    }
  }

  /** Commit a token: atomic create-exclusive via hard link (full content
    * appears atomically; creation fails with EEXIST when another publisher
    * committed the same version first → [[ConcurrentPublishException]]).
    */
  private def linkToken(root: String, token: CatalogToken): Unit = {
    val dir = indexDir(root)
    Files.createDirectories(dir)
    val target = dir.resolve(tokenName(token.version))
    val tmp = dir.resolve(target.getFileName.toString + ".tmp." + java.util.UUID.randomUUID())
    Files.write(tmp, org.json4s.jackson.Serialization.write(token)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentPublishException(
          s"catalog version ${token.version} was committed concurrently at $root")
    } finally Files.deleteIfExists(tmp)
    // legacy single-token hint for pre-chain readers; the token chain is
    // authoritative, so an out-of-order hint write between two racing
    // publishers is harmless
    graft.lake.Manifest.writeAtomic(dir.resolve("catalog.json"),
      org.json4s.jackson.Serialization.write(currentToken(root).getOrElse(token)))
  }

  /** Channels whose entries are minted by APIs, not by walking the data
    * tree — a directory re-publish carries them forward instead of
    * silently dropping them (see [[Catalog.publish]]).
    */
  val SYNTHETIC_CHANNELS: Set[String] = Set("sql")

  /** All entries of the currently published index (empty when nothing is
    * published) — the read side of a carry-forward re-publish. Gated on
    * the AUTHORITATIVE token resolution ([[currentToken]]), not on the
    * legacy catalog.json hint: a publisher that died after the token CAS
    * but before the hint write must not make the next merge read "empty"
    * and truncate the index.
    */
  def currentEntries(spark: SparkSession, root: String): Seq[(String, String, String, String, Boolean)] =
    if (currentToken(root).isEmpty) Nil
    else open(spark, root).index.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq

  /** Versions COMMITTED by a token (the chain, plus the legacy single
    * token) — the set [[publish]] refuses to reuse. Orphaned frames whose
    * publisher died before its token CAS are deliberately NOT in this
    * set: they were never readable, and counting them would wedge
    * [[publishCas]] (target current+1) on the orphan forever.
    */
  private[ops] def committedVersions(root: String): Set[Long] = {
    val dir = indexDir(root)
    val fromChain: Set[Long] =
      if (!Files.isDirectory(dir)) Set.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
          case tokenRe(v) => Some(v.toLong)
          case _ => None
        }).toSet finally s.close()
      }
    val fromLegacy = scala.util.Try {
      org.json4s.jackson.Serialization.read[CatalogToken](
        new String(Files.readAllBytes(dir.resolve("catalog.json")))).version
    }.toOption
    fromChain ++ fromLegacy
  }

  /** Write the channel-sharded index frames + swap the consistency token.
    * Returns the published version.
    *
    * A version is IMMUTABLE once committed: a reader holding a token
    * points at that version's frames (frame filenames carry this
    * publish's uid, so no other publish can ever write over them).
    * Publishing a version whose token already exists fails loudly —
    * incremental flows should use [[publishCas]] instead of picking
    * versions by hand.
    */
  def publish(spark: SparkSession, root: String,
              entries: Seq[(String, String, String, String, Boolean)],
              version: Long): Long = {
    import spark.implicits._
    val dir = indexDir(root)
    Files.createDirectories(dir)
    // immutability is judged on COMMITTED versions (token chain + legacy
    // token) — a version is only readable once its token exists. Orphaned
    // frames from a publisher that died before its token CAS must NOT
    // block the version forever (frames are uid-suffixed, so re-publishing
    // over orphans can never clobber files a reader could be holding).
    require(!committedVersions(root).contains(version),
      s"catalog version $version is already published at $root — versioned " +
      "frames are immutable; publish under a fresh version")
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val channels = entries.map(_._1).distinct.sorted
    channels.foreach { ch =>
      val rows = entries.filter(_._1 == ch)
      rows.toDF("channel", "namespace", "table", "path", "is_lake")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(dir.resolve(frameName(ch, version, uid)).toString)
    }
    // frames first (immutable, uid-unique — a racing publisher of the same
    // version cannot clobber them), then the token CAS decides the winner
    linkToken(root, CatalogToken(version, channels.toList, uid))
    version
  }

  /** Cross-process-safe read-modify-publish: merge `update` against the
    * CURRENT entries and commit as version current+1 via the token CAS;
    * on a lost race, re-read and retry with the winner's entries included.
    * This is the path for incremental index updates (SQL registrations,
    * data-tree re-publishes) — neither of two concurrent updaters' changes
    * is lost, unlike a plain last-writer-wins token swap.
    */
  def publishCas(spark: SparkSession, root: String,
                 update: Seq[(String, String, String, String, Boolean)] => Seq[(String, String, String, String, Boolean)],
                 maxAttempts: Int = 50): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val v0 = currentToken(root).map(_.version).getOrElse(0L)
      val merged = update(currentEntries(spark, root))
      try return publish(spark, root, merged, v0 + 1)
      catch {
        case _: ConcurrentPublishException if attempt < maxAttempts =>
          Thread.sleep(5L + scala.util.Random.nextInt(20))
        case e: IllegalArgumentException
            if attempt < maxAttempts && e.getMessage != null &&
              e.getMessage.contains("already published") =>
          // version already taken (raced with another publisher) — backoff
          // with jitter and re-merge against the new current
          Thread.sleep(5L + scala.util.Random.nextInt(20))
      }
    }
    throw new IllegalStateException("unreachable")
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
  def currentVersion(root: String): Option[Long] = currentToken(root).map(_.version)

  /** Open the published catalog at its current consistency token. */
  def open(spark: SparkSession, root: String, channels: Seq[String] = Nil): Reader = {
    val tokenOpt = currentToken(root)
    require(tokenOpt.nonEmpty, s"no published catalog at $root (run publish first)")
    val token = tokenOpt.get
    val version = token.version
    val published = token.channels
    val want = if (channels.isEmpty) published else {
      val missing = channels.filterNot(published.contains)
      require(missing.isEmpty, s"channels not published: ${missing.mkString(", ")}")
      channels
    }
    val frames = want.map(ch => spark.read.parquet(
      indexDir(root).resolve(frameName(ch, version, token.uid)).toString))
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
