package graft.util

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** RawLocalFileSystem with the fork+exec permission storms removed: without
  * `libhadoop`, every chmod/chown falls back to `Shell.runCommand` — the
  * dominant non-parallel cost in single-node per-batch profiles.
  */
class FastRawLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
  override def setOwner(p: Path, username: String, groupname: String): Unit = ()
}

/** Local filesystem tuned for single-node Spark without the Hadoop native
  * library: (a) CRC sidecar writing/verification is disabled (stock
  * `LocalFileSystem` writes a `.crc` per file), and (b) permission
  * operations are no-ops instead of fork+exec `chmod`/`ls` storms.
  *
  * MUST remain a `LocalFileSystem` subclass: Hadoop code paths that call
  * `FileSystem.getLocal(conf)` (e.g. the RocksDB state store's checkpoint
  * upload via `copyFromLocalFile`) cast the `file://` filesystem to
  * `LocalFileSystem` — a direct `RawLocalFileSystem` subclass passes most
  * workloads but ClassCastExceptions there (caught by the RocksDB-backed
  * StreamingDedup test).
  *
  * Register with: `spark.hadoop.fs.file.impl = graft.util.FastLocalFileSystem`.
  * (On a real cluster the data path is HDFS/S3 and this class is unused.)
  */
class FastLocalFileSystem extends org.apache.hadoop.fs.LocalFileSystem(new FastRawLocalFileSystem) {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
