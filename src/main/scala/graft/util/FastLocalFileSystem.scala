package graft.util

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem tuned for single-node Spark without the Hadoop native
  * library: the stock `LocalFileSystem` (a) writes a `.crc` sidecar per
  * file and (b) falls back to fork+exec of `chmod`/`ls` for every
  * permission operation when `libhadoop` is absent — both show up as the
  * dominant non-parallel cost in per-batch profiles (Shell.runCommand /
  * ProcessImpl.forkAndExec frames). Extending RawLocalFileSystem drops the
  * CRC sidecars; overriding the permission calls to no-ops drops the
  * fork+exec storms. Register with:
  * `spark.hadoop.fs.file.impl = graft.util.FastLocalFileSystem`.
  *
  * (On a real cluster the data path is HDFS/S3 and this class is unused.)
  */
class FastLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
  override def setOwner(p: Path, username: String, groupname: String): Unit = ()
}
