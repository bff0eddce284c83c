package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit arbiter's one primitive: create `target` with `bytes` iff it
  * does not already exist, atomically with respect to every other writer.
  *
  * On HDFS-class stores `FileSystem.create(path, overwrite = false)` IS
  * that primitive (a namenode-atomic O_EXCL create — the arbiter Delta's
  * own HDFSLogStore documents). On the LOCAL filesystem, however,
  * `RawLocalFileSystem.create` is CHECK-THEN-ACT (an exists() test followed
  * by a plain FileOutputStream), so two threads racing in one JVM can both
  * "win" the same version — caught by IcebergLiteSpec's racing-writers
  * case under full-suite load (r10). This helper closes the in-process
  * window with a JVM-wide per-path monitor around the exists+create pair;
  * cross-PROCESS arbitration still rides the store's own atomic create,
  * which is the deployment contract on every real cluster store.
  */
private[sources] object AtomicCreate {

  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** True iff THIS caller created `target`. */
  def create(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
    val key = fs.makeQualified(target).toString
    val m = monitors.computeIfAbsent(key, _ => new Object)
    val won = m.synchronized {
      if (fs.exists(target)) false
      else
        try {
          val out = fs.create(target, /* overwrite = */ false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }
    // Only retire the monitor once the file EXISTS: removing it after a
    // failed create would let a third thread mint a fresh monitor while
    // another still holds the old one — reopening the exact exists+create
    // TOCTOU this helper closes. Monitors for losers/failures stay mapped
    // (bounded: one tiny Object per version-file path this JVM touches).
    if (won) monitors.remove(key, m)
    won
  }
}
