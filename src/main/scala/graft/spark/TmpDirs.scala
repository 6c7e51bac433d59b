package graft.spark

/** Scratch directories for harness I/O (streaming checkpoints, staged
  * inputs, delivery tables). Prefers tmpfs (/dev/shm): checkpoint and
  * state-store commits are many small fsynced files whose latency dominates
  * micro-batch startup on a disk-backed /tmp — measured as the bulk of the
  * events_windowed_stream wall time in round 1.
  */
object TmpDirs {
  def create(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }
}
