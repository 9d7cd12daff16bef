package graft.streaming

/** Scratch-space placement for replay-harness STREAM METADATA.
  *
  * A driver-gate replay runs dozens of micro-batches, and each batch
  * commits offset + commit log entries through the checkpoint file
  * manager's write-fsync-rename discipline — on a disk-backed /tmp
  * that is pure harness latency (the logs are tens of bytes and die
  * with the query). `ckptDir()` places them on /dev/shm when the
  * machine has one, trimming the per-query floor without touching
  * semantics: checkpoint content is identical, only the medium moves.
  *
  * DATA stays on disk: state tables, staged replay batches, and
  * accepted-output tables are corpus-proportional, and tmpfs pages
  * would compete with executor memory at probe scales — only the
  * bounded metadata moves.
  */
object Scratch {
  private val shm = java.nio.file.Paths.get("/dev/shm")

  /** A fresh checkpoint directory on tmpfs when available. */
  def ckptDir(prefix: String = "graft_ckpt"): String =
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix).toString
    else
      java.nio.file.Files.createTempDirectory(prefix).toString
}
