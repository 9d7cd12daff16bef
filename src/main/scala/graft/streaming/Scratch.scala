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

  // Every harness temp dir registers for exit-time deletion: the
  // dirs die WITH the query semantically, but nothing used to delete
  // them, so repeated bench/probe/verify runs accumulated
  // corpus-sized leftovers on /tmp and (worse — it's RAM) checkpoint
  // shells on /dev/shm across process lifetimes (round-13 ADVICE).
  // One hook, registered lazily on first use; a dir that is already
  // gone (or still being written by a crashed task) is skipped, not
  // fatal — cleanup must never mask the real failure.
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try deleteRecursively(p) catch { case _: Throwable => () }
      }
    }, "graft-scratch-sweep"))

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(p)) {
      Files.walkFileTree(p, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: attribute.BasicFileAttributes) = {
          Files.deleteIfExists(f); FileVisitResult.CONTINUE
        }
        override def postVisitDirectory(d: Path, e: java.io.IOException) = {
          Files.deleteIfExists(d); FileVisitResult.CONTINUE
        }
      })
    }
  }

  /** Register an existing directory for exit-time deletion. */
  def register(dir: java.nio.file.Path): java.nio.file.Path = {
    hookInstalled
    registered.add(dir)
    dir
  }

  /** A fresh exit-swept temp directory (disk-backed) — the harness
    * replacement for bare `Files.createTempDirectory`.
    */
  def tmpDir(prefix: String): String =
    register(java.nio.file.Files.createTempDirectory(prefix)).toString

  /** A fresh checkpoint directory on tmpfs when available. */
  def ckptDir(prefix: String = "graft_ckpt"): String =
    register(
      if (shmUsable)
        java.nio.file.Files.createTempDirectory(shm, prefix)
      else
        java.nio.file.Files.createTempDirectory(prefix)).toString

  private def shmUsable: Boolean =
    java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)

  /** A fresh exit-swept REPLAY-SOURCE directory (round 20 — the
    * round-19 verdict's crawl-loop item): tmpfs when available, so
    * the [[FileReplay]] harness's per-tick staging write + atomic
    * publish rename + the running query's busy-poll source listings
    * stop paying disk fsync latency that the ENGINE under measurement
    * never causes (production streams read Kafka/object-store sources
    * in place; the staged feed exists only to drive replays). This is
    * harness INPUT, not engine state — state tables, accepted outputs
    * and checkpointed cuts stay disk-backed per the data-placement
    * policy above. Opt out (corpus-scale probes on a small-/dev/shm
    * box) with `spark.graft.replay.onDisk=true`.
    */
  def replayDir(spark: org.apache.spark.sql.SparkSession,
      prefix: String = "graft_replay_src"): String = {
    val onDisk = spark.conf.getOption("spark.graft.replay.onDisk")
      .exists(_.toBoolean)
    register(
      if (!onDisk && shmUsable)
        java.nio.file.Files.createTempDirectory(shm, prefix)
      else
        java.nio.file.Files.createTempDirectory(prefix)).toString
  }
}
