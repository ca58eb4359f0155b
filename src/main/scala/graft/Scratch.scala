package graft

/** Per-JVM scratch space for queries that exercise a real write-then-
  * read lifecycle (q65/q66/q86 format round-trips, q154's clustered
  * snapshot, q155's persisted term index).
  *
  * One unique root per JVM — concurrent graft JVMs (bench + verify)
  * must not race on a fixed /tmp path, where one JVM's overwrite
  * deletes files the other is mid-read on — and ONE shutdown hook
  * that removes the whole root recursively, so repeated Verify/Bench
  * runs stop accumulating unbounded temp-dir garbage (each run cleans
  * up after itself; nothing under the root is meant to outlive the
  * session).
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A named path under the per-JVM root (stable within the JVM —
    * re-executions overwrite, which the format round-trip queries
    * want).
    */
  def dir(name: String): String = root.resolve(name).toString

  /** A fresh, never-before-used path under the per-JVM root — for
    * snapshot-table queries whose version pinning wants an untouched
    * table per execution.
    */
  def fresh(prefix: String): String =
    root.resolve(s"$prefix${counter.incrementAndGet()}").toString

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        walk
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () } })
      } finally walk.close()
    }
  }
}
