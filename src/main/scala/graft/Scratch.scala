package graft

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Scratch directories for operators that stage data on disk (bucketed
  * layouts, roundtrip sinks, edge-list materialization). Every directory is
  * registered for recursive deletion at JVM exit, so repeated bench/verify
  * rounds in one process — or many processes on a shared machine — don't
  * accumulate full table copies in /tmp. (A cluster deployment would point
  * this at a job-scoped staging prefix and let the platform's TTL policy
  * reap it; the lifecycle contract — scratch data dies with the job — is
  * the same.)
  */
object Scratch {
  private val created = mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.synchronized(created.toList).foreach(deleteRecursively)
    }, "graft-scratch-cleanup"))
  }

  private def deleteRecursively(p: Path): Unit =
    // best-effort by contract: the walk itself can throw UncheckedIOException
    // when racing a concurrent delete (exit hook vs an early drop()) — that
    // must not abort the hook's cleanup of the REMAINING dirs, nor mask a
    // caller's own result when invoked from a finally block
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(f => try Files.delete(f) catch { case _: java.io.IOException => () })
        finally walk.close()
      }
    } catch { case _: java.io.IOException | _: java.io.UncheckedIOException => () }

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.synchronized(created += p)
    p.toString
  }

  /** Delete a scratch dir early (it stays registered; the exit hook's
    * second delete is a no-op).
    */
  def drop(dir: String): Unit = deleteRecursively(Paths.get(dir))
}
