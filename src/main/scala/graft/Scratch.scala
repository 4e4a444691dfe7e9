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
  *
  * == The per-JVM staging-memo contract (shared by every *Cache map) ==
  * Several operator modules memoize a staged artifact per INPUT DIR for
  * the JVM's lifetime (Graph.lpaCache/lpaEdgeCache/lpacEdpCache/triCache/
  * hbCache, Similarity.knnGraphCache/kcenterCache, Dedup's pair/CC
  * stagings, …): the first query touching a family pays the build, every
  * later query reads the parquet leaf. Two assumptions make that sound,
  * and they are the CONTRACT, stated here once rather than per cache:
  *
  *  1. '''Fixture data is immutable per JVM.''' The driver's testdata
  *     dirs are generated once and read-only; regenerating data at the
  *     same path mid-session would serve stale artifacts. A dev loop that
  *     rewrites a fixture must restart the JVM (sbt's forked test JVMs and
  *     the driver's per-round Verify/Bench processes all do). Keying on
  *     (dir, mtime) was considered and rejected: an mtime probe per lookup
  *     re-lists the directory on the hot path of EVERY query, to defend a
  *     sequence no harness run performs.
  *  2. '''Input-dir cardinality is tiny.''' Keys are the 3–4 sf dirs, so
  *     the unbounded-map growth mode is bounded by the harness's world.
  *     A long-lived service would swap these maps for a TTL'd cache keyed
  *     on a snapshot/version id — the memo call sites are the seam.
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
