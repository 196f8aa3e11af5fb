package graft.util

import java.io.File

/**
 * Disk hygiene for the bench/tooling mains. Round 4's driver bench died on
 * ENOSPC ("No space left on device" inside a shuffle write) caused not by
 * the bench's own working set — which runs flat — but by a dirty sandbox:
 * a stale 30 GB `/tmp/blockmgr-*` scratch dir from a crashed earlier JVM
 * plus leftover `graft-scaling-*` corpora. Three rules prevent a recurrence,
 * all enforced here and used by every measuring main:
 *
 *  1. OWN the Spark scratch dir (`spark.local.dir` under `target/`), so a
 *     crash leaves garbage at a path the NEXT run's sweep knows about —
 *     never an anonymous `/tmp/blockmgr-*` nobody claims.
 *  2. SWEEP stale run outputs on startup (crashed runs can't clean up in a
 *     finally), and delete own outputs on completion.
 *  3. PREFLIGHT free disk and refuse to start a measurement that would die
 *     mid-run anyway; record free bytes in the result JSON so a poisoned
 *     run is diagnosable from the artifact alone.
 */
object Disk {

  /** Recursive delete, quiet on absence/failure. */
  def rm(path: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new File(path))
    ()
  }

  /** Delete children of `dir` whose name starts with `prefix` and whose
    * mtime is older than `olderThanMs` (0 = any age). */
  def sweep(dir: String, prefix: String, olderThanMs: Long = 0L): Unit = {
    val now = System.currentTimeMillis()
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File]).foreach { f =>
      if (f.getName.startsWith(prefix) &&
          (olderThanMs <= 0L || now - f.lastModified() > olderThanMs)) {
        org.apache.commons.io.FileUtils.deleteQuietly(f)
        ()
      }
    }
  }

  /**
   * Stale-run sweep, called by every measuring main before it creates a
   * session: graft-owned outputs from crashed runs are deleted at any age
   * (only one bench runs at a time in this environment); anonymous Spark
   * scratch dirs in /tmp are deleted only when hours-stale, because a LIVE
   * foreign JVM (the test suite, the driver's own session) may still own a
   * recent one and deleting it out from under a running job is worse than
   * the disk it frees.
   */
  def sweepStale(): Unit = {
    Seq("bench-corpus-", "bench-incr-", "bench-local-",
      "scaling-local-", "scaling-warm-", "scaling-out-", "probe-local-")
      .foreach(sweep("target", _))
    sweep("/tmp", "graft-")
    val staleMs = 6L * 3600 * 1000
    Seq("blockmgr-", "spark-").foreach(sweep("/tmp", _, staleMs))
  }

  /** Usable bytes on the filesystem holding `path`, in GiB. */
  def freeGb(path: String = "target"): Double = {
    val f = new File(path)
    val probe = if (f.exists()) f else new File(".")
    probe.getUsableSpace / (1024.0 * 1024 * 1024)
  }

  /** A process-owned Spark scratch dir under target/ (rule 1). The caller
    * passes it as `spark.local.dir` and deletes it in its finally block;
    * the startup sweep reclaims it after a crash. */
  def ownLocalDir(tag: String): String = {
    val d = new File(s"target/$tag-local-${ProcessHandle.current().pid()}")
    d.mkdirs()
    d.getPath
  }
}
