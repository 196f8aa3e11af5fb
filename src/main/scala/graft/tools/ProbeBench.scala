package graft.tools

import org.apache.spark.sql.functions.col

import graft.config.DedupConfig
import graft.gen.Synth

/**
 * Serving-path scale measurement: bootstrap a pre-materialized corpus into a
 * checkpointed root (resumable — re-runs skip straight to probing), then
 * time read-only `Probe.run` batches against it. Evidences the probe's
 * design claim: per-probe work is proportional to the BATCH and the index
 * slices it touches, not the corpus — the number `incremental_epoch_sec`
 * cannot show because appends pay the full stage-checkpoint floor.
 *
 *   sbt "runMain graft.tools.ProbeBench <corpusParquet> <corpusRows> <probeRows>"
 *
 * Probe rows are Synth rows [corpusRows, corpusRows+probeRows) — unseen by
 * the corpus, ids sorting after it (generation is a pure function of
 * (seed, index), so the corpus prefix is unchanged) — materialized via an
 * eager localCheckpoint BEFORE timing so image encode cost stays out of the
 * serving number.
 */
object ProbeBench {

  private def loadavg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val Array(corpusPath0, corpusRowsS, probeRowsS) = args.take(3)
    val fresh = args.contains("--fresh")
    val nCorpus = corpusRowsS.toLong
    val probeN = probeRowsS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = graft.util.Disk.ownLocalDir("probe")
    val spark = graft.util.Sessions.build("graft-probe-bench", cpus,
      Map("spark.local.dir" -> localDir))
    // "synth" = self-contained mode: materialize the deterministic corpus
    // prefix once (resumable like the root itself)
    val corpusPath = if (corpusPath0 == "synth") {
      val p = s"target/probe-bench-corpus-$nCorpus"
      if (!new java.io.File(p).exists())
        Synth.corpus(spark, nCorpus).write.mode("overwrite").parquet(p)
      p
    } else corpusPath0

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // the resumable root is keyed by CORPUS IDENTITY (absolute path hash),
    // not just row count: two different corpora of the same size must not
    // share a bootstrap, or the probes time against the wrong persisted
    // state and report numbers for data that was never probed. --fresh
    // forces a rebuild of the same corpus's root.
    val corpusKey = java.lang.Long.toHexString(
      graft.util.Hashing.splitmix64(
        new java.io.File(corpusPath).getAbsolutePath.hashCode.toLong))
    val root = s"target/probe-bench-root-$nCorpus-$corpusKey"
    if (fresh) graft.util.Disk.rm(root)
    val input = spark.read.parquet(corpusPath)
    val (_, bootSec) = time {
      graft.Dedup.runCheckpointed(spark, input, root, DedupConfig.default)
      graft.Incremental.ensureIndexes(spark, root)
    }

    val batch = Synth.corpus(spark, nCorpus + probeN).toDF()
      .where(col("image_id") >= f"img-$nCorpus%010d")
      .localCheckpoint()
    require(batch.count() == probeN)

    val loadStart = loadavg1
    // cold = first call (loads + caches the serving index); warm reps keep
    // the context cached — the steady-state serving number
    val (_, coldSec) = time(
      graft.Probe.run(spark, root, batch, DedupConfig.default).outcomes.count())
    val secs = (1 to 3).map { _ =>
      time(graft.Probe.run(spark, root, batch, DedupConfig.default)
        .outcomes.count())._2
    }
    val median = secs.sorted.apply(secs.size / 2)
    val all = secs.map(s => f"$s%.2f").mkString("[", ",", "]")
    // job accounting on one extra warm probe: serving latency at batch
    // sizes is a JOB-COUNT floor (every broadcast collect + CC round is a
    // sequential driver-coordinated job), so the count is the number to
    // engineer against
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val probeT0 = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
        println(s"[probe-jobmap] job=${j.jobId} stages=${j.stageIds.mkString(",")} $desc")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          val sec = (System.nanoTime() - t0) / 1e9
          jobNanos.addAndGet(System.nanoTime() - t0)
          val rel0 = (t0 - probeT0.get()) / 1e9
          println(f"[probe-job] start=$rel0%7.3f dur=$sec%6.3f  $desc")
        }
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3)
          .getOrElse(-1.0)
        if (dur > 0.25)
          println(f"[probe-stage] id=${i.stageId}%3d dur=$dur%6.3f tasks=${i.numTasks}%3d ${i.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    probeT0.set(System.nanoTime())
    val (_, jobSec) = time(
      graft.Probe.run(spark, root, batch, DedupConfig.default).outcomes.count())
    spark.sparkContext.removeSparkListener(listener)
    println(f"""{"corpus_rows":$nCorpus,"probe_rows":$probeN,"bootstrap_sec":$bootSec%.1f,"probe_sec":$median%.2f,"probe_cold_sec":$coldSec%.2f,"probe_sec_all":$all,"probe_rows_per_sec":${probeN / median}%.1f,"probe_jobs":${jobs.get},"probe_jobs_sec":${jobNanos.get / 1e9}%.2f,"probe_jobs_wall_sec":$jobSec%.2f,"cores":$cpus,"load_start":$loadStart%.2f,"load_end":$loadavg1%.2f}""")
    try spark.stop() catch { case _: Throwable => }
    graft.util.Disk.rm(localDir)
    sys.exit(0)
  }
}
