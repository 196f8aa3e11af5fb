package graft

import org.apache.spark.sql.functions.col

import graft.config.DedupConfig
import graft.gen.Synth
import graft.queries.Engine

/**
 * Per-round benchmark (driver contract): runs the headline queries on
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line
 * {"metric","value","unit","queries",...}.
 *
 * The dedup pipeline is benchmarked against a PRE-MATERIALIZED parquet
 * corpus (generation cost measured separately as `corpus_gen`) so
 * `images_per_sec` reflects engine throughput, not the synthetic generator.
 *
 * Load self-identification: this box's ambient load swings 1→36 and wall
 * times with it ~3x (round-3's driver bench recorded 102.7 s for a 28.9 s
 * build). The JSON line therefore carries /proc/loadavg at start and end —
 * a poisoned run is detectable from the artifact alone — and, unless
 * disabled (GRAFT_QUIET_MAX=0), the bench first waits up to
 * GRAFT_QUIET_TIMEOUT_SEC (default 300) for 1-min load <= GRAFT_QUIET_MAX
 * (default 4.0), then measures regardless, recording how long it waited.
 *
 * Disk safety (round 4's failure mode — ENOSPC from a dirty sandbox, see
 * `util.Disk`): stale bench/scratch dirs are swept on startup, the session's
 * `spark.local.dir` is bench-owned and deleted in a finally along with the
 * bench's own corpus/root outputs, free disk is preflighted (refuse to start
 * under `GRAFT_MIN_FREE_GB`, default 10) and recorded in the JSON, and the
 * JVM hard-exits on completion so no lingering non-daemon thread can keep
 * writing shuffle state after the result is printed.
 */
object Bench {

  private def loadavg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Wait for a quiet window; returns seconds waited. */
  private def waitQuiet(maxLoad: Double, timeoutSec: Int): Double = {
    if (maxLoad <= 0) return 0.0
    val t0 = System.nanoTime()
    while (loadavg1 > maxLoad && (System.nanoTime() - t0) / 1e9 < timeoutSec) {
      System.err.println(f"[bench] waiting for load ${loadavg1}%.1f <= $maxLoad%.1f")
      Thread.sleep(15000)
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    graft.util.Disk.sweepStale()
    val diskFreeStart = graft.util.Disk.freeGb()
    val minFree = sys.env.getOrElse("GRAFT_MIN_FREE_GB", "10").toDouble
    if (diskFreeStart < minFree) {
      System.err.println(f"[bench] refusing to start: ${diskFreeStart}%.1f GiB free " +
        f"< $minFree%.1f GiB floor (a mid-run ENOSPC corrupts the measurement " +
        "anyway; free disk or lower GRAFT_MIN_FREE_GB)")
      sys.exit(3)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val quietMax = sys.env.getOrElse("GRAFT_QUIET_MAX", "4.0").toDouble
    val quietTimeout = sys.env.getOrElse("GRAFT_QUIET_TIMEOUT_SEC", "300").toInt
    val quietWaitSec = waitQuiet(quietMax, quietTimeout)
    val loadStart = loadavg1
    val localDir = graft.util.Disk.ownLocalDir("bench")
    val spark = graft.util.Sessions.build("graft-bench", cpus,
      Map("spark.local.dir" -> localDir))
    val ownedDirs = scala.collection.mutable.ArrayBuffer[String](localDir)
    try {
      body(spark, sfDir, quietWaitSec, loadStart, diskFreeStart, ownedDirs)
    } finally {
      try spark.stop() catch { case _: Throwable => }
      ownedDirs.foreach(graft.util.Disk.rm)
    }
    // non-daemon stragglers (round 4: bench/test JVMs alive 5+ min after
    // success, still holding Spark temp dirs) must not outlive the result
    sys.exit(0)
  }

  private def body(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      quietWaitSec: Double, loadStart: Double, diskFreeStart: Double,
      ownedDirs: scala.collection.mutable.ArrayBuffer[String]): Unit = {

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    val headline = Seq(
      "q01_pricing_summary", "q03_top_revenue_orders", "q05_topk_per_group",
      "q07_daily_events", "q13_customers_without_orders",
      "q17_token_stats", "q21_ngram_jaccard", "q23_embed_topk",
      "dedup_minhash_docs", "dedup_simhash_docs", "ann_lsh_topk", "ann_ivf_topk")

    // JIT warmup, untimed (same protocol as ScalingBench's 10% slice):
    // a fresh JVM's first execution of each plan pays whole-stage-codegen
    // class compilation, not engine cost — measured on this box, the
    // IDENTICAL pipeline run is 54.6 s cold vs 5.6 s warm in one JVM.
    // Steady-state throughput is the operationally meaningful number for a
    // long-lived cluster job, so each headline plan and the pipeline are
    // exercised once on the smallest table set before timing begins.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) {
      headline.foreach { name => SparkEntry.queries(name)(spark, warmDir).count() }
      graft.util.Caches.releaseAll()
      spark.sqlContext.clearCache()
    } else {
      System.err.println(s"[bench] warm dir $warmDir absent — skipping warm pass (cold JIT)")
    }

    // Isolate each measurement: earlier queries' persisted frames and dead
    // broadcast state otherwise bill their old-gen collection to whichever
    // later query the GC lands on (measured: q21 at 20.8/23.0 s mid-sequence
    // in two full-bench JVMs vs 6.1 s with the identical warm-then-measure
    // protocol in isolation, with 3 s of GC inside even the isolated run).
    def isolate(): Unit = {
      graft.util.Caches.releaseAll()
      spark.sqlContext.clearCache()
      System.gc()
    }
    // dedup pipeline FIRST, while the JVM is cleanest: measured on this box,
    // the identical pipeline medians 26-37 s in a young JVM but 52-110 s
    // after ~48 headline-plan executions have filled metaspace/old-gen with
    // dead codegen classes and broadcast state that System.gc() does not
    // fully claw back. The flagship number should not pay for the side
    // queries' JVM wear.
    val n = Engine.synthRows(sfDir)
    val corpusPath = s"target/bench-corpus-$n"
    ownedDirs += corpusPath
    val (_, genSec) = time {
      Synth.corpus(spark, n).write.mode("overwrite").parquet(corpusPath)
    }
    results("corpus_gen") = genSec

    val input = spark.read.parquet(corpusPath)
    // warm pass at FULL size: physical plans are size-dependent (broadcast
    // vs shuffle joins, AQE re-plans), so a small-slice warmup does not
    // compile the plans the measured run executes. All caches are dropped
    // in between — the timed run recomputes every stage (features included)
    // with compiled code, which is what a long-lived cluster JVM sustains.
    Dedup.run(spark, input, DedupConfig.default).clusters.count()
    isolate()
    // median of 3 timed passes: single-shot pipeline walls on this box
    // spread up to 3x under IO-latency bursts and old-gen GC (protocol
    // section of BENCH/BASELINE.md)
    var clusters = 0L
    val pipeSecs = (1 to 3).map { _ =>
      val (c, sec) = time {
        val r = Dedup.run(spark, input, DedupConfig.default)
        r.clusters.count()
      }
      isolate()
      clusters = c
      sec
    }
    val pipeSec = pipeSecs.sorted.apply(pipeSecs.size / 2)

    // median of 3 per query, isolated reps: single-shot walls on this box
    // spread up to 3x under IO-latency bursts (ann_lsh_topk measured 4.5 /
    // 11.2 / 17.0 s across three same-build bench JVMs)
    val allReps = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to 3).map { _ =>
        val (_, sec) = time(fn(spark, sfDir).count())
        isolate()
        sec
      }
      allReps(name) = secs
      results(name) = secs.sorted.apply(secs.size / 2)
    }
    results("pipeline_dedup") = pipeSec

    // incremental/streaming path (the reference's actual request-driven
    // shape): bootstrap 90% of the corpus checkpointed, then absorb 5
    // batches of 1% each through Incremental.append — per-epoch latency is
    // what a continuously-fed deployment pays per arrival wave, vs the
    // full-recompute `pipeline_dedup` above. 5 epochs bound the median as
    // well as 10 did and halve this section's share of the bench wall
    // (it was ~10 of 17 minutes)
    val incRoot = s"target/bench-incr-$n"
    ownedDirs += incRoot
    org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
      .delete(new org.apache.hadoop.fs.Path(incRoot), true)
    val cut = n * 9 / 10
    val (_, bootSec) = time {
      Dedup.runCheckpointed(spark,
        input.where(col("image_id") < f"img-$cut%010d"), incRoot, DedupConfig.default)
    }

    val epochRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val epochSecs = (0 until 5).map { i =>
      val lo = cut + i * (n - cut) / 10
      val hi = cut + (i + 1) * (n - cut) / 10
      val batch = input.where(col("image_id") >= f"img-$lo%010d" &&
        col("image_id") < f"img-$hi%010d")
      epochRows += (hi - lo)
      time(Incremental.append(spark, incRoot, batch, s"s$i", DedupConfig.default))._2
    }
    val epochMedian = epochSecs.sorted.apply(epochSecs.size / 2)

    // read-only serving probe (Probe.run): a 1k-row held-out batch evaluated
    // against the bootstrapped root with NO state mutation — the reference's
    // request-shaped "is this a duplicate?" check at its interactive batch
    // size (round-4 verdict #3: the serving number to price is a SMALL batch,
    // not a 5% slice). Prices the serving path against incremental_epoch_sec,
    // whose wall is dominated by the 14-stage checkpoint re-derivation the
    // probe never pays. Median of 3 (read-only, so reps are identical work).
    val hi5 = cut + 5 * (n - cut) / 10
    val probeRows = math.min(n - hi5, 1000L)
    val probeBatch = input.where(col("image_id") >= f"img-$hi5%010d" &&
      col("image_id") < f"img-${hi5 + probeRows}%010d")
    // cold = first call: loads + caches the serving index (the FAISS
    // load-at-startup analog) and pays the parquet scans once. warm = the
    // steady-state serving shape a long-lived probe process sustains — the
    // context stays cached across calls, so NO isolate() between reps (that
    // would unpersist the index and measure three cold calls).
    val (_, probeColdSec) = time(
      Probe.run(spark, incRoot, probeBatch, DedupConfig.default).outcomes.count())
    val probeSecs = (1 to 3).map { _ =>
      time(Probe.run(spark, incRoot, probeBatch, DedupConfig.default)
        .outcomes.count())._2
    }
    val probeMedian = probeSecs.sorted.apply(probeSecs.size / 2)
    isolate()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.values.sum}%.3f"
    val ips = f"${n / pipeSec}%.1f"
    val pipeAll = pipeSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    val repsAll = allReps.map { case (k, v) =>
      "\"" + k + "\":" + v.map(s => f"$s%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // incremental numbers are REPORTED OUTSIDE total/queries: they measure a
    // different deployment shape (per-arrival-wave latency), and folding ten
    // epoch walls into `total` would make round-over-round totals
    // incomparable
    val incF = f""""incremental_bootstrap_sec":$bootSec%.3f,"incremental_epoch_sec":$epochMedian%.3f,"incremental_rows_per_sec":${epochRows.sum / epochSecs.sum}%.1f,"probe_batch_sec":$probeMedian%.3f,"probe_cold_sec":$probeColdSec%.3f,"probe_rows":$probeRows,"probe_rows_per_sec":${probeRows / probeMedian}%.1f"""
    // per-query latency percentiles (reference harness shape,
    // benchmarks/run_benchmarks.py:72-98): exact linear interpolation,
    // same definition as q33 / DuckDB quantile_cont
    def pct(p: Double): Double = {
      val s = results.values.toSeq.sorted
      val pos = p * (s.size - 1)
      val lo = s(pos.floor.toInt); val hi = s(pos.ceil.toInt)
      lo + (hi - lo) * (pos - pos.floor)
    }
    val pcts = f""""query_sec_p50":${pct(0.5)}%.3f,"query_sec_p95":${pct(0.95)}%.3f,"query_sec_p99":${pct(0.99)}%.3f"""
    val loadEnd = loadavg1
    val loadF = f""""load_start":$loadStart%.2f,"load_end":$loadEnd%.2f,"quiet_wait_sec":$quietWaitSec%.1f"""
    val diskF = f""""disk_free_gb_start":$diskFreeStart%.1f,"disk_free_gb_end":${graft.util.Disk.freeGb()}%.1f"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$pcts,"sf":"$sfDir","pipeline_rows":$n,"pipeline_clusters":$clusters,"images_per_sec":$ips,"pipeline_sec_all":$pipeAll,"queries_sec_all":$repsAll,$incF,$loadF,$diskF}""")
  }
}
