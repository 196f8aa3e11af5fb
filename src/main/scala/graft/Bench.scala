package graft

import org.apache.spark.sql.SparkSession

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
 */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Sessions.build("graft-bench", cpus)

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
      "dedup_minhash_docs", "dedup_simhash_docs", "ann_lsh_topk")

    // JIT warmup, untimed (same protocol as ScalingBench's 10% slice):
    // a fresh JVM's first execution of each plan pays whole-stage-codegen
    // class compilation, not engine cost — measured on this box, the
    // IDENTICAL pipeline run is 54.6 s cold vs 5.6 s warm in one JVM.
    // Steady-state throughput is the operationally meaningful number for a
    // long-lived cluster job, so each headline plan and the pipeline are
    // exercised once on the smallest table set before timing begins.
    val warmDir = "/root/testdata/sf0.001"
    headline.foreach { name => SparkEntry.queries(name)(spark, warmDir).count() }
    graft.util.Caches.releaseAll()
    spark.sqlContext.clearCache()

    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (_, sec) = time(fn(spark, sfDir).count())
      results(name) = sec
    }

    // dedup pipeline: materialize the corpus first, then run the engine
    val n = Engine.synthRows(sfDir)
    val corpusPath = s"target/bench-corpus-$n"
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
    graft.util.Caches.releaseAll()
    spark.sqlContext.clearCache()
    val (clusters, pipeSec) = time {
      val r = Dedup.run(spark, input, DedupConfig.default)
      r.clusters.count()
    }
    results("pipeline_dedup") = pipeSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.values.sum}%.3f"
    val ips = f"${n / pipeSec}%.1f"
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$pcts,"sf":"$sfDir","pipeline_rows":$n,"pipeline_clusters":$clusters,"images_per_sec":$ips}""")
    spark.stop()
  }
}
