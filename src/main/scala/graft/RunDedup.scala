package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.config.DedupConfig
import graft.gen.Synth

/**
 * spark-submit entry point for the dedup pipeline (north rule: "runs via
 * spark-submit at N and 4N executors").
 *
 * Usage: RunDedup <nRows> <outDir> [inputParquet]
 *   - with inputParquet: read the image+caption table from parquet
 *   - without: generate the deterministic synthetic corpus of nRows
 * Runs the checkpointed (resumable) pipeline into outDir and prints a
 * one-line JSON summary.
 */
object RunDedup {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000L
    val outDir = if (args.length > 1) args(1) else "target/dedup-out"
    val inputPath = if (args.length > 2) Some(args(2)) else None

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.Sessions.build("graft-dedup", cpus)

    val input = inputPath.map(spark.read.parquet(_)).getOrElse(Synth.corpus(spark, n).toDF())
    val result = Dedup.runCheckpointed(spark, input, outDir, DedupConfig.default)

    val rows = result.clusters.count()
    val clusters = result.clusters.select("cluster_id").distinct().count()
    val dupRows = rows - clusters
    val lowQ = result.lowQuality.count()
    val byDecision = result.decisions.groupBy("decision").count()
      .collect().map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
    val recurring = result.recurring.count()
    println(s"""{"rows":$rows,"clusters":$clusters,"duplicate_rows":$dupRows,""" +
      s""""low_quality":$lowQ,"recurring_clusters":$recurring,"decisions":{$byDecision}}""")
    graft.tables.Layout.releaseCaches(outDir)
    graft.util.Caches.releaseAll()
    spark.stop()
    // a straggler non-daemon thread must not keep the JVM (and its Spark
    // scratch dirs) alive after the summary is printed (round-4 verdict #2)
    sys.exit(0)
  }
}
