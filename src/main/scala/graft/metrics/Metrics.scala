package graft.metrics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Aggregations over the dedup pipeline's OWN outputs — the reference's
 * monitoring dashboard queries (`/root/reference/app/api/monitoring.py`)
 * re-expressed as DataFrame transforms:
 *
 *   - prevention rate / decision counts  (`monitoring.py:41-44`)
 *   - duplicate-score histogram          (`monitoring.py:293-300`)
 *   - top parents by duplicate count     (`monitoring.py:73-86`)
 *   - quality-issue explode counts       (`monitoring.py:216-258` analog)
 *   - cluster-size distribution          (duplicates/day stands on the
 *     events table — the input schema pins no timestamp, see input_hint)
 *
 * Each function takes the stage DataFrame by column contract so it runs
 * identically over the pipeline's outputs (engine-native) and over the
 * document-table twins in `DedupTwins` (driver DuckDB-checked). Counts are
 * cast to double in the long-format outputs so one typed value column
 * carries both counts and rates.
 */
object Metrics {

  /** Long-format decision metrics: (metric, value). Rates are exact
    * count/count divisions rounded to 4 decimals (hash-stable). */
  def decisionMetrics(decisions: DataFrame, decisionCol: String = "decision"): DataFrame = {
    val agg = decisions.groupBy(col(decisionCol).as("metric"))
      .agg(count(lit(1)).cast("double").as("value"))
    val total = decisions.select(
      lit("total_rows").as("metric"), count(lit(1)).cast("double").as("value"))
    val totalC = sum(col("value")).over()
    val rates = agg.select(
      concat(col("metric"), lit("_rate")).as("metric"),
      round(col("value") / totalC, 4).as("value"))
    agg.unionByName(total).unionByName(rates)
  }

  /** Reference threshold buckets for a match score column. */
  def scoreBucket(score: Column): Column =
    when(score >= 0.85, "block")
      .when(score >= 0.70, "flag")
      .otherwise("below")

  /** (bucket, cnt) histogram of match scores. */
  def scoreHistogram(scored: DataFrame, scoreCol: String): DataFrame =
    scored.groupBy(scoreBucket(col(scoreCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Top-k parents by number of rows that matched them
    * (`monitoring.py:73-86` "top duplicate parents"). Total tie-break on
    * the parent id keeps top-k deterministic. */
  def topParents(decisions: DataFrame, k: Int,
      parentCol: String = "best_match_id"): DataFrame =
    decisions.where(col(parentCol).isNotNull)
      .groupBy(col(parentCol).as("parent_id"))
      .agg(count(lit(1)).as("dup_count"))
      .orderBy(col("dup_count").desc, col("parent_id").asc)
      .limit(k)

  /** Explode-and-count quality issues from the low-quality queue. */
  def issueCounts(lowQuality: DataFrame, issuesCol: String = "issues"): DataFrame =
    lowQuality.select(explode(col(issuesCol)).as("issue"))
      .groupBy("issue").agg(count(lit(1)).as("cnt"))

  /** Cluster-size distribution: (members, clusters). */
  def clusterSizeHistogram(clusters: DataFrame,
      clusterCol: String = "cluster_id"): DataFrame =
    clusters.groupBy(col(clusterCol)).agg(count(lit(1)).as("members"))
      .groupBy("members").agg(count(lit(1)).as("clusters"))
}
