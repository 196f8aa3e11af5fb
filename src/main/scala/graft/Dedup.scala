package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.cluster.ConnectedComponents
import graft.config.DedupConfig
import graft.pairs.{Candidates, PairVerifier}
import graft.quality.Quality
import graft.sig.Shingle
import graft.tables.Layout

/** All pipeline outputs (each a lazily-planned DataFrame). */
final case class DedupResult(
    features: DataFrame, // clean rows + norm/shingles/quality columns
    lowQuality: DataFrame, // quarantined rows + issues (triage queue analog)
    candidates: DataFrame, // (src, dst, source) from all four generators
    verified: DataFrame, // candidate pairs + exact measures + edge flags
    clusters: DataFrame, // (image_id, cluster_id) for every CLEAN row
    decisions: DataFrame, // per-row blocked/duplicate/new + best match
    recurring: DataFrame // cluster_id tagged Recurring (>= 1+minDups members)
)

/**
 * The dedup pipeline — batch Spark re-architecture of the reference's
 * request-driven `DuplicateDetector.process_incoming_bug`
 * (`app/services/duplicate_detector.py:51-97`): the decision branches
 * (block / flag / create) become three filtered outputs of one verified-pairs
 * DataFrame instead of control flow (SURVEY.md §3.1).
 *
 * Stage graph (each arrow a shuffle boundary):
 *   input → quality split → feature projection (norm, shingles, phash)
 *         → exact-group rep (1 shuffle on exact_key)
 *         → candidates: exact ∪ minhash-LSH ∪ simhash ∪ substring
 *         → verify (hydrate ×2 + measures)
 *         → edges → connected components → clusters
 *         → decisions / recurring
 */
object Dedup {

  /** Clean-row feature projection. `bytes` is never touched — column pruning
    * keeps it out of every scan downstream of the input. */
  def features(input: DataFrame, cfg: DedupConfig): DataFrame =
    input
      .withColumn("issues", Quality.issuesCol(col("caption"), cfg))
      .withColumn("quality_score", Quality.scoreCol(col("issues")))
      .withColumn("quality_severity", Quality.severityCol(col("issues")))
      .withColumn("is_low_quality", Quality.isLowQualityCol(col("issues")))
      .withColumn("norm", Shingle.normalizeCol(col("caption")))
      .withColumn("shingles", Shingle.shingleHashesCol(col("caption"), cfg.shingleSize))
      .select("image_id", "w", "h", "fmt", "caption", "phash",
        "issues", "quality_score", "quality_severity", "is_low_quality",
        "norm", "shingles")

  def candidates(clean: DataFrame, cfg: DedupConfig): DataFrame = {
    val repMap = Candidates.exactRepMap(clean)
    // rep ids are a thin id list — the join back to the (persisted) feature
    // table broadcasts under the raised threshold, so selecting rep rows
    // costs no extra shuffle of the wide table
    val repIds = repMap.where(col("image_id") === col("rep")).select("image_id")
    val reps = clean.join(repIds, Seq("image_id"))
    Candidates.exactPairs(repMap)
      .unionByName(Candidates.minhashPairs(reps, cfg))
      .unionByName(Candidates.simhashPairs(clean, cfg))
      .unionByName(Candidates.substringPairs(clean, cfg))
  }

  def decisions(clean: DataFrame, edges: DataFrame, clusters: DataFrame,
      cfg: DedupConfig): DataFrame = {
    // a row's decision is driven by its best match among EARLIER rows
    // (src < dst lexicographically = arrival order), mirroring the
    // reference's incoming-vs-prior semantics.
    val byDst = Window.partitionBy(col("dst"))
      .orderBy(col("match_score").desc, col("src").asc)
    val best = edges
      .withColumn("rn", row_number().over(byDst))
      .where(col("rn") === 1)
      .select(col("dst").as("image_id"), col("src").as("best_match_id"),
        col("match_score").as("best_score"))
    clean.select("image_id")
      .join(best, Seq("image_id"), "left")
      .join(clusters, Seq("image_id"), "left")
      .withColumn("decision",
        when(col("best_score") >= cfg.blockThreshold, "blocked")
          .when(col("best_score") >= cfg.flagThreshold, "duplicate")
          .otherwise("new"))
  }

  def recurring(clusters: DataFrame, cfg: DedupConfig): DataFrame =
    clusters.groupBy("cluster_id").agg(count(lit(1)).as("members"))
      .where(col("members") >= cfg.recurringMinDuplicates + 1)
      .withColumn("tag", lit("Recurring"))

  /** In-memory run (tests, small inputs). */
  def run(spark: SparkSession, input: DataFrame, cfg: DedupConfig = DedupConfig.default): DedupResult = {
    val feats = features(input, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val clean = feats.where(!col("is_low_quality"))
    val lowQ = feats.where(col("is_low_quality"))
      .select("image_id", "caption", "issues", "quality_score", "quality_severity")

    val cands = candidates(clean, cfg)
    val verified = PairVerifier.verify(cands, clean, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = verified.where(col("is_edge")).select("src", "dst", "match_score")

    val clusters = ConnectedComponents.run(
      clean.select(col("image_id").as("id")), edges, cfg.maxCcIterations)
      .select(col("id").as("image_id"), col("cluster_id"))

    DedupResult(clean, lowQ, cands, verified, clusters,
      decisions(clean, edges, clusters, cfg), recurring(clusters, cfg))
  }

  /**
   * Checkpointed, resumable run: every stage is persisted as an
   * Iceberg-layout table under `root`; a re-run skips stages whose manifest
   * exists (kill-and-restart resumes at the first incomplete stage), and
   * lineage + metrics rows are appended per stage.
   */
  def runCheckpointed(spark: SparkSession, input: DataFrame, root: String,
      cfg: DedupConfig = DedupConfig.default): DedupResult = {
    val feats = Layout.runStage(spark, root, "features")(features(input, cfg))
    val clean = feats.where(!col("is_low_quality"))
    val lowQ = Layout.runStage(spark, root, "low_quality")(
      feats.where(col("is_low_quality"))
        .select("image_id", "caption", "issues", "quality_score", "quality_severity"))

    val cands = Layout.runStage(spark, root, "candidates", Seq("source"))(
      candidates(clean, cfg))
    val verified = Layout.runStage(spark, root, "verified")(
      PairVerifier.verify(cands, clean, cfg))
    val edges = verified.where(col("is_edge")).select("src", "dst", "match_score")

    val clusters = Layout.runStage(spark, root, "clusters")(
      ConnectedComponents.run(
        clean.select(col("image_id").as("id")), edges, cfg.maxCcIterations)
        .select(col("id").as("image_id"), col("cluster_id")))

    val decis = Layout.runStage(spark, root, "decisions")(
      decisions(clean, edges, clusters, cfg))
    val recur = Layout.runStage(spark, root, "recurring")(recurring(clusters, cfg))

    // one aggregation job for all decision metrics (decision counts come
    // from a single groupBy pass, candidate/cluster rows from the stage
    // manifests' footer-only counts)
    val decisionCounts = decis.groupBy("decision").count().collect()
      .map(r => (s"decisions", r.getString(0), r.getLong(1).toDouble)).toSeq
    Layout.appendMetrics(spark, root, Seq(
      ("candidates", "pairs", cands.count().toDouble),
      ("clusters", "rows", clusters.count().toDouble)) ++ decisionCounts)

    DedupResult(clean, lowQ, cands, verified, clusters, decis, recur)
  }
}
