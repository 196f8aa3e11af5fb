package graft.qa

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.cluster.ConnectedComponents
import graft.config.DedupConfig
import graft.tables.Layout
import graft.{Dedup, DedupResult}

/**
 * Human-in-the-loop mutations over a checkpointed root — the reference's QA
 * triage surface (`app/api/qa_interface.py`): approve/reject rows in the
 * low-quality queue (`:56-176`, status Pending→Approved/Rejected on
 * `migrations/schema.sql:78-85`) and promote/reclassify duplicate links
 * (`:180-294`).
 *
 * Two primitives:
 *  - row mutations ride `Layout.mergeStage` (partition-scoped copy-on-write
 *    MERGE — the Iceberg `MERGE INTO` analog);
 *  - link mutations are an append-only `_overrides` edge table (force-link /
 *    force-split) applied to the verified edge set before EVERY connected-
 *    components derivation — batch, incremental, and refresh alike — so an
 *    override survives subsequent appends instead of being washed away by
 *    the next re-derivation.
 *
 * A force-split removes the DIRECT edge only; its endpoints stay clustered
 * when another verified path connects them (standard CC semantics — the
 * reference's reclassify has the same property via parent unlink). Decisions'
 * best_match/score reflect MEASURED similarity; override links surface
 * through cluster membership (cluster_id, is_recurring), mirroring the
 * reference where promote rewrites the parent chain, not the match score.
 *
 * An approved row joins the cluster space immediately (as a singleton if it
 * was quarantined before candidate generation). Full candidate hydration for
 * approved rows is the standard stage-invalidation path: drop the
 * `candidates` + `verified` manifests and the next checkpointed run
 * recomputes them over the full clean set (ResumeSpec's kill-a-stage
 * semantics) — at QA rates, batching that nightly is the intended shape.
 */
object Qa {

  val OverridesTable = "_overrides"
  val Pending = "Pending"
  val Approved = "Approved"
  val Rejected = "Rejected"

  // ---- override edges ------------------------------------------------------

  /** Read the override edge set: (src, dst, action, seq), src < dst. */
  def readOverrides(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$OverridesTable")
    if (!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) None
    else Some(spark.read.parquet(s"$root/$OverridesTable"))
  }

  /** Append one override; `action` is "link" or "split". Pair orientation is
    * normalized to src < dst (the edge set's invariant). Later overrides for
    * the same pair win (monotonic `seq`). */
  def addOverride(spark: SparkSession, root: String,
      a: String, b: String, action: String): Unit = {
    require(action == "link" || action == "split", s"unknown action '$action'")
    require(a != b, "override endpoints must differ")
    import spark.implicits._
    val seq = readOverrides(spark, root)
      .map(_.agg(max("seq")).head().getLong(0) + 1L).getOrElse(0L)
    Seq((math.Ordering[String].min(a, b), math.Ordering[String].max(a, b), action, seq))
      .toDF("src", "dst", "action", "seq")
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$root/$OverridesTable")
  }

  def forceLink(spark: SparkSession, root: String, a: String, b: String): Unit =
    addOverride(spark, root, a, b, "link")

  def forceSplit(spark: SparkSession, root: String, a: String, b: String): Unit =
    addOverride(spark, root, a, b, "split")

  /** Apply the root's overrides to an edge set (src, dst, match_score):
    * drop force-split pairs, add force-link pairs at score 1.0 (deduped
    * against measured edges — max score wins). Last override per pair wins.
    * The override table is QA-scale and broadcasts. */
  def applyOverrides(spark: SparkSession, root: String, edges: DataFrame): DataFrame =
    readOverrides(spark, root) match {
      case None => edges
      case Some(ov) =>
        val last = ov.groupBy(col("src"), col("dst"))
          .agg(max(struct(col("seq"), col("action"))).as("l"))
          .select(col("src"), col("dst"), col("l.action").as("action"))
        val splits = last.where(col("action") === "split").select("src", "dst")
        val links = last.where(col("action") === "link")
          .select(col("src"), col("dst"), lit(1.0).as("match_score"))
        edges.join(broadcast(splits), Seq("src", "dst"), "left_anti")
          .unionByName(links)
          .groupBy(col("src"), col("dst"))
          .agg(max(col("match_score")).as("match_score"))
    }

  // ---- row mutations -------------------------------------------------------

  /** Approve quarantined rows into the corpus: low_quality status →
    * Approved, features.is_low_quality → false, then re-derive the global
    * stages (the rows join clusters/decisions immediately). */
  def approve(spark: SparkSession, root: String, ids: Seq[String],
      cfg: DedupConfig = DedupConfig.default): DedupResult = {
    import spark.implicits._
    Layout.mergeStage(spark, root, "low_quality", Seq("image_id"))(
      ids.map((_, Approved)).toDF("image_id", "status"))
    Layout.mergeStage(spark, root, "features", Seq("image_id"))(
      ids.map((_, false)).toDF("image_id", "is_low_quality"))
    refreshGlobal(spark, root, cfg)
  }

  /** Reject stays in the queue with a terminal status (reference parity —
    * rejected rows never enter the corpus). No re-derivation needed. */
  def reject(spark: SparkSession, root: String, ids: Seq[String]): Long = {
    import spark.implicits._
    Layout.mergeStage(spark, root, "low_quality", Seq("image_id"))(
      ids.map((_, Rejected)).toDF("image_id", "status"))
  }

  /** Reclassify a pair (the reference's promote_duplicate / reclassify_bug):
    * record the override and re-derive the global stages. */
  def reclassify(spark: SparkSession, root: String, a: String, b: String,
      action: String, cfg: DedupConfig = DedupConfig.default): DedupResult = {
    addOverride(spark, root, a, b, action)
    refreshGlobal(spark, root, cfg)
  }

  /** Re-derive clusters / recurring / decisions / audit from the persisted
    * features + verified stages with overrides applied — the same global
    * step every incremental append runs (`Incremental.append` step 7). */
  def refreshGlobal(spark: SparkSession, root: String,
      cfg: DedupConfig = DedupConfig.default): DedupResult = {
    val feats = Layout.read(spark, root, "features")
    val clean = feats.where(!col("is_low_quality"))
    val verifiedAll = Layout.read(spark, root, "verified")
    val candsAll = Layout.read(spark, root, "candidates")
    val lowQ = Layout.read(spark, root, "low_quality")
      .where(col("status") =!= Approved)

    Seq("clusters", "recurring", "decisions", "audit").foreach(Layout.invalidate(root, _))
    val edges = applyOverrides(spark, root,
      verifiedAll.where(col("is_edge")).select("src", "dst", "match_score"))
    val clusters = Layout.runStage(spark, root, "clusters")(
      ConnectedComponents.run(
        clean.select(col("image_id").as("id")), edges, cfg.maxCcIterations)
        .select(col("id").as("image_id"), col("cluster_id")))
    val recur = Layout.runStage(spark, root, "recurring")(
      Dedup.recurring(clusters, cfg))
    val decis = Layout.runStage(spark, root, "decisions")(
      Dedup.decisionsEnriched(clean, verifiedAll, clusters, recur, cfg))
    val audit = Layout.runStage(spark, root, "audit")(Dedup.auditLog(decis, cfg))
    Dedup.writeRunMetrics(spark, root, decis, lowQ, clusters)
    DedupResult(clean, lowQ, candsAll, verifiedAll, clusters, decis, recur, audit)
  }
}
