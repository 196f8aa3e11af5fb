package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cluster.ConnectedComponents
import graft.config.DedupConfig
import graft.pairs.{Candidates, PairVerifier}
import graft.sig.SuffixDup
import graft.tables.Layout

/**
 * Read-only probe outputs: dedup decisions for the probed rows (the exact
 * rows `Incremental.append` would write for this batch) plus the
 * quality-gate rejects that never reach similarity search.
 */
final case class ProbeResult(decisions: DataFrame, lowQuality: DataFrame) {

  /** One row per probed input: the serving answer. `outcome` is the
    * reference's response status — rejected_low_quality / blocked (409) /
    * duplicate-flagged (201+warning) / new (201). */
  def outcomes: DataFrame =
    decisions.select(col("image_id"), col("decision").as("outcome"),
      col("best_match_id"), col("best_score"), col("cluster_id"), col("is_recurring"))
      .unionByName(
        lowQuality.select(col("image_id"), lit("low_quality").as("outcome")),
        allowMissingColumns = true)
}

/**
 * Point-lookup serving path: evaluate a batch of incoming rows against a
 * completed dedup root WITHOUT mutating any state — the reference's actual
 * request shape (`app/services/duplicate_detector.py:51-97`
 * `process_incoming_bug` + `similarity_engine.py:32-104` `find_similar_bugs`:
 * check the incoming item against the persisted index, return a decision).
 * `Incremental.append` is ingest (match + commit); `Probe.run` is the same
 * matching with the commit deleted — the "is this a duplicate?" API call, a
 * dry-run admission check, a what-if triage query.
 *
 * Contract (asserted by ProbeSpec):
 *   Probe.run(root, batch).decisions == the batch's decision rows of a
 *   subsequent Incremental.append(root, batch, _), byte for byte — and the
 *   root's files are untouched (no writes, no manifest changes, no lineage).
 *
 * Scale shape is append's: the probe batch is the small side, so its keys
 * broadcast; persisted index stages (rep_map / norm_map / banded /
 * banded_simhash / suffix_keys) are only ever SCANNED and filtered against
 * those broadcast keys — the corpus never shuffles. Per-probe-batch work is
 * proportional to the batch and the band buckets / components it touches.
 * Unlike append there are NO stage writes, so a probe costs the candidate
 * probe + verify + a quotient-graph CC over the touched components only —
 * the floor `Incremental` pays per epoch for its 14 checkpoint writes does
 * not apply (BENCH/BASELINE.md prices both).
 *
 * Assumes probe ids are unseen and sort after the corpus ids (arrival
 * order — the same invariant append requires). Probe rows DO see each other
 * (a batch of two identical new captions reports the second as a duplicate
 * of the first), exactly as sequential requests would in the reference.
 */
object Probe {

  /** Build the serving indexes if missing (the FAISS load/rebuild-at-startup
    * analog, `app/utils/vector_store.py:138-163`) and evaluate `input`
    * read-only. Index build is the ONLY write this can ever perform; on a
    * root that has served an append (or probed once) it is a no-op. */
  def run(spark: SparkSession, root: String, input: DataFrame,
      cfg: DedupConfig = DedupConfig.default): ProbeResult = {
    Incremental.ensureIndexes(spark, root, cfg)

    // Lazy localCheckpoints below stand in for append's stage writes: every
    // checkpointed frame is batch-proportional, and without the truncation
    // each consumer (and every CC iteration) re-evaluates the whole transient
    // candidate pipeline — measured as thousands of recomputed stages on a
    // 480-row probe. Lazy (materialize on first consumer) rather than eager:
    // each eager checkpoint is its own driver-sync job, and at serving batch
    // sizes the probe's cost is bounded by job/stage floors, not data.
    val feats = Dedup.features(input, cfg).localCheckpoint(false)
    val cleanNew = feats.where(!col("is_low_quality"))
    val lowQ = feats.where(col("is_low_quality"))
      .select("image_id", "caption", "issues", "quality_score", "quality_severity")
      .withColumn("status", lit(graft.qa.Qa.Pending))
    val oldClean = Layout.read(spark, root, "features")
      .where(!col("is_low_quality")).drop("batch")

    // ---- exact / norm groups: transient twins of append steps 2-3 ---------
    val keyCols = Candidates.ExactKeyCols
    val newKeyed = cleanNew.select((Seq("image_id") ++ keyCols).map(col): _*)
    val oldGroupReps = Layout.read(spark, root, "rep_map")
      .where(col("image_id") === col("rep"))
      .select(keyCols.map(col) :+ col("rep"): _*)
    val matched = oldGroupReps.join(broadcast(newKeyed), keyCols)
      .select((Seq("image_id") ++ keyCols :+ "rep").map(col): _*)
    val unmatched = Candidates.repTag(
      newKeyed.join(broadcast(matched.select("image_id")), Seq("image_id"), "left_anti"),
      keyCols, "image_id", "rep")
    val repNew = matched.unionByName(unmatched).localCheckpoint(false)

    val newNorms = cleanNew.select("image_id", "norm")
    val oldNormReps = Layout.read(spark, root, "norm_map")
      .where(col("image_id") === col("nrep")).select("norm", "nrep")
    val matchedN = oldNormReps.join(broadcast(newNorms), Seq("norm"))
      .select("image_id", "norm", "nrep")
    val unmatchedN = Candidates.repTag(
      newNorms.join(broadcast(matchedN.select("image_id")), Seq("image_id"), "left_anti"),
      Seq("norm"), "image_id", "nrep")
    val normNew = matchedN.unionByName(unmatchedN).localCheckpoint(false)
    val normMapAll = Layout.read(spark, root, "norm_map")
      .select("image_id", "norm", "nrep")
      .unionByName(normNew)

    // ---- transient index slices for the batch (append step 4, no writes) --
    val newRepIds = repNew.where(col("image_id") === col("rep")).select("image_id")
    val bandedNew = Candidates.minhashBanded(
      cleanNew.join(broadcast(newRepIds), Seq("image_id")), cfg)
    val bandedAll = Layout.read(spark, root, "banded")
      .select("id", "band", "bkey").unionByName(bandedNew)

    val phNewVals = cleanNew.select("phash").distinct()
    val phOld = oldClean.select("image_id", "phash")
    val presentOld = phOld.join(broadcast(phNewVals), Seq("phash"))
      .select("phash").distinct()
    val newDistinctPh = phNewVals.join(broadcast(presentOld), Seq("phash"), "left_anti")
    val newPhReps = cleanNew.select("image_id", "phash")
      .join(broadcast(newDistinctPh), Seq("phash"))
      .groupBy("phash").agg(min("image_id").as("id"))
      .select("id", "phash").localCheckpoint(false)
    val bandedSimAll = Layout.read(spark, root, "banded_simhash")
      .select("id", "band", "bkey")
      .unionByName(Candidates.simhashBanded(newPhReps, cfg))

    val newNormRepRows = normNew.where(col("image_id") === col("nrep"))
      .select(col("nrep").as("id"), col("norm")).distinct()
    val suffixKeysAll = Layout.read(spark, root, "suffix_keys")
      .select("b_id", "tier", "k")
      .unionByName(SuffixDup.suffixEntries(newNormRepRows).select("b_id", "tier", "k"))

    // ---- candidate pairs touching the batch (append step 5, verbatim) -----
    val newIds = cleanNew.select(col("image_id").as("id"))

    val exactNew = repNew.where(col("image_id") =!= col("rep"))
      .select(col("rep").as("src"), col("image_id").as("dst"), lit("exact").as("source"))

    val affectedBands = bandedNew.select("band", "bkey").distinct()
    val bandCohort = bandedAll
      .join(broadcast(affectedBands), Seq("band", "bkey"))
    val mhNew = Incremental.pairsTouching(
      Candidates.saltedSelfJoin(bandCohort, cfg.bucketSizeCap), newIds)
      .withColumn("source", lit("minhash"))

    val phAll = phOld.unionByName(cleanNew.select("image_id", "phash"))
    val prepPh = phAll.join(broadcast(phNewVals), Seq("phash"))
      .groupBy("phash").agg(min("image_id").as("prep"))
    val samePhashNew = cleanNew.select("image_id", "phash")
      .join(broadcast(prepPh), Seq("phash"))
      .where(col("image_id") =!= col("prep"))
      .select(col("prep").as("src"), col("image_id").as("dst"))
    val affectedCombos = Candidates.simhashBanded(newPhReps, cfg)
      .select("band", "bkey").distinct()
    val simCohort = bandedSimAll
      .join(broadcast(affectedCombos), Seq("band", "bkey"))
    val simBandNew = Incremental.pairsTouching(
      Candidates.saltedSelfJoin(simCohort, cfg.bucketSizeCap),
      newPhReps.select("id"))
    val simNew = samePhashNew.unionByName(simBandNew).withColumn("source", lit("simhash"))

    val touchedNorms = cleanNew.select("norm").distinct()
    val nrepsAll = normMapAll.where(col("image_id") === col("nrep"))
    val touchedReps = nrepsAll.join(broadcast(touchedNorms), Seq("norm"))
      .select(col("nrep").as("id"), col("norm"))
    val probesNew = SuffixDup.probeEntries(touchedReps, cfg)
    // no broadcast hint on the index slice: a hot shared prefix can pull a
    // corpus-scale slice (same reasoning as Incremental's skCohort)
    val skCohort = suffixKeysAll
      .join(broadcast(probesNew.select("tier", "k").distinct()), Seq("tier", "k"))
    val suffixCohort = nrepsAll
      .select(col("nrep").as("b_id"), col("norm").as("b_norm"))
      .join(skCohort, Seq("b_id"))
    val r1 = SuffixDup.verifyJoin(probesNew, suffixCohort, cfg)
    val buildsNew = SuffixDup.suffixEntries(touchedReps)
    val probeCohort = SuffixDup.probeEntries(
        nrepsAll.select(col("nrep").as("id"), col("norm")), cfg)
      .join(broadcast(buildsNew.select("tier", "k").distinct()), Seq("tier", "k"))
    val r2 = SuffixDup.verifyJoin(probeCohort, buildsNew, cfg)
    val relations = r1.union(r2).distinct()
    val involvedReps = relations.select(col("src").as("nrep"))
      .union(relations.select(col("dst").as("nrep"))).distinct()
    val normCohort = normMapAll.join(broadcast(involvedReps), Seq("nrep"))
      .select("image_id", "norm", "nrep")
    val subNew = Incremental.pairsTouching(
      Candidates.expandSubstringPairs(relations, normCohort)
        .select("src", "dst"), newIds)
      .withColumn("source", lit("substring"))

    val candsNew = exactNew.unionByName(mhNew.select("src", "dst", "source"))
      .unionByName(simNew.select("src", "dst", "source"))
      .unionByName(subNew.select("src", "dst", "source"))

    // ---- verify (append step 6) -------------------------------------------
    val cleanAll = oldClean.unionByName(cleanNew)
    val verifiedNew = PairVerifier.verify(candsNew, cleanAll, cfg).localCheckpoint(false)

    // ---- would-be global state over the touched components only -----------
    // Always the quotient path: probe edges point old→new (unseen ids sort
    // last), so the persisted clusters table — which reflects any QA
    // overrides from its own derivation — composes with the new edges by
    // min-label propagation; a force-split among OLD rows is already
    // materialized in clustersPrev, and no override can name an unseen id.
    val clustersPrev = Layout.read(spark, root, "clusters")
    val newEdges = verifiedNew.where(col("is_edge"))
      .select("src", "dst", "match_score")
    val srcLab = clustersPrev
      .join(broadcast(newEdges.select(col("src")).distinct()),
        col("image_id") === col("src"))
      .select(col("src").as("qsrc"), col("cluster_id").as("qlab"))
    val qEdges = newEdges
      .join(broadcast(srcLab), col("src") === col("qsrc"), "left")
      .select(coalesce(col("qlab"), col("src")).as("src"), col("dst"),
        col("match_score"))
    val qLabels = ConnectedComponents.run(
      newIds.select(col("id"))
        .unionByName(qEdges.select(col("src").as("id"))).distinct(),
      qEdges, cfg.maxCcIterations).localCheckpoint(false)
    val remap = qLabels
      .join(broadcast(newIds), Seq("id"), "left_anti")
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as("__from"), col("cluster_id").as("__to"))
    val newAssign = qLabels.join(broadcast(newIds), Seq("id"))
      .select(col("id").as("image_id"), col("cluster_id"))

    // Recurring status needs member counts only for clusters a probed row
    // lands in (decisions join recurring on the NEW rows' labels): count the
    // touched clusters' previous members — a broadcast-filtered scan, never
    // a corpus shuffle — plus the batch's own assignments. Counts equal the
    // full-table counts append computes, restricted to the touched labels.
    val touchedLabels = qLabels.select("cluster_id").distinct()
    val prevTouched = clustersPrev
      .join(broadcast(remap), col("cluster_id") === col("__from"), "left")
      .withColumn("cluster_id", coalesce(col("__to"), col("cluster_id")))
      .join(broadcast(touchedLabels), Seq("cluster_id"))
      .select("image_id", "cluster_id")
    val recurTouched = Dedup.recurring(prevTouched.unionByName(newAssign), cfg)

    val decis = Dedup.decisionsEnriched(cleanNew, verifiedNew, newAssign,
      recurTouched, cfg)
    ProbeResult(decis, lowQ)
  }
}
