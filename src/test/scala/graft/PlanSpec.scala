package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.queries.Relational

/**
 * Physical-plan shape assertions (.explain is a correctness surface at
 * scale): filters and projections must reach the parquet scan, small
 * dimensions must broadcast, and the dedup pipeline must never scan the
 * image `bytes` column it doesn't use.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: predicates push down to the parquet scan") {
    val p = plan(Relational.q02FilterProject(spark, dir))
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"),
      "shipdate filter must reach the scan")
  }

  test("q02: scan reads only the referenced columns") {
    val p = plan(Relational.q02FilterProject(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag"), readSchema)
    assert(readSchema.contains("l_orderkey"), readSchema)
  }

  test("q04: small dimensions join via broadcast") {
    val p = plan(Relational.q04RegionSuppliers(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("pipeline never scans the image bytes column") {
    val corpusPath = "target/planspec-corpus"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      Synth.corpus(spark, 400).write.mode("overwrite").parquet(corpusPath)
    }
    val input = spark.read.parquet(corpusPath)
    val r = Dedup.run(spark, input, DedupConfig.default)
    val p = plan(r.verified)
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.contains("bytes"),
      s"bytes column must be pruned from every scan:\n$readSchemas")
  }

  test("candidate machinery is count-window-free (hot-key skew safety)") {
    import org.apache.spark.sql.functions._
    import graft.pairs.Candidates
    // A count(*) OVER (PARTITION BY key) would co-locate every occurrence
    // of the hottest key on one task with no remedy (windows cannot be
    // split) — the round-2 skew exposure. The salted join's size tagging
    // must be a partial-agg + join-back (AQE skew-join can split a hot
    // join partition at runtime), so its plan contains NO Window operator
    // and carries the singleton filter (m >= 2) that keeps one-row buckets
    // out of the grid shuffle.
    import spark.implicits._
    // repartition: a bare toDF Seq is a LocalRelation, which takes the
    // serving path's driver-side size map (pinned separately below) — the
    // DISTRIBUTED plan shape is what this test exists to pin
    val banded = (0 until 1000).map(i => (f"id$i%04d", i % 3, (i % 7).toLong))
      .toDF("id", "band", "bkey").repartition(4)
    val p = plan(Candidates.saltedSelfJoin(banded, 8))
    assert(!p.contains("Window"), s"no window in the salted join:\n${p.take(1200)}")
    assert(p.contains(">= 2"), s"singleton buckets must be filtered pre-grid:\n${p.take(1200)}")

    val q21 = plan(graft.queries.Documents.q21NgramJaccard(spark, dir))
    assert(!q21.contains("Window"), "no df count window in q21")

    // serving fast path: a LOCAL cohort's size map is computed on the
    // driver (zero jobs) — same pair multiset as the distributed shape
    val local = spark.createDataFrame(
      java.util.Arrays.asList(banded.collect(): _*), banded.schema)
    val localPairs = Candidates.saltedSelfJoin(local, 8)
      .select("src", "dst").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    val distPairs = Candidates.saltedSelfJoin(banded, 8)
      .select("src", "dst").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    assert(localPairs == distPairs,
      s"local fast-path pair set diverged: ${localPairs.size} vs ${distPairs.size}")
  }

  test("rep maps are window-free (hot group co-location safety)") {
    // min(id) OVER (PARTITION BY key) would put EVERY row of the hottest
    // exact/caption/phash group on one task — the most skewed spot of the
    // whole input (boilerplate captions, identical images). The rep maps
    // must be partial-agg groupBy + join-back instead (round-3 verdict #1).
    import graft.pairs.Candidates
    val corpusPath = "target/planspec-corpus"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      Synth.corpus(spark, 400).write.mode("overwrite").parquet(corpusPath)
    }
    val input = spark.read.parquet(corpusPath)
    val feats = Dedup.features(input, DedupConfig.default)
    for ((name, df) <- Seq(
        "exactRepMapFull" -> Candidates.exactRepMapFull(feats),
        "normMap" -> Candidates.normMap(feats),
        "phashRepMap" -> Candidates.phashRepMap(feats))) {
      val p = plan(df)
      assert(!p.contains("Window"), s"$name must not use a window:\n${p.take(1200)}")
      // map-side combine: one row per group reaches the reducers
      // (min(string) aggs plan as SortAggregate, hence not "HashAggregate")
      assert(p.contains("partial_min"), s"$name must partial-agg:\n${p.take(1200)}")
    }
    // and the full candidate machinery end to end: four generators, salted
    // join, suffix pass — zero Window operators anywhere
    val cands = plan(Dedup.candidates(feats, DedupConfig.default))
    assert(!cands.contains("Window"),
      s"candidate machinery must be window-free end to end:\n${cands.take(1500)}")
  }

  test("decisions top-k is two-phase salted: no unbounded per-dst window input") {
    val corpusPath = "target/planspec-corpus"
    val input = spark.read.parquet(corpusPath)
    val r = Dedup.run(spark, input, DedupConfig.default)
    val p = plan(r.decisions.where(col("decision") =!= "none"))
    // phase 1 must rank within (dst, salt) — a hot dst splits across salts
    // and the phase-2 window sees <= k * DecisionSalts rows per dst
    assert(p.contains("__salt"), p.take(800))
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("bytes"))
  }

  test("ivf ann plan: posting-list scan is a splittable join, never a cartesian") {
    val p = plan(graft.queries.Engine.annIvfTopk(spark, dir))
    // the probe×assign posting scan and both vector rejoins must be
    // key-joins (AQE can split a hot cell); a CartesianProduct or
    // BroadcastNestedLoopJoin would mean the cell key got lost
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // exactly one Window: the final per-query top-k, whose input is bounded
    // by construction at nprobe*n/k rows per qid — no other operator may
    // introduce one (train runs OUTSIDE this plan, as build actions)
    val windows = "\\bWindow \\[".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly the top-k window, found $windows:\n${p.take(1200)}")
  }
}
