package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Documents, Engine}

/**
 * Containment/sanity evidence for the approximate (rows-only) operators
 * against their exact twins on the driver's sf0.001 tables:
 *  - MinHash/LSH candidates must contain every exact-Jaccard pair >= 0.5
 *    (the s-curve puts P(candidate) > 0.999 there);
 *  - ANN-LSH top-1 should usually agree with brute-force top-1.
 */
class EngineQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("minhash candidates contain all exact jaccard >= 0.5 pairs") {
    import spark.implicits._
    val exact = Documents.q21NgramJaccard(spark, dir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // the minhash query sketches the SAME word 3-gram sets as q21
    // (Documents.shingles3), so the s-curve applies to q21's Jaccard directly.
    val approx = Engine.minhashCandidatesDocs(spark, dir)
      .as[(Long, Long)].collect().toSet
    val missed = exact -- approx
    info(s"exact pairs=${exact.size} lsh candidates=${approx.size} missed=${missed.size}")
    assert(exact.nonEmpty, "sf0.001 documents should contain planted near-dups")
    assert(missed.isEmpty, s"LSH missed exact pairs: $missed")
  }

  test("simhash doc pairs overlap exact near-dups") {
    import spark.implicits._
    val exact = Documents.q21NgramJaccard(spark, dir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val sim = Engine.simhashDocs(spark, dir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    info(s"exact=${exact.size} simhash=${sim.size} overlap=${(exact intersect sim).size}")
    assert(sim.nonEmpty)
  }

  test("ann lsh topk: recall@5 vs the exact crossJoin twin") {
    import spark.implicits._
    val bf = Documents.q23EmbedTopk(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = Engine.annLshTopk(spark, dir)
      .where("qid < 20").select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = bf.map { case (q, want) => (ann.getOrElse(q, Set.empty) & want).size }.sum
    val total = bf.values.map(_.size).sum
    val recall = hits.toDouble / total
    // top-1 must also usually survive (the strongest neighbor shares a
    // bucket with the highest probability)
    val top1 = Documents.q23EmbedTopk(spark, dir).where("rank = 1")
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val top1Hit = top1.count { case (q, n) => ann.getOrElse(q, Set.empty).contains(n) }
    info(s"recall@5=$recall ($hits/$total), exact-top1 retrieved=$top1Hit/${top1.size}")
    assert(recall >= 0.5, s"ann recall@5 $recall collapsed vs exact twin")
    assert(top1Hit * 2 >= top1.size, "ann should retrieve the exact top-1 for a majority of queries")
  }

  test("ann lsh topk: planted near-neighbor pairs (θ≈30°) meet the GW bound") {
    import spark.implicits._
    // Per-plane match rate for angle θ is 1-θ/π (Goemans–Williamson); with
    // OR-amplification over L tables of `planes` bits the candidate
    // probability is 1-(1-(1-θ/π)^planes)^L. At θ=30°, planes=4, L=8 that
    // is ≥0.99 — a far stronger regime than the far-neighbor corpus's 0.5
    // floor, so assert ≥0.9 measured.
    val dim = 64
    val theta = math.Pi / 6
    val planes = 4
    val tables = 8
    val p1 = math.pow(1 - theta / math.Pi, planes)
    val pBound = 1 - math.pow(1 - p1, tables)
    assert(pBound >= 0.99, f"config must put the bound above 0.99, got $pBound%.4f")

    val rnd = new scala.util.Random(2026)
    def gauss() = Array.fill(dim)(rnd.nextGaussian())
    def norm(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], String)]
    var id = 0L
    val nPairs = 150
    (0 until nPairs).foreach { p =>
      val v = norm(gauss())
      val w0 = gauss()
      val d = v.zip(w0).map { case (a, b) => a * b }.sum
      val w = norm(w0.zip(v).map { case (b, a) => b - d * a }) // ⊥ v
      val u = v.zip(w).map { case (a, b) => math.cos(theta) * a + math.sin(theta) * b }
      rows += ((id, v.map(_.toFloat), s"pair$p")); id += 1
      rows += ((id, u.map(_.toFloat), s"pair$p")); id += 1
    }
    (0 until 100).foreach { _ => rows += ((id, norm(gauss()).map(_.toFloat), "bg")); id += 1 }
    val nnDir = "target/ann-near-spec"
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$nnDir/embeddings.parquet")

    val ann = Engine.annLshTopk(spark, nnDir, planes, tables)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the partner sits at cos≈0.866 vs ~0 background — whenever the LSH
    // candidate step finds the pair, top-5 must contain it, so the
    // retrieval rate measures the bucket hit rate directly
    val retrieved = (0 until nPairs).count { p =>
      val a = 2L * p; val b = a + 1
      ann.getOrElse(a, Set.empty).contains(b) && ann.getOrElse(b, Set.empty).contains(a)
    }
    val rate = retrieved.toDouble / nPairs
    info(f"partner retrieval=$rate%.3f over $nPairs pairs (GW bound $pBound%.4f)")
    assert(rate >= 0.9, f"near-neighbor retrieval $rate%.3f below 0.9 (bound $pBound%.4f)")
  }

  test("ann ivf topk: recall@5 vs the exact crossJoin twin; deterministic") {
    import spark.implicits._
    val bf = Documents.q23EmbedTopk(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val run = () => Engine.annIvfTopk(spark, dir)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect()
    val rows = run()
    val ivf = rows.map(r => (r._1, r._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queried = ivf.filterKeys(bf.contains)
    val hits = bf.map { case (q, want) => (ivf.getOrElse(q, Set.empty) & want).size }.sum
    val total = bf.values.map(_.size).sum
    val recall = hits.toDouble / total
    // the exact top-1 neighbor lands in the query's probed cells with the
    // highest probability of any neighbor (smallest angle ⇒ most likely to
    // share the Voronoi cell or a probed adjacent one)
    val top1 = Documents.q23EmbedTopk(spark, dir).where("rank = 1")
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val top1Hit = top1.count { case (q, n) => ivf.getOrElse(q, Set.empty).contains(n) }
    info(s"ivf recall@5=$recall ($hits/$total), exact-top1 retrieved=$top1Hit/${top1.size}, " +
      s"probed-queries=${queried.size}")
    assert(recall >= 0.5, s"ivf recall@5 $recall collapsed vs exact twin")
    assert(top1Hit * 2 >= top1.size, "ivf should retrieve the exact top-1 for a majority of queries")
    // seed pick, Lloyd rounds, probing, and tie-breaks are all deterministic
    assert(run().sortBy(r => (r._1, r._3)) sameElements rows.sortBy(r => (r._1, r._3)),
      "ivf results must be deterministic run-to-run")
  }

  // exact_dedup_corpus / substring_pairs_corpus moved to DedupTwins in
  // round 5 (planted-duplicate documents derivations, DuckDB-oracle-checked
  // by the driver); the hot-group exact-dedup behavior over the SYNTHETIC
  // corpus stays covered by the pipeline itself (exact generator + rep maps,
  // PipelineSpec/CandidatesSpec).
  test("exact dedup twin finds exactly the planted copies") {
    import spark.implicits._
    val groups = graft.queries.DedupTwins.exactDedupCorpus(spark, dir)
      .select("copies").as[Long].collect()
    assert(groups.nonEmpty)
    assert(groups.forall(_ == 2), "every planted copy pairs with its original")
  }

  test("substring pairs twin finds the planted fragments") {
    val pairs = graft.queries.DedupTwins.substringPairsCorpus(spark, dir)
    assert(pairs.where(col("src").startsWith("frag-")).count() > 0,
      "planted token-aligned prefixes must be detected as contained")
  }

  test("percentile_approx tracks the exact percentile (A10)") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("p"))
    val r = li.agg(
      percentile(col("p"), lit(0.95)).as("exact"),
      percentile_approx(col("p"), lit(0.95), lit(10000)).as("approx")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    info(f"p95 exact=$e%.2f approx=$a%.2f")
    assert(math.abs(e - a) / e < 0.01, s"approx $a drifted >1% from exact $e")
  }

  test("driver contract: entry returns rows; every oracleSql key has a query") {
    assert(SparkEntry.entry(spark).count() > 0)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("image features decode consistently") {
    import spark.implicits._
    val feats = Engine.imageFeatures(spark, dir)
    val inconsistent = feats.where("not phash_consistent").count()
    assert(inconsistent == 0, "recomputed phash must equal stored phash")
  }
}
