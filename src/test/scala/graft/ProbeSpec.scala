package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.tables.Layout

/** The read-only serving path: `Probe.run` must return exactly the decision
  * rows a subsequent `Incremental.append` of the same batch would write,
  * while leaving every byte under the root untouched. */
class ProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** (relative path, size, mtime) of every file under root. */
  private def snapshot(root: String): Set[(String, Long, Long)] = {
    val base = Paths.get(root).toAbsolutePath
    Files.walk(base).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => (base.relativize(p).toString, Files.size(p),
        Files.getLastModifiedTime(p).toMillis))
      .toSet
  }

  private val decisionCols = Seq("image_id", "best_match_id", "best_score",
    "matching_fields", "differing_fields", "confidence", "top_matches",
    "cluster_id", "decision", "is_recurring")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(decisionCols.map(col): _*).collect().map(_.toSeq).toSet

  test("probe == append's decisions for the batch; root bytes untouched") {
    val root = "target/probe-spec"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 480).toDF()
    val cut = f"img-${400}%010d"
    val old = all.where(col("image_id") < cut)
    val neu = all.where(col("image_id") >= cut)

    // two byte-identical rows UNSEEN in the corpus: the second must match
    // the first — probe rows see each other, like sequential requests
    val uniqueCap = "zyqqat florblex umbrine quavitol dresken marlowex vintagra koomzel"
    val seed = neu.orderBy("image_id").limit(1)
      .withColumn("caption", lit(uniqueCap))
      .withColumn("phash", lit(0x5AC3F00D12345678L))
    val p1 = seed.withColumn("image_id", lit("img-zzzzzz0001"))
    val p2 = seed.withColumn("image_id", lit("img-zzzzzz0002"))
    val batch = neu.unionByName(p1).unionByName(p2)

    Dedup.runCheckpointed(spark, old, root, DedupConfig.default)
    Incremental.ensureIndexes(spark, root)

    val before = snapshot(root)
    val probe = Probe.run(spark, root, batch)
    val probed = rows(probe.decisions)
    val probedLowQ = probe.lowQuality.select("image_id").collect().map(_.getString(0)).toSet
    val outcomes = probe.outcomes.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snapshot(root) == before, "probe mutated the root")

    // within-batch duplicate: p2's best match is p1, and it blocks
    val d2 = probe.decisions.where(col("image_id") === "img-zzzzzz0002")
      .select("decision", "best_match_id").collect()
    assert(d2.length == 1 && d2(0).getString(0) == "blocked"
      && d2(0).getString(1) == "img-zzzzzz0001", d2.mkString)

    // outcomes covers every input row exactly once
    assert(outcomes.size == batch.count())
    assert(outcomes("img-zzzzzz0002") == "blocked")

    val inc = Incremental.append(spark, root, batch, "1", DedupConfig.default)
    val appended = rows(inc.decisions.where(col("batch") === "1").drop("batch"))
    assert(probed == appended, {
      val a = (probed -- appended).take(3); val b = (appended -- probed).take(3)
      s"probe-only=$a append-only=$b"
    })
    val appLowQ = Layout.read(spark, root, "low_quality")
      .where(col("batch") === "1")
      .select("image_id").collect().map(_.getString(0)).toSet
    assert(probedLowQ == appLowQ)
  }

  test("probe composes with persisted QA overrides (force-link before probe)") {
    val root = "target/probe-spec-qa"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 300).toDF()

    val res = Dedup.runCheckpointed(spark, all, root, DedupConfig.default)
    val byCluster = res.clusters.collect()
      .map(r => r.getString(0) -> r.getString(1)).groupBy(_._2)
    val reps = byCluster.keys.toSeq.sorted.take(2)
    val (a, b) = (reps(0), reps(1))
    graft.qa.Qa.reclassify(spark, root, a, b, "link")
    val labA = Layout.read(spark, root, "clusters")
      .where(col("image_id") === a).select("cluster_id").head().getString(0)
    val labB = Layout.read(spark, root, "clusters")
      .where(col("image_id") === b).select("cluster_id").head().getString(0)
    assert(labA == labB, "force-link did not merge the clusters")

    // an exact duplicate of `a` probes into the MERGED cluster
    val batch = all.where(col("image_id") === a)
      .withColumn("image_id", lit("img-zzzzzz0009"))
    Incremental.ensureIndexes(spark, root)
    val probe = Probe.run(spark, root, batch)
    val probed = rows(probe.decisions)
    val d = probe.decisions.where(col("image_id") === "img-zzzzzz0009")
      .select("decision", "cluster_id").head()
    assert(d.getString(0) == "blocked" && d.getString(1) == labA, d.toString)

    // append takes the override slow path (full re-derivation); the probe's
    // quotient path must still match it row for row
    val inc = Incremental.append(spark, root, batch, "1", DedupConfig.default)
    val appended = rows(inc.decisions
      .where(col("image_id") === "img-zzzzzz0009").drop("batch"))
    assert(probed.filter(_.head == "img-zzzzzz0009") == appended)
  }

  test("pipeline_probe driver query: one outcome per held-out row") {
    val out = graft.queries.Engine.pipelineProbe(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 50, s"expected the 5% held-out slice, got ${out.length}")
    val outcomes = out.map(_.getString(1)).toSet
    assert(outcomes.subsetOf(Set("low_quality", "blocked", "duplicate", "new")),
      outcomes.mkString(","))
    // the synthetic corpus plants duplicates across the whole id range, so a
    // probe of its tail must actually match some of them against the corpus
    assert(out.exists(r => r.getString(1) == "blocked" || r.getString(1) == "duplicate"))
  }
}
