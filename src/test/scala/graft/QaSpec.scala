package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.ParallelTestExecution
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.qa.Qa
import graft.tables.Layout

/**
 * QA mutation surface (reference `app/api/qa_interface.py`): row-level
 * MERGE through the Layout facade (approve/reject the low-quality queue)
 * and force-link/force-split override edges into connected components.
 */
class QaSpec extends AnyFunSuite with ParallelTestExecution {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig.default

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** (name -> (size, mtime, first/last bytes)) for every file in a dir tree —
    * byte-identity evidence without hashing libraries. */
  private def snapshot(dir: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  test("approve/reclassify: partition-scoped MERGE + override edges into CC") {
    import spark.implicits._
    val root = "target/qa-spec-root"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 800).toDF().cache()
    val cut = f"img-${600}%010d"
    Dedup.runCheckpointed(spark, all.where(col("image_id") < cut), root, cfg)
    Incremental.append(spark, root, all.where(col("image_id") >= cut), "s1", cfg)

    def clustersOf = spark.read.parquet(s"$root/clusters")
      .as[(String, String)].collect().toMap

    // duplicate_history: append-only event log, one row per non-new
    // decision event, batch-partitioned, with the match method recorded
    val hist = spark.read.parquet(s"$root/duplicate_history")
    val decNonNew = spark.read.parquet(s"$root/decisions")
      .where(col("decision") =!= "new")
    assert(hist.count() == decNonNew.count())
    assert(hist.where(col("batch") === "s1").count() > 0,
      "the incremental batch must append its own events")
    assert(hist.where(col("was_blocked") && col("match_method").isNull).count() == 0,
      "blocked events must carry their match method")

    // -- approve a quarantined batch-0 row into the corpus ------------------
    val lqIds = spark.read.parquet(s"$root/low_quality")
      .where(col("batch") === "0").select("image_id").as[String].collect().sorted
    assert(lqIds.nonEmpty, "corpus must plant low-quality rows in batch 0")
    val lq = lqIds.head
    assert(!clustersOf.contains(lq), "quarantined row must not be clustered yet")

    val untouchedFeat = snapshot(s"$root/features/batch=s1")
    val untouchedLowQ = snapshot(s"$root/low_quality/batch=s1")

    Qa.approve(spark, root, Seq(lq), cfg)

    val status = spark.read.parquet(s"$root/low_quality")
      .where(col("image_id") === lq).select("status").as[String].head()
    assert(status == Qa.Approved)
    val c1 = clustersOf
    assert(c1.contains(lq), "approved row must join the cluster space")
    val dec = spark.read.parquet(s"$root/decisions")
      .where(col("image_id") === lq).select("decision").as[String].head()
    assert(dec == "new", "no candidates were generated for it: decision=new singleton")
    // copy-on-write: the untouched batch partitions are bit-for-bit the same
    // files (same names, sizes, mtimes — not rewritten, not even touched)
    assert(snapshot(s"$root/features/batch=s1") == untouchedFeat)
    assert(snapshot(s"$root/low_quality/batch=s1") == untouchedLowQ)

    // -- force-split a measured edge whose cluster has exactly 2 members ----
    val sizes = c1.groupBy(_._2).view.mapValues(_.size).toMap
    val edges = spark.read.parquet(s"$root/verified").where(col("is_edge"))
      .select("src", "dst").as[(String, String)].collect()
    val (es, ed) = edges.find { case (s, d) =>
      c1.get(s).exists(cid => sizes(cid) == 2) && c1.get(s) == c1.get(d)
    }.getOrElse(fail("need a 2-member cluster edge"))

    // the two-step form (record override, then refresh) — what a triage UI
    // batching several human actions into one re-derivation calls
    Qa.forceSplit(spark, root, es, ed)
    Qa.refreshGlobal(spark, root, cfg)
    val c2 = clustersOf
    assert(c2(es) != c2(ed), "force-split must separate a pair whose only link it was")

    // -- force-link two unrelated singletons --------------------------------
    val singles = c2.toSeq.groupBy(_._2).filter(_._2.size == 1)
      .keys.toSeq.sorted.take(4)
    val Seq(sa, sb, sc, sd) = singles.map(cid => c2.find(_._2 == cid).get._1)
    // the one-shot form (override + refresh in one call)
    Qa.reclassify(spark, root, sa, sb, "link", cfg)
    // the two-step form: record the override now, refresh with the rest
    Qa.forceLink(spark, root, sc, sd)
    Qa.refreshGlobal(spark, root, cfg)
    val c3 = clustersOf
    assert(c3(sa) == c3(sb), "force-link must merge the pair's clusters")
    assert(c3(sc) == c3(sd), "batched force-link applies on the next refresh")
    assert(c3(es) != c3(ed), "earlier split override still applies")

    // -- reject: terminal status, row never enters the corpus ---------------
    val lqRest = lqIds.filterNot(_ == lq)
    assert(lqRest.nonEmpty, "need a second quarantined row for the reject case")
    val rej = lqRest.head
    Qa.reject(spark, root, Seq(rej))
    assert(spark.read.parquet(s"$root/low_quality")
      .where(col("image_id") === rej).select("status").as[String].head() == Qa.Rejected)

    // -- overrides survive a later incremental append -----------------------
    val more = Synth.corpus(spark, 900).toDF()
      .where(col("image_id") >= f"img-${800}%010d")
    Incremental.append(spark, root, more, "s2", cfg)
    val c4 = clustersOf
    assert(c4(sa) == c4(sb), "link override must survive the append's re-derivation")
    assert(c4(es) != c4(ed), "split override must survive the append's re-derivation")
    assert(!c4.contains(rej), "rejected row stays out of the cluster space")
  }

  test("promote: rep override re-anchors a cluster, keeps membership, survives appends") {
    import spark.implicits._
    val root = "target/qa-promote-root"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 700).toDF().cache()
    Dedup.runCheckpointed(spark, all.where(col("image_id") < f"img-${600}%010d"),
      root, cfg)

    def clustersOf = spark.read.parquet(s"$root/clusters")
      .as[(String, String)].collect().toMap

    val c0 = clustersOf
    val (label, members) = c0.toSeq.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      .filter { case (cid, ms) => ms.size >= 3 && ms.min == cid }
      .toSeq.minBy(_._1)
    // promote a NON-min member: min-id labeling would never pick it
    val anchor = members.toSeq.sorted.apply(1)
    assert(anchor != label)

    val untouchedFeat = snapshot(s"$root/features")
    val untouchedVerified = snapshot(s"$root/verified")
    Qa.promote(spark, root, anchor)
    Qa.refreshGlobal(spark, root, cfg)

    val c1 = clustersOf
    assert(members.forall(m => c1(m) == anchor),
      s"every member of $label must re-anchor to $anchor")
    assert(c1.count(_._2 == anchor) == members.size, "membership must not change")
    // decisions carry the promoted label; the decision VALUES are untouched
    val dec = spark.read.parquet(s"$root/decisions")
      .select("image_id", "cluster_id").as[(String, String)].collect().toMap
    assert(members.forall(m => dec(m) == anchor))
    // copy-on-write: row-level stages are not rewritten by a rep override
    assert(snapshot(s"$root/features") == untouchedFeat)
    assert(snapshot(s"$root/verified") == untouchedVerified)

    // latest promote wins inside one cluster
    val anchor2 = members.toSeq.sorted.apply(2)
    Qa.promote(spark, root, anchor2)
    Qa.refreshGlobal(spark, root, cfg)
    assert(members.forall(m => clustersOf(m) == anchor2))

    // the promote survives an incremental append's re-derivation (overrides
    // force the slow path, which re-applies promotes after CC)
    Incremental.append(spark, root,
      all.where(col("image_id") >= f"img-${600}%010d"), "s1", cfg)
    val c2 = clustersOf
    val merged = c2.toSeq.filter(_._2 == c2(anchor2)).map(_._1).toSet
    assert(members.subsetOf(merged), "membership can only grow through an append")
    assert(c2(anchor2) == anchor2,
      "the promoted anchor must still name its (possibly grown) cluster")
  }
}
