package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.tables.Layout

/** Resumability gate (BASELINE.md): any stage re-runnable from its
  * per-stage checkpoint; a restart skips completed stages and produces
  * identical outputs. */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  test("re-run skips completed stages and yields identical clusters") {
    import spark.implicits._
    val root = "target/resume-spec"
    deleteRec(Paths.get(root))
    val input = Synth.corpus(spark, 400).toDF()

    val first = Dedup.runCheckpointed(spark, input, root, DedupConfig.default)
    val clustersA = first.clusters.as[(String, String)].collect().toSet

    val second = Dedup.runCheckpointed(spark, input, root, DedupConfig.default)
    val clustersB = second.clusters.as[(String, String)].collect().toSet
    assert(clustersA == clustersB)

    val lineage = spark.read.parquet(s"$root/_lineage")
      .select("stage", "skipped").as[(String, Boolean)].collect()
    val stages = lineage.map(_._1).distinct
    // every stage has a skipped=true row from the second run
    stages.foreach { st =>
      assert(lineage.contains((st, true)), s"stage $st was not skipped on re-run")
    }
  }

  test("killing a stage (deleting its checkpoint) recomputes only from there") {
    import spark.implicits._
    val root = "target/resume-spec-kill"
    deleteRec(Paths.get(root))
    val input = Synth.corpus(spark, 400).toDF()
    val first = Dedup.runCheckpointed(spark, input, root, DedupConfig.default)
    val clustersA = first.clusters.as[(String, String)].collect().toSet

    // simulate a crash during the 'verified' stage: its checkpoint and all
    // downstream checkpoints are gone (a real crash never completes them)
    deleteRec(Paths.get(root, "verified"))
    deleteRec(Paths.get(root, "clusters"))
    deleteRec(Paths.get(root, "decisions"))
    deleteRec(Paths.get(root, "recurring"))
    deleteRec(Paths.get(root, "audit"))

    assert(Layout.isComplete(root, "features"), "upstream checkpoint intact")
    assert(!Layout.isComplete(root, "verified"))

    val resumed = Dedup.runCheckpointed(spark, input, root, DedupConfig.default)
    val clustersB = resumed.clusters.as[(String, String)].collect().toSet
    assert(clustersA == clustersB)

    val lineage = spark.read.parquet(s"$root/_lineage")
      .select("stage", "skipped").as[(String, Boolean)].collect()
    // the resumed run must have SKIPPED features but RECOMPUTED verified
    val resumedRows = lineage.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    assert(resumedRows("features").count(_ == true) >= 1)
    assert(resumedRows("verified").count(_ == false) >= 2, "verified recomputed")
  }
}
