package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.tables.Layout

/**
 * Small-file compaction (`Layout.compactStage`, the Iceberg
 * `rewrite_data_files` analog; reference analog: the scheduled FAISS
 * re-pack, `app/tasks.py:157-185`). Incremental epochs append one
 * multi-file partition per batch; compaction re-packs the files without
 * changing a row, a partition value, the manifest's row counts, or resume
 * state — and is idempotent.
 */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig.default

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** name -> (size, mtime) for every file — untouched-layout evidence. */
  private def snapshot(dir: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  test("compactStage packs small files; rows, partitions, and resume unchanged") {
    import spark.implicits._
    val root = "target/compaction-spec-root"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 700).toDF().cache()
    val c1 = f"img-${500}%010d"
    val c2 = f"img-${600}%010d"
    // repartition(8) models a many-slot writer: each epoch leaves ~8 small
    // files in its batch partition — the layout compaction exists to fix
    Dedup.runCheckpointed(spark,
      all.where(col("image_id") < c1).repartition(8), root, cfg)
    Incremental.append(spark, root,
      all.where(col("image_id") >= c1 && col("image_id") < c2).repartition(8), "s1", cfg)
    Incremental.append(spark, root,
      all.where(col("image_id") >= c2).repartition(8), "s2", cfg)

    val stage = "features"
    val beforeRows = spark.read.parquet(s"$root/$stage")
      .select("image_id", "batch").as[(String, String)].collect().sorted.toSeq
    val manifestBefore = Layout.manifestRows(root, stage)
    val partsBefore = Layout.partitionRows(root, stage)
    assert(partsBefore.keySet == Set("0", "s1", "s2"))

    val (rewritten, before, after) = Layout.compactStage(spark, root, stage)
    assert(rewritten > 0, s"nothing qualified for compaction ($before files)")
    assert(after < before, s"compaction must shrink the file count ($before -> $after)")
    assert(after >= partsBefore.size.toLong, "every partition keeps >= 1 file")

    // row multiset, manifest row counts, and the partition map are unchanged
    val afterRows = spark.read.parquet(s"$root/$stage")
      .select("image_id", "batch").as[(String, String)].collect().sorted.toSeq
    assert(afterRows == beforeRows)
    assert(Layout.manifestRows(root, stage) == manifestBefore)
    assert(Layout.partitionRows(root, stage) == partsBefore)

    // idempotent: a second pass finds nothing to rewrite and touches no file
    val snap = snapshot(s"$root/$stage")
    val (r2, b2, a2) = Layout.compactStage(spark, root, stage)
    assert(r2 == 0 && b2 == a2)
    assert(snapshot(s"$root/$stage") == snap)

    // resume semantics intact: re-appending a committed batch still skips
    // every slice (partition values were preserved, not merged)
    Incremental.append(spark, root,
      all.where(col("image_id") >= c2).repartition(8), "s2", cfg)
    assert(Layout.partitionRows(root, stage) == partsBefore)
    assert(spark.read.parquet(s"$root/$stage").count() == beforeRows.size.toLong)
    all.unpersist()
  }
}
