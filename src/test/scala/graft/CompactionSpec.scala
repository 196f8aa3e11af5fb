package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.ParallelTestExecution
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
class CompactionSpec extends AnyFunSuite with ParallelTestExecution {
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

    // ---- crash-window repair (ADVICE r4): a compaction that dies BETWEEN
    // rename(live->bak) and rename(fresh->live) leaves the partition's only
    // copy in the backup dir. The next compactStage must restore it on
    // entry — not delete the backup (which was the only copy) — and end
    // with the stage intact.
    val liveDir = Paths.get(s"$root/$stage/batch=s1")
    val bakDir = Paths.get(s"$root/_compact_old_$stage/batch=s1")
    Files.createDirectories(bakDir.getParent)
    Files.move(liveDir, bakDir) // the mid-swap crash state
    assert(!Files.exists(liveDir))
    val (_, _, afterRepair) = Layout.compactStage(spark, root, stage)
    assert(Files.exists(liveDir), "crashed swap's partition was not restored")
    assert(!Files.exists(Paths.get(s"$root/_compact_old_$stage")))
    assert(afterRepair >= partsBefore.size.toLong)
    val repairedRows = spark.read.parquet(s"$root/$stage")
      .select("image_id", "batch").as[(String, String)].collect().sorted.toSeq
    assert(repairedRows == beforeRows,
      "rows after crash repair differ from the pre-crash stage")
    assert(Layout.partitionRows(root, stage) == partsBefore)

    // same repair on the mergeStage swap path: plant a mid-swap crash state,
    // then run a merge touching a DIFFERENT partition — entry repair must
    // bring s2 back before anything else happens
    val live2 = Paths.get(s"$root/$stage/batch=s2")
    val bak2 = Paths.get(s"$root/_merge_old_$stage/batch=s2")
    Files.createDirectories(bak2.getParent)
    Files.move(live2, bak2)
    val someBase = spark.read.parquet(s"$root/$stage")
      .where(col("batch") === "0").select("image_id").limit(1)
      .as[String].collect().head
    Layout.mergeStage(spark, root, stage, Seq("image_id"))(
      Seq((someBase, false)).toDF("image_id", "is_low_quality"))
    assert(Files.exists(live2), "merge entry did not restore the crashed swap")
    val mergedRows = spark.read.parquet(s"$root/$stage")
      .select("image_id", "batch").as[(String, String)].collect().sorted.toSeq
    assert(mergedRows == beforeRows)
    all.unpersist()
  }
}
