package graft.tables

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}

/**
 * Iceberg-layout table facade (SURVEY.md §1.3): partitioned Parquet plus a
 * JSON snapshot/manifest file per stage, giving the semantics the north rule
 * asks of Iceberg tables — snapshot-scoped resumability, PER-PARTITION
 * manifest entries (so an appended input partition recomputes only its own
 * slice of each upstream stage), per-stage lineage and metrics rows —
 * without the (absent, offline env) iceberg-spark-runtime jar. A real
 * Iceberg catalog is a drop-in replacement for this object.
 *
 * Job economy (the round-1 fixed-cost lesson — 35 driver jobs per run):
 *  - `write` runs ONE Spark job: the row count rides the write itself via
 *    `Observation` instead of a read-back count; the file count comes from
 *    a filesystem listing, not a second scan.
 *  - lineage rows are buffered per run and flushed once (`flushLineage`),
 *    not one tiny write job per stage.
 *  - manifest row counts are readable without any job (`manifestRows`), so
 *    run-level metrics need no extra count() actions.
 *
 * Reference analog: FAISS index persistence + rebuild
 * (`app/utils/vector_store.py:138-163`, `app/tasks.py:157-185`) and the
 * `audit_log` / `system_metrics` append tables
 * (`migrations/schema.sql:126-178`).
 */
object Layout {

  private def manifestPath(root: String, stage: String) =
    Paths.get(root, stage, "_MANIFEST.json")

  def isComplete(root: String, stage: String): Boolean =
    Files.exists(manifestPath(root, stage))

  /** Per-partition row counts recorded in the stage manifest — the north
    * rule's per-partition lineage/metrics, readable with zero Spark jobs. */
  def partitionRows(root: String, stage: String): Map[String, Long] =
    if (!isComplete(root, stage)) Map.empty
    else {
      val m = Files.readString(manifestPath(root, stage))
      """"partitions":\{([^}]*)\}""".r.findFirstMatchIn(m)
        .map(_.group(1).split(",").filter(_.contains(":")).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
        }.toMap)
        .getOrElse(Map.empty)
    }

  /** Partition values (of the stage's partition column) recorded complete. */
  def completePartitions(root: String, stage: String): Set[String] =
    partitionRows(root, stage).keySet

  /** Row count recorded in the stage manifest — zero Spark jobs. */
  def manifestRows(root: String, stage: String): Long = {
    val m = Files.readString(manifestPath(root, stage))
    """"rows":(\d+)""".r.findFirstMatchIn(m).map(_.group(1).toLong).getOrElse(-1L)
  }

  private def listParquetFiles(dir: String): Long =
    if (!Files.exists(Paths.get(dir))) 0L
    else Files.walk(Paths.get(dir)).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))

  private def writeManifest(root: String, stage: String, rows: Long,
      partitionBy: Seq[String], partitions: Map[String, Long],
      schema: String): Unit = {
    val files = listParquetFiles(s"$root/$stage")
    val pv = partitions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val manifest =
      s"""{"stage":"$stage","rows":$rows,"files":$files,"schema":$schema,""" +
        s""""partition_by":${partitionBy.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""partitions":$pv}"""
    Files.createDirectories(manifestPath(root, stage).getParent)
    Files.writeString(manifestPath(root, stage), manifest)
  }

  private def schemaJson(df: DataFrame): String =
    df.schema.map(f => s""""${f.name}":"${f.dataType.simpleString}"""")
      .mkString("{", ",", "}")

  /** ONE-job checkpoint write: the row count is observed on the write job
    * itself. Returns the row count. */
  def write(df: DataFrame, root: String, stage: String,
      partitionBy: Seq[String] = Nil,
      partitionValue: Option[String] = None): Long = {
    val dir = s"$root/$stage"
    val obs = Observation(s"graft-$stage")
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    val writer = observed.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(dir)
    val rows = obs.get("rows").asInstanceOf[Long]
    writeManifest(root, stage, rows, partitionBy,
      partitionValue.map(_ -> rows).toMap, schemaJson(df))
    rows
  }

  /** Append one PARTITION of a partitioned stage (dynamic overwrite of that
    * partition only) and record its rows in the manifest. */
  def appendPartition(df: DataFrame, root: String, stage: String,
      partitionBy: Seq[String], partitionValue: String): Long = {
    val dir = s"$root/$stage"
    val obs = Observation(s"graft-$stage-$partitionValue")
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(dir)
    val rows = obs.get("rows").asInstanceOf[Long]
    val prevRows = if (isComplete(root, stage)) math.max(manifestRows(root, stage), 0L) else 0L
    val prev = partitionRows(root, stage)
    writeManifest(root, stage, prevRows + rows, partitionBy,
      prev + (partitionValue -> rows), schemaJson(df))
    rows
  }

  def read(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage")

  /** Drop a stage's manifest so the next runStage recomputes it (the
    * Overwrite write replaces the data files). Used by the incremental
    * path for the global stages (clusters/decisions/...) that must be
    * re-derived after an append. */
  def invalidate(root: String, stage: String): Unit =
    Files.deleteIfExists(manifestPath(root, stage))

  /**
   * Resumable stage: if the stage's manifest exists, read the checkpoint and
   * skip the compute entirely (re-run after a kill resumes here); otherwise
   * compute WITH a memory/disk persist, write the checkpoint (the write job
   * populates the cache — one pass), and return the CACHED DataFrame.
   * Downstream stages read the cache instead of re-scanning the
   * freshly-written Parquet — the checkpoint is for resume and external
   * consumers, not for intra-run data flow (round-1's write→read-back
   * round-trips were a measured chunk of the fixed per-run cost).
   */
  def runStage(spark: SparkSession, root: String, stage: String,
      partitionBy: Seq[String] = Nil,
      partitionValue: Option[String] = None)(compute: => DataFrame): DataFrame = {
    if (!isComplete(root, stage)) {
      val t0 = System.nanoTime()
      val df = compute.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = write(df, root, stage, partitionBy, partitionValue)
      bufferLineage(root, stage, rows, (System.nanoTime() - t0) / 1e9, skipped = false)
      df
    } else {
      bufferLineage(root, stage, -1L, 0.0, skipped = true)
      read(spark, root, stage)
    }
  }

  /** Per-partition resumable stage: compute and append only if `partition`
    * is not yet in the stage manifest. */
  def runStagePartition(spark: SparkSession, root: String, stage: String,
      partitionBy: Seq[String], partition: String)(compute: => DataFrame): DataFrame = {
    if (!completePartitions(root, stage).contains(partition)) {
      val t0 = System.nanoTime()
      val rows = appendPartition(compute, root, stage, partitionBy, partition)
      bufferLineage(root, s"$stage/$partition", rows, (System.nanoTime() - t0) / 1e9,
        skipped = false)
    } else {
      bufferLineage(root, s"$stage/$partition", -1L, 0.0, skipped = true)
    }
    read(spark, root, stage)
  }

  // ---- lineage / metrics tables (append-only) -----------------------------

  private val lineageBuf =
    mutable.Map.empty[String, mutable.ArrayBuffer[(String, Long, Double, Boolean)]]

  /** Buffer a lineage row; `flushLineage` writes the batch in one job. */
  def bufferLineage(root: String, stage: String, rows: Long, seconds: Double,
      skipped: Boolean): Unit = synchronized {
    lineageBuf.getOrElseUpdate(root, mutable.ArrayBuffer.empty)
      .append((stage, rows, seconds, skipped))
  }

  /** Write all buffered lineage rows for `root` as ONE append job. */
  def flushLineage(spark: SparkSession, root: String): Unit = {
    val rows = synchronized(lineageBuf.remove(root)).getOrElse(mutable.ArrayBuffer.empty)
    if (rows.nonEmpty) {
      import spark.implicits._
      rows.toSeq.toDF("stage", "rows", "seconds", "skipped")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$root/_lineage")
    }
  }

  /** Append-only metrics table: (stage, metric, value) rows. */
  def appendMetrics(spark: SparkSession, root: String,
      rows: Seq[(String, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("stage", "metric", "value")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/_metrics")
  }

  /** Per-partition metrics rows for a stage, read from its manifest — the
    * north rule's per-partition metrics evidence, with zero Spark jobs. */
  def partitionMetricRows(root: String, stage: String): Seq[(String, String, Double)] =
    partitionRows(root, stage).toSeq.sortBy(_._1).map { case (p, r) =>
      (stage, s"rows[batch=$p]", r.toDouble)
    }
}
