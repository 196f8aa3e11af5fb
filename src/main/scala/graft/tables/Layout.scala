package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Iceberg-layout table facade (SURVEY.md §1.3): partitioned Parquet plus a
 * JSON snapshot/manifest file per stage, giving the semantics the north rule
 * asks of Iceberg tables — snapshot-scoped resumability, per-stage lineage
 * and metrics rows — without the (absent, offline env) iceberg-spark-runtime
 * jar. `read/write/isComplete/runStage` are the only entry points, so a real
 * Iceberg catalog is a drop-in replacement.
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

  def write(df: DataFrame, root: String, stage: String,
      partitionBy: Seq[String] = Nil): Long = {
    val dir = s"$root/$stage"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(dir)
    val spark = df.sparkSession
    val rows = spark.read.parquet(dir).count()
    val files = spark.read.parquet(dir).inputFiles.length
    val schema = df.schema.map(f => s""""${f.name}":"${f.dataType.simpleString}"""")
      .mkString("{", ",", "}")
    val manifest =
      s"""{"stage":"$stage","rows":$rows,"files":$files,"schema":$schema,"partition_by":${partitionBy.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    Files.createDirectories(manifestPath(root, stage).getParent)
    Files.writeString(manifestPath(root, stage), manifest)
    rows
  }

  def read(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage")

  /**
   * Resumable stage: if the stage's manifest exists, read the checkpoint and
   * skip the compute entirely (re-run after a kill resumes here); otherwise
   * compute, persist, append a lineage row, and read back (so downstream
   * stages scan Parquet instead of recomputing the plan).
   */
  def runStage(spark: SparkSession, root: String, stage: String,
      partitionBy: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (!isComplete(root, stage)) {
      val t0 = System.nanoTime()
      val rows = write(compute, root, stage, partitionBy)
      appendLineage(spark, root, stage, rows, (System.nanoTime() - t0) / 1e9, skipped = false)
    } else {
      appendLineage(spark, root, stage, -1L, 0.0, skipped = true)
    }
    read(spark, root, stage)
  }

  /** Append-only lineage table: one row per stage execution (or skip). */
  def appendLineage(spark: SparkSession, root: String, stage: String,
      rows: Long, seconds: Double, skipped: Boolean): Unit = {
    import spark.implicits._
    Seq((stage, rows, seconds, skipped))
      .toDF("stage", "rows", "seconds", "skipped")
      .write.mode(SaveMode.Append).parquet(s"$root/_lineage")
  }

  /** Append-only metrics table: (stage, metric, value) rows. */
  def appendMetrics(spark: SparkSession, root: String,
      rows: Seq[(String, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("stage", "metric", "value")
      .write.mode(SaveMode.Append).parquet(s"$root/_metrics")
  }

  /** Per-partition row counts for a stage — the north rule's
    * per-partition metrics evidence. */
  def partitionMetrics(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("rows"))
}
