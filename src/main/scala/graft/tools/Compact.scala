package graft.tools

import org.apache.hadoop.fs.Path

import graft.tables.Layout

/**
 * Offline table maintenance: small-file compaction over a checkpointed
 * dedup root (`Layout.compactStage`, the Iceberg `rewrite_data_files`
 * analog). Incremental epochs append one multi-file partition per batch;
 * run this on a schedule — the reference runs its index re-pack daily
 * (`app/tasks.py:244-252`) — to keep scan cost proportional to rows, not
 * to accumulated epoch count.
 *
 *   sbt "runMain graft.tools.Compact <root> [stage ...]"
 *
 * With no stages given, every batch-partitioned stage with a complete
 * manifest is compacted. GRAFT_COMPACT_TARGET_ROWS overrides the rows-per-
 * file target (default 4Mi — sized so a ~100-column feature row lands near
 * the 128–512 MB file size Parquet scanners want).
 */
object Compact {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Compact <root> [stage ...]")
    val root = args(0)
    val target = sys.env.get("GRAFT_COMPACT_TARGET_ROWS").map(_.toLong)
      .getOrElse(4L * 1024 * 1024)
    val spark = graft.util.Sessions.build("graft-compact",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val stages: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else {
        val rootPath = new Path(root)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(rootPath)) Seq.empty
        else fs.listStatus(rootPath).toSeq
          .filter(_.isDirectory).map(_.getPath.getName)
          .filterNot(_.startsWith("_"))
          .filter(s => Layout.isComplete(root, s) &&
            Layout.partitionRows(root, s).nonEmpty)
          .sorted
      }

    stages.foreach { stage =>
      val (rewritten, before, after) =
        Layout.compactStage(spark, root, stage, targetRowsPerFile = target)
      println(s"""[compact] {"stage":"$stage","partitions_rewritten":$rewritten,"files_before":$before,"files_after":$after}""")
    }
    spark.stop()
  }
}
