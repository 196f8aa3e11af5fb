package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/**
 * Dev tool: dump `.explain("formatted")` for declared queries to
 * `<outDir>/<name>_<tag>.txt` — the before/after plan evidence the
 * optimization rounds commit under `plans/`. Plans are captured WITHOUT
 * executing the query (initial AQE plan), which is what a reviewer can
 * diff for Exchange counts / join strategies / PushedFilters.
 *
 * Usage: PlanDump <sfDir> <outDir> <tag> [queryName ...]
 * (no names = every SparkEntry.queries entry).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Sessions.build("graft-plandump", cpus)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), plan.getBytes(UTF_8))
      System.err.println(s"[plandump] wrote $name ($tag)")
    }
    spark.stop()
    sys.exit(0)
  }
}
