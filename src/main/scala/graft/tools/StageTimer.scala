package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall/CPU attribution via SparkListener.
  *
  * Stage call sites are useless under AQE (every materialization job is
  * submitted from the shared `withThreadLocalCaptured` pool), so stages are
  * labeled with their JOB's `spark.job.description` instead — AQE captures
  * the submitting thread's local properties, so a `setJobDescription` around
  * each pipeline stage (see `Layout.runStage`) flows through to every
  * AQE-materialized shuffle stage it spawns. Sorting the report by run_ms,
  * not wall: AQE submits stages concurrently, so per-stage wall includes
  * queue time and double-counts the clock.
  */
class StageTimer extends SparkListener {
  val rows = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long)]()
  private val stageDesc = mutable.Map.empty[Int, String]

  override def onJobStart(j: SparkListenerJobStart): Unit = {
    val d = Option(j.properties).flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse("")
    j.stageIds.foreach(id => stageDesc.getOrElseUpdate(id, d))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val i = sc.stageInfo
    val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
    val cpu = i.taskMetrics.executorCpuTime / 1000000L
    val run = i.taskMetrics.executorRunTime
    val gc = i.taskMetrics.jvmGCTime
    val label = stageDesc.getOrElse(i.stageId, "")
    rows += ((i.stageId, s"gc=${gc}ms tasks=${i.numTasks} [$label] ${i.name.take(100)}", wall, run, cpu,
      i.taskMetrics.shuffleWriteMetrics.bytesWritten))
  }

  def report(top: Int = 25): Unit = {
    println(f"${"stage"}%6s ${"wall_ms"}%9s ${"run_ms"}%9s ${"cpu_ms"}%9s ${"shufMB"}%7s  name")
    rows.sortBy(-_._4).take(top).foreach { case (id, name, wall, run, cpu, sw) =>
      println(f"$id%6d $wall%9d $run%9d $cpu%9d ${sw / 1024 / 1024}%7d  $name")
    }
    // roll up by job description: where the machine time actually goes
    val byDesc = rows.groupBy(_._2.split("\\[", 2).last.split("\\]", 2).head)
      .map { case (d, rs) => (d, rs.map(_._4).sum, rs.map(_._5).sum, rs.size) }
      .toSeq.sortBy(-_._2)
    println(f"${"run_s"}%8s ${"cpu_s"}%8s ${"stages"}%6s  description")
    byDesc.take(top).foreach { case (d, run, cpu, n) =>
      println(f"${run / 1000.0}%8.1f ${cpu / 1000.0}%8.1f $n%6d  $d")
    }
  }
}

object StageTimer {
  def attach(spark: SparkSession): StageTimer = {
    val t = new StageTimer
    spark.sparkContext.addSparkListener(t)
    t
  }
}
