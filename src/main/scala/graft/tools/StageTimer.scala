package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall/CPU attribution via SparkListener. */
class StageTimer extends SparkListener {
  val rows = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long)]()
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val i = sc.stageInfo
    val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
    val cpu = i.taskMetrics.executorCpuTime / 1000000L
    val run = i.taskMetrics.executorRunTime + i.taskMetrics.jvmGCTime * 0 // keep run pure
    val gc = i.taskMetrics.jvmGCTime
    rows += ((i.stageId, s"gc=${gc}ms ${i.name.take(70)}", wall, run, cpu,
      i.taskMetrics.shuffleWriteMetrics.bytesWritten))
  }
  def report(top: Int = 25): Unit = {
    println(f"${"stage"}%6s ${"wall_ms"}%9s ${"run_ms"}%9s ${"cpu_ms"}%9s ${"shufMB"}%7s  name")
    rows.sortBy(-_._3).take(top).foreach { case (id, name, wall, run, cpu, sw) =>
      println(f"$id%6d $wall%9d $run%9d $cpu%9d ${sw / 1024 / 1024}%7d  $name")
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
