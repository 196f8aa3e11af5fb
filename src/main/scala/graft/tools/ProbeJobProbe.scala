package graft.tools

import org.apache.spark.sql.functions._

/** Dev micro-experiment: why does one collect() over `cached-scan ⋈
  * broadcast(LocalRelation)` submit more than one Spark job on the probe's
  * conf profile? Prints per-job stage names for three shapes. */
object ProbeJobProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.build("graft-jobprobe", "8")
    import spark.implicits._
    val big = spark.range(0, 1000000).select(col("id"),
      pmod(col("id"), lit(1000)).as("k")).persist()
    big.count()
    val localDf = spark.createDataFrame(java.util.Arrays.asList(
      (0 until 50).map(i => org.apache.spark.sql.Row(i.toLong)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        println(s"[jobprobe] job=${j.jobId} stages=${j.stageIds.mkString(",")}")
      }
    })
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def run(tag: String)(f: => Unit): Unit = {
      jobs.set(0); f
      Thread.sleep(300)
      println(s"[jobprobe] $tag -> ${jobs.get} jobs")
    }
    run("warm")(big.join(broadcast(localDf), Seq("k")).collect())
    run("cached-scan-join-broadcast-local")(
      big.join(broadcast(localDf), Seq("k")).collect())
    run("isin-then-join")(
      big.where(col("k").isin((0L until 50L): _*))
        .join(broadcast(localDf), Seq("k")).collect())
    run("plain-filter-collect")(big.where(col("k") < 50).collect())
    spark.stop(); sys.exit(0)
  }
}
