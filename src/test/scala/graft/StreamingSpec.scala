package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.ParallelTestExecution
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.streaming.StreamingDedup

/**
 * Structured Streaming gate (§2.9): readStream over an arrival directory,
 * foreachBatch → Incremental.append, outputs identical to a batch run over
 * the union of all arrivals.
 */
class StreamingSpec extends AnyFunSuite with ParallelTestExecution {
  lazy val spark = SparkTestSession.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  test("streamed micro-batches produce the batch-run outputs") {
    import spark.implicits._
    val inDir = "target/streaming-spec-in"
    val root = "target/streaming-spec-root"
    val rootFull = "target/streaming-spec-full"
    Seq(inDir, root, rootFull).foreach(d => deleteRec(Paths.get(d)))
    Files.createDirectories(Paths.get(inDir))

    // three arrival files with increasing id ranges (arrival order)
    val all = Synth.corpus(spark, 360).toDF().cache()
    val cuts = Seq((0L, 200L), (200L, 280L), (280L, 360L))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      val slice = all.where(col("image_id") >= f"img-$lo%010d" &&
        col("image_id") < f"img-$hi%010d")
      // one parquet file per arrival so maxFilesPerTrigger(1) gives one
      // micro-batch per slice
      slice.coalesce(1).write.parquet(s"$inDir/arrival-$i")
      val part = Files.walk(Paths.get(s"$inDir/arrival-$i")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(s"$inDir/slice-$i.parquet"))
      deleteRec(Paths.get(s"$inDir/arrival-$i"))
    }

    val q = StreamingDedup.start(spark, inDir, root, DedupConfig.default)
    // AvailableNow terminates when drained; awaitTermination(timeout)
    // returns FALSE on timeout without failing — assert it, or a slow run
    // (suites run concurrently) reads partial output and misdiagnoses as
    // a correctness failure
    assert(q.awaitTermination(900000), "stream did not drain in 15 min")

    val full = Dedup.runCheckpointed(spark, all, rootFull, DedupConfig.default)

    val streamedClusters = spark.read.parquet(s"$root/clusters")
      .as[(String, String)].collect().toSet
    val fullClusters = full.clusters.as[(String, String)].collect().toSet
    assert(streamedClusters == fullClusters,
      s"stream-only=${(streamedClusters -- fullClusters).take(5)} " +
        s"full-only=${(fullClusters -- streamedClusters).take(5)}")

    val streamedPairs = spark.read.parquet(s"$root/verified")
      .select(col("src"), col("dst"), col("is_edge")).collect().map(_.toSeq).toSet
    val fullPairs = full.verified
      .select(col("src"), col("dst"), col("is_edge")).collect().map(_.toSeq).toSet
    assert(streamedPairs == fullPairs)

    val streamedDecisions = spark.read.parquet(s"$root/decisions")
      .select("image_id", "decision").as[(String, String)].collect().toSet
    val fullDecisions = full.decisions
      .select("image_id", "decision").as[(String, String)].collect().toSet
    assert(streamedDecisions == fullDecisions)

    // three epochs were absorbed (bootstrap + two incremental appends)
    val epochs = Files.list(Paths.get(root)).iterator().asScala
      .count(_.getFileName.toString.startsWith("_epoch_"))
    assert(epochs == 3, s"expected 3 epoch markers, got $epochs")
    assert(Files.exists(Paths.get(root, "features", "batch=s1")) ||
      Files.exists(Paths.get(root, "features", "batch=s2")),
      "later arrivals must land as incremental batch partitions")
  }

  test("bootstrap-epoch redelivery resumes the bootstrap, never double-appends") {
    import spark.implicits._
    import graft.tables.Layout
    val root = "target/streaming-spec-redeliver"
    val rootFull = "target/streaming-spec-redeliver-full"
    Seq(root, rootFull).foreach(d => deleteRec(Paths.get(d)))
    val all = Synth.corpus(spark, 240).toDF().cache()
    val cut = f"img-${160}%010d"
    val b0 = all.where(col("image_id") < cut)
    val b1 = all.where(col("image_id") >= cut)

    // crash state: _bootstrap_epoch durable, every bootstrap stage landed,
    // but the _epoch_0 marker never committed — foreachBatch redelivers
    // epoch 0 with the SAME rows
    Layout.markerWrite(s"$root/_bootstrap_epoch", "0")
    Dedup.runCheckpointed(spark, b0, root, DedupConfig.default)
    assert(!Layout.markerExists(s"$root/_epoch_0"))

    StreamingDedup.absorb(spark, b0, root, 0L, DedupConfig.default)
    assert(Layout.markerExists(s"$root/_epoch_0"))
    assert(!Layout.completePartitions(root, "features").contains("s0"),
      "redelivered bootstrap rows must NOT be routed into Incremental.append")

    StreamingDedup.absorb(spark, b1, root, 1L, DedupConfig.default)
    val full = Dedup.runCheckpointed(spark, all, rootFull, DedupConfig.default)

    val streamed = spark.read.parquet(s"$root/decisions")
      .select("image_id", "decision").as[(String, String)].collect().toSet
    val batch = full.decisions
      .select("image_id", "decision").as[(String, String)].collect().toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(5)} full-only=${(batch -- streamed).take(5)}")
    val blockedRate = streamed.count(_._2 == "blocked").toDouble / streamed.size
    assert(blockedRate < 0.5, "a double-applied bootstrap would flip most rows to blocked")
  }

  test("ingest monitor: watermarked windowed agg counts per window and drops late rows") {
    import org.apache.spark.sql.streaming.Trigger
    val inDir = "target/streaming-monitor-in"
    val ckpt = "target/streaming-monitor-ckpt"
    Seq(inDir, ckpt).foreach(d => deleteRec(Paths.get(d)))
    Files.createDirectories(Paths.get(inDir))

    val base = Synth.corpus(spark, 40).toDF().cache()
    def slice(lo: Int, hi: Int) = base.where(col("image_id") >= f"img-$lo%010d" &&
      col("image_id") < f"img-$hi%010d")
    def at(s: String) = lit(java.sql.Timestamp.valueOf(s"2026-01-01 $s"))
    def writeArrival(i: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.parquet(s"$inDir/arrival-$i")
      val part = Files.walk(Paths.get(s"$inDir/arrival-$i")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(s"$inDir/slice-$i.parquet"))
      deleteRec(Paths.get(s"$inDir/arrival-$i"))
      // file-source ordering is by mod time: pin it so slice-0 is batch 0
      Files.setLastModifiedTime(Paths.get(s"$inDir/slice-$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    // batch 0: 10 rows in [10:00,10:01), 10 rows in [10:04,10:05) —
    // max event time 10:04:10, so the batch-1 watermark is 10:02:10
    // (lateness 2min): the [10:00,10:01) and [10:01,10:02) windows close
    writeArrival(0, slice(0, 10).withColumn("event_ts", at("10:00:30"))
      .unionByName(slice(10, 20).withColumn("event_ts", at("10:04:10"))))
    // batch 1: 5 on-time rows at 10:05
    writeArrival(1, slice(20, 25).withColumn("event_ts", at("10:05:00")))
    // batch 2: 5 LATE rows at 10:01 — behind the watermark, must be dropped.
    // They arrive TWO batches after the event-time advance: Spark's
    // watermark propagation filters late events with the PREVIOUS batch's
    // watermark (eviction uses the current one — visible as the two
    // watermark values on the StateStoreSave node), so a row is only
    // guaranteed dropped once the advance is two micro-batches old
    writeArrival(2, slice(25, 30).withColumn("event_ts", at("10:01:00")))

    val arrivals = spark.readStream
      .schema(StreamingDedup.InputSchema.add("event_ts", "timestamp"))
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.ingestMonitor(arrivals)
      .selectExpr("window.start as ws", "fmt", "arrivals", "low_quality", "avg_quality")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .format("memory")
      .queryName("ingest_monitor")
      .start()
    assert(q.awaitTermination(900000), "stream did not drain in 15 min")

    // the watermark must actually have DROPPED the late rows, not just
    // evicted state — numRowsDroppedByWatermark is the per-operator counter
    val droppedTotal = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(droppedTotal >= 1, s"late rows must hit the watermark filter, dropped=$droppedTotal")
    // the aggregation must be STATEFUL with an event-time watermark — the
    // contract that bounds window state at stream scale
    val prog = q.lastProgress
    assert(prog.stateOperators.nonEmpty, "ingest monitor must be a stateful streaming agg")
    assert(Option(prog.eventTime.get("watermark")).exists(_.startsWith("2026-01-01")),
      s"watermark must have advanced from event time, got ${prog.eventTime}")

    // update-mode memory sink holds every emitted update; the LAST value per
    // window is the final count. Sum across fmt groups per window.
    val byWindow = spark.table("ingest_monitor")
      .groupBy(col("ws")).agg(max(col("arrivals")).as("a"))
      .collect().map(r => (r.getTimestamp(0).toString.substring(11, 16), r.getLong(1)))
      .toMap
    // per-(window,fmt) the count never legally shrinks, so summing the max
    // per fmt gives the final per-window total
    val finalCounts = spark.table("ingest_monitor")
      .groupBy(col("ws"), col("fmt")).agg(max(col("arrivals")).as("a"))
      .groupBy(col("ws")).agg(sum(col("a")).as("n"))
      .collect().map(r => (r.getTimestamp(0).toString.substring(11, 16), r.getLong(1)))
      .toMap
    assert(finalCounts.get("10:00").contains(10L),
      s"[10:00,10:01) must hold exactly the 10 on-time rows — late rows dropped; got $finalCounts")
    assert(finalCounts.get("10:04").contains(10L), s"got $finalCounts")
    assert(finalCounts.get("10:05").contains(5L), s"got $finalCounts")
    assert(!byWindow.contains("10:01"),
      s"the late-only [10:01,10:02) window must never materialize; got ${byWindow.keySet}")
  }

  test("corrupt bootstrap marker routes the epoch through the bootstrap, not a wedge") {
    import spark.implicits._
    import graft.tables.Layout
    val root = "target/streaming-spec-corrupt"
    deleteRec(Paths.get(root))
    val b0 = Synth.corpus(spark, 160).toDF()

    // crash state: the bootstrap epoch died MID-marker-write (truncated /
    // garbage content) after some stages landed. markerWrite is atomic now,
    // but pre-atomic roots and non-atomic stores (s3a) can still present
    // this; the redelivered epoch must resume the bootstrap — a parse crash
    // here would wedge every redelivery forever.
    Layout.markerWrite(s"$root/_bootstrap_epoch", "1\u0000garbage")
    StreamingDedup.absorb(spark, b0, root, 0L, DedupConfig.default)
    assert(Layout.markerExists(s"$root/_epoch_0"))
    assert(Layout.isComplete(root, "clusters"))
    assert(!Layout.completePartitions(root, "features").contains("s0"),
      "corrupt-marker epoch must bootstrap, not incremental-append")
    // and the marker is repaired to the epoch that completed the bootstrap
    assert(Layout.markerRead(s"$root/_bootstrap_epoch").map(_.trim) == Some("0"))
  }
}
