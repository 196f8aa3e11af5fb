package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.streaming.StreamingDedup

/**
 * Structured Streaming gate (§2.9): readStream over an arrival directory,
 * foreachBatch → Incremental.append, outputs identical to a batch run over
 * the union of all arrivals.
 */
class StreamingSpec extends AnyFunSuite {
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
    q.awaitTermination(300000)

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
}
