package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.integrations.Outbox

/** Outbound-sync outbox (reference `app/tasks.py:36-154`): exactly-once
  * VISIBLE delivery of duplicate events under at-least-once transport. */
class OutboxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig.default

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  test("pending/ack: at-least-once redelivery, idempotent acks, per-consumer cursors") {
    val root = "target/outbox-spec"
    deleteRec(Paths.get(root))
    val all = Synth.corpus(spark, 500).toDF().cache()
    Dedup.runCheckpointed(spark, all.where(col("image_id") < f"img-${400}%010d"),
      root, cfg)

    def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("event_id").collect().map(_.getString(0)).toSet

    val allEvents = ids(Outbox.events(spark, root))
    assert(allEvents.nonEmpty, "the corpus must plant duplicate events")
    assert(allEvents.forall(_.endsWith("@0")), "bootstrap events carry batch 0")

    // fresh consumer sees everything; a second read (crash before ack —
    // at-least-once transport) sees exactly the same set, nothing dropped
    val p0 = ids(Outbox.pending(spark, root, "jira"))
    assert(p0 == allEvents)
    assert(ids(Outbox.pending(spark, root, "jira")) == p0)

    // ack half; pending shrinks to the complement
    val (half, rest) = p0.toSeq.sorted.splitAt(p0.size / 2)
    Outbox.ack(spark, root, "jira", half)
    assert(ids(Outbox.pending(spark, root, "jira")) == rest.toSet)

    // redelivered ack (consumer crashed mid-ack and retried): idempotent
    Outbox.ack(spark, root, "jira", half)
    assert(ids(Outbox.pending(spark, root, "jira")) == rest.toSet)

    // a second consumer has its own cursor — jira's acks are invisible to it
    assert(ids(Outbox.pending(spark, root, "tp")) == allEvents)

    // drain via the frame-shaped loop; acked events never reappear
    val delivered = Outbox.pending(spark, root, "jira")
    Outbox.ackFrame(spark, root, "jira", delivered)
    assert(Outbox.pending(spark, root, "jira").isEmpty)

    // an incremental batch surfaces exactly its own new events
    Incremental.append(spark, root,
      all.where(col("image_id") >= f"img-${400}%010d"), "s1", cfg)
    val p1 = ids(Outbox.pending(spark, root, "jira"))
    assert(p1.nonEmpty && p1.forall(_.endsWith("@s1")),
      s"only the new batch's events may appear, got ${p1.take(3)}")
    // the other consumer sees old + new
    assert(ids(Outbox.pending(spark, root, "tp")) == allEvents ++ p1)
  }
}
