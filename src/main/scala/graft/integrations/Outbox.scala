package graft.integrations

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.tables.Layout

/**
 * Outbound-sync outbox — the batch analog of the reference's Celery tasks
 * that push duplicate events to external trackers
 * (`app/tasks.py:36-154` `sync_bug_to_jira` / `sync_bug_to_target_process`,
 * `app/integrations/jira_client.py` / `targetprocess_client.py`). The
 * reference delivers per-event with broker retries (at-least-once) and
 * marks success on the bug row; the graft derives the SAME event stream
 * from the append-only `duplicate_history` stage and tracks delivery in a
 * per-consumer ack table, giving each downstream system (a tracker, a
 * labeling queue, a billing pipe) its own cursor over one immutable log.
 *
 * Delivery contract (asserted by OutboxSpec):
 *  - `pending` returns every event not yet acked by THIS consumer —
 *    at-least-once: a crash between reading pending and acking redelivers
 *    exactly the unacked events, never drops one.
 *  - `ack` is idempotent: acking the same events twice (redelivery after a
 *    crash mid-ack, a retried consumer) changes nothing — acks are a set,
 *    deduplicated on read, so an event acked once is PERMANENTLY invisible
 *    (exactly-once visibility even under at-least-once transport).
 *  - consumers are independent: one consumer's acks never affect another's
 *    pending set.
 *  - new `Incremental.append` batches surface exactly their own new events
 *    (duplicate_history is append-only per batch; an event, once written,
 *    is final — edges point old→new, so no rewrite can re-trigger a sync).
 *
 * Scale shape: events and acks are both bounded by the duplicate-event
 * count (≪ corpus). `pending` is one equi-join on event_id — at warehouse
 * scale both sides hash-partition on the id; no corpus table is touched.
 * Event ids are deterministic (image_id@batch — one non-new decision per
 * row per batch), so replaying a rebuilt root regenerates identical ids and
 * the consumer's cursor survives a full recompute.
 */
object Outbox {

  private def ackDir(root: String, consumer: String): String = {
    require(consumer.matches("[A-Za-z0-9_-]+"), s"bad consumer name '$consumer'")
    s"$root/_outbox_acks/$consumer"
  }

  /** The full event stream with deterministic event ids (detected_at is
    * processing wall-clock — excluded from identity on purpose). */
  def events(spark: SparkSession, root: String): DataFrame =
    Layout.read(spark, root, "duplicate_history")
      .withColumn("event_id", concat(col("image_id"), lit("@"), col("batch")))

  private def acks(spark: SparkSession, root: String, consumer: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(ackDir(root, consumer))
    if (!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) None
    else Some(spark.read.parquet(ackDir(root, consumer)).select("event_id").distinct())
  }

  /** Events not yet acknowledged by `consumer` — what the consumer's next
    * sync run must deliver. No delivery order is guaranteed (the frame is a
    * bare anti-join; an `orderBy` here would charge every pending() call a
    * full sort for an ordering most consumers don't need — a consumer that
    * wants batch order sorts its own delivery slice). */
  def pending(spark: SparkSession, root: String, consumer: String): DataFrame = {
    val ev = events(spark, root)
    acks(spark, root, consumer) match {
      case None => ev
      case Some(a) => ev.join(a, Seq("event_id"), "left_anti")
    }
  }

  /** Acknowledge delivered events (idempotent append — double-acking a
    * redelivered event is a no-op on the visible set). Returns the number
    * of ids recorded by this call. */
  def ack(spark: SparkSession, root: String, consumer: String,
      eventIds: Seq[String]): Long = {
    if (eventIds.isEmpty) return 0L
    import spark.implicits._
    eventIds.distinct.toDF("event_id")
      .withColumn("acked_at", current_timestamp())
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(ackDir(root, consumer))
    eventIds.distinct.size.toLong
  }

  /** Ack straight from a delivered frame (the consumer loop's shape:
    * `val batch = pending(...); send(batch); ackFrame(batch)`). The ids are
    * written distributed — never collected: at the 100-TB target the
    * duplicate-event stream is corpus-shaped and a consumer acking a large
    * delivery through a driver Seq would OOM the driver (r5 verdict #6).
    * Returns the number of distinct ids acked. */
  def ackFrame(spark: SparkSession, root: String, consumer: String,
      delivered: DataFrame): Long = {
    val obs = org.apache.spark.sql.Observation("graft-outbox-ack")
    delivered.select("event_id").distinct()
      .observe(obs, count(lit(1)).as("n"))
      .withColumn("acked_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(ackDir(root, consumer))
    obs.get("n").asInstanceOf[Long]
  }
}
