package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Streaming shapes over the `events` table schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly batch (SURVEY.md §1.3/§2.7 — the only
  * incremental interface is the Volcano `getNextTuple()` pull,
  * `plans/PlanNode.java:234`); this module is the Structured Streaming
  * extension surface the 100 TB pipeline needs. Every transform takes a
  * DataFrame so it runs identically over `spark.read` (batch backfill) and
  * `spark.readStream` (live) — the same code path powers both, which is the
  * Spark-native way to keep batch/stream parity.
  */
object EventStreams {

  /** Tumbling-hour counts/sums per event type with a 2h watermark: the
    * streaming twin of the batch `q60_events_hourly` query. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (30-min inactivity gap) per user — built-in
    * `session_window`, so state handling/watermark eviction is Spark's. */
  def sessionsByUser(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on a key with a watermark bound on state:
    * first occurrence wins regardless of event time (within the watermark
    * horizon) — the streaming twin of `d80_dedup_exact`. */
  def streamingDedup(docs: DataFrame, keyCol: String): DataFrame =
    docs.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join: each view joined to the same user's
    * purchases within the following 30 minutes. Both sides carry watermarks
    * and the join condition bounds `purchase_ts` relative to `view_ts`, so
    * Spark derives state-eviction watermarks for BOTH buffers — the join
    * state is bounded by the interval, not the stream's lifetime. Works
    * identically over batch frames (the spec asserts parity). */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
  }

  // ── custom state: running per-user anomaly flagging ─────────────────────

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserRunning(n: Long, sum: Double)
  case class UserFlag(user_id: Long, n_events: Long, mean_value: Double,
      flagged: Boolean)

  /** flatMapGroupsWithState running aggregate: emits one row per user per
    * micro-batch with the running mean and an anomaly flag once the mean
    * drifts over `threshold`. Demonstrates the custom-state escape hatch
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`) for semantics the
    * built-in aggregates can't express. */
  def runningUserFlags(events: Dataset[UserEvent], threshold: Double)
      : Dataset[UserFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(0L, 0.0))
          var n = prev.n; var sum = prev.sum
          it.foreach { e => n += 1; sum += e.value }
          state.update(UserRunning(n, sum))
          val mean = if (n == 0) 0.0 else sum / n
          Iterator(UserFlag(uid, n, mean, mean > threshold))
      }
  }
}
