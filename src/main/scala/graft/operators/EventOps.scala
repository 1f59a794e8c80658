package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's per-key stateful semantics (SURVEY.md §2.5 A4/A5/A6, §2.6
  * W8) re-expressed over a bounded event table. The streaming twins live in
  * [[graft.streaming]]; these batch forms define the exact semantics (and
  * are what the DuckDB oracle checks), because each of the reference's
  * keyed-state programs is a *function of the per-key event history* that a
  * window/group-by computes declaratively:
  *
  *  - A4 UV-dedup("first event per mid per day")       = min(ts) over (key, day)
  *  - A6 visitor-repair("is_new iff first-ever day")   = min(day) over key
  *  - W8 jump-detect("entry with no follow-up ≤ T")    = lead(ts) over key
  *
  * Scale: every Window here partitions by the entity key (user/mid) — the
  * natural high-cardinality partitioner, no global sort, no skew beyond the
  * per-user event count.
  */
object EventOps {

  /** A4 — daily unique-visitor dedup: first event per (user, day) survives.
    * Reference: app/dwd/DwdTrafficUniqueVisitorDetail.java:55-84
    * (ValueState lastDate + 1-day TTL ≡ group-by day). */
  def dedupDaily(events: DataFrame, keyCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("visit_date"))
      .agg(min(col(tsCol)).as("first_ts"))

  /** A5 — dual-flag UV: per day, distinct users seen on each of two pages
    * (home/good_detail in the reference → two event types here).
    * Reference: app/dws/DwsTrafficPageViewWindow.java:67-137. */
  def dualFlagUv(
      events: DataFrame,
      typeA: String, typeB: String,
      typeCol: String = "event_type",
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    events
      .where(col(typeCol).isin(typeA, typeB))
      .groupBy(to_date(col(tsCol)).as("visit_date"))
      .agg(
        count_distinct(when(col(typeCol) === typeA, col(keyCol))).as("a_uv_ct"),
        count_distinct(when(col(typeCol) === typeB, col(keyCol))).as("b_uv_ct"))

  /** A6 — new/old-visitor flag repair: a visit is "new" iff its day is the
    * user's first-ever day. Reference: app/dwd/BaseLogApp.java:59-91 (keyed
    * ValueState firstVisitDate; demote is_new on revisit). */
  def visitorRepair(events: DataFrame, keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    events
      .withColumn("first_date", min(to_date(col(tsCol))).over(w))
      .withColumn("is_new",
        when(to_date(col(tsCol)) === col("first_date"), lit(1)).otherwise(lit(0)))
  }

  /** W8 — jump(bounce)-detection: an ENTRY event (session-starting) that is
    * followed by another entry — or by silence — within `horizonSec` is a
    * bounce. Emits both the matched and the timed-out starts, exactly like
    * the reference CEP union (app/dwd/DwdTrafficUserJumpDetail.java:48-82:
    * Pattern(entry → entry).within(10s), match + timeout side-output).
    *
    * Batch form: lead(ts)/lead(isEntry) per key. Streaming twin:
    * [[graft.streaming.JumpDetect]] (state + event-time timer).
    */
  def jumpDetect(
      events: DataFrame,
      isEntry: Column,
      horizonSec: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // event_id tiebreak keeps lead() deterministic if two events share a ts;
    // µs integer arithmetic (not second truncation) keeps the horizon exact.
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("event_id"))
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    events
      .withColumn("is_entry", isEntry)
      .withColumn("next_ts", lead(col(tsCol), 1).over(w))
      .withColumn("next_entry", lead(col("is_entry"), 1).over(w))
      .where(col("is_entry") &&
        (col("next_ts").isNull ||                                   // timeout at end of stream
         us(col("next_ts")) - us(col(tsCol)) > horizonSec * 1000000L || // silence
         col("next_entry")))                                        // immediate re-entry
      .drop("is_entry", "next_ts", "next_entry")
  }

  /** The classic "TopN hot items" DWS pattern (a staple of the gmall
    * curriculum the reference belongs to, though this repo's reference
    * stops at plain window sums): per tumbling window, rank the keys by
    * event count and keep the top `n`, ties broken by key for
    * determinism.
    *
    * Scale: one count shuffle on (window, key) with map-side combine,
    * then a ranking window partitioned BY THE TIME WINDOW — per-window
    * work is bounded by key cardinality, never a global sort.
    */
  def topNPerWindow(
      events: DataFrame,
      windowDur: String,
      keyCol: Column,
      n: Int,
      tsCol: String = "ts"): DataFrame = {
    val counted = events
      .groupBy(window(col(tsCol), windowDur), keyCol.as("item"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
    val w = Window.partitionBy(col("stt")).orderBy(col("ct").desc, col("item"))
    counted.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
  }

  /** A1/A2/A3 + W1/W6 — tumbling event-time window aggregation with the
    * window bounds emitted as formatted strings (stt/edt), exactly the DWS
    * output shape. Keys optional (A3 = global window). Spark's window agg is
    * already incremental with partial aggregation (X6). */
  def tumblingAgg(
      events: DataFrame,
      windowDur: String,
      keys: Seq[Column],
      aggs: Seq[Column],
      tsCol: String = "ts"): DataFrame = {
    val grouped = events.groupBy((window(col(tsCol), windowDur) +: keys): _*)
    grouped.agg(aggs.head, aggs.tail: _*)
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
  }
}
