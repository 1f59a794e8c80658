package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Semantics of the bounded-heap [[EventOps.topNPerWindow]]: it must be
  * row-for-row identical to the declarative row_number() window it
  * replaced (that window IS the spec — and the DuckDB oracle), including
  * count ties broken by item, windows with fewer than n keys, and both
  * numeric and string key types. */
class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  // two hourly windows; 10:00 has a 3-way count tie at ct=2, 11:00 has
  // a single key (fewer than n)
  private lazy val events = Seq(
    (ts("10:01"), 7L), (ts("10:02"), 7L),             // 7 -> 2
    (ts("10:03"), 3L), (ts("10:04"), 3L),             // 3 -> 2
    (ts("10:05"), 9L), (ts("10:06"), 9L),             // 9 -> 2 (tie w/ 3,7)
    (ts("10:07"), 5L),                                // 5 -> 1 (must lose)
    (ts("11:30"), 1L)
  ).toDF("ts", "user_id")

  private def windowReference(keyed: org.apache.spark.sql.DataFrame, n: Int) = {
    val counted = keyed
      .groupBy(window(col("ts"), "1 hour"), col("k").as("item"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
    val w = Window.partitionBy(col("stt")).orderBy(col("ct").desc, col("item"))
    counted.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
      .select("stt", "item", "ct", "rnk")
  }

  test("bounded heap matches the row_number window spec on ties (long keys)") {
    val got = EventOps.topNPerWindow(events, "1 hour", col("user_id"), 3)
      .select("stt", "item", "ct", "rnk").orderBy("stt", "rnk")
    val want = windowReference(events.withColumnRenamed("user_id", "k"), 3)
      .orderBy("stt", "rnk")
    assert(got.collect().toSeq == want.collect().toSeq)
    // the tie at ct=2 resolves by item asc: 3, 7, 9 — and 5 (ct=1) is out
    val r10 = got.where(col("stt") === "2024-01-01 10:00:00")
      .orderBy("rnk").select("item").as[Long].collect().toSeq
    assert(r10 == Seq(3L, 7L, 9L))
  }

  test("string keys rank lexicographically and round-trip their type") {
    val sev = events.withColumn("user_id",
      concat(lit("u"), col("user_id").cast("string")))
    val got = EventOps.topNPerWindow(sev, "1 hour", col("user_id"), 3)
      .select("stt", "item", "ct", "rnk").orderBy("stt", "rnk")
    val want = windowReference(sev.withColumnRenamed("user_id", "k"), 3)
      .orderBy("stt", "rnk")
    assert(got.schema("item").dataType.typeName == "string")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("funnel: order is mandatory, strictly-after, horizon cuts, steps monotone") {
    def e(id: Long, u: Long, tp: String, t: String) =
      (id, ts(t), u, tp, 0.0, "{}")
    val events = Seq(
      // u1 converts fully: view 10:00 -> click 10:05 -> purchase 10:06
      e(1, 1, "view", "10:00"), e(2, 1, "click", "10:05"), e(3, 1, "purchase", "10:06"),
      // u2 clicks BEFORE viewing -> stops at view
      e(4, 2, "click", "10:00"), e(5, 2, "view", "10:05"),
      // u3: click exactly AT the view instant -> strictly-after fails
      e(6, 3, "view", "10:10"), e(7, 3, "click", "10:10"),
      // u4: click beyond the horizon -> stops at view
      e(8, 4, "view", "10:00"), e(9, 4, "click", "11:30"),
      // u5 never views -> counted nowhere
      e(10, 5, "click", "10:00"), e(11, 5, "purchase", "10:01")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnel(events, Seq("view", "click", "purchase"),
        horizonSec = Some(3600L))
      .orderBy("step_idx").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "view", 4L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("sessionize: gap splits, boundary gap keeps, single shuffle") {
    def e(id: Long, u: Long, t: String, v: Double) = (id, ts(t), u, v)
    val events = Seq(
      // u1: 10:00, 10:05 one session; 18:00 is 7h55m after -> new session
      e(1, 1, "10:00", 1.0), e(2, 1, "10:05", 2.0), e(3, 1, "18:00", 4.0),
      // u2: second event EXACTLY at prev + 360 min -> same session (> is strict)
      e(4, 2, "10:00", 8.0), e(5, 2, "16:00", 16.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = EventOps.sessionize(events, gapMinutes = 360)
    val got = out.orderBy("user_id", "session_no")
      .as[(Long, Long, String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2L, 3.0),
      (1L, 2L, "2024-01-01 18:00:00", "2024-01-01 18:00:00", 1L, 4.0),
      (2L, 1L, "2024-01-01 10:00:00", "2024-01-01 16:00:00", 2L, 24.0)))
    // ONE exchange: the (user, session_no) groupBy must reuse the
    // window's HashPartitioning(user_id) — a second Exchange here is
    // the scale regression this operator's doc promises away
    val phys = out.queryExecution.executedPlan.toString
    val nExchanges = "(?i)\\bExchange hashpartitioning".r
      .findAllMatchIn(phys).size
    assert(nExchanges == 1, s"expected 1 shuffle, got $nExchanges:\n$phys")
  }

  test("sessionize: same-timestamp ties break on tieCols deterministically") {
    val events = Seq(
      (2L, ts("10:00"), 1L, 1.0), (1L, ts("10:00"), 1L, 2.0),
      (3L, ts("17:00"), 1L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = EventOps.sessionize(events, gapMinutes = 360)
      .orderBy("session_no")
      .as[(Long, Long, String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 2L, 3.0),
      (1L, 2L, "2024-01-01 17:00:00", "2024-01-01 17:00:00", 1L, 4.0)))
  }

  test("cohortRetention: first-day cohorts, distinct actives per cell") {
    def d(id: Long, u: Long, day: Int, hhmm: String) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d $hhmm:00"), u)
    val events = Seq(
      d(1, 1, 1, "09:00"), d(2, 1, 1, "18:00"), // u1 day1 twice -> one active
      d(3, 1, 3, "10:00"),                      // u1 back at offset 2
      d(4, 2, 2, "10:00"),                      // u2 cohort day2
      d(5, 3, 1, "10:00"), d(6, 3, 3, "10:00")  // u3 same cells as u1
    ).toDF("event_id", "ts", "user_id")
    val out = EventOps.cohortRetention(events)
    val got = out.orderBy("cohort_day", "day_offset")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 2L), ("2024-01-02", 0L, 1L)))
    // THREE real shuffles: the map-side-combined (key, day) distinct, the
    // post-dedup repartition(key) that carries the cohort aggregate AND
    // (via AQE exchange reuse — the cohorts side must come back as a
    // ReusedExchange of the same stage) the merge join, and the final
    // (cohort_day, offset) groupBy. Only the first is raw-event-sized.
    // Execute `out` itself first — reuse only materializes in the AQE
    // final plan, and count that section only (toString also prints the
    // initial plan).
    out.collect()
    val phys = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val nExchanges = phys.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(nExchanges == 3, s"expected 3 shuffles, got $nExchanges:\n$phys")
    assert(phys.contains("ReusedExchange"),
      s"cohorts side must reuse the post-dedup repartition:\n$phys")
  }

  test("int keys round-trip as int, windows smaller than n emit all keys") {
    val iev = events.withColumn("user_id", col("user_id").cast("int"))
    val got = EventOps.topNPerWindow(iev, "1 hour", col("user_id"), 3)
    assert(got.schema("item").dataType.typeName == "integer")
    val r11 = got.where(col("stt") === "2024-01-01 11:00:00").collect()
    assert(r11.length == 1 && r11(0).getAs[Int]("item") == 1)
  }
}
