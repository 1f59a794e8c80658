package graft.core

import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zone-EXPLICIT date/partition helpers. The reference hard-codes UTC+8 in
  * a JVM-default-zone SimpleDateFormat (utils/DateFormatUtil.java:21 — a
  * documented bug magnet: results change with the cluster's default zone);
  * here every conversion takes the zone as a parameter and the session
  * zone is pinned UTC in Verify/Bench, so day boundaries are reproducible
  * on any cluster. Pass `BeijingZone` to reproduce the reference's UTC+8
  * day-bucketing bit-for-bit.
  */
object DateUtil {

  /** The reference's implicit zone (gmall runs in UTC+8). */
  val BeijingZone: ZoneId = ZoneId.of("Asia/Shanghai")

  private val dayFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val dtFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  // ------------------------------------------------------------ driver-side
  /** epoch millis → 'yyyy-MM-dd' in an explicit zone (DateFormatUtil.toDate). */
  def toDate(epochMillis: Long, zone: ZoneId): String =
    dayFmt.format(Instant.ofEpochMilli(epochMillis).atZone(zone))

  /** epoch millis → 'yyyy-MM-dd HH:mm:ss' in an explicit zone
    * (DateFormatUtil.toYmdHms). */
  def toYmdHms(epochMillis: Long, zone: ZoneId): String =
    dtFmt.format(Instant.ofEpochMilli(epochMillis).atZone(zone))

  /** 'yyyy-MM-dd HH:mm:ss' in an explicit zone → epoch millis
    * (DateFormatUtil.toTs). */
  def toTs(s: String, zone: ZoneId): Long =
    java.time.LocalDateTime.parse(s, dtFmt).atZone(zone).toInstant.toEpochMilli

  // ---------------------------------------------------------- column-level
  /** Day string of a timestamp column in an explicit zone — the
    * partition-day / date_id column for every DWD output. Requires the
    * session timezone pinned to UTC (this library's entry points all pin
    * it); the zone PARAMETER then controls day bucketing, not whatever
    * the cluster JVM happens to default to. */
  def dayStr(ts: Column, zone: ZoneId): Column =
    date_format(from_utc_timestamp(ts, zone.getId), "yyyy-MM-dd")

  /** Same for epoch-millis columns (the behavior-log `ts` field). */
  def dayStrMillis(tsMillis: Column, zone: ZoneId): Column =
    dayStr(timestamp_millis(tsMillis), zone)
}
