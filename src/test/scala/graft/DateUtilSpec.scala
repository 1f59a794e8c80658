package graft

import java.time.ZoneId
import org.apache.spark.sql.functions._
import graft.core.DateUtil

/** Zone-explicit date bucketing (SURVEY §7.3 #7: the reference's
  * DateFormatUtil depends on the JVM default zone; ours takes the zone). */
class DateUtilSpec extends SparkTestBase {
  import spark.implicits._

  private val utc = ZoneId.of("UTC")

  test("driver-side conversions are explicit-zone and round-trip") {
    // 2023-04-01 23:30 UTC = 2023-04-02 07:30 Beijing: day differs by zone
    val ts = DateUtil.toTs("2023-04-01 23:30:00", utc)
    assert(DateUtil.toDate(ts, utc) === "2023-04-01")
    assert(DateUtil.toDate(ts, DateUtil.BeijingZone) === "2023-04-02")
    assert(DateUtil.toYmdHms(ts, DateUtil.BeijingZone) === "2023-04-02 07:30:00")
    assert(DateUtil.toTs(DateUtil.toYmdHms(ts, DateUtil.BeijingZone),
      DateUtil.BeijingZone) === ts)
  }

  test("column-level dayStr buckets by the explicit zone, not the session") {
    val ts = DateUtil.toTs("2023-04-01 23:30:00", utc)
    val row = Seq(ts).toDF("ms")
      .select(
        DateUtil.dayStrMillis(col("ms"), utc).as("d_utc"),
        DateUtil.dayStrMillis(col("ms"), DateUtil.BeijingZone).as("d_cn"))
      .as[(String, String)].head()
    assert(row === (("2023-04-01", "2023-04-02")))
  }
}
