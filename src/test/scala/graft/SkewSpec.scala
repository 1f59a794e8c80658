package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must be semantically invisible: identical results to the naive
  * form, with the hot key's work split across buckets. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // heavily skewed: key 0 holds 90% of rows
  private val rows = (1 to 2000).map { i =>
    val k = if (i % 10 != 0) 0L else (i % 7).toLong
    (k, (i % 100).toDouble / 4.0)
  }

  test("saltedSumCount equals direct groupBy on skewed data") {
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq(col("k")), col("v").cast("decimal(18,2)"))
      .select(col("k"), col("sum_value").cast("double"), col("cnt"))
      .as[(Long, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double"), count(lit(1)))
      .as[(Long, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    assert(salted === direct)
  }

  test("saltedBroadcastableJoin equals direct join on skewed data") {
    val big = rows.toDF("k", "v")
    val small = Seq((0L, "hot"), (3L, "warm"), (99L, "nomatch")).toDF("k", "name")
    val salted = Skew.saltedBroadcastableJoin(big, small, "k")
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .as[(Long, String, Long, Double)].collect().toSet
    val direct = big.join(small, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(salted === direct)
    assert(salted.exists(_._2 == "hot"))
  }
}
