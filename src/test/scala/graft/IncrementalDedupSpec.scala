package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Bloom-prefiltered cross-batch dedup: exactness must be independent of
  * the bloom filter's false-positive rate. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def fp(t: String): String =
    Seq(t).toDF("text").select(TextFunctions.fingerprint($"text")).as[String].head()

  test("emits only first-per-fingerprint rows not already in the store") {
    val store = Seq("seen one", "seen two").toDF("text")
      .select(TextFunctions.fingerprint($"text").as("fp"))
    val batch = Seq(
      (10L, "seen one"),       // dup of store -> dropped
      (11L, "fresh alpha"),    // new
      (12L, "fresh alpha"),    // in-batch dup -> min id wins
      (13L, "fresh beta")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, store)
      .select($"doc_id", $"fp").orderBy($"doc_id")
      .as[(Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(11L, 13L))
    assert(out(0)._2 === fp("fresh alpha"))
  }

  test("null text forms its own dedup class instead of crashing the bloom screen") {
    val store = Seq("seen").toDF("text")
      .select(TextFunctions.fingerprint($"text").as("fp"))
    val batch = Seq((1L, null), (2L, "fresh"), (3L, null))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, store)
      .select($"doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L)) // null class keeps min id, like exact()
  }

  test("a saturated (all-positive) bloom filter still yields exact output") {
    // expectedItems=1 with a larger store saturates the filter: every row
    // screens positive and must be rescued by the exact anti-join
    val store = (1 to 200).map(i => s"stored text $i").toDF("text")
      .select(TextFunctions.fingerprint($"text").as("fp"))
    val batch = Seq((1L, "stored text 7"), (2L, "brand new")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, store, expectedItems = 1L)
      .select($"doc_id").as[Long].collect()
    assert(out.toSeq === Seq(2L))
  }
}
