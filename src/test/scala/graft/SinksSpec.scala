package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Sinks

/** Sink contracts (SURVEY.md §2.2): keyed upsert compaction (K4) and
  * declaration-order batch sink (K5). */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("upsertByKey keeps last row per key within a batch and merges across batches (K4)") {
    val dir = Files.createTempDirectory("graft_upsert_").toString + "/store"
    val b1 = Seq(("k1", 1L, "v1a"), ("k1", 2L, "v1b"), ("k2", 1L, "v2a"))
      .toDF("id", "ts", "payload")
    Sinks.upsertByKey(b1, Seq("id"), "ts", dir)
    val s1 = spark.read.parquet(dir).select("id", "payload").as[(String, String)].collect().toMap
    assert(s1 === Map("k1" -> "v1b", "k2" -> "v2a")) // last-by-ts wins in batch

    val b2 = Seq(("k2", 5L, "v2new"), ("k3", 1L, "v3")).toDF("id", "ts", "payload")
    Sinks.upsertByKey(b2, Seq("id"), "ts", dir)
    val s2 = spark.read.parquet(dir).select("id", "payload").as[(String, String)].collect().toMap
    assert(s2 === Map("k1" -> "v1b", "k2" -> "v2new", "k3" -> "v3")) // upsert semantics
  }

  test("orderedBatchSink writes declared field order minus transient columns (K5)") {
    val dir = Files.createTempDirectory("graft_ordered_").toString + "/out"
    val ds = Seq(SinksSpec.Bean("s", "e", "w", 1L, "x")).toDS()
    Sinks.orderedBatchSink(ds, Seq("debugOnly"), dir)
    val written = spark.read.parquet(dir)
    assert(written.schema.fieldNames.toSeq === Seq("stt", "edt", "word", "ct"))
  }
}

object SinksSpec {
  case class Bean(stt: String, edt: String, word: String, ct: Long, debugOnly: String)
}
