package graft

import java.nio.file.Files
import graft.core.Envelopes
import graft.streaming.Sources

/** The file-drop source binding ([[Sources.fileValues]]) — the executed
  * source path of SURVEY §2.1: chunks dropped into a watched dir stream
  * through the same envelope parsers the Kafka binding feeds. */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("fileValues streams dropped chunks through the envelope parser") {
    val root = Files.createTempDirectory("graft_filesrc_").toString
    val in = s"$root/in"
    // two chunk drops (second lands before the query starts — arrival
    // batching is the harness's concern; here the BINDING is under test)
    Seq("""{"database":"d","table":"t1","type":"insert","ts":1,"data":{"id":"1"}}""")
      .toDF("value").coalesce(1).write.mode("append").parquet(in)
    Seq("""{"database":"d","table":"t2","type":"insert","ts":2,"data":{"id":"2"}}""",
        "{not json")
      .toDF("value").coalesce(1).write.mode("append").parquet(in)
    val (clean, dirty) = Envelopes.cleanDirty(
      Envelopes.parseMaxwell(Sources.fileValues(spark, in, maxFilesPerTrigger = 1)))
    val q = clean.select($"table")
      .writeStream.format("memory").queryName("graft_src_spec")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("graft_src_spec").as[String].collect().toSet === Set("t1", "t2"))
    assert(dirty.isStreaming, "dirty branch must stay a streaming side output")
  }
}
