package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Loader contract probe against the LIVE driver-generated testdata.
  *
  * Round-8 lesson: the driver regenerated `/root/testdata` mid-round and
  * `events.parquet`'s `ts` encoding changed (INT64 TIMESTAMP(NANOS) →
  * plain timestamp[us]); a loader hard-wired to the old encoding failed
  * 43 gates + the whole bench at once. This spec makes the NEXT
  * regeneration fail one focused test instead: it reads every table in
  * every present sf dir through the real `Tables` loaders and asserts
  * the decoded shapes downstream operators depend on — plus it pins the
  * legacy nanos-as-long branch with a synthesized file so both known
  * `ts` generations stay loadable regardless of which one the live data
  * uses.
  */
class TablesSpec extends SparkTestBase {
  private val testdataRoot = "/root/testdata"

  private def sfDirs: Seq[String] = {
    val root = Paths.get(testdataRoot)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_)).map(_.toString).toList.sorted
      } finally s.close()
    }
  }

  test("every table in every sf dir loads through its Tables loader with rows > 0") {
    val dirs = sfDirs
    assert(dirs.nonEmpty, s"no testdata dirs under $testdataRoot")
    for (dir <- dirs; name <- Tables.names) {
      val df = name match {
        case "events"     => Tables.events(spark, dir)
        case "documents"  => Tables.documents(spark, dir)
        case "embeddings" => Tables.embeddings(spark, dir)
        case other        => Tables.load(spark, dir, other)
      }
      // limit(1): a schema-or-decode break surfaces without scanning sf0.1
      assert(df.limit(1).count() == 1L, s"$dir/$name loaded no rows")
    }
  }

  test("events.ts decodes to a session-TZ timestamp whatever the file encoding") {
    for (dir <- sfDirs) {
      val events = Tables.events(spark, dir)
      assert(events.schema("ts").dataType == TimestampType,
        s"$dir events.ts decoded as ${events.schema("ts").dataType}, downstream ops expect TimestampType")
      // the value must be usable as event time (windows, watermarks, date_format)
      val probe = events.select(date_format(col("ts"), "yyyy-MM-dd").as("dt")).limit(1).collect()
      assert(probe.head.getString(0) != null)
    }
  }

  test("embeddings.embedding decodes to array<float> (ANN/dedup contract)") {
    for (dir <- sfDirs) {
      val emb = Tables.embeddings(spark, dir)
      assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
             emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
        s"$dir embeddings.embedding decoded as ${emb.schema("embedding").dataType}")
    }
  }

  test("legacy INT64-nanos events files still load through the LongType branch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-legacy-events").toString
    // 2024-01-02T03:04:05.678901Z expressed as epoch NANOS stored in a
    // plain int64 column — the shape the nanosAsLong conf yields for the
    // old TIMESTAMP(NANOS) files.
    val micros = 1704164645678901L
    Seq((1L, micros * 1000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros, s"nanos→micros conversion off: $got != $micros")
  }
}
