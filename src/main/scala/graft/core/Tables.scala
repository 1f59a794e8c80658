package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same code runs at sf0.001 → sf0.1 →
  * (conceptually) 100 TB; nothing below hard-codes a path.
  *
  * Scale note: `spark.read.parquet` gives splittable columnar scans with
  * column pruning + predicate pushdown for free — every downstream
  * operator keeps its filters/projections declarative so they reach the
  * scan (verified via `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** events.parquet's `ts` encoding has varied across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark 4 refuses to read
    * natively — [PARQUET_TYPE_ILLEGAL]) and plain timestamp[us]. Branch on
    * the decoded dtype so both generations load:
    *  - LongType (nanos read via the legacy conf) → div 1000 to µs —
    *    lossless: the generated data is µs-precision (epoch_ns % 1000 == 0).
    *  - TimestampNTZType → cast to session-TZ timestamp; the session is
    *    pinned UTC so the cast is an identity relabel, matching DuckDB.
    *  - TimestampType → already what every downstream op expects.
    * The nanosAsLong conf is a no-op for non-nanos columns, so setting it
    * up front is safe for the modern encoding. */
  private def loadNanoTs(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events + documents feed ~40 gates each (every dedup/text/window
    * query) — cached per session like TopicDb's parse, so a bench run
    * scans and decodes each ONCE (warmed + disclosed in Bench's
    * warmup_sec) instead of per query. The other tables are joined
    * at-most-once per gate and stay plain scans (pushdown-friendly). */
  def events(s: SparkSession, d: String): DataFrame =
    SessionCache(s, "events|" + d)(loadNanoTs(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame =
    SessionCache(s, "documents|" + d)(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
