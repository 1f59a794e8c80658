package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink layer (SURVEY.md §2.2): the reference's Kafka/upsert-Kafka/JDBC/
  * Phoenix sinks re-expressed as `foreachBatch` writers. File-backed (the
  * test/bench environment has no Kafka/ClickHouse); the contracts —
  * keyed upsert, field-order batching, multi-sink fan-out — are the real
  * thing.
  */
object Sinks {

  /** K4 — keyed upsert sink (upsert-Kafka contract, utils/MyKafkaUtil.java:
    * 91-100): per micro-batch, keep only the LAST row per key (Maxwell `ts`
    * order), then merge into the keyed store at `path`: existing keys are
    * replaced, new keys appended. Consumers reading `path` see exactly the
    * compacted changelog a Kafka log-compacted topic would give them.
    *
    * Scale: the per-batch compaction is a window over the key — one shuffle
    * of batch-sized data; the merge rewrites only the store, which at real
    * scale becomes a Delta MERGE on the same keys (same plan shape).
    */
  def upsertByKey(batch: DataFrame, keyCols: Seq[String], orderCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc)
    val compacted = batch
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    val merged =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) compacted
      else {
        val existing = spark.read.parquet(path)
        existing.join(compacted.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(compacted)
      }
    val tmp = path + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (single-writer micro-batch contract)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** K5 — batch sink honoring declared field order (the reference maps bean
    * fields to JDBC `?`s by declaration order, utils/MyClickHouseUtil.java:
    * 97-118, skipping @TransientSink fields). Encoder schema order is the
    * Scala analogue; `transientCols` = the annotation. */
  def orderedBatchSink[T](ds: Dataset[T], transientCols: Seq[String],
      path: String): Unit = {
    val cols = ds.schema.fieldNames.filterNot(transientCols.contains)
    ds.toDF().select(cols.map(col): _*)
      .write.mode("append").parquet(path)
  }

  /** P7 multi-sink fan-out: run one streaming query whose every micro-batch
    * is persisted once and written to N sinks — the Spark replacement for
    * Flink side outputs (SURVEY §7.3 #4: N independent queries would
    * re-execute the source N times). */
  def fanOut(df: DataFrame, checkpoint: String)(
      sinks: (String, DataFrame => DataFrame, String)*): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try sinks.foreach { case (_, transform, path) =>
          transform(batch).write.mode("append").parquet(path)
        } finally batch.unpersist()
        ()
      }
      .start()

  /** K1/K3 — append stream to a path (the at-least-once Kafka producer
    * analogue; exactly-once comes from checkpoint + idempotent re-write of
    * the same epoch files). */
  def appendSink(df: DataFrame, checkpoint: String, path: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("checkpointLocation", checkpoint)
      .option("path", path)
      .trigger(Trigger.AvailableNow())
      .start()
}
