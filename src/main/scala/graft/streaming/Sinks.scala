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
    // existence check and swap go through the SAME Hadoop FileSystem the
    // writes use — a java.nio check is wrong on any non-local URI
    // (hdfs://, s3a://) and would silently overwrite the first batch
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst)) {
      compacted.write.mode("overwrite").parquet(path)
      return
    }
    val existing = spark.read.parquet(path)
    val merged = existing
      .join(compacted.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(compacted)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap via rename-aside, not delete-then-rename: a crash mid-swap
    // leaves the full store at `_old` (recoverable) instead of nothing
    // (single-writer micro-batch contract)
    fs.delete(old, true)
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"upsertByKey: cannot set aside $dst")
    if (!fs.rename(tmp, dst)) {
      fs.rename(old, dst) // restore
      throw new java.io.IOException(s"upsertByKey: cannot publish $tmp")
    }
    fs.delete(old, true)
  }

  /** [[upsertByKey]] for stores too big to rewrite per batch: the store is
    * hash-partitioned into `_bucket = pmod(hash(keys), nBuckets)` dirs and a
    * micro-batch rewrites ONLY the buckets its keys touch — per-batch I/O is
    * O(store/nBuckets · touched) instead of O(store), the partitioned-store
    * step the round-1 review asked for on the way to a real Delta MERGE.
    * Each touched bucket swaps via the same rename-aside protocol (crash
    * leaves that bucket's full old content at `_old`, recoverable).
    */
  def upsertByKeyPartitioned(batch: DataFrame, keyCols: Seq[String],
      orderCol: String, path: String, nBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc)
    val compacted = batch
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      .withColumn("_bucket", pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst)) {
      compacted.write.partitionBy("_bucket").mode("overwrite").parquet(path)
      return
    }
    val touched = compacted.select(col("_bucket")).distinct()
      .collect().map(_.getInt(0)).sorted // ≤ nBuckets values, driver-safe
    val existing = spark.read.parquet(path)
      .where(col("_bucket").isin(touched.map(Int.box): _*))
    val merged = existing
      .join(compacted.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(compacted)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    merged.write.partitionBy("_bucket").mode("overwrite").parquet(tmp.toString)
    // set-asides live OUTSIDE the store root: a crash must never leave a
    // non-`_bucket=N` dir inside `path` where partition discovery would
    // choke on it
    val oldRoot = new org.apache.hadoop.fs.Path(path + "_old")
    fs.mkdirs(oldRoot)
    touched.foreach { b =>
      val bNew = new org.apache.hadoop.fs.Path(s"$tmp/_bucket=$b")
      val bDst = new org.apache.hadoop.fs.Path(s"$path/_bucket=$b")
      val bOld = new org.apache.hadoop.fs.Path(s"$oldRoot/_bucket=$b")
      fs.delete(bOld, true)
      if (fs.exists(bDst) && !fs.rename(bDst, bOld))
        throw new java.io.IOException(s"upsertByKeyPartitioned: cannot set aside $bDst")
      if (!fs.rename(bNew, bDst)) {
        fs.rename(bOld, bDst) // restore
        throw new java.io.IOException(s"upsertByKeyPartitioned: cannot publish $bNew")
      }
      fs.delete(bOld, true)
    }
    fs.delete(tmp, true)
    fs.delete(oldRoot, true)
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
