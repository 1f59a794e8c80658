package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.hash
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Drives a genuinely-streaming (micro-batch) query over a sequence of
  * batches and hands back the collected sink as a DataFrame. This is how the
  * correctness gate exercises the *incremental* code paths
  * ([[StatefulOps]]) against the same DuckDB oracles as the batch forms:
  * state must carry correctly across micro-batch boundaries and event-time
  * timeouts must fire off the advancing watermark — exactly the semantics
  * the reference's Flink jobs rely on.
  *
  * Two feed paths:
  *  - [[runFiles]] (the gates' path): batches stay DATASETS end to end —
  *    each is written to parquet by an executor-side job and streamed back
  *    through Spark's real file source, one chunk per micro-batch. No rows
  *    ever pass through the driver and task closures stay constant-size at
  *    every SF (the round-5 review measured the collect-fed closures at
  *    9.3 MiB at sf0.1, growing linearly with SF).
  *  - [[run]] (tests / tiny literal feeds): driver-held `Seq` batches via
  *    MemoryStream; fine for spec-sized inputs, not for SF-scaled feeds.
  */
object StreamHarness {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Clone the session for one harness run: caller's runtime conf carried
    * over, shuffle partitions capped, RocksDB state store by default.
    *
    * Shuffle partitions are capped at 8 for the query's lifetime: each
    * stateful operator commits one state-store instance PER shuffle
    * partition PER micro-batch, so a 32-partition session pays 4× the
    * store-commit overhead for gate-sized feeds (≤300k rows) with zero
    * parallelism gain — measured 2-3× wall-clock on the DWS window gates.
    * Results are partition-count independent; production sizing is the
    * deployment's own concern. The default cap of 8 is measured optimal
    * at sf0.1/local[32] (4 and 16 are both slower — commit overhead vs
    * lost parallelism); override with GRAFT_HARNESS_PARTS to re-measure.
    * The cap is set on a CLONED session
    * (`newSession`: same SparkContext + cache, isolated SQLConf), so
    * concurrent harness runs never race on shared session state and the
    * caller's conf is never mutated. */
  private[graft] def prepared(spark: SparkSession): SparkSession = {
    val session = spark.newSession()
    // newSession starts from the BUILDER's options; carry over any conf the
    // caller set at runtime (e.g. the RocksDB state-store provider) so the
    // clone behaves exactly like the caller's session. Static confs are
    // already shared and unsettable — skip them.
    spark.conf.getAll.foreach { case (k, v) =>
      if (!session.conf.getOption(k).contains(v)) {
        try session.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
      }
    }
    val cap = sys.env.get("GRAFT_HARNESS_PARTS").flatMap(_.toIntOption).getOrElse(8)
    val parts = session.conf.get("spark.sql.shuffle.partitions").toIntOption
    session.conf.set("spark.sql.shuffle.partitions",
      math.min(parts.getOrElse(cap), cap).toString)
    // RocksDB unless the caller chose otherwise: measured ~15 % faster on
    // the DWS window gates than the HDFS-backed default, and it is the
    // store that holds state > heap at production scale anyway.
    // GRAFT_STATE_PROVIDER=hdfs|rocksdb re-measures the choice without a
    // rebuild (dev knob — results are provider-independent either way).
    val provider = sys.env.get("GRAFT_STATE_PROVIDER") match {
      case Some("hdfs") => Some(
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      case Some("rocksdb") | None => Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case Some(other) =>
        System.err.println(s"[harness] unknown GRAFT_STATE_PROVIDER '$other' — keeping default")
        None
    }
    if (session.conf.getOption("spark.sql.streaming.stateStore.providerClass").isEmpty)
      provider.foreach(p =>
        session.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    // concurrent streaming queries on a saturated local[N] host can queue
    // a broadcast-exchange job past the 300 s default (observed: the
    // 17-query DAG gate at the ×10 bench leg); the timeout exists to
    // catch hung exchanges, not healthy queueing — give it an hour.
    // Mirrors the providerClass guard above: a caller-set runtime value
    // wins over our default (getAll holds only explicitly-set entries;
    // getOption would see the SQLConf default and always look "set"),
    // and GRAFT_BROADCAST_TIMEOUT wins over both.
    val callerTimeout = spark.conf.getAll.get("spark.sql.broadcastTimeout")
    sys.env.get("GRAFT_BROADCAST_TIMEOUT").orElse(callerTimeout) match {
      case Some(t) => session.conf.set("spark.sql.broadcastTimeout", t)
      case None    => session.conf.set("spark.sql.broadcastTimeout", "3600")
    }
    // measured and rejected: RocksDB changelog checkpointing costs ~15 %
    // on the DWS gates (q63: 5.6 → 6.4 s) — gate state is far too small
    // for snapshot upload to dominate; it is the right switch only when
    // per-batch full snapshots outweigh the changelog replay at recovery
    session
  }

  /** Feed `batches` one micro-batch at a time through `build`, wait for
    * every batch (and any watermark-triggered no-data batch) to complete,
    * return the memory sink's contents. Driver-held feed — see object doc
    * for when to prefer [[runFiles]]. */
  def run[T](spark: SparkSession, batches: Seq[Seq[T]])(
      build: Dataset[T] => DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    val session = prepared(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val stream = MemoryStream[T]
    val name = s"graft_mem_sink_${counter.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val query = build(stream.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try batches.foreach { b =>
      stream.addData(b)
      query.processAllAvailable()
    } finally {
      // stop() can itself throw on an errored query — the checkpoint dir
      // (no post-stop reader; the memory sink holds the results) must be
      // deleted on that path too, or error runs leak temp dirs for the
      // JVM's lifetime
      try query.stop()
      finally {
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
        graft.core.SessionCache.evictOwnedExactly(session)
      }
    }
    session.table(name)
  }

  /** [[run]] with EXECUTOR-fed batches: each batch Dataset is written once
    * to a parquet chunk (a distributed write job — no driver collect, no
    * rows in the task closure), then picked up by a REAL
    * `readStream.parquet` file source. Batch boundaries are exact: chunk i
    * is moved into the watched dir only after batch i−1's
    * `processAllAvailable` returns, so each chunk is one micro-batch in
    * feed order — the file-source analogue of Kafka offsets
    * ([[Sources.kafkaValues]] is the production binding;
    * utils/MyKafkaUtil.java:21-50).
    *
    * Within-batch row order is deterministically HASH-SCRAMBLED at write
    * time (the old driver feeds' explicit scramble, applied uniformly):
    * every [[StatefulOps]] processor re-sorts its group by
    * (event-time µs, id) per batch, and the scramble keeps the gates
    * proving that re-sort exists — callers control only batch
    * COMPOSITION, the thing that exercises cross-batch state.
    */
  def runFiles[T](spark: SparkSession, batches: Seq[Dataset[T]],
      extraConf: Map[String, String] = Map.empty)(
      build: Dataset[T] => DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    val name = s"graft_mem_sink_${counter.incrementAndGet()}"
    val session = feedFiles(spark, batches, extraConf) { (stream, ckpt) =>
      build(stream)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    }
    session.table(name)
  }

  /** The [[runFiles]] feed loop around a CALLER-started sink (e.g. a
    * checkpointed `foreachBatch` dim sink): `start` receives the
    * file-source Dataset and a fresh checkpoint dir and returns the
    * running query; each batch Dataset then lands as exactly one
    * micro-batch, in order, with the engine's own epochIds. */
  def runFilesSink[T](spark: SparkSession, batches: Seq[Dataset[T]])(
      start: (Dataset[T], String) => StreamingQuery)(
      implicit enc: Encoder[T]): Unit = {
    feedFiles(spark, batches)(start)
    ()
  }

  private def feedFiles[T](spark: SparkSession, batches: Seq[Dataset[T]],
      extraConf: Map[String, String] = Map.empty)(
      start: (Dataset[T], String) => StreamingQuery)(
      implicit enc: Encoder[T]): SparkSession = {
    require(batches.nonEmpty, "file feed needs at least one batch")
    val session = prepared(spark)
    // per-gate conf (e.g. q164's changelog checkpointing) lands on the
    // CLONE only: runtime conf is session-global, and setting it on the
    // caller bled the mode into any gate started concurrently in the
    // set/restore window (round-13 advisor)
    extraConf.foreach { case (k, v) => session.conf.set(k, v) }
    val root = Files.createTempDirectory("graft_feed_")
    try {
      val watched = root.resolve("in")
      Files.createDirectories(watched)
      // file sources need an explicit schema; the encoder's schema with
      // relaxed nullability (parquet stores everything nullable — the .as[T]
      // below re-asserts non-null primitives exactly like any table read)
      val schema = StructType(enc.schema.fields.map(_.copy(nullable = true)))
      val query = start(
        session.readStream.schema(schema).parquet(watched.toString).as[T](enc),
        root.resolve("ckpt").toString)
      try batches.zipWithIndex.foreach { case (b, i) =>
        val stage = root.resolve(s"stage_$i")
        // write under the ENCODER's field names (parquet resolves by name):
        // a tuple Dataset built from a select keeps the select's column
        // names, not _1/_2 — the positional rename bridges the two exactly
        // like MemoryStream's implicit tuple encoding did. Rows land in a
        // deterministic HASH-SCRAMBLED order (the old driver feeds'
        // explicit scramble): a chunk written in source order would let a
        // processor that dropped its per-batch (µs, id) re-sort still pass
        // every gate.
        val named = b.toDF(schema.fieldNames.toIndexedSeq: _*)
        named.coalesce(1)
          .sortWithinPartitions(hash(schema.fieldNames.map(named(_)): _*))
          .write.parquet(stage.toString)
        val parts = stage.toFile.listFiles().filter(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        parts.zipWithIndex.foreach { case (p, j) =>
          Files.move(p.toPath, watched.resolve(f"chunk-$i%05d-$j%03d.parquet"))
        }
        query.processAllAvailable()
      } finally query.stop()
    } finally {
      // one cleanup for every exit: feed-loop errors, stop() errors, AND
      // a start() that throws before any query exists
      org.apache.hadoop.fs.FileUtil.fullyDelete(root.toFile)
      // clone-keyed SessionCache entries (built by `start`'s plan under
      // this throwaway session) can never be reused once the query stops —
      // unpersist now; the memory sink the caller reads is materialized
      // rows, independent of the cached source plans
      graft.core.SessionCache.evictOwnedExactly(session)
    }
    session
  }
}
