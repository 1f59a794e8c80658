package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Drives a genuinely-streaming (micro-batch) query over in-memory batches
  * and hands back the collected sink as a DataFrame. This is how the
  * correctness gate exercises the *incremental* code paths
  * ([[StatefulOps]]) against the same DuckDB oracles as the batch forms:
  * state must carry correctly across micro-batch boundaries and event-time
  * timeouts must fire off the advancing watermark — exactly the semantics
  * the reference's Flink jobs rely on.
  *
  * Scale note: this harness collects input to the driver, which is fine for
  * the gate (≤100k rows) and for tests; production streams read Kafka via
  * `readStream` with the identical transform functions.
  */
object StreamHarness {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Feed `batches` one micro-batch at a time through `build`, wait for
    * every batch (and any watermark-triggered no-data batch) to complete,
    * return the memory sink's contents.
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
  def run[T](spark: SparkSession, batches: Seq[Seq[T]])(
      build: Dataset[T] => DataFrame)(implicit enc: Encoder[T]): DataFrame = {
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
    // store that holds state > heap at production scale anyway
    if (session.conf.getOption("spark.sql.streaming.stateStore.providerClass").isEmpty)
      session.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
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
      query.stop()
      // the memory sink holds the results; the per-run checkpoint dir has
      // no post-stop reader — delete it so gate/test runs don't accumulate
      // temp dirs for the JVM's lifetime
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
      ()
    }
    session.table(name)
  }
}
