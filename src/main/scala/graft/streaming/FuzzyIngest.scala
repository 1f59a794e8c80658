package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Paragraph-grain FUZZY dedup ON INGEST — the streaming twin of
  * [[graft.operators.Dedup.paragraphDedupFuzzy]], the same step up from
  * exact ingest dedup (q103/q108's `firstPerKey`) that q109 is from
  * q101: near-identical paragraph variants arriving in LATER
  * micro-batches must collapse into groups whose earliest instance may
  * be batches old.
  *
  * The state is relational, not per-key — a group's membership changes
  * as texts arrive — so it rides a per-epoch STORE (the
  * [[DimSink]]/[[DeltaStore]] deployment shape) instead of a keyed state
  * processor:
  *
  *  - `texts/epoch=N`: (pid, para, canon) — every DISTINCT paragraph
  *    text seen through batch N, keyed by its earliest instance's
  *    encoded (doc, pos) `pid`, labeled with its fuzzy group's canonical
  *    keeper key;
  *  - `bands/epoch=N`: (band, bandkey, pid) — the LSH index of those
  *    texts, what makes each batch's candidate discovery an equi-join
  *    against state instead of a re-scan of history.
  *
  * Per batch: collapse exact copies in-batch (min enc per text), drop
  * texts already in state, signature+band only the NEW texts, find
  * candidates new-vs-new (band self-join) and new-vs-state (band join
  * against the index), verify exact Jaccard, then resolve groups by
  * running star components over the merge edges with state-side nodes
  * mapped to their CANON — a new text bridging two existing groups
  * relabels both (the incremental union step), so after any feed order
  * the partition equals the batch operator's connected components over
  * the identical pair graph. Candidate discovery is complete by
  * induction: a colliding pair is checked the batch its YOUNGER member
  * arrives.
  *
  * Exactly-once: batch N reads snapshot N−1 and (over)writes snapshot N
  * — a checkpointed foreachBatch replay recomputes N from N−1
  * verbatim. Scale: per-batch work is new-text grain (signatures narrow,
  * candidates equi-joins, components O(log n) on the touched groups);
  * the full-snapshot store rewrite is the gate-scale simplification —
  * production swaps in [[Sinks.upsertByKeyPartitioned]] (touched-bucket
  * rewrites) or [[DeltaStore]] relabel deltas, same contract.
  */
object FuzzyIngest {

  private def epochDir(root: String, kind: String, epoch: Long) =
    s"$root/$kind/epoch=$epoch"

  private def readIf(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  /** Fold one micro-batch of (enc, para) paragraph instances into the
    * store under `root`, reading snapshot `epochId−1` and writing
    * snapshot `epochId`. */
  def processBatch(
      batch: DataFrame,
      root: String,
      epochId: Long,
      threshold: Double = 0.4,
      shingleN: Int = 3,
      numPerms: Int = 32,
      bands: Int = 8): Unit = {
    val spark = batch.sparkSession
    val prevTexts = readIf(spark, epochDir(root, "texts", epochId - 1))
    val prevBands = readIf(spark, epochDir(root, "bands", epochId - 1))
    // in-batch exact collapse; feed batches enc-ascending so a text's
    // first batch holds its global min instance
    val batchFirst = batch.groupBy(col("para")).agg(min(col("enc")).as("pid"))
    val newTexts = (prevTexts match {
      case Some(t) => batchFirst.join(t.select(col("para")), Seq("para"), "left_anti")
      case None    => batchFirst
    }).localCheckpoint(true) // consumed by sigs, verify, union below
    val newBands = Dedup.bandedSigs(
        Dedup.minhashSignatures(newTexts, "pid", "para", shingleN, numPerms),
        "pid", bands)
      .select(col("band"), col("bandkey"), col("pid"))
      .localCheckpoint(true)
    // candidates: new-vs-new + new-vs-state — both (band, bandkey)
    // equi-joins, never text×text
    val nn = newBands.select(col("pid").as("a"), col("band"), col("bandkey"))
      .join(newBands.select(col("pid").as("b"), col("band"), col("bandkey")),
        Seq("band", "bandkey"))
      .where(col("a") < col("b"))
    val ns = prevBands match {
      case Some(sb) => newBands.select(col("pid").as("a"), col("band"), col("bandkey"))
        .join(sb.select(col("pid").as("b"), col("band"), col("bandkey")),
          Seq("band", "bandkey"))
      case None => nn.limit(0)
    }
    val cand = nn.select(col("a"), col("b"))
      .unionByName(ns.select(col("a"), col("b"))).distinct()
    val allTexts = prevTexts match {
      case Some(t) => newTexts.select(col("pid"), col("para"))
        .unionByName(t.select(col("pid"), col("para")))
      case None => newTexts.select(col("pid"), col("para"))
    }
    val pairs = Dedup.jaccardVerify(allTexts, cand, "pid", "para",
      shingleN, threshold)
    // merge resolution: map state-side endpoints to their group CANON so
    // components union whole groups, then min-label via star rounds
    val canonOf = prevTexts match {
      case Some(t) => t.select(col("pid").as("sp"), col("canon").as("sc"))
      case None    => spark.range(0).select(col("id").as("sp"), col("id").as("sc"))
    }
    val edges = pairs
      .join(canonOf.withColumnRenamed("sp", "a").withColumnRenamed("sc", "ca"),
        Seq("a"), "left")
      .join(canonOf.withColumnRenamed("sp", "b").withColumnRenamed("sc", "cb"),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
    val comps =
      if (edges.isEmpty) canonOf.select(col("sp").as("id"), col("sc").as("comp")).limit(0)
      else Dedup.connectedComponentsStar(edges)
    val relabel = comps.select(col("id").as("canon"), col("comp"))
    val newLabeled = newTexts
      .join(comps.withColumnRenamed("id", "pid"), Seq("pid"), "left")
      .select(col("pid"), col("para"), coalesce(col("comp"), col("pid")).as("canon"))
    val outTexts = (prevTexts match {
      case Some(t) => t.join(relabel, Seq("canon"), "left")
        .select(col("pid"), col("para"),
          coalesce(col("comp"), col("canon")).as("canon"))
        .unionByName(newLabeled)
      case None => newLabeled
    })
    outTexts.write.mode("overwrite").parquet(epochDir(root, "texts", epochId))
    (prevBands match {
      case Some(sb) => sb.unionByName(newBands)
      case None     => newBands
    }).write.mode("overwrite").parquet(epochDir(root, "bands", epochId))
  }

  /** The latest snapshot's surviving keeper keys, decoded to (doc_id,
    * pos) — one per fuzzy group, the earliest instance of the group's
    * earliest text: exactly the batch operator's keeper set. */
  def survivors(spark: SparkSession, root: String): DataFrame = {
    val base = new Path(s"$root/texts")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toLong).max
    spark.read.parquet(epochDir(root, "texts", last))
      .select(col("canon")).distinct()
      .select(expr(s"canon div ${Dedup.ParaPosEncode}").as("doc_id"),
        pmod(col("canon"), lit(Dedup.ParaPosEncode)).as("pos"))
  }
}
