package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.norm
import graft.operators.{Dedup, Similarity}

/** SemDeDup ON INGEST — the streaming twin of
  * [[graft.operators.Similarity.semDedup]] (Abbas et al. 2023,
  * arXiv:2303.09540), shaped exactly like [[FuzzyIngest]] with k-means
  * CELLS in place of LSH bands: a micro-batch's vectors must collapse
  * into semantic groups whose earlier members arrived batches ago.
  *
  *  - `cents/` (written at epoch 0, unconditionally overwritten on an
  *    epoch-0 replay so a crash mid-write can never leave partial
  *    centroids behind): the coarse cell centroids — seeded from the
  *    FIRST batch's lowest ids, the streaming analogue of training the
  *    quantizer on an initial sample and freezing it. FIRST-SEEN
  *    CONTRACT: cell geometry is fixed by the first batch; feed batches
  *    id-ascending and the seeds equal the batch operator's corpus-wide
  *    lowest-id seeds, so the partitions match (q118 shares q102's
  *    oracle under that feed). Under other orders the cells — and hence
  *    which near-dup pairs are DISCOVERED — follow the first batch's
  *    geometry; within any fixed geometry the keeper of each group is
  *    still min(vec_id), order-independently (see [[survivors]]).
  *  - `texts/` (key `vec_id`, an INCREMENTAL bucketed keyed store via
  *    [[Sinks.upsertByKeyPartitioned]] — only touched hash buckets
  *    rewrite, per-batch I/O is O(batch + relabeled groups), never
  *    O(corpus)): (vec_id, label, cell, canon, embedding, nrm) — every
  *    vector seen so far with its group's canonical min-id member.
  *
  * Per batch: drop already-stored vectors (replay idempotence on the
  * in-place store), assign the rest to their nearest frozen centroid,
  * score candidate pairs new-vs-new and new-vs-state WITHIN cells only
  * (cell equi-joins through [[Similarity.scoredPairs]] — the one
  * scoring contract the oracles pin), then union groups by star
  * components over canon-mapped merge edges, relabeling state when a
  * new vector bridges two groups. Pair discovery is complete by
  * induction (a within-cell pair is scored the batch its younger member
  * arrives), so the final partition equals the batch operator's
  * connected components over the same pair graph. A feed starting
  * mid-chain (missing store at epoch > 0) fails loudly instead of
  * silently restarting dedup state from empty.
  */
object SemIngest {

  private def existsDir(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readStore(spark: SparkSession, dir: String): Option[DataFrame] =
    if (existsDir(spark, dir)) Some(spark.read.parquet(dir).drop("_bucket", "_ver"))
    else None

  /** Fold one micro-batch of (vec_id, embedding, label) rows into the
    * store under `root`. */
  def processBatch(
      batch: DataFrame,
      root: String,
      epochId: Long,
      nCells: Int = 16,
      threshold: Double = 0.35,
      nBuckets: Int = 64,
      targetBucketBytes: Long = 256L << 20): Unit = {
    val spark = batch.sparkSession
    val centsDir = s"$root/cents"
    val textsDir = s"$root/texts"
    val state = readStore(spark, textsDir)
    require(epochId == 0L || state.isDefined,
      s"SemIngest: texts store missing at $textsDir for epoch $epochId — " +
        "broken snapshot chain (lost store or non-contiguous feed); refusing " +
        "to silently restart dedup state from empty")
    if (epochId == 0L)
      // unconditional overwrite: deterministic from the (replayed) first
      // batch, so a crash mid-write can never leave partial centroids
      // that a replay would silently trust
      Similarity.kmeansCentroids(batch, nCells, 0)
        .write.mode("overwrite").parquet(centsDir)
    else require(existsDir(spark, centsDir),
      s"SemIngest: centroids missing at $centsDir for epoch $epochId")
    val cents = spark.read.parquet(centsDir)
    val stateTexts = state.getOrElse(
      spark.range(0).select(col("id").as("vec_id"), lit(0).as("label"),
        col("id").as("cell"), col("id").as("canon"),
        lit(null).cast("array<float>").as("embedding"),
        lit(0.0).as("nrm")))
    // replay idempotence: vectors already in the in-place store are not
    // re-admitted (their pairs were scored the batch they arrived)
    val fresh = batch.join(stateTexts.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val newRows = fresh
      .join(Similarity.assignCells(fresh, cents), "vec_id")
      .select(col("vec_id"), col("label"), col("cell"),
        col("embedding"), norm(col("embedding")).as("nrm"))
      .localCheckpoint(true) // consumed by both pair sides and the union
    // candidate pairs touch a NEW vector and ride the cell equi-join —
    // symmetric so a state id below a new id still pairs; state-state
    // pairs were scored the batch their younger member arrived
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("vec_id").as(tag), col("embedding").as(s"v$tag"),
        col("nrm").as(s"n$tag"), col("cell"))
    val pairCols = Seq(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val all = newRows.select(pairCols: _*)
      .unionByName(stateTexts.select(pairCols: _*))
    val joined = side(all, "a").join(side(newRows, "b"), Seq("cell"))
      .unionByName(side(newRows, "a").join(side(all, "b"), Seq("cell")))
    val pairs = Similarity.scoredPairs(joined, threshold)
      .select(col("a"), col("b")).distinct()
    val canonOf = stateTexts.select(col("vec_id").as("sp"), col("canon").as("sc"))
    val edges = pairs
      .join(canonOf.withColumnRenamed("sp", "a").withColumnRenamed("sc", "ca"),
        Seq("a"), "left")
      .join(canonOf.withColumnRenamed("sp", "b").withColumnRenamed("sc", "cb"),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
    val comps =
      if (edges.isEmpty)
        spark.range(0).select(col("id"), col("id").as("comp"))
      else Dedup.connectedComponentsStar(edges)
    val newLabeled = newRows
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("cell"),
        coalesce(col("comp"), col("vec_id")).as("canon"),
        col("embedding"), col("nrm"))
    // touched state rows ONLY: groups whose canon actually changed
    val relabel = comps.where(col("comp") =!= col("id"))
      .select(col("id").as("canon"), col("comp"))
    val touched = stateTexts.join(relabel, Seq("canon"))
      .select(col("vec_id"), col("label"), col("cell"),
        col("comp").as("canon"), col("embedding"), col("nrm"))
    // materialize before mutating the store the lineage reads
    val textsRows = touched.unionByName(newLabeled)
      .withColumn("_ver", lit(epochId))
      .localCheckpoint(true)
    if (!textsRows.isEmpty)
      Sinks.upsertByKeyPartitioned(textsRows, Seq("vec_id"), "_ver",
        textsDir, nBuckets, targetBucketBytes = targetBucketBytes)
  }

  /** [[processBatch]] with the production recenter CADENCE wired in
    * (round-9 verdict ask #3 — q127 proved one refit; this is the "when"):
    * after folding the batch, refit the quantizer when `epochId` is a
    * power of two (1, 2, 4, 8, …). Epochs carry roughly equal batch
    * volume, so power-of-two epochs are corpus doublings: each recenter
    * is O(corpus-so-far), the k-th recenter covers a corpus of ~2^k
    * batches, and the total maintenance work over N batches telescopes to
    * O(N) — amortized O(1) per ingested vector, the same geometric
    * schedule as [[Sinks.upsertByKeyPartitioned]]'s bucket resize. Between
    * recenters the geometry is at most one doubling stale, bounding the
    * frozen-contract drift window.
    *
    * With an id-ascending feed every refit's corpus-lowest-id seeds equal
    * the frozen epoch-0 seeds, so the cadence preserves the batch
    * operator's partition exactly (q160 shares q102's oracle);
    * SemIngestSpec pins the drift direction (a mid-stream firing
    * discovers a stale-split pair `processBatch` alone misses) and
    * trigger-on/off equivalence under the canonical feed. */
  def processBatchWithCadence(
      batch: DataFrame,
      root: String,
      epochId: Long,
      nCells: Int = 16,
      threshold: Double = 0.35,
      lloydRounds: Int = 0,
      nBuckets: Int = 64,
      targetBucketBytes: Long = 256L << 20): Unit = {
    processBatch(batch, root, epochId, nCells, threshold, nBuckets,
      targetBucketBytes)
    if (epochId >= 1L && (epochId & (epochId - 1L)) == 0L)
      recenter(batch.sparkSession, root, nCells, epochId, threshold,
        lloydRounds, nBuckets, targetBucketBytes)
  }

  /** Periodic centroid maintenance for TRUE unbounded ingest — the answer
    * to the first-seen contract's one weakness: cell geometry frozen at
    * batch 1 drifts as the corpus outgrows its first batch, and dup pairs
    * the stale cells SPLIT are never discovered. `recenter` refits the
    * quantizer over everything seen (corpus-wide lowest-id seeds +
    * `lloydRounds` Lloyd rounds — [[Similarity.kmeansCentroids]], the
    * batch operator's own trainer, so with an id-ascending feed the refit
    * geometry equals what batch SemDeDup would use at the CURRENT corpus),
    * re-assigns every vector, scores pairs between MOVED vectors and their
    * new cellmates (a pair with neither endpoint moved kept its co-cell
    * status and was scored the batch its younger member arrived), and
    * merges the resulting groups through the same canon-mapped star
    * components as [[processBatch]] — existing groups can only MERGE,
    * never split, so every previously-emitted suppression stays valid.
    *
    * Scale contract: one recenter is O(corpus) assignment + within-cell
    * pair scoring — run it at geometrically-spaced epochs (corpus
    * doublings), like [[Sinks.upsertByKeyPartitioned]]'s bucket resize,
    * and the amortized cost per ingested vector is O(1). `nCells` is the
    * refit cell count — pass ~√N for the SemDeDup paper's regime as the
    * corpus grows. A crash between the texts upsert and the centroid swap
    * leaves cells from the new geometry with the old centroids: pair
    * DISCOVERY degrades (never corrupts — keepers stay min-id per group)
    * until recenter is re-run, which converges; the centroid swap itself
    * is rename-aside with recovery at the next call. */
  def recenter(
      spark: SparkSession,
      root: String,
      nCells: Int,
      epochId: Long,
      threshold: Double = 0.35,
      lloydRounds: Int = 1,
      nBuckets: Int = 64,
      targetBucketBytes: Long = 256L << 20): Unit = {
    val centsDir = s"$root/cents"
    val textsDir = s"$root/texts"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val centsOld = new Path(centsDir + "_old")
    // recovery: an interrupted swap left the only centroids set aside
    if (!existsDir(spark, centsDir) && fs.exists(centsOld) &&
        !fs.rename(centsOld, new Path(centsDir)))
      throw new java.io.IOException(s"SemIngest: cannot restore $centsOld")
    val store = readStore(spark, textsDir).getOrElse(
      throw new IllegalStateException(
        s"SemIngest: no texts store at $textsDir to recenter"))
      .localCheckpoint(true)
    val vecs = store.select(col("vec_id"), col("embedding"))
    val cents = Similarity.kmeansCentroids(vecs, nCells, lloydRounds)
      .localCheckpoint(true)
    val rows = store.drop("cell")
      .join(Similarity.assignCells(vecs, cents), "vec_id")
      .select(col("vec_id"), col("label"), col("cell"), col("canon"),
        col("embedding"), col("nrm"))
      .localCheckpoint(true)
    val moved = rows
      .join(store.select(col("vec_id"), col("cell").as("old_cell")), "vec_id")
      .where(col("cell") =!= col("old_cell")).drop("old_cell")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("vec_id").as(tag), col("embedding").as(s"v$tag"),
        col("nrm").as(s"n$tag"), col("cell"))
    val joined = side(rows, "a").join(side(moved, "b"), Seq("cell"))
      .unionByName(side(moved, "a").join(side(rows, "b"), Seq("cell")))
    val pairs = Similarity.scoredPairs(joined, threshold)
      .select(col("a"), col("b")).distinct()
    val canonOf = rows.select(col("vec_id").as("sp"), col("canon").as("sc"))
    val edges = pairs
      .join(canonOf.withColumnRenamed("sp", "a").withColumnRenamed("sc", "ca"),
        Seq("a"), "left")
      .join(canonOf.withColumnRenamed("sp", "b").withColumnRenamed("sc", "cb"),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
    val relabeled =
      if (edges.isEmpty) rows
      else {
        val comps = Dedup.connectedComponentsStar(edges)
        val relabel = comps.where(col("comp") =!= col("id"))
          .select(col("id").as("canon"), col("comp"))
        rows.join(relabel, Seq("canon"), "left")
          .select(col("vec_id"), col("label"), col("cell"),
            coalesce(col("comp"), col("canon")).as("canon"),
            col("embedding"), col("nrm"))
      }
    // texts first (canon merges are durable), centroids second — the crash
    // window between them only degrades discovery, documented above
    val textsRows = relabeled.withColumn("_ver", lit(epochId))
      .localCheckpoint(true)
    Sinks.upsertByKeyPartitioned(textsRows, Seq("vec_id"), "_ver",
      textsDir, nBuckets, targetBucketBytes = targetBucketBytes)
    val centsNew = new Path(centsDir + "_new")
    cents.write.mode("overwrite").parquet(centsNew.toString)
    fs.delete(centsOld, true)
    if (!fs.rename(new Path(centsDir), centsOld))
      throw new java.io.IOException(s"SemIngest: cannot set aside $centsDir")
    if (!fs.rename(centsNew, new Path(centsDir))) {
      fs.rename(centsOld, new Path(centsDir)) // restore
      throw new java.io.IOException(s"SemIngest: cannot publish $centsNew")
    }
    fs.delete(centsOld, true)
  }

  /** The store's survivors — each group's min-id member plus every
    * untouched vector: the batch operator's output. Within any fixed
    * cell geometry this is feed-order independent: star components
    * min-label over vec_ids, and relabeling propagates a later-arriving
    * smaller id through its whole group. */
  def survivors(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/texts")
      .where(col("canon") === col("vec_id"))
      .select(col("vec_id"), col("label"))
}
