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
  *  - `cents/` (written once, at epoch 0): the coarse cell centroids —
  *    seeded from the FIRST batch's lowest ids, the streaming analogue
  *    of training the quantizer on an initial sample and freezing it
  *    (feed batches id-ascending and the seeds equal the batch
  *    operator's corpus-wide lowest-id seeds, so the partitions match);
  *  - `texts/epoch=N`: (vec_id, label, cell, canon, embedding, nrm) —
  *    every vector seen through batch N with its group's canonical
  *    min-id member.
  *
  * Per batch: assign new vectors to their nearest frozen centroid, score
  * candidate pairs new-vs-new and new-vs-state WITHIN cells only (cell
  * equi-joins through [[Similarity.scoredPairs]] — the one scoring
  * contract the oracles pin), then union groups by star components over
  * canon-mapped merge edges, relabeling state when a new vector bridges
  * two groups. Pair discovery is complete by induction (a within-cell
  * pair is scored the batch its younger member arrives), so the final
  * partition equals the batch operator's connected components and the
  * survivor set (canon == own id) shares q102's oracle. Snapshot chain =
  * checkpointed-replay exactly-once, as [[FuzzyIngest]].
  */
object SemIngest {

  private def epochDir(root: String, epoch: Long) = s"$root/texts/epoch=$epoch"

  private def readIf(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  /** Fold one micro-batch of (vec_id, embedding, label) rows into the
    * store under `root`. */
  def processBatch(
      batch: DataFrame,
      root: String,
      epochId: Long,
      nCells: Int = 16,
      threshold: Double = 0.35): Unit = {
    val spark = batch.sparkSession
    val centsDir = s"$root/cents"
    if (readIf(spark, centsDir).isEmpty)
      Similarity.kmeansCentroids(batch, nCells, 0)
        .write.mode("overwrite").parquet(centsDir)
    val cents = spark.read.parquet(centsDir)
    val prev = readIf(spark, epochDir(root, epochId - 1))
    val newRows = batch
      .join(Similarity.assignCells(batch, cents), "vec_id")
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
    val all = prev match {
      case Some(t) => newRows.select(pairCols: _*)
        .unionByName(t.select(pairCols: _*))
      case None    => newRows.select(pairCols: _*)
    }
    val joined = side(all, "a").join(side(newRows, "b"), Seq("cell"))
      .unionByName(side(newRows, "a").join(side(all, "b"), Seq("cell")))
    val pairs = Similarity.scoredPairs(joined, threshold)
      .select(col("a"), col("b")).distinct()
    val canonOf = prev match {
      case Some(t) => t.select(col("vec_id").as("sp"), col("canon").as("sc"))
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
    val newLabeled = newRows
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("cell"),
        coalesce(col("comp"), col("vec_id")).as("canon"),
        col("embedding"), col("nrm"))
    val out = prev match {
      case Some(t) => t.join(relabel, Seq("canon"), "left")
        .select(col("vec_id"), col("label"), col("cell"),
          coalesce(col("comp"), col("canon")).as("canon"),
          col("embedding"), col("nrm"))
        .unionByName(newLabeled)
      case None => newLabeled
    }
    out.write.mode("overwrite").parquet(epochDir(root, epochId))
  }

  /** The latest snapshot's survivors — each group's min-id member plus
    * every untouched vector: exactly the batch operator's output. */
  def survivors(spark: SparkSession, root: String): DataFrame = {
    val base = new Path(s"$root/texts")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toLong).max
    spark.read.parquet(epochDir(root, last))
      .where(col("canon") === col("vec_id"))
      .select(col("vec_id"), col("label"))
  }
}
