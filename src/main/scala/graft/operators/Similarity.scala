package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *    one codegen'd pass over the corpus, per-query top-k via window rank.
  *    The corpus side never shuffles its vectors; only (query_id, doc_id,
  *    score) triples move. Correct at any corpus size as long as the QUERY
  *    set broadcasts.
  *  - [[lshTopK]]: the scale path — random-hyperplane buckets on both sides;
  *    only same-bucket pairs are scored. Probing `nProbes` neighboring
  *    buckets (single-bit flips) trades recall for cost, the standard
  *    multi-probe LSH trick.
  *  - [[nearDupPairs]]: all-pairs cosine ≥ threshold within hyperplane
  *    buckets — embedding-level near-duplicate detection for dedup.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (it is hinted); corpus is streamed. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // norms are precomputed per vector (not per pair) — identical float op
    // order as cosine(), so bit-equal scores, at a third of the flops.
    // The corpus side is repartitioned so the broadcast nested-loop scoring
    // parallelizes across all cores (a single parquet file would otherwise
    // score every (query, doc) pair in ONE task).
    val shufflePartitions =
      corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn")).repartition(shufflePartitions)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("score"), 6).as("score"),
        col("rank"))
  }

  /** IVF/LSH-bucketed ANN: hyperplane-bucket both sides, score only bucket
    * collisions. Recall < 1.0 by construction; raise nPlanes↓/probes↑ to
    * tune. Bucket join is a plain equi-join → shuffles only ids+buckets. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      nPlanes: Int = 12,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val shufflePartitions =
      corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      hyperplaneBucket(col(vecCol), dim, nPlanes).as("bucket"))
      .repartition(shufflePartitions)
    // multi-probe: query also checks buckets at hamming distance 1
    val qb0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      hyperplaneBucket(col(vecCol), dim, nPlanes).as("bucket0"))
    val probes = array((lit(0L) +: (0 until nPlanes).map(b => lit(1L << b))): _*)
    val qb = qb0.select(col("query_id"), col("qv"), col("qn"),
      explode(transform(probes, m => col("bucket0").bitwiseXOR(m))).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("score")).as("score")) // dedup multi-probe collisions
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("score"), 6).as("score"),
        col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold),
    * bucketed by hyperplane LSH so the pair space is per-bucket, not global.
    * For the exact (oracle-checkable) variant pass nPlanes = 0 → single
    * bucket = exact all-pairs (only viable at verification scale).
    */
  def nearDupPairs(
      vecs: DataFrame,
      threshold: Double,
      dim: Int,
      nPlanes: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
    val shufflePartitions =
      vecs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val joined =
      if (nPlanes <= 0) {
        // exact all-pairs: a constant join key would degenerate to a
        // single-task nested loop — instead broadcast one side and
        // repartition the other so the O(n²) scoring spreads over all cores.
        val l = base.select(col(idCol).as("a"), col(vecCol).as("va"),
          col("nrm").as("na")).repartition(shufflePartitions)
        val r = base.select(col(idCol).as("b"), col(vecCol).as("vb"),
          col("nrm").as("nb"))
        l.crossJoin(broadcast(r))
      } else {
        // scale path: only same-bucket pairs are candidates; the bucket
        // equi-join shuffle-partitions the pair space by bucket.
        val withBucket =
          base.withColumn("bucket", hyperplaneBucket(col(vecCol), dim, nPlanes))
        val l = withBucket.select(col(idCol).as("a"), col(vecCol).as("va"),
          col("nrm").as("na"), col("bucket"))
        val r = withBucket.select(col(idCol).as("b"), col(vecCol).as("vb"),
          col("nrm").as("nb"), col("bucket"))
        l.join(r, Seq("bucket"))
      }
    joined
      .where(col("a") < col("b"))
      .withColumn("score", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("score") >= threshold)
      .select(col("a"), col("b"), round(col("score"), 6).as("score"))
  }
}
