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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
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
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), dim, nPlanes).as("bucket"))
    // multi-probe: query also checks buckets at hamming distance 1
    val qb0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), dim, nPlanes).as("bucket0"))
    val probes = array((lit(0L) +: (0 until nPlanes).map(b => lit(1L << b))): _*)
    val qb = qb0.select(col("query_id"), col("qv"),
      explode(transform(probes, m => col("bucket0").bitwiseXOR(m))).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
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
    val withBucket =
      if (nPlanes <= 0) vecs.select(col(idCol), col(vecCol)).withColumn("bucket", lit(0L))
      else vecs.select(col(idCol), col(vecCol),
        hyperplaneBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val l = withBucket.select(col(idCol).as("a"), col(vecCol).as("va"), col("bucket"))
    val r = withBucket.select(col(idCol).as("b"), col(vecCol).as("vb"), col("bucket"))
    l.join(r, Seq("bucket"))
      .where(col("a") < col("b"))
      .withColumn("score", cosine(col("va"), col("vb")))
      .where(col("score") >= threshold)
      .select(col("a"), col("b"), round(col("score"), 6).as("score"))
  }
}
