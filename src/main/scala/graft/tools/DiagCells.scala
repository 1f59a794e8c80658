package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.entry.GateSupport

/** Cell-population diagnostic for the k-means pair space (q102's
  * SemDeDup) — the cell twin of [[DiagBuckets]]: prints the per-cell
  * population histogram at the semDedupCells(n) cell count, the implied
  * within-cell clique pair space, and the median-derived cap the
  * profile-driven operators would choose. A k-means cell bounds the pair
  * space only if no cell IS a dense near-dup cluster; this tool measures
  * whether the corpus at `sfDir` trips that case (the q53 adjudication
  * applied to cells). Usage: runMain graft.tools.DiagCells <sfDir>
  */
object DiagCells {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val n = emb.count()
    val nCells = GateSupport.semDedupCells(n)
    println(s"n=$n nCells=$nCells")
    val cents = Similarity.kmeansCentroids(emb, nCells, 0)
    val hist = Similarity.assignCells(emb, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("c"))
    val agg = hist.agg(
      count(lit(1)).as("n_cells"),
      max(col("c")).as("max_pop"),
      expr("approx_percentile(c, array(0.5, 0.9, 0.99))").as("p50_90_99"),
      sum(expr("c*(c-1) div 2")).as("pairs")).head()
    val top = hist.orderBy(col("c").desc).limit(12).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"cells=${agg.getLong(0)} maxPop=${agg.getLong(1)} " +
      s"p50/90/99=${agg.getSeq[Long](2).mkString("/")} " +
      s"pairSpace=${agg.getLong(3)} top12[$top]")
    // the LSH bucket space at autoPlanes, for the derived-cap design
    val planes = Similarity.autoPlanes(n)
    val bhist = emb.select(graft.functions.VectorFunctions
        .hyperplaneBucket(col("embedding"), 64, planes).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val bs = bhist.orderBy(col("c"), col("bucket")).collect()
      .map(r => r.getLong(1))
    val med = bs((bs.length - 1) / 2)
    println(s"planes=$planes buckets=${bs.length} pops=[${bs.mkString(",")}] " +
      s"lowerMedian=$med 4xMed=${4 * med}")
    spark.stop()
  }
}
