package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Bucket-population diagnostic for the hyperplane-LSH near-dup path
  * (q53): prints the bucket histogram and the implied same-bucket pair
  * space at a given sf dir, at the autoPlanes-chosen plane count and a
  * couple of alternatives. The ×100 q53 exponent read 1.34-1.36 across
  * two rounds even after the density pin fixed the AVERAGE population —
  * this tool separates "buckets too big on average" (plane count) from
  * "buckets skewed" (correlated embeddings put a large fraction of the
  * corpus on the same side of many planes — average density can't see
  * that). Usage: runMain graft.tools.DiagBuckets <sfDir> [planes...]
  */
object DiagBuckets {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/updata/sf10docs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val n = emb.count()
    val auto = Similarity.autoPlanes(n)
    val tryPlanes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(auto, auto + 2, auto + 4)
    println(s"n=$n autoPlanes=$auto")
    tryPlanes.foreach { p =>
      val hist = emb
        .select(VectorFunctions.hyperplaneBucket(col("embedding"), 64, p).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val agg = hist.agg(
        count(lit(1)).as("n_buckets"),
        max(col("c")).as("max_pop"),
        expr("approx_percentile(c, array(0.5, 0.9, 0.99))").as("p50_90_99"),
        sum(expr("c*(c-1) div 2")).as("pairs")).head()
      val top = hist.orderBy(col("c").desc).limit(8).collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"planes=$p buckets=${agg.getLong(0)} (of ${1L << p} possible) " +
        s"maxPop=${agg.getLong(1)} p50/90/99=${agg.getSeq[Long](2).mkString("/")} " +
        s"pairSpace=${agg.getLong(3)} top8[$top]")
    }
    spark.stop()
  }
}
