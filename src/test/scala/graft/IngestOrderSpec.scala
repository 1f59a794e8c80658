package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{FuzzyIngest, SemIngest}
import graft.operators.Similarity

/** Round-7's feed-order contract: the ingest twins' SURVIVOR sets must
  * not depend on arrival order. FuzzyIngest is fully order-independent
  * (LSH signatures depend only on the text; the keeper is derived from
  * the tracked global-min instance at survivors() time) — a descending
  * feed must converge to the ascending feed's exact keeper set.
  * SemIngest is order-independent WITHIN a fixed cell geometry (the
  * first-seen centroid contract); with one cell the geometry is
  * order-free and a descending feed must equal the batch operator. */
class IngestOrderSpec extends SparkTestBase {
  import spark.implicits._

  // A vs B differ at words 1, 2, 10 (jaccard 0.4545 < 0.55: separate);
  // C shares A's tail and B's head — near both, so it bridges them.
  private val A = "w1 w2 c3 c4 c5 c6 c7 c8 c9 a10"
  private val B = "x1 x2 c3 c4 c5 c6 c7 c8 c9 b10"
  private val C = "x1 x2 c3 c4 c5 c6 c7 c8 c9 a10"

  private def fuzzSurv(root: String): Set[(Long, Long)] =
    FuzzyIngest.survivors(spark, root).as[(Long, Long)].collect().toSet

  test("fuzzy: a descending-enc feed converges to the ascending feed's keepers") {
    // instances: A@1/0, B@2/0, C@3/0, and an exact B re-arrival @4/0.
    // Expected after C bridges: ONE group, keeper = global min instance
    // (1, 0) — regardless of which batch carried which instance.
    val asc = Seq(
      Seq((100000L, A), (200000L, B)),
      Seq((300000L, C)),
      Seq((400000L, B)))
    val desc = Seq(
      Seq((400000L, B)),
      Seq((300000L, C)),
      Seq((200000L, B), (100000L, A)))
    def run(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long)] = {
      val root = Files.createTempDirectory("graft_fuzzy_ord_").toString
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          FuzzyIngest.processBatch(b.toDF("enc", "para"), root, i.toLong,
            threshold = 0.55, bands = 16)
        }
        fuzzSurv(root)
      } finally {
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
      }
    }
    val up = run(asc)
    val down = run(desc)
    assert(up === Set((1L, 0L)), s"ascending feed keeper set wrong: $up")
    assert(down === up,
      "a descending feed must converge to the ascending feed's exact keepers")
  }

  test("sem: a descending-id feed equals the batch operator (fixed geometry)") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 10),
      (2L, Array(0f, 1f), 20),
      (3L, Array(0.7071f, 0.7071f), 30)) // near both: bridges 1 and 2
    val root = Files.createTempDirectory("graft_sem_ord_").toString
    try {
      // feed DESCENDING by id, one vector per batch: the bridge arrives
      // first, then the group members it will union
      vecs.sortBy(-_._1).zipWithIndex.foreach { case (v, i) =>
        SemIngest.processBatch(Seq(v).toDF("vec_id", "embedding", "label"),
          root, i.toLong, nCells = 1, threshold = 0.6)
      }
      val streamed = SemIngest.survivors(spark, root)
        .select(col("vec_id")).as[Long].collect().toSet
      val batch = Similarity.semDedup(
          vecs.toDF("vec_id", "embedding", "label"), 1, 0, 0.6)
        .select(col("vec_id")).as[Long].collect().toSet
      assert(streamed === batch,
        s"descending ingest ($streamed) must equal the batch operator ($batch)")
      assert(streamed === Set(1L), "the merged group keeps its min id")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }
}
