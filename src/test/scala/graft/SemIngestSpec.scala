package graft

import java.nio.file.Files
import graft.streaming.SemIngest

/** SemIngest's incremental-union property (the cell-space analogue of
  * FuzzyIngestSpec): a later vector near BOTH of two previously-separate
  * groups merges them, and a replayed epoch leaves the store unchanged. */
class SemIngestSpec extends SparkTestBase {
  import spark.implicits._

  // A ⟂ B (cosine 0 → separate at 0.6); C = normalized A+B is at 0.707
  // from each — near both, so it bridges them.
  private def df(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  private def surv(root: String): Set[Long] =
    SemIngest.survivors(spark, root).select("vec_id").as[Long].collect().toSet

  test("a bridging vector merges two prior groups; replayed epoch is idempotent") {
    val root = Files.createTempDirectory("graft_sem_spec_").toString
    try {
      SemIngest.processBatch(
        df((1L, Array(1f, 0f), 10), (2L, Array(0f, 1f), 20)),
        root, 0L, nCells = 1, threshold = 0.6)
      assert(surv(root) === Set(1L, 2L), "orthogonal vectors stay separate groups")
      SemIngest.processBatch(
        df((3L, Array(0.7071f, 0.7071f), 30)),
        root, 1L, nCells = 1, threshold = 0.6)
      assert(surv(root) === Set(1L), "the bridge unions both groups under the min id")
      SemIngest.processBatch(
        df((3L, Array(0.7071f, 0.7071f), 30)),
        root, 1L, nCells = 1, threshold = 0.6)
      assert(surv(root) === Set(1L), "replayed epoch must not change the store")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }
}
