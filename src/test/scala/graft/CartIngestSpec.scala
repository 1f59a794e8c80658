package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.streaming.CartIngest

/** Frozen-tree CART scoring on ingest: batch equivalence, out-of-model
  * routing, replay idempotence, and the loud missing-model guard. */
class CartIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def docs =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_cart_spec_").toString

  test("two-batch ingest over the training corpus equals batch scoreTree") {
    val root = tmp()
    CartIngest.freezeModel(docs, root)
    CartIngest.processBatch(docs.where($"doc_id" < 250), root, 0L)
    CartIngest.processBatch(docs.where($"doc_id" >= 250), root, 1L)
    val got = CartIngest.readScores(spark, root)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val lf = Classifier.labeledFeatures(docs)
    val want = Classifier.scoreTree(lf, Classifier.trainTree(lf))
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("a crash-replayed epoch overwrites its own directory, never double-appends") {
    val root = tmp()
    CartIngest.freezeModel(docs, root)
    val half = docs.where($"doc_id" < 250)
    CartIngest.processBatch(half, root, 0L)
    CartIngest.processBatch(half, root, 0L) // the replay
    assert(CartIngest.readScores(spark, root).count() === half.count())
  }

  test("a doc the frozen tree never saw still routes to a trained leaf") {
    val root = tmp()
    CartIngest.freezeModel(docs, root)
    // synthetic doc far outside the corpus: 30 long tokens, no stopwords
    val weird = Seq((999999L, Seq.fill(30)("antidisestablishmentarianism")
      .mkString(" "))).toDF("doc_id", "text")
    CartIngest.processBatch(weird, root, 7L)
    val row = CartIngest.readScores(spark, root)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row._1 === 999999L)
    assert(row._3 === -1L && row._4 === -1L) // teacher and tree agree: reject
  }

  test("processBatch without a frozen model refuses loudly") {
    val err = intercept[IllegalArgumentException] {
      CartIngest.processBatch(docs.limit(1), tmp(), 0L)
    }
    assert(err.getMessage.contains("freezeModel first"))
  }
}
