package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus composition: mixture interleave schedule semantics. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("mixtureInterleave densities follow the weights in the merged order") {
    // 30 docs per stratum; weight 3 vs 1 → in any merged prefix ending at
    // an integer position p, stratum a has contributed 3p docs, b has p
    val docs = ((1 to 30).map(i => (i.toLong, "a")) ++
      (31 to 60).map(i => (i.toLong, "b"))).toDF("doc_id", "stratum")
    val out = Corpus.mixtureInterleave(docs, $"stratum", $"doc_id",
        Map("a" -> 3.0), defaultWeight = 1.0)
      .select($"doc_id", $"stratum", $"mix_pos")
      .orderBy($"mix_pos", $"stratum", $"doc_id")
      .as[(Long, String, Double)].collect()
    (1 to 10).foreach { p =>
      val prefix = out.takeWhile(_._3 <= p.toDouble)
      assert(prefix.count(_._2 == "a") === 3 * p, s"prefix to $p")
      assert(prefix.count(_._2 == "b") === p, s"prefix to $p")
    }
    // deterministic: within a stratum, schedule order == id order
    val aIds = out.filter(_._2 == "a").map(_._1).toSeq
    assert(aIds === aIds.sorted)
  }

  test("mixtureInterleave refuses non-positive weights") {
    val docs = Seq((1L, "a")).toDF("doc_id", "stratum")
    intercept[IllegalArgumentException] {
      Corpus.mixtureInterleave(docs, $"stratum", $"doc_id", Map("a" -> 0.0))
    }
  }
}
