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

  test("crossSourceOverlap counts shared fingerprints and Jaccard across sources") {
    // A: {x, y, z}; B: {x, y, w} (x whitespace-variant — fingerprints
    // normalize); C: {v} disjoint. A∩B = {x, y} → J = 2/(3+3-2) = 0.5.
    // The synthetic gate corpus has only WITHIN-source dups, so the
    // off-diagonal path is pinned here.
    val docs = Seq(
      (0L, "A", "x one"), (1L, "A", "y two"), (2L, "A", "z three"),
      (3L, "B", "x  one "), (4L, "B", "y two"), (5L, "B", "w four"),
      (6L, "B", "y two"), // in-source dup: distinct grain must not double-count
      (7L, "C", "v five")).toDF("doc_id", "source", "text")
    val out = Corpus.crossSourceOverlap(docs)
      .orderBy($"src_a", $"src_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("A", "A", 3L, 1.0), ("A", "B", 2L, 0.5), ("B", "B", 3L, 1.0),
      ("C", "C", 1L, 1.0)))
  }
}
