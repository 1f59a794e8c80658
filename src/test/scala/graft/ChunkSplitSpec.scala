package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Token-window chunking, leakage-free splits, and cross-split
  * contamination — boundary semantics pinned on hand-built data.
  */
class ChunkSplitSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def text(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunkByTokens: clamped-tail windows cover every token exactly once per rule") {
    // n=10 (< size): one short chunk; n=32: one exact chunk; n=33: clamp
    // puts the tail at start 1 (not stride 24); n=56: starts 0,24 (24 = n-32
    // exactly, no clamp); n=80: starts 0,24,48
    val docs = Seq((1L, text(10)), (2L, text(32)), (3L, text(33)),
      (4L, text(56)), (5L, text(80))).toDF("doc_id", "text")
    val out = Corpus.chunkByTokens(docs, chunkSize = 32, stride = 24)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Long, Long, Long, String)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(r => (r._3, r._4)).toSeq === Seq((0L, 10L)))
    assert(byDoc(2L).map(r => (r._3, r._4)).toSeq === Seq((0L, 32L)))
    assert(byDoc(3L).map(r => (r._3, r._4)).toSeq === Seq((0L, 32L), (1L, 32L)))
    assert(byDoc(4L).map(r => (r._3, r._4)).toSeq === Seq((0L, 32L), (24L, 32L)))
    assert(byDoc(5L).map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 32L), (24L, 32L), (48L, 32L)))
    // every chunk's fingerprint is the md5 of exactly its token slice
    val toks80 = (1 to 80).map(i => s"w$i")
    assert(byDoc(5L).map(_._5).toSeq ===
      Seq(0, 24, 48).map(s => md5hex(toks80.slice(s, s + 32).mkString(" "))))
    // the last chunk always reaches the last token
    byDoc.foreach { case (id, rows) =>
      val n = Seq(10, 32, 33, 56, 80)(id.toInt - 1)
      assert(rows.map(r => r._3 + r._4).max === n.toLong, s"doc $id tail")
    }
  }

  test("holdoutSplit: exact duplicates always land on the same side") {
    val docs = (1 to 200).map(i => (i.toLong, s"doc body number ${i % 40}"))
      .toDF("doc_id", "text") // 5 copies of each of 40 distinct texts
    val out = Corpus.holdoutSplit(docs)
      .select($"cluster_fp", $"split").distinct().collect()
    // one split per fingerprint — never both
    assert(out.map(_.getString(0)).distinct.length === out.length)
    // ppm extremes
    assert(Corpus.holdoutSplit(docs, heldoutPpm = 0L)
      .where($"split" === "heldout").count() === 0)
    assert(Corpus.holdoutSplit(docs, heldoutPpm = 1000000L)
      .where($"split" === "train").count() === 0)
  }

  test("holdoutSplitByClusters: component members share a side, unclustered fall back to own id") {
    val docs = (1 to 6).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L)).toDF("id", "comp")
    val out = Corpus.holdoutSplitByClusters(docs, clusters)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(1L)._2 === out(2L)._2)
    assert(out(4L)._1 === 4L && out(5L)._1 === 4L && out(4L)._2 === out(5L)._2)
    assert(out(3L)._1 === 3L && out(6L)._1 === 6L)
    // same ppm rule as holdoutSplit, applied to the cluster key
    val gate = docs.select($"doc_id",
        (graft.operators.Dedup.md5Long($"doc_id".cast("string")) % 1000000L < 100000L)
          .as("h")).as[(Long, Boolean)].collect().toMap
    Seq(1L, 3L, 4L, 6L).foreach { k =>
      assert(out(k)._2 === (if (gate(k)) "heldout" else "train"), s"key $k")
    }
  }

  test("expectations: exact violation counts for every kind, incl. NULL semantics") {
    import graft.operators.Expectations._
    val rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Double, String)] = Seq(
      (1L, 1L, 10.0, "A"),
      (1L, 1L, 20.0, "B"),    // duplicate (id, k2) key
      (null, 2L, 99.0, "A"),  // null id; 99 out of range
      (3L, 3L, null, "C"),    // null value violates range; C not in enum
      (4L, 9L, 5.0, "A"))     // k2=9 dangling FK
    val df = rows.toDF("id", "k2", "v", "s")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val out = check(df, Seq(
        NotNull("id"),
        UniqueKey(Seq("id", "k2")),
        InRange("v", 0.0, 50.0),
        InSet("s", Seq("A", "B")),
        RefIntegrity("k2", dim, "k")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("not_null_id") === ((5L, 1L, false)))
    // the duplicate pair contributes 1, the null-keyed row 1 more
    assert(out("unique_id_k2") === ((5L, 2L, false)))
    assert(out("range_v") === ((5L, 2L, false)))   // 99 + NULL
    assert(out("in_set_s") === ((5L, 1L, false)))  // C
    assert(out("ref_k2") === ((5L, 1L, false)))    // 9
    // all-green path
    val clean = check(df.where($"id" === 4L), Seq(NotNull("id"), InSet("s", Seq("A"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(clean.forall(_._4))
  }

  test("expectations route(): per-row violation sets reconcile with check()'s counts") {
    import graft.operators.Expectations._
    val rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Double, String)] = Seq(
      (1L, 1L, 10.0, "A"),
      (1L, 1L, 20.0, "B"),    // duplicate (id, k2) key
      (null, 2L, 99.0, "A"),  // null id; 99 out of range
      (3L, 3L, null, "C"),    // null value violates range; C not in enum
      (4L, 9L, 5.0, "A"))     // k2=9 dangling FK
    val df = rows.toDF("id", "k2", "v", "s")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val exps = Seq(
      NotNull("id"),
      UniqueKey(Seq("id", "k2")),
      InRange("v", 0.0, 50.0),
      InSet("s", Seq("A", "B")),
      RefIntegrity("k2", dim, "k"))
    val routed = route(df, exps, uniqueTieBreak = Seq($"v"))
      .select($"v", $"violated").as[(Option[Double], Seq[String])].collect()
      .map { case (v, viol) => v -> viol }.toMap
    // tie-break v ASC: the 10.0 row escapes the unique flag, 20.0 carries it
    assert(routed(Some(10.0)) === Seq.empty)
    assert(routed(Some(20.0)) === Seq("unique_id_k2"))
    assert(routed(Some(99.0)) === Seq("not_null_id", "range_v", "unique_id_k2"))
    assert(routed(None) === Seq("in_set_s", "range_v"))
    assert(routed(Some(5.0)) === Seq("ref_k2"))
    // reconciliation: per-expectation routed-row counts == check()'s audit
    val audits = check(df, exps).as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val fromRoute = route(df, exps)
      .select(explode($"violated").as("e")).groupBy($"e").count()
      .as[(String, Long)].collect().toMap
    audits.foreach { case (name, n) =>
      assert(fromRoute.getOrElse(name, 0L) === n, name)
    }
  }

  test("expectations: colliding declared names are refused at declaration") {
    import graft.operators.Expectations._
    val df = Seq((1L, 5.0)).toDF("id", "v")
    // two InRange on one column derive the same agg output name — ambiguous
    val e = intercept[IllegalArgumentException] {
      check(df, Seq(InRange("v", 0.0, 10.0), InRange("v", 2.0, 3.0)))
    }
    assert(e.getMessage.contains("duplicate expectation names"))
  }

  test("weightedSample: A-ES ordering equals the in-JVM reference; heavy rows dominate") {
    val docs = (1 to 200).map(i => (i.toLong, if (i == 7) 1e9 else 1.0 + i % 5))
      .toDF("doc_id", "w")
    val out = Corpus.weightedSample(docs, "doc_id", $"w", 50)
      .orderBy($"rank").as[(Long, Double, Double, Long)].collect()
    assert(out.length === 50)
    assert(out.exists(_._1 == 7L), "an astronomically heavy row must be sampled")
    // in-JVM replay: same md5-derived dyadic u, same key, same rounding
    val M = 9007199254740992L
    def md5l(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (1 to 200).map { i =>
      val w = if (i == 7) 1e9 else 1.0 + i % 5
      val u = ((md5l(i.toString) % M) + 1).toDouble / M.toDouble
      (i.toLong, r6(math.log(u) / w))
    }.sortBy { case (id, key) => (-key, id) }.take(50).map(_._1)
    assert(out.map(_._1).toSeq === expect)
  }

  test("rankByScore assigns exact global ranks across range partitions") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 25).toDouble))
      .toDF("id", "score") // heavy score ties → id tie-break must decide
    val out = Corpus.rankByScore(df, "id", "score")
      .as[(Long, Double, Long)].collect()
    val expected = out.map(r => (r._2, r._1)).sorted.zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, _, r) => assert(r === expected(id), s"id $id") }
    val desc = Corpus.rankByScore(df, "id", "score", ascending = false)
      .as[(Long, Double, Long)].collect()
    val expDesc = desc.map(r => (-r._2, r._1)).sorted.zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    desc.foreach { case (id, _, r) => assert(r === expDesc(id), s"desc id $id") }
  }

  test("perplexityBands: equal-population bands, monotone in rank") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.TextProfile.perplexityBands(docs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    val n = out.length
    assert(out.map(_._4).toSeq === out.map(r => 1 + ((r._3 - 1) * 3) / n).toSeq)
    val sizes = out.groupBy(_._4).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"band sizes $sizes")
    // band order follows surprisal order
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq)
  }

  test("splitContamination counts exactly the heldout grams present in train") {
    val train = (1L, (1 to 12).map(i => s"t$i").mkString(" "))
    // heldout A shares train's tokens 3..10 (one 8-gram); B shares none
    val heldA = (2L, ((3 to 10).map(i => s"t$i") ++ Seq("x1", "x2")).mkString(" "))
    val heldB = (3L, (1 to 10).map(i => s"u$i").mkString(" "))
    val docs = Seq(train, heldA, heldB).toDF("doc_id", "text")
    val splits = Seq((1L, "train"), (2L, "heldout"), (3L, "heldout"))
      .toDF("doc_id", "split")
    val out = Corpus.splitContamination(docs, splits)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) === ((2L, 3L, 1L, true)))  // 10 toks → 3 grams, 1 hit
    assert(out(3L) === ((3L, 3L, 0L, false)))
    assert(!out.contains(1L)) // train docs are not audited
  }

}
