package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.core.Envelopes
import graft.operators.EventOps
import graft.streaming.{StatefulOps, StreamHarness}

/** The property-based tests SURVEY §5 commits to: envelope-parse totality,
  * dedup idempotence, visitor-repair monotonicity, and jump-detection
  * equivalence against a naive in-memory reference implementation.
  * ScalaCheck generators with a FIXED seed (deterministic CI) produce the
  * cases; each property evaluates over one generated dataset per seed
  * variant so Spark-job count stays bounded.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // local twins of StatefulOps' private helpers (µs epoch, UTC day bucket)
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  private def dayOf(ts: Timestamp): String =
    ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  // -- 1. envelope parsing is TOTAL: any string parses or routes to dirty --

  test("parseMaxwell never throws and partitions every input into clean+dirty") {
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.alphaNumStr.map(s => s"{$s"),                       // broken brace
      Gen.alphaNumStr.map(s => s"""{"table":"$s"}"""),        // valid minimal
      Gen.const("""{"table":"t","data":{"id":"1"},"ts":5}"""),
      Gen.const("""{"table":"t","data":["not","a","map"]}"""), // schema clash
      Gen.const(""),
      Gen.listOfN(6, Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString))
    val inputs = sample(Gen.listOfN(300, junk), seed = 11L)
    val df = inputs.toDF("value")
    val parsed = Envelopes.parseMaxwell(df)
    val (clean, dirty) = Envelopes.cleanDirty(parsed)
    val (nc, nd) = (clean.count(), dirty.count())
    assert(nc + nd === inputs.length.toLong) // total: nothing lost, no throw
    // dirty rows keep the raw payload for replay (reference's side output)
    assert(dirty.where(col("_raw").isNull).count() === 0L)
  }

  test("parseLog never throws and partitions every input into clean+dirty") {
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.alphaNumStr.map(s => s"{$s"),
      Gen.const("""{"common":{"mid":"m1"},"page":{"page_id":"home"},"ts":5}"""),
      Gen.const("""{"common":"not-a-struct","ts":5}"""),   // schema clash
      Gen.const("""{"displays":{"not":"an array"},"ts":5}"""),
      Gen.const(""),
      Gen.listOfN(6, Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString))
    val inputs = sample(Gen.listOfN(300, junk), seed = 13L)
    val (clean, dirty) = Envelopes.cleanDirty(Envelopes.parseLog(inputs.toDF("value")))
    assert(clean.count() + dirty.count() === inputs.length.toLong)
    assert(dirty.where(col("_raw").isNull).count() === 0L)
  }

  // -- 2. daily dedup: one row per (user, day); idempotent under replay ----

  private val eventGen: Gen[StatefulOps.Event] = for {
    id <- Gen.choose(0L, 100000L)
    user <- Gen.choose(1L, 12L)
    day <- Gen.choose(0, 3)
    sec <- Gen.choose(0L, 86399L)
    tpe <- Gen.oneOf("view", "click", "purchase")
  } yield StatefulOps.Event(id, new Timestamp((day * 86400L + sec) * 1000L),
    user, tpe, 0.0, "{}")

  test("dedupDaily emits exactly one first-event per (user, day), idempotently") {
    val events = sample(Gen.listOfN(400, eventGen), seed = 23L)
      .distinctBy(_.event_id)
    val df = events.toDF()
    val out = EventOps.dedupDaily(df)
    val rows = out.select($"user_id", $"visit_date".cast("string"), $"first_ts")
      .as[(Long, String, Timestamp)].collect()
    // one row per (user, day), and it IS the min-ts event of that group
    val expected = events.groupBy(e => (e.user_id, dayOf(e.ts)))
      .map { case (_, es) => es.map(e => micros(e.ts)).min }
      .toSeq.sorted
    assert(rows.map(r => micros(r._3)).sorted.toSeq === expected)
    // idempotence: dedup of the dedup output (as events) changes nothing
    val again = EventOps.dedupDaily(
      out.select($"user_id", $"first_ts".as("ts")))
    assert(again.count() === out.count())
  }

  test("streaming dedupDaily covers the same (user, day) set under any batch split") {
    val events = sample(Gen.listOfN(300, eventGen), seed = 31L)
      .distinctBy(_.event_id)
    // adversarial split: hash-scrambled order, two arbitrary batches
    val scrambled = events.sortBy(e => e.event_id * 0x61C88647L)
    val (b1, b2) = scrambled.splitAt(scrambled.length / 3)
    val out = StreamHarness.run(spark, Seq(b1, b2))(StatefulOps.dedupDaily(_).toDF())
      .as[StatefulOps.Event].collect()
    val got = out.map(e => (e.user_id, dayOf(e.ts))).toSet
    val want = events.map(e => (e.user_id, dayOf(e.ts))).toSet
    assert(got === want)                  // every (user, day) exactly once
    assert(out.length === want.size)
    // every emitted row is a real input event
    val ids = events.map(_.event_id).toSet
    assert(out.forall(e => ids.contains(e.event_id)))
  }

  // -- 3. visitor repair: is_new never flips 0 -> 1 in event-time order ----

  test("visitorRepair is_new is monotonically non-increasing per user") {
    val events = sample(Gen.listOfN(400, eventGen), seed = 47L)
      .distinctBy(_.event_id)
    val out = EventOps.visitorRepair(events.toDF())
      .select($"user_id", $"ts", $"is_new").as[(Long, Timestamp, Int)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val flags = rows.sortBy(r => micros(r._2)).map(_._3)
      assert(!flags.sliding(2).exists(p => p.length == 2 && p(0) == 0 && p(1) == 1),
        s"is_new flipped 0->1: ${flags.toSeq}")
    }
    // and is_new=1 exactly on first-day events
    out.groupBy(_._1).foreach { case (_, rows) =>
      val firstDay = rows.map(r => dayOf(r._2)).min
      rows.foreach { r =>
        assert((r._3 == 1) === (dayOf(r._2) == firstDay))
      }
    }
  }

  // -- 4. jump detection == naive reference implementation -----------------

  /** Naive single-threaded CEP reference: per user in (ts, id) order, an
    * entry event is a bounce iff the next event is > horizon away (or
    * absent), or is itself an entry. */
  private def naiveJump(events: Seq[StatefulOps.Event], horizonSec: Long,
      isEntry: StatefulOps.Event => Boolean): Set[Long] =
    events.groupBy(_.user_id).values.flatMap { es =>
      val sorted = es.sortBy(e => (micros(e.ts), e.event_id)).toVector
      sorted.zipWithIndex.collect {
        case (e, i) if isEntry(e) &&
          (i == sorted.length - 1 ||
            micros(sorted(i + 1).ts) - micros(e.ts) > horizonSec * 1000000L ||
            isEntry(sorted(i + 1))) => e.event_id
      }
    }.toSet

  test("jumpDetect (batch lead form) equals the naive reference on random data") {
    // ts collisions ARE generated (coarse second grid) to stress tie-break
    val clustered = eventGen.map(e => e.copy(
      ts = new Timestamp((e.ts.getTime / 1000 / 7 * 7) * 1000L)))
    val events = sample(Gen.listOfN(400, clustered), seed = 59L)
      .distinctBy(_.event_id)
    val horizon = 30L
    val got = EventOps.jumpDetect(events.toDF(), col("event_type") === "view", horizon)
      .select($"event_id").as[Long].collect().toSet
    val want = naiveJump(events, horizon, _.event_type == "view")
    assert(got === want)
  }

  // -- 4b. substring dup profile == naive reference ------------------------

  /** Brute-force reference: enumerate windows on the TWO-PHASE grid
    * (offsets 0 and stride/2 per step — mirrors dupSpans), find cross-doc
    * duplicated window texts, merge offsets into islands (new island iff
    * off strictly past the running max end), report (n_spans, dup_chars)
    * per doc. */
  private def naiveSubstringProfile(docs: Seq[(Long, String)], w: Int, st: Int)
      : Map[Long, (Long, Long)] = {
    val half = math.max(1, st / 2)
    val wins = docs.flatMap { case (id, t) =>
      if (t.length < w) Seq.empty
      else ((0 to (t.length - w) by st) ++ (half to (t.length - w) by st))
        .distinct.sorted
        .map(off => (id, off, t.substring(off, off + w)))
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    wins.filter(x => dup(x._3)).groupBy(_._1).map { case (id, xs) =>
      var n = 0L; var covered = 0L; var curS = -1; var curE = -1
      xs.map(_._2).sorted.foreach { o =>
        if (curE < 0 || o > curE) {
          if (curE >= 0) covered += curE - curS
          n += 1; curS = o; curE = o + w
        } else curE = math.max(curE, o + w)
      }
      covered += curE - curS
      id -> (n, covered)
    }
  }

  test("substringDupProfile equals the naive reference on random spliced docs") {
    val rnd = new scala.util.Random(73)
    // a pool of shared snippets long enough to carry whole windows, spliced
    // into random filler at random (UNALIGNED) offsets — dup detection then
    // depends on which splices happen to agree mod stride/2 (the two-phase
    // grid), exactly the operator's documented recall condition, so the
    // reference must agree case by case, not just on "obvious" dups
    (0 until 8).foreach { round =>
      val pool = Vector.fill(3)(Vector.fill(30)(('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = (0L until 6L).map { id =>
        val parts = (0 until rnd.nextInt(5)).map { _ =>
          if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else Vector.fill(rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString
        }
        (id, parts.mkString)
      }
      val got = graft.operators.Dedup
        .substringDupProfile(docs.toDF("doc_id", "text"), window = 12, stride = 4)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = naiveSubstringProfile(docs, 12, 4)
      assert(got === want, s"round $round: docs=$docs")
    }
  }

  // -- 5. bounded-heap topN == naive sort-based reference ------------------

  test("topNPerWindow (bounded heap) equals the naive sort reference on random data") {
    // few keys + coarse hour grid → dense count ties, the hard case
    val events = sample(Gen.listOfN(500, eventGen), seed = 67L)
      .distinctBy(_.event_id)
    val got = EventOps.topNPerWindow(events.toDF(), "1 hour", $"user_id", 3)
      .select($"stt", $"item", $"ct", $"rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val want = events
      .groupBy(e => fmt.format(java.time.Instant
        .ofEpochMilli(e.ts.getTime / 3600000L * 3600000L)))
      .flatMap { case (stt, es) =>
        es.groupBy(_.user_id).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (item, ct) => (-ct, item) }
          .take(3).zipWithIndex
          .map { case ((item, ct), i) => (stt, item, ct, (i + 1).toLong) }
      }.toSet
    assert(got === want)
  }

  // -- 5b. asOfJoin == naive per-row scan, incl. duplicate (key, ts) -------

  test("asOfJoin equals the naive reference on random data with ts collisions") {
    val rowGen = for {
      key <- Gen.choose(1L, 8L)
      ts <- Gen.choose(0L, 40L) // dense grid → frequent (key, ts) duplicates
      v <- Gen.choose(0L, 999L)
    } yield (key, ts, v)
    val left = sample(Gen.listOfN(120, rowGen), seed = 83L).map(r => (r._1, r._2))
    val right = sample(Gen.listOfN(120, rowGen), seed = 89L)
    val got = graft.operators.Relational.asOfJoin(
        left.toDF("key", "ts"), right.toDF("key", "ts", "v"), "key", "ts", Seq("v"))
      .select($"key", $"ts", $"v").as[(Long, Long, Option[Long])]
      .collect().toSeq.sorted
    // naive: latest right at-or-before; ties on ts resolve to the GREATEST
    // payload (the operator's documented deterministic tiebreak)
    val want = left.map { case (k, lts) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= lts)
      val v = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2, r._3))._3)
      (k, lts, v)
    }.sorted
    assert(got === want)
  }

  // -- 6. DeltaStore == an in-memory map under random op sequences ---------

  test("DeltaStore replays a random upsert/delete/compact history like a Map") {
    import graft.streaming.DeltaStore
    val path = java.nio.file.Files.createTempDirectory("graft_prop_delta_").toString
    case class Op(epoch: Long, ups: Seq[(Long, String, Long)], dels: Seq[Long],
      compactAfter: Boolean)
    val opGen = for {
      nUp <- Gen.choose(0, 6)
      ups <- Gen.listOfN(nUp, for {
        k <- Gen.choose(0L, 15L); v <- Gen.alphaStr.map(_.take(4))
      } yield (k, v, 0L))
      nDel <- Gen.choose(0, 2)
      dels <- Gen.listOfN(nDel, Gen.choose(0L, 15L))
      c <- Gen.prob(0.3)
    } yield Op(0L, ups, dels, c)
    val ops = sample(Gen.listOfN(12, opGen), seed = 71L)
      .zipWithIndex.map { case (op, i) =>
        // unique ts per epoch so within-epoch last-writer is well-defined
        op.copy(epoch = i.toLong,
          ups = op.ups.zipWithIndex.map { case ((k, v, _), j) => (k, v, j.toLong) }
            .groupBy(_._1).values.map(_.maxBy(_._3)).toSeq)
      }
    val model = scala.collection.mutable.Map.empty[Long, (String, Long)]
    ops.foreach { op =>
      val delSet = op.dels.toSet -- op.ups.map(_._1) // in-epoch upsert wins
      DeltaStore.append(op.ups.toDF("k", "v", "ts"), Seq("k"), "ts", path,
        op.epoch, deleteKeys = Some(op.dels.toDF("k")))
      op.ups.foreach { case (k, v, ts) => model(k) = (v, ts) }
      delSet.foreach(model.remove)
      if (op.compactAfter && model.nonEmpty)
        DeltaStore.compact(spark, path, Seq("k"), "ts", nBuckets = 4)
      val got = DeltaStore.read(spark, path, Seq("k"), "ts")
        .select($"k", $"v", $"ts").as[(Long, String, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === model.toMap, s"after epoch ${op.epoch} (compact=${op.compactAfter})")
    }
  }

  // -- 9. paragraph dedup equals the naive first-occurrence reference ------

  test("paragraphDedup equals the naive reference on random repetitive corpora") {
    // small word alphabet + short docs → heavy cross-doc paragraph overlap
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = sample(Gen.listOfN(40, doc), seed = 23L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = 2
    // naive reference: explode, keep first (doc, pos) per distinct para
    val paras = texts.zipWithIndex.flatMap { case (t, i) =>
      t.split(" ").grouped(w).zipWithIndex.map { case (ws, p) =>
        (i.toLong, p.toLong, ws.mkString(" ")) }
    }
    val keep = paras.groupBy(_._3).map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
    val expect = paras.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.filter(keep).sortBy(_._2)
      (id, ps.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }
    val got = graft.operators.Dedup.paragraphDedup(docs, wordsPerPara = w)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    expect.foreach { case (id, np, nk, txt) =>
      assert(got(id) === ((id, np, nk, txt)), s"doc $id") }
    assert(got.size === texts.size)
  }

  // -- 8. chunkByTokens equals the naive clamped-tail windowing ----------

  test("chunkByTokens equals the naive reference for random lengths and strides") {
    val lens = sample(Gen.listOfN(60, Gen.choose(0, 130)), 4242L)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    def naive(n: Int, cs: Int, st: Int): Seq[(Long, Long)] = {
      val k = math.max(0, (n - cs + st - 1) / st)
      (0 to k).map { i =>
        val s = math.min(i.toLong * st, math.max(0, n - cs).toLong)
        (s, math.min(cs.toLong, n - s))
      }
    }
    Seq((32, 24), (8, 8), (5, 3)).foreach { case (cs, st) =>
      val got = graft.operators.Corpus
        .chunkByTokens(docs, chunkSize = cs, stride = st)
        .select($"doc_id", $"start_tok", $"n_tok_chunk")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq).toMap
      lens.zipWithIndex.foreach { case (n, i) =>
        val exp = naive(n, cs, st)
        assert(got(i.toLong) === exp, s"doc $i n=$n cs=$cs st=$st")
        // invariant: the windows cover [0, n) with no gap (tail clamps)
        if (n > 0) assert(exp.map(c => c._1 + c._2).max === n.toLong)
      }
    }
  }
}
