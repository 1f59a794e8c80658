package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{FuzzyIngest, SemIngest}

/** The round-7 scale contract for the ingest twins' state stores: a
  * micro-batch's I/O must be O(batch + touched groups), never O(corpus)
  * — a tiny later batch may rewrite only the hash buckets its keys land
  * in, with every other bucket's files left byte-identical on disk.
  * Plus the loud-failure contracts: a feed starting mid-chain (missing
  * store at epoch > 0) aborts, and an epoch-0 replay regenerates the
  * centroid store rather than trusting a possibly-partial dir. */
class IngestStoreSpec extends SparkTestBase {
  import spark.implicits._

  /** Every data file under `root`, as (relative path, length, mtime) —
    * the identity a rename-aside bucket swap preserves for untouched
    * buckets and necessarily changes for rewritten ones. */
  private def fileState(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val base = new java.io.File(root)
    walk(base)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath.stripPrefix(base.getAbsolutePath),
        (f.length(), f.lastModified())))
      .toMap
  }

  /** Bucket dir (`.../_bucket=N`) of a store file path. */
  private def bucketOf(rel: String): String =
    rel.split('/').takeWhile(!_.startsWith("part-")).mkString("/")

  // 10 unique words per text → zero shingle overlap → no fuzzy groups
  private def uniqueText(i: Int): String =
    (0 until 10).map(w => s"t${i}w$w").mkString(" ")

  test("a one-text batch rewrites only its own buckets (fuzzy store)") {
    val root = Files.createTempDirectory("graft_fuzzy_incr_").toString
    try {
      val big = (0 until 120).map(i => ((i + 1) * 100000L, uniqueText(i)))
      FuzzyIngest.processBatch(big.toDF("enc", "para"), root, 0L, nBuckets = 16)
      val before = fileState(root)
      val textsBuckets = before.keys.filter(_.startsWith("/texts"))
        .map(bucketOf).toSet
      assert(textsBuckets.size >= 12,
        s"expected 120 keys to spread over most of 16 buckets, got $textsBuckets")
      FuzzyIngest.processBatch(Seq((99900000L, uniqueText(999))).toDF("enc", "para"),
        root, 1L, nBuckets = 16)
      val after = fileState(root)
      val changed = (after.keySet ++ before.keySet)
        .filter(k => before.get(k) != after.get(k))
      val changedTexts = changed.filter(_.startsWith("/texts")).map(bucketOf)
      val changedBands = changed.filter(_.startsWith("/bands")).map(bucketOf)
      // one new pid → exactly 1 texts bucket; its 8 (pid, band) keys hash
      // into ≤ 8 bands buckets. Everything else must be byte-identical.
      assert(changedTexts.size <= 1,
        s"one new text must touch ≤ 1 texts bucket, touched: $changedTexts")
      assert(changedBands.size <= 8,
        s"8 band keys must touch ≤ 8 bands buckets, touched: $changedBands")
      val untouched = before.keySet.filter(k =>
        k.startsWith("/texts") && !changedTexts.contains(bucketOf(k)))
      assert(untouched.nonEmpty && untouched.forall(k => before(k) == after(k)),
        "untouched texts buckets must be byte-identical (no O(corpus) rewrite)")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }

  test("a one-vector batch rewrites only its own bucket (sem store)") {
    val root = Files.createTempDirectory("graft_sem_incr_").toString
    def vec(i: Int): Array[Float] = {
      // well-spread unit-ish vectors, pairwise cosine far below threshold
      val a = new Array[Float](8); a(i % 8) = 1f; a((i + 3) % 8) = (i % 5) * 0.01f; a
    }
    try {
      val big = (0 until 120).map(i => (i + 1L, vec(i), i))
      SemIngest.processBatch(big.toDF("vec_id", "embedding", "label"),
        root, 0L, nCells = 4, threshold = 0.999, nBuckets = 16)
      val before = fileState(root)
      SemIngest.processBatch(Seq((999L, vec(1), 999)).toDF("vec_id", "embedding", "label"),
        root, 1L, nCells = 4, threshold = 0.999, nBuckets = 16)
      val after = fileState(root)
      val changed = (after.keySet ++ before.keySet)
        .filter(k => before.get(k) != after.get(k))
        .filter(_.startsWith("/texts")).map(bucketOf)
      assert(changed.size <= 1,
        s"one new vector must touch ≤ 1 texts bucket, touched: $changed")
      val untouched = before.keySet.filter(k =>
        k.startsWith("/texts") && !changed.contains(bucketOf(k)))
      assert(untouched.nonEmpty && untouched.forall(k => before(k) == after(k)),
        "untouched buckets must be byte-identical (no O(corpus) rewrite)")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }

  test("a missing store at epoch > 0 fails loudly in both twins") {
    val root = Files.createTempDirectory("graft_ingest_chain_").toString
    try {
      val fz = intercept[IllegalArgumentException] {
        FuzzyIngest.processBatch(Seq((100000L, uniqueText(1))).toDF("enc", "para"),
          root + "/f", 3L)
      }
      assert(fz.getMessage.contains("broken snapshot chain"))
      val sm = intercept[IllegalArgumentException] {
        SemIngest.processBatch(
          Seq((1L, Array(1f, 0f), 1)).toDF("vec_id", "embedding", "label"),
          root + "/s", 3L)
      }
      assert(sm.getMessage.contains("broken snapshot chain"))
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }

  test("an epoch-0 replay regenerates centroids over a partial cents dir") {
    val root = Files.createTempDirectory("graft_sem_cents_").toString
    try {
      // simulate a crash mid-write of cents/: a dir exists with garbage
      // centroids (e.g. from a half-committed job) — the epoch-0 replay
      // must overwrite it, not trust it
      Seq((77L, Array(0f, 1f), 0)).toDF("cell", "ce", "x")
        .select(col("cell"), col("ce"),
          lit(1.0).as("cn2"))
        .write.mode("overwrite").parquet(s"$root/cents")
      SemIngest.processBatch(
        Seq((1L, Array(1f, 0f), 10), (2L, Array(0f, 1f), 20))
          .toDF("vec_id", "embedding", "label"),
        root, 0L, nCells = 2, threshold = 0.6)
      val cells = spark.read.parquet(s"$root/cents")
        .select(col("cell")).as[Long].collect().toSet
      assert(cells === Set(1L, 2L),
        "epoch-0 must regenerate cents from the replayed batch's lowest ids")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }

  private def readMeta(path: String): Int =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_NBUCKETS"))).trim.toInt

  test("the bucketed store doubles its bucket count as it grows (amortized resize)") {
    val root = Files.createTempDirectory("graft_resize_").toString
    val path = s"$root/store"
    // INCOMPRESSIBLE payloads (seeded random alphanumerics) — a constant
    // pad RLE-compresses to nothing and the size probe never fires
    def pay(i: Int) = new scala.util.Random(i).alphanumeric.take(400).mkString
    def rows(r: Range) = r.map(i => (s"k$i", s"v$i${pay(i)}", i.toLong)).toDF("k", "v", "_ver")
    // target 12 KB: ~123 KB of payload lands at 4 buckets ≈ 31 KB avg →
    // one resize to 16 (≈ 8 KB avg), comfortably BELOW target afterwards
    // so later small upserts don't creep into further resizes
    try {
      // creation: no resize on the create path — layout is the seed count
      graft.streaming.Sinks.upsertByKeyPartitioned(
        rows(0 until 300), Seq("k"), "_ver", path, nBuckets = 4,
        targetBucketBytes = 12L << 10)
      assert(readMeta(path) === 4)
      // first MERGE: avg bucket ≫ 12 KB → the store re-hashes itself
      graft.streaming.Sinks.upsertByKeyPartitioned(
        rows(300 until 302), Seq("k"), "_ver", path, nBuckets = 4,
        targetBucketBytes = 12L << 10)
      val grown = readMeta(path)
      assert(grown > 4 && (grown & (grown - 1)) == 0,
        s"bucket count must have doubled past 4, got $grown")
      // layout matches the meta: every row sits in pmod(hash(k), grown)
      val store = spark.read.parquet(path)
      assert(store.where(col("_bucket") =!=
        pmod(hash(col("k")), lit(grown))).isEmpty,
        "post-resize rows must be bucketed by the NEW count")
      assert(store.count() === 302)
      // a later writer still passing the stale seed count must follow the
      // STORE's count (meta wins) — and keep rewrites touched-bucket-grain
      val before = fileState(path)
      graft.streaming.Sinks.upsertByKeyPartitioned(
        rows(0 until 1), Seq("k"), "_ver", path, nBuckets = 4,
        targetBucketBytes = 12L << 10)
      assert(readMeta(path) === grown, "a stale caller count must not shrink the store")
      val after = fileState(path)
      val changed = (after.keySet ++ before.keySet)
        .filter(k => before.get(k) != after.get(k)).map(bucketOf)
      assert(changed.size <= 1,
        s"one key must touch ≤ 1 of the $grown buckets, touched: $changed")
      val out = spark.read.parquet(path).where(col("k") === "k0")
        .select(col("v")).as[String].collect()
      assert(out.toSeq === Seq(s"v0${pay(0)}"))
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
    }
  }

  test("resize-crash recovery: every crash window leaves a store the next call restores") {
    val root = Files.createTempDirectory("graft_resize_crash_").toString
    def rows(r: Range) = r.map(i => (s"k$i", s"v$i", i.toLong)).toDF("k", "v", "_ver")
    def mv(a: String, b: String): Unit = {
      assert(new java.io.File(a).renameTo(new java.io.File(b)), s"rename $a -> $b")
      ()
    }
    def contents(path: String): Set[String] =
      spark.read.parquet(path).select(col("k")).as[String].collect().toSet

    // window 1: crash BETWEEN set-aside and publish — the set-aside at
    // `_retired` is the only copy; the next call must restore it
    val p1 = s"$root/s1"
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(0 until 20), Seq("k"), "_ver", p1, 4)
    mv(p1, p1 + "_retired") // dst gone, retired holds the full store
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(20 until 21), Seq("k"), "_ver", p1, 4)
    assert(contents(p1) === (0 until 21).map(i => s"k$i").toSet,
      "recovery must restore the set-aside store, then apply the batch")
    assert(!new java.io.File(p1 + "_retired").exists())

    // window 2: crash AFTER publish, before the retired copy's delete —
    // both dirs exist; the published store wins, the stale copy is dropped
    val p2 = s"$root/s2"
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(0 until 20), Seq("k"), "_ver", p2, 4)
    val stale = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(p2 + "_retired/_bucket=0"))
    assert(stale.toFile.isDirectory)
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(20 until 21), Seq("k"), "_ver", p2, 4)
    assert(contents(p2) === (0 until 21).map(i => s"k$i").toSet)
    assert(!new java.io.File(p2 + "_retired").exists(),
      "a completed swap's stale retired copy must be dropped")

    // window 3: crash mid-build of `_resize` — the half-built rehash is
    // never the only copy and must simply be discarded
    val p3 = s"$root/s3"
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(0 until 20), Seq("k"), "_ver", p3, 4)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(p3 + "_resize/_bucket=0"))
    graft.streaming.Sinks.upsertByKeyPartitioned(rows(20 until 21), Seq("k"), "_ver", p3, 4)
    assert(contents(p3) === (0 until 21).map(i => s"k$i").toSet)
    assert(!new java.io.File(p3 + "_resize").exists(),
      "a half-built resize must be discarded at the next call")

    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root)); ()
  }
}
