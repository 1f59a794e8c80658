package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the documents pipeline — the four standard
  * levels of a training-data dedup stack, each designed scale-first:
  *
  *  - exact:        one hash-shuffle on md5(normalized text); map-side combine.
  *  - minhash+LSH:  shingle → minhash signature → band buckets → self-join on
  *                  bucket. Candidate generation is O(n·bands), never O(n²).
  *  - simhash:      64-bit signature per doc via bitwise majority vote of
  *                  token hashes; near-dups = small hamming distance within
  *                  prefix buckets.
  *  - n-gram Jaccard: exact verification on LSH candidates (inverted-index
  *                  join at small scale; at 100 TB run it only on minhash
  *                  candidates — see [[jaccardVerify]]).
  *
  * All hash arithmetic is built from md5 (stable across engines → DuckDB
  * oracle-checkable) composed with affine permutations mod a Mersenne prime —
  * the textbook public MinHash construction (Broder 1997).
  */
object Dedup {

  /** First 15 hex chars of md5 → non-negative long. `conv` is a native
    * codegen'd expression; 60 bits of the digest is plenty for hashing. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------- exact --

  /** Exact dedup: group by content hash, keep the smallest id as keeper.
    * One shuffle, partial aggregation on the map side. Emits one row per
    * distinct content with the keeper id and duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------- minhash --

  val MersennePrime = 2305843009213693951L // 2^61 - 1

  /** Affine permutation of a base hash: (a·h + b) mod p, computed in
    * multiplicative pieces that stay within long range for h < 2^60. */
  private def perm(h: Column, i: Int): Column = {
    // deterministic per-perm coefficients (split-mix style)
    def mix(x0: Long): Long = {
      var x = x0 * 0x9e3779b97f4a7c15L
      x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
      x ^= (x >>> 27); x *= 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val a = (mix(2L * i + 1).abs % (MersennePrime - 1)) + 1
    val b = mix(2L * i + 2).abs % MersennePrime
    // (a*h+b) mod p without overflow: use Spark decimal for the product.
    ((h.cast("decimal(38,0)") * lit(a) + lit(b)) % lit(MersennePrime)).cast("long")
  }

  /** MinHash signatures: one row per doc, `sig` = array of numPerms minima
    * over the doc's shingle hashes. Implemented as numPerms `min()`
    * aggregates over the exploded shingle set → a single shuffle with
    * map-side partial mins (no per-doc collect, no UDAF).
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerms: Int = 32): DataFrame = {
    val sh = docs.select(
      col(idCol),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("sh"))
    val h = sh.withColumn("h", md5Long(col("sh")))
    val minCols = (0 until numPerms).map(i => min(perm(col("h"), i)).as(s"m$i"))
    h.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split each signature into `bands` bands of
    * numPerms/bands rows; docs sharing any band hash become candidates.
    * Self-join is on (band, bandHash) — the classic O(n) candidate
    * generator. Emits distinct candidate pairs (a < b).
    *
    * Skew note: a degenerate band (e.g. all-empty docs) can create a hot
    * bucket; cap bucket size upstream or salt if observed at scale.
    */
  def lshCandidates(sigs: DataFrame, idCol: String = "doc_id", bands: Int = 8): DataFrame = {
    val banded = sigs.select(
      col(idCol),
      posexplode(expr(s"transform(sequence(0, $bands - 1), " +
        s"b -> concat_ws(',', slice(sig, b * (size(sig) div $bands) + 1, size(sig) div $bands)))"))
        .as(Seq("band", "bandkey")))
    val l = banded.select(col(idCol).as("a"), col("band"), col("bandkey"))
    val r = banded.select(col(idCol).as("b"), col("band"), col("bandkey"))
    l.join(r, Seq("band", "bandkey"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  // -------------------------------------------------------- n-gram Jaccard --

  /** Exact n-gram Jaccard similarity for ALL pairs sharing ≥1 shingle,
    * via inverted-index self-join: explode distinct shingles, join on the
    * shingle, count common, |A∪B| = |A|+|B|−common.
    *
    * At 100 TB this exact form is the *verifier* behind minhash candidates
    * ([[jaccardVerify]]); standalone it is still O(pairs-sharing-a-shingle),
    * far below O(n²) on natural text. Very frequent shingles should be
    * stop-listed at scale (TODO knob: maxDocFreq).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val joined = sh.select(col("id").as("a"), col("sh"))
      .join(sh.select(col("id").as("b"), col("sh")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    joined
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("jaccard",
        round(col("common").cast("double")
          / (col("sza") + col("szb") - col("common")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** The scale path: minhash-LSH candidates → exact Jaccard verification of
    * only those pairs. Cost = O(n) signatures + O(candidates) verification. */
  def jaccardVerify(
      docs: DataFrame,
      candidates: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("shs"))
    candidates
      .join(sets.select(col("id").as("a"), col("shs").as("sha")), Seq("a"))
      .join(sets.select(col("id").as("b"), col("shs").as("shb")), Seq("b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("common").cast("double")
          / (size(col("sha")) + size(col("shb")) - col("common")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash --

  /** 64-bit SimHash per document: every distinct token contributes its
    * 60-bit md5 hash; each output bit is the majority vote across tokens.
    * Implemented as 64 conditional sums in ONE aggregation (map-side
    * combine) — no per-doc state, scales linearly.
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bits: Int = 60): DataFrame = {
    val tok = docs.select(
      col(idCol),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h", md5Long(col("tok")))
    val votes: Seq[Column] = (0 until bits).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"v$b")
    }
    tok.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(
        col(idCol),
        (0 until bits).map { b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  /** Near-dup pairs by SimHash: bucket on the top `prefixBits` bits (docs
    * differing only in low bits still collide via multiple rotations at
    * scale; here one prefix table), then verify hamming distance ≤ maxDist
    * with bit_count(xor). */
  def simhashNearDups(
      sigs: DataFrame,
      idCol: String = "doc_id",
      prefixBits: Int = 16,
      maxDist: Int = 8): DataFrame = {
    val b = sigs.withColumn("bucket", shiftright(col("simhash"), 60 - prefixBits))
    val l = b.select(col(idCol).as("a"), col("bucket"), col("simhash").as("sa"))
    val r = b.select(col(idCol).as("b"), col("bucket"), col("simhash").as("sb"))
    l.join(r, Seq("bucket"))
      .where(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .where(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }
}
