package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators for training-data pipelines: deterministic
  * sampling (data mixing) and sequence packing. Both are pure declarative
  * plans — no RNG, no driver loops — so corpus builds are REPRODUCIBLE
  * (the same inputs always yield the same corpus, resumable after
  * failure) and oracle-checkable.
  */
object Corpus {

  /** Deterministic stratified sampling — the "mixture weights" step of a
    * corpus build: keep a row iff md5(id) mod 10⁶ < fraction(stratum)·10⁶.
    * Hash-gated, not RNG-gated: membership is a pure function of the row
    * id, stable across runs, engines, partitionings, and retries. One
    * narrow filter pushed at the scan — no shuffle, any scale. */
  def stratifiedSample(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    // thresholds become exact LONG literals driver-side: a runtime
    // `(frac * 1e6).cast(long)` would TRUNCATE (e.g. 0.7 → 699999) while
    // engines that round (DuckDB CAST) say 700000 — the plan must carry
    // one unambiguous integer per stratum
    def ppm(f: Double): Long = math.round(f * 1000000L)
    val threshold = fractions.foldLeft(lit(ppm(defaultFraction))) {
      case (acc, (stratum, f)) => when(stratumCol === stratum, lit(ppm(f))).otherwise(acc)
    }
    df.where(Dedup.md5Long(idCol.cast("string")) % 1000000L < threshold)
  }

  /** Per-source curation profile — the domain-level filtering step of a
    * training-data pipeline (the keep/downsample/blocklist decision is
    * made per source/domain before any per-doc scoring): doc and token
    * volumes, language spread, and the intra-source exact-duplicate
    * volume (docs sharing a normalized md5 fingerprint with another doc
    * of the SAME source — a high rate flags mirror/boilerplate domains).
    *
    * Scale: one (source, fingerprint) shuffle with map-side combine,
    * then source grain; the final join is aggregate-to-aggregate on the
    * source key. No doc×doc work, no global sort.
    */
  def sourceProfile(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val t = docs.select(col(sourceCol), col(langCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"))
    val dupVolume = t.groupBy(col(sourceCol), col("fp"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(sourceCol))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_exact_dup"))
    t.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"))
      .join(dupVolume, Seq(sourceCol))
  }

  /** Cross-source duplication matrix — the curation diagnostic behind
    * mixture weights and dedup priorities ("how much of source B is
    * already in source A?"): for every source pair (a ≤ b), the number
    * of distinct content fingerprints present in BOTH, plus the Jaccard
    * of the two fingerprint sets. Diagonal rows (a = b) carry each
    * source's distinct-content count (Jaccard 1).
    *
    * Scale: the pair space rides the fingerprint equi-join over the
    * DISTINCT (source, fp) grain — each fp contributes at most
    * #sources² pair rows (sources are a small constant), never doc×doc;
    * one fp-keyed shuffle plus a sources²-row aggregate out. */
  def crossSourceOverlap(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val fps = docs.select(col(sourceCol).as("src"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"))
      .distinct()
    val sizes = fps.groupBy(col("src")).agg(count(lit(1)).as("n"))
    fps.select(col("src").as("src_a"), col("fp"))
      .join(fps.select(col("src").as("src_b"), col("fp")), "fp")
      .where(col("src_a") <= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared")) // (src, fp) rows are distinct
      .join(sizes.select(col("src").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
  }

  /** Greedy contiguous sequence packing — assign documents to fixed-token
    * bins for training-batch assembly: per stratum, in id order, a doc
    * starts in the bin its cumulative-token offset falls in
    * (`bin = ⌊(cumsum − tokens) / capacity⌋`). The window is PER STRATUM
    * (language, source, shard), so packing parallelizes across strata
    * instead of one global sort — at 100 TB the stratum column is the
    * shard key and each shard packs independently.
    *
    * BOUND: each stratum's cumulative sum is one task (the price of
    * contiguity). Size strata so one stratum's rows fit a task — at
    * corpus scale that means sub-shard ids (`source/part-N`) as the
    * stratum, not whole sources. */
  def packSequences(
      docs: DataFrame,
      capacity: Int,
      stratumCol: Column,
      idCol: Column,
      tokenCountCol: Column): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
    docs
      .withColumn("_tok", tokenCountCol.cast("long"))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .withColumn("bin", floor((col("_cum") - col("_tok")) / lit(capacity.toDouble)))
      .drop("_cum")
      .withColumnRenamed("_tok", "n_tokens")
  }

  /** Mixture interleave — the training-ORDER schedule that follows the
    * mixture-weights sample: per stratum in id order, a doc's schedule
    * position is `rank / weight`, so a weight-3 stream appears three
    * times as densely as a weight-1 stream in the merged order (the
    * standard temperature/weight interleave of multi-source training
    * runs). Deterministic — a pure function of (id order, weights).
    *
    * Emits the position KEY, not a global index: consumers sort by
    * (mix_pos, stratum, id), a range-partitioned sort — never a
    * single-task global row_number. Per-stratum ranking parallelizes
    * across strata; the packSequences stratum-size bound applies. */
  def mixtureInterleave(
      docs: DataFrame,
      stratumCol: Column,
      idCol: Column,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      "mixture weights must be positive")
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
    val weight = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, wt)) => when(stratumCol === s, lit(wt)).otherwise(acc)
    }
    docs
      .withColumn("_rank", row_number().over(w))
      .withColumn("mix_pos", round(col("_rank").cast("double") / weight, 6))
      .drop("_rank")
  }
}
