package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB — the two standard declarative
  * techniques, kept semantically transparent (identical results to the
  * naive form, oracle-checkable):
  *
  *  - [[saltedAggregate]]: two-phase aggregation. A single hot group key
  *    (e.g. one power user with 10^9 events, a null join key, the empty
  *    document) funnels all its rows through ONE reducer in a plain
  *    groupBy. Salting splits each group into `saltBuckets` sub-groups
  *    (partial agg), then re-aggregates the per-salt partials — the hot
  *    key's work spreads over `saltBuckets` reducers while every other
  *    key pays one extra tiny shuffle row.
  *  - [[saltedBroadcastableJoin]]: replicate-small/salt-big equi-join.
  *    The big side gets a deterministic salt from its *non-key* identity;
  *    the small side is exploded `saltBuckets`× so every (key, salt)
  *    bucket still finds its match. Shuffle partitions then split a hot
  *    join key `saltBuckets` ways.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers the
  * sort-merge case automatically; these helpers cover aggregations and
  * joins where the skew is known ahead of time (AQE only splits
  * post-shuffle partitions, not a single monster key inside one reducer
  * for aggregation).
  */
object Skew {

  /** Two-phase (salted) aggregation: `aggs` must be algebraic pairs —
    * each entry provides the partial expression and how to merge partials.
    * For the common cases use [[saltedSumCount]]-style helpers or pass
    * (partial, merge) column pairs directly.
    *
    * @param partials per-salt aggregate columns (aliased)
    * @param merges   final re-aggregation over the partial column names
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[Column],
      partials: Seq[Column],
      merges: Seq[Column],
      saltBuckets: Int = 16,
      saltFrom: Column = spark_partition_id()): DataFrame = {
    // deterministic salt: spreads rows of the same key across buckets
    // without an RNG (reproducible plans, no nondeterminism for AQE)
    val salted = df.withColumn("_salt", pmod(hash(saltFrom, monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy((keys :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** sum+count salted aggregate — enough for sum/count/avg rollups.
    * Emits `sum_<name>` and `cnt` columns identical to a direct groupBy. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[Column],
      valueCol: Column,
      saltBuckets: Int = 16): DataFrame =
    saltedAggregate(
      df, keys,
      partials = Seq(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt")),
      merges = Seq(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("cnt")),
      saltBuckets = saltBuckets)

  /** Salt-big / replicate-small inner equi-join on `key`. Result is
    * row-identical to `big.join(small, key)`; the hot key's probe work is
    * split `saltBuckets` ways. Small side grows `saltBuckets`× — keep it
    * broadcast-sized per bucket. */
  def saltedBroadcastableJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
