package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS — the pre-training contract check
  * every production pipeline runs on a new data drop (the
  * great-expectations/dbt-test pattern): each expectation is declared as
  * data, evaluated exactly, and reported as one audit row
  * `(expectation, n_checked, n_violations, pass)`.
  *
  * Violation semantics are pinned (and mirrored by the oracle):
  *  - [[NotNull]]: a NULL value violates.
  *  - [[UniqueKey]]: every row beyond the first per key tuple violates
  *    (violations = rows − distinct NON-NULL key tuples; a row with a
  *    NULL key component can't prove uniqueness, so it violates too).
  *  - [[InRange]]: a value outside `[lo, hi]` OR NULL violates (a null
  *    can't prove it's in range).
  *  - [[InSet]]: a value outside the enum OR NULL violates.
  *  - [[RefIntegrity]]: a row whose key has no match in the dimension
  *    violates (NULL keys violate — they reference nothing).
  *
  * Scale: every expectation is one aggregate over the scan (NotNull /
  * InRange / InSet fold into ONE shared pass), UniqueKey is one
  * distinct-aggregate, and RefIntegrity is a left join against the
  * distinct dimension keys (broadcast when it fits). The report is
  * O(#expectations) rows; nothing row-grain leaves the executors.
  */
object Expectations {

  sealed trait Expectation { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(c: String) extends Expectation {
    val name = s"not_null_$c"
  }
  /** The column tuple must be unique across rows. */
  final case class UniqueKey(cols: Seq[String]) extends Expectation {
    val name = s"unique_${cols.mkString("_")}"
  }
  /** Values must lie in `[lo, hi]`; NULL violates. */
  final case class InRange(c: String, lo: Double, hi: Double) extends Expectation {
    val name = s"range_$c"
  }
  /** Values must be one of `values`; NULL violates. */
  final case class InSet(c: String, values: Seq[String]) extends Expectation {
    val name = s"in_set_$c"
  }
  /** Every `c` must exist as `dimKey` in `dim` (FK check); NULL violates. */
  final case class RefIntegrity(c: String, dim: DataFrame, dimKey: String)
      extends Expectation {
    val name = s"ref_${c}"
  }

  /** Evaluate all expectations. Every scalar expectation (NotNull /
    * UniqueKey / InRange / InSet) folds into ONE aggregate pass over the
    * corpus — a naive one-agg-per-expectation union would re-scan once
    * per check; the 1-row result is materialized and fanned out into
    * audit rows for free. Each RefIntegrity is its own (single
    * key-column) scan + left join against the distinct dim keys. */
  def check(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "no expectations declared")
    // agg output columns are named by e.name; two expectations with the
    // same derived name (e.g. two InRange on one column with different
    // bounds) would collide in the shared aggregate and col(e.name)
    // resolves ambiguously — fail loudly at declaration instead
    require(exps.map(_.name).distinct.size == exps.size,
      s"duplicate expectation names: ${exps.map(_.name).diff(exps.map(_.name).distinct).distinct.mkString(", ")}")
    def violations(e: Expectation): Column = e match {
      case NotNull(c) => count(when(col(c).isNull, 1))
      case UniqueKey(cs) => count(lit(1)) - countDistinct(cs.head, cs.tail: _*)
      case InRange(c, lo, hi) =>
        count(when(col(c).isNull || col(c) < lo || col(c) > hi, 1))
      case InSet(c, vs) =>
        count(when(col(c).isNull || !col(c).isin(vs.map(lit(_)): _*), 1))
      case _: RefIntegrity => throw new IllegalStateException("unreachable")
    }
    val (refs, simple) = exps.partition(_.isInstanceOf[RefIntegrity])
    val simpleRows: Seq[DataFrame] =
      if (simple.isEmpty) Nil
      else {
        val one = df.agg(count(lit(1)).cast("long").as("_n"),
            simple.map(e => violations(e).cast("long").as(e.name)): _*)
          .localCheckpoint(true) // one row; every audit row reads it free
        simple.map(e => one.select(lit(e.name).as("expectation"),
          col("_n").as("n_checked"), col(e.name).as("n_violations"),
          (col(e.name) === 0L).as("pass")))
      }
    val refRows = refs.map { case e @ RefIntegrity(c, dim, k) =>
      val hits = dim.select(col(k).as("_refkey")).distinct()
        .withColumn("_hit", lit(1))
      df.select(col(c).as("_fk"))
        .join(hits, col("_fk") === col("_refkey"), "left")
        .agg(count(lit(1)).cast("long").as("n_checked"),
          count(when(col("_hit").isNull, 1)).cast("long").as("n_violations"))
        .select(lit(e.name).as("expectation"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0L).as("pass"))
    }
    (simpleRows ++ refRows).reduce(_ unionByName _)
  }
}
