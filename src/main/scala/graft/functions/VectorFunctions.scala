package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge

/** Vector math over `array<float>` embedding columns, backed by the native
  * codegen'd Catalyst expressions in [[VectorExpressions]] (tight primitive
  * loops inside whole-stage codegen — the interpreted `zip_with`/`aggregate`
  * higher-order form costs ~6 µs per 64-dim pair; the loop is ~100×
  * cheaper). Accumulation is in double precision with left-fold order from
  * 0.0 — bit-identical to the HOF form and to DuckDB's `list_reduce`
  * oracle formulation.
  */
object VectorFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(col)

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    c(VectorExpressions.DotProductF(e(a), e(b)))

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    c(VectorExpressions.L2NormF(e(a)))

  /** cosine(a, b) in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** plane(p, d) = deterministic pseudo-random in [-1, 1) — the hyperplane
    * matrix for [[hyperplaneBucket]] (xorshift on (planeIdx, dim), same
    * family as published SimHash-LSH). */
  def planeComp(p: Int, d: Int): Double = {
    var x = (p.toLong * 1125899906842597L) ^ (d.toLong * 2654435761L) ^ 0x9e3779b97f4a7c15L
    x ^= (x << 13); x ^= (x >>> 7); x ^= (x << 17)
    x.toDouble / Long.MaxValue.toDouble
  }

  /** Random-hyperplane (SimHash) LSH bucket id for a vector: the sign
    * pattern of `nPlanes` fixed pseudo-random hyperplanes packed into a
    * long. Vectors in the same bucket are near-duplicate candidates;
    * compare buckets, not all pairs → O(n·B) not O(n²) at 100 TB.
    */
  def hyperplaneBucket(v: Column, dim: Int, nPlanes: Int): Column =
    c(VectorExpressions.HyperplaneBucketF(e(v), dim, nPlanes))
}
