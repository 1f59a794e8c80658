package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built on native
  * higher-order functions (`zip_with` / `aggregate`) so the arithmetic is
  * whole-stage-codegen'd and needs no UDF. All accumulation is in double
  * precision regardless of the (float) storage type — deterministic and
  * matching DuckDB's list_* double semantics.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** cosine(a, b) in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash) LSH bucket id for a vector: the sign
    * pattern of `planes.length` fixed pseudo-random hyperplanes packed
    * into a long. Deterministic: hyperplane components are derived from
    * xorshift on (planeIdx, dim) — same family as published SimHash-LSH.
    * Vectors in the same bucket are near-duplicate candidates; compare
    * buckets, not all pairs → O(n·B) not O(n²) at 100 TB.
    */
  def hyperplaneBucket(v: Column, dim: Int, nPlanes: Int): Column = {
    // plane(p, d) = deterministic pseudo-random in [-1, 1)
    def comp(p: Int, d: Int): Double = {
      var x = (p.toLong * 1125899906842597L) ^ (d.toLong * 2654435761L) ^ 0x9e3779b97f4a7c15L
      x ^= (x << 13); x ^= (x >>> 7); x ^= (x << 17)
      (x.toDouble / Long.MaxValue.toDouble)
    }
    val bits: Seq[Column] = (0 until nPlanes).map { p =>
      val planeDot = (0 until dim).map { d =>
        element_at(v, d + 1).cast("double") * lit(comp(p, d))
      }.reduce(_ + _)
      when(planeDot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
