package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §7.2:
  * "a native Catalyst `Expression` (with `doGenCode`) beats a Scala UDF").
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`) is
  * interpreted per element in Spark — measured ~6 µs per 64-dim cosine pair
  * on the all-pairs join. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead, preserving the exact left-fold
  * accumulation order (acc starts at 0.0, adds products in index order) so
  * results stay bit-identical to the HOF form and to the DuckDB oracle.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over two float arrays, accumulated in double. */
  case class DotProductF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** ‖a‖₂ of a float array, accumulated in double. */
  case class L2NormF(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2norm_f"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $a.numElements();
           |double ${v}acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  final double $v = (double) $a.getFloat($i);
           |  ${v}acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt(${v}acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH bucket: sign bits of `nPlanes` fixed
    * pseudo-random hyperplanes packed into a long. Plane components come
    * from [[VectorFunctions.planeComp]]; the flattened plane matrix rides
    * into generated code as a referenced object — one multiply-add per
    * (plane, dim) instead of a 768-node expression tree. */
  case class HyperplaneBucketF(child: Expression, dim: Int, nPlanes: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_bucket"

    @transient private lazy val planes: Array[Double] =
      Array.tabulate(nPlanes * dim)(k => VectorFunctions.planeComp(k / dim, k % dim))

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(dim, x.numElements())
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        var d = 0
        while (d < n) { s += x.getFloat(d).toDouble * planes(p * dim + d); d += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val p = ctx.freshName("p")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val n = ctx.freshName("n")
        s"""
           |final int $n = java.lang.Math.min($dim, $a.numElements());
           |${ev.value} = 0L;
           |for (int $p = 0; $p < $nPlanes; $p++) {
           |  double $s = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += (double) $a.getFloat($d) * $planesRef[$p * $dim + $d];
           |  }
           |  if ($s >= 0) ${ev.value} |= (1L << $p);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
