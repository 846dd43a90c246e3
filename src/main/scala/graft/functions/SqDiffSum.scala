package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst Σ(aᵢ−bᵢ)² over two array<double> columns — the squared
  * euclidean distance kernel of k-means assignment and k-center radius.
  *
  * Why it exists (r6): the unrolled column form — a 64-term
  * `element_at`-minus-literal chain per center, 16 centers per row — grows
  * the generated method past the JVM's 64 KB limit, so whole-stage codegen
  * bails and the ENTIRE stage (including the downstream aggregate) runs
  * interpreted; the measured cost was ~19 CPU-seconds per trained-IVF
  * query at sf0.1. This loop is the [[DotProduct]] treatment of the same
  * fold: one compact generated loop per (vector, center) pair, inside
  * whole-stage codegen.
  *
  * Bit-equality contract: the accumulation is the same strict
  * left-to-right order as the unrolled chain it replaces
  * (`((d₁²+d₂²)+d₃²)+…` — starting the loop at `s = 0.0` is exact because
  * squared diffs are never −0.0) and as the DuckDB
  * `list_sum(list_transform(list_zip(a,b), z -> (z[1]-z[2])*(z[1]-z[2])))`
  * twin, so every pinned-center and k-means oracle hash is unchanged.
  */
case class SqDiffSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_diff_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDiffSum =
    copy(left = newLeft, right = newRight)
}

object SqDiffSum {
  /** Column-API surface: Σ(aᵢ−bᵢ)². */
  def sqDiffSum(a: Column, b: Column): Column =
    ColumnBridge.column(
      SqDiffSum(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
