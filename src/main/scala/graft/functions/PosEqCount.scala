package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Σ[aᵢ = bᵢ] over two array<bigint> columns — the
  * position-agreement count of the MinHash Jaccard estimator
  * ([[graft.operators.Dedup.minhashEstimates]]).
  *
  * Why it exists (r9, VERDICT r8 #5): the
  * `aggregate(zip_with(a, b, (x,y) -> if(x=y,1,0)), 0, +)` column form is
  * a higher-order function pair — Catalyst evaluates HOFs with an
  * interpreted lambda per element, outside whole-stage codegen, on
  * exactly the O(h)-per-candidate verification path the operator's doc
  * sells as the 100 TB verify. This is the [[SqDiffSum]] treatment: one
  * compact generated loop per signature pair, inside whole-stage codegen.
  *
  * Bit-equality contract: an integer count over positional equality has
  * no rounding or ordering freedom at all — any summation order equals
  * the strict left-to-right one, so the DuckDB twin
  * (`list_sum(list_transform(list_zip(a,b), z -> if(z[1]=z[2],1,0)))`)
  * and the `q_minhash_est` hash gate carry over unchanged. */
case class PosEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pos_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) s += 1L
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $s++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PosEqCount =
    copy(left = newLeft, right = newRight)
}

object PosEqCount {
  /** Column-API surface: Σ[aᵢ = bᵢ] as bigint. */
  def posEqCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      PosEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
