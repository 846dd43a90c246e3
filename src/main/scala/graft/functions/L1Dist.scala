package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Σ|aᵢ − bᵢ| over two array<bigint> columns — the
  * char-histogram L1 lower bound on the edit-distance verify path
  * ([[graft.operators.Dedup.editDistancePairs]] stage 1: one edit moves
  * at most 2 units of character mass, so lev ≥ L1/2 and candidates with
  * L1 > 2·maxDist never pay the DP).
  *
  * Why it exists (r10): the `aggregate(zip_with(ha, hb, abs), 0, +)`
  * column form is a higher-order-function pair — interpreted lambda per
  * element, outside whole-stage codegen — sitting on the per-CANDIDATE
  * prefilter path, exactly the [[PosEqCount]]/[[SqDiffSum]] situation
  * one round earlier. One compact generated loop per pair instead.
  *
  * Bit-equality contract: an integer sum of integer absolute differences
  * has no rounding or ordering freedom, so the swap is exact. Unequal
  * lengths fold the common prefix (the call sites only ever compare
  * equal-length 64-lane histograms). */
case class L1Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "l1_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.abs(x.getLong(i) - y.getLong(i))
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
         |  $s += java.lang.Math.abs($a.getLong($i) - $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1Dist =
    copy(left = newLeft, right = newRight)
}

object L1Dist {
  /** Column-API surface: Σ|aᵢ − bᵢ| as bigint. */
  def l1Dist(a: Column, b: Column): Column =
    ColumnBridge.column(
      L1Dist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
