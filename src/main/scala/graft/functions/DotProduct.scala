package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The built-in way to write a dot product — `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` — is a higher-order function: Catalyst evaluates it INTERPRETED
  * (no whole-stage codegen), with a lambda-variable box/unbox per element.
  * On n·d-shaped workloads (ANN scoring, IVF assignment) that interpretation
  * dominates the runtime, which is exactly the case SURVEY.md §7.2 reserves
  * for a custom `Expression` with `doGenCode`: the generated loop below stays
  * inside whole-stage codegen, reads the unsafe array data directly, and
  * accumulates in the same strict left-to-right order as the higher-order
  * fold and the DuckDB `list_sum(list_transform(list_zip(...)))` twin — so
  * results remain bit-identical across all three implementations.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are cast to array<double> at every call site (Similarity.cosine
  // operates on emb columns already cast at the source boundary)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API surface: dot(a, b). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
