package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BoundedCollectList, DotProduct}

/** SparkSessionExtensions hook: registers the engine's native expressions for
  * the SQL surface, so `spark.sql("SELECT dot_product(a, b)")` plans the
  * codegen'd [[graft.functions.DotProduct]] — the standard deployment path is
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (SURVEY.md §7.2: no custom Rule/SparkStrategy is needed for any reference
  * operator — Catalyst's built-ins cover them — so the extension surface is
  * intentionally just function registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product expects two array<double> arguments")
        DotProduct(args.head, args(1))
      }))
    // aggregate-function registration: the bounded posting-list collect
    // (maxLen must be a foldable int literal, like any SQL agg parameter)
    ext.injectFunction((
      new FunctionIdentifier("bounded_collect_list"),
      new ExpressionInfo(classOf[BoundedCollectList].getName, "bounded_collect_list"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bounded_collect_list expects (long column, int literal maxLen)")
        val maxLen = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bounded_collect_list maxLen must be an int literal, got $other")
        }
        BoundedCollectList(args.head, maxLen)
      }))
  }
}
