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
  * (SURVEY.md §7.2: no custom Rule/SparkStrategy is NEEDED for any reference
  * operator — Catalyst's built-ins cover them — so the extension surface is
  * function registration plus ONE semantics-preserving optimizer rule,
  * [[ThresholdLevenshteinRule]], that stages unbounded edit-distance
  * filters the way the engine's own dedup operators stage them by hand.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ThresholdLevenshteinRule)
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
    // composed-expression registration: the Z-order (Morton) key is a tree
    // of BUILT-IN catalyst integer ops — no new Expression class, full
    // whole-stage codegen. (Composing via the public Column API and
    // unwrapping does NOT work here: a FunctionBuilder must return a
    // resolvable expression tree, and Spark 4 Column nodes carry
    // UnresolvedFunction wrappers the analyzer never visits from inside
    // one.) Mirrors graft.operators.Layout.zvalue bit for bit — asserted
    // in ExtensionsSpec.
    ext.injectFunction((
      new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(graft.operators.Layout.getClass.getName, "zorder_key"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zorder_key expects two bigint arguments")
        import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd,
          BitwiseOr, Literal, ShiftLeft, ShiftRight}
        val one = Literal(1L)
        (0 until 16).map { b =>
          BitwiseOr(
            ShiftLeft(BitwiseAnd(ShiftRight(args.head, Literal(b)), one),
              Literal(2 * b)),
            ShiftLeft(BitwiseAnd(ShiftRight(args(1), Literal(b)), one),
              Literal(2 * b + 1))): Expression
        }.reduce(BitwiseOr(_, _))
      }))
  }
}
