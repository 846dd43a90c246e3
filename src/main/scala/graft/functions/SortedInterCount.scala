package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst |a ∩ b| over two ASCENDING-SORTED array<bigint>
  * columns — the shingle-set intersection count on every near-dup verify
  * path ([[graft.operators.Dedup]]'s MinHash-LSH, prefix-Jaccard and
  * incremental-dedup verifies).
  *
  * Why it exists (r9): the `size(array_intersect(hs_a, hs_b))` form
  * routes through Spark's `SQLOpenHashSet` — per candidate PAIR it
  * allocates a hash set, inserts one side, rehashes it several times as
  * it grows (jstack sampling during the bench showed
  * `OpenHashSet.rehash` as the dominant executor frame), probes the
  * other side, then materializes the intersection ARRAY only for `size`
  * to count it and throw it away. The verify step is O(pairs · |doc|)
  * at 100 TB — the exact place an allocation-per-pair pattern hurts.
  * [[graft.operators.Dedup.docSignatures]] already owns the per-doc
  * shingle sets, so it emits them SORTED (one Arrays.sort per doc,
  * amortized over every pair the doc appears in) and this expression
  * counts the overlap with a zero-allocation two-pointer merge inside
  * whole-stage codegen.
  *
  * Bit-equality contract, in two layers. (1) ENGINE-internal,
  * unconditional: the kernel adjacent-dedups the sorted 60-bit hashes,
  * so the inputs are strictly increasing distinct-element sets and the
  * merge count equals `size(array_intersect(...))` exactly — even two
  * distinct in-doc shingles colliding under h60 cannot leave a
  * duplicated value in `hs`. (2) ENGINE↔ORACLE: the DuckDB twins count
  * distinct shingle STRINGS (string-keyed sz/inter CTEs), so oracle
  * equality remains conditional on no in-doc h60 collision
  * (~|doc|²/2⁶¹ per doc — under a collision the engine's hash-set
  * cardinalities read one lower than the oracle's string counts). That
  * condition predates this expression; every hash-keyed gate in the
  * repo carries it.
  * SORTED INPUT IS A PRECONDITION, not detected at runtime: an unsorted
  * input undercounts. Both columns must come from the kernel's `hs` —
  * and the type contract is enforced at analysis time
  * (checkInputDataTypes: array<bigint> both sides), so a mistyped column
  * fails the analyzer instead of reading garbage through
  * ArrayData.getLong. */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def prettyName: String = "sorted_inter_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { s += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $s++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  /** Column-API surface: |a ∩ b| as bigint over sorted distinct arrays. */
  def sortedInterCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedInterCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
