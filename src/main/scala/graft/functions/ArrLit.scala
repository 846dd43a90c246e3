package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Constant array<double> literal as ONE Catalyst `Literal` (a converted
  * ArrayData the generated code references by object handle), replacing the
  * `array(values.map(lit): _*)` idiom whose `CreateArray` re-materializes
  * the array element by element PER ROW in generated code. With k trained
  * centers × 64 dims + 128 LSH planes in one projection, the element-wise
  * form grew `processNext()` past the JVM's 64 KB method limit, whole-stage
  * codegen bailed, and the stage ran interpreted (measured 9-16 s per
  * banded-LSH query at sf0.1, r8). The values are the identical doubles, so
  * every [[DotProduct]]/[[SqDiffSum]] fold — and every pinned-literal DuckDB
  * oracle — is bit-unchanged. */
object ArrLit {
  def darr(values: Array[Double]): Column =
    ColumnBridge.column(Literal.create(values, ArrayType(DoubleType)))
}
