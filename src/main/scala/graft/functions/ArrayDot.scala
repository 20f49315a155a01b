package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns → double.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are CodegenFallback — each row allocates lambda variables and walks an
  * interpreter, which is why the brute-force ANN scan spends more time in
  * expression evaluation than arithmetic. This expression generates a
  * primitive loop (`getFloat`/`getDouble` straight off the columnar
  * ArrayData), keeping the scan inside whole-stage codegen.
  *
  * Semantics: Σ aᵢ·bᵢ over the common prefix (min length), each element
  * widened to double BEFORE multiplying — the same strict left-to-right
  * fold as the `zip_with`/`aggregate` formulation and the DuckDB oracle's
  * grouped sum, so swapping it in cannot change a result hash. Null
  * arrays → null; null elements contribute 0.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"array_dot expects array<float>/array<double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column API: codegen'd Σ aᵢ·bᵢ. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
