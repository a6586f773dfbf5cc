package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the exact int64 dot product of two
  * `array<bigint>` columns — the hot loop of every similarity query
  * (quantized cosine: dot and both norms, since `norm² = dot(q, q)`).
  *
  * The composed built-in form it replaces,
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)`,
  * materializes an intermediate array and evaluates two higher-order
  * lambdas per row; this is one fused loop with zero allocation,
  * inlined into whole-stage codegen via [[doGenCode]]. Integer
  * addition is associative, so the value is bit-identical to the
  * composed form (the equivalence is property-tested in FunctionsSpec
  * and implicitly re-proven by every DuckDB oracle run, whose twin
  * stays `list_sum(list_transform(...))`).
  *
  * Inputs are expected non-null-elemented equal-length arrays (all
  * quantized-embedding pipelines guarantee this); length mismatch
  * truncates to the shorter, mirroring `zip_with`'s non-padding
  * prefix.
  */
final case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLong = copy(left = newLeft, right = newRight)
}

object DotLong {

  /** Column wrapper. Both sides must already be `array<bigint>`. */
  def apply(a: Column, b: Column): Column =
    bridge.toColumn(DotLong(bridge.toExpression(a), bridge.toExpression(b)))

  /** The composed built-in form (kept for the equivalence property
    * test; also the shape the DuckDB oracle mirrors).
    */
  def composed(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  }
}
