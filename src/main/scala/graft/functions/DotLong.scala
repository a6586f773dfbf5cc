package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact int64 dot product of two
  * `array<bigint>` columns — the hot loop of every similarity query
  * (quantized cosine: dot and both norms, since `norm² = dot(q, q)`).
  *
  * The composed built-in form it replaces,
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)`,
  * materializes an intermediate array and evaluates two higher-order
  * lambdas per row; this is one fused loop with zero allocation,
  * inlined into whole-stage codegen via [[doGenCode]].
  *
  * Semantics are bit-identical to that composition (the equivalence is
  * property-tested in FunctionsSpec and implicitly re-proven by every
  * DuckDB oracle run, whose twin stays `list_sum(list_transform(...))`):
  * integer addition is associative, a NULL element anywhere poisons
  * the sum to NULL (`acc + null` in the aggregate), and mismatched
  * lengths yield NULL (`zip_with` pads the shorter side with nulls).
  * Non-`array<bigint>` inputs are rejected at analysis time — the SQL
  * registry path ([[GraftExtensions]]) hands this expression arbitrary
  * user arguments, and a silent element-width mismatch would read
  * garbage instead of failing.
  */
final case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var i = 0
      var acc = 0L
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
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
