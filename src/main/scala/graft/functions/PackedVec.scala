package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** SHUFFLE-WIDTH representation for quantized vectors: `array<bigint>`
  * serializes at ~9 bytes/element through an exchange, but the
  * quantized components are `floor(x·4096)` of unit-bounded floats —
  * they fit int16 with room to spare. Packing to 2-byte little-endian
  * before a vector column enters a shuffle cuts that exchange's bytes
  * ~4.5×; the NN-Descent build's scoring joins (candidate rows carry
  * a vector past the broadcast threshold) are the measured case.
  *
  * The packing is REPRESENTATION ONLY: [[DotPackedS16]] over packed
  * bytes computes the identical int64 sum [[DotLong]] computes over
  * the long arrays (property-pinned in FunctionsSpec), so no oracle
  * twin changes — DuckDB keeps scoring the long lists. Out-of-range
  * components fail [[PackS16]] LOUDLY at pack time: a silent wrap
  * would corrupt every distance downstream.
  */
final case class PackS16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_s16"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      if (v < Short.MinValue || v > Short.MaxValue)
        throw new IllegalArgumentException(
          s"pack_s16: component $v out of int16 range — refusing to wrap")
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n * 2];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $v = $a.getLong($i);
         |  if ($v < Short.MIN_VALUE || $v > Short.MAX_VALUE)
         |    throw new IllegalArgumentException(
         |      "pack_s16: component " + $v + " out of int16 range");
         |  $out[2 * $i] = (byte) ($v & 0xff);
         |  $out[2 * $i + 1] = (byte) (($v >> 8) & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PackS16 = copy(child = newChild)
}

object PackS16 {
  def apply(a: Column): Column =
    bridge.toColumn(PackS16(bridge.toExpression(a)))
}

/** Exact int64 dot product over two [[PackS16]]-packed vectors — the
  * same integers [[DotLong]] sums, one fused loop over the packed
  * bytes, inlined into whole-stage codegen.
  */
final case class DotPackedS16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_packed_s16"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null
    else {
      var i = 0
      var acc = 0L
      while (i < x.length) {
        val xv = ((x(i) & 0xff) | (x(i + 1) << 8)).toShort.toLong
        val yv = ((y(i) & 0xff) | (y(i + 1) << 8)).toShort.toLong
        acc += xv * yv
        i += 2
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |long $acc = 0L;
         |if ($a.length != $b.length) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $a.length; $i += 2) {
         |    long $xv = (short) (($a[$i] & 0xff) | ($a[$i + 1] << 8));
         |    long $yv = (short) (($b[$i] & 0xff) | ($b[$i + 1] << 8));
         |    $acc += $xv * $yv;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotPackedS16 =
    copy(left = newLeft, right = newRight)
}

object DotPackedS16 {
  def apply(a: Column, b: Column): Column =
    bridge.toColumn(
      DotPackedS16(bridge.toExpression(a), bridge.toExpression(b)))
}
