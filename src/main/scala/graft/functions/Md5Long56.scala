package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 56-bit md5 hash
  * ([[CrossHash.md5Long]] semantics): the first 7 digest bytes as a
  * big-endian long — bit-identical to
  * `conv(substr(md5(x),1,14),16,10)::long` (14 hex chars = 7 bytes)
  * and to the DuckDB oracle's `CAST('0x'||substr(md5(x),1,14) AS
  * BIGINT)`.
  *
  * Why a custom expression when the composition exists: md5Long is the
  * hot scalar of the dedup/text pipeline (one call per shingle/token —
  * millions per partition at scale), and the composed form pays for a
  * 32-char hex UTF8String, a substring copy, and a string→long radix
  * parse per call. This one goes digest-bytes → long with a
  * thread-local MessageDigest and zero intermediate allocation, and
  * participates in whole-stage codegen via [[doGenCode]] (a direct
  * static call — no interpreted fallback in the generated code).
  */
final case class Md5Long56(child: Expression) extends UnaryExpression {

  // input typing is handled at the Column wrapper (explicit cast to
  // string) instead of ExpectsInputTypes — its signature types are
  // private[sql] in Spark 4
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long56"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long56.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long56.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long56 =
    copy(child = newChild)
}

object Md5Long56 {

  private val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 7 md5 digest bytes, big-endian (56 bits, non-negative). */
  def hash(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
  }

  /** Column wrapper (classic API); the cast pins the input type. */
  def apply(c: Column): Column =
    bridge.toColumn(Md5Long56(bridge.toExpression(c.cast("string"))))
}
