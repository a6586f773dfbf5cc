package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing.
  *
  * The driver checks every query against a DuckDB oracle, so any hash
  * used in a checked query must produce bit-identical values in both
  * engines. Engine-native hashes (Spark `hash`/`xxhash64`, DuckDB
  * `hash`) differ, but MD5 is MD5 everywhere: both engines emit the
  * same lowercase hex for the same UTF-8 bytes. We take the first 14
  * hex digits (56 bits — always fits an int64) as the integer hash.
  *
  * Spark side: `conv(substr(md5(x),1,14),16,10)::long`.
  * DuckDB side: `CAST('0x' || substr(md5(x),1,14) AS BIGINT)`.
  *
  * Derived hash families use modular arithmetic in a 31-bit prime
  * field so every product stays < 2^62 (no 64-bit overflow in either
  * engine): h_i(x) = (a_i * (x mod P) + b_i) mod P.
  */
object CrossHash {

  /** 2^31 - 1, prime. Field for derived hash families. */
  val P: Long = 2147483647L

  /** 56-bit integer hash of a string column, identical in DuckDB.
    * Backed by the native codegen'd [[Md5Long56]] expression; the
    * composed built-in form it replaced (and the DuckDB oracle still
    * uses, proving equivalence every verify run) is
    * `conv(substr(md5(x),1,14),16,10)::long`.
    */
  def md5Long(c: Column): Column = Md5Long56(c)

  /** The built-in composition (kept for the equivalence property test). */
  def md5LongComposed(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 14), 16, 10).cast("long")

  /** DuckDB twin of [[md5Long]]. `x` is a SQL expression string. */
  def sqlMd5Long(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 14) AS BIGINT)"

  /** i-th universal hash over the P field, from a base 56-bit hash.
    * Coefficients are fixed odd constants so both engines agree.
    */
  def affine(h: Column, i: Int): Column =
    ((lit(coefA(i)) * (h % P) + coefB(i)) % P)

  def sqlAffine(h: String, i: Int): String =
    s"((${coefA(i)} * (($h) % $P) + ${coefB(i)}) % $P)"

  /** Deterministic per-family coefficients in [1, P). Any fixed
    * pseudo-random scheme works as long as both emitters share it.
    * MixA/MixB are the single source of truth — SQL emitters that need
    * the formula symbolically (coefficient index as a SQL variable)
    * build it from these same constants.
    */
  val MixA: Long = 2654435761L
  val MixB: Long = 40503L
  def coefA(i: Int): Long = (MixA * (i + 1) + 1) % P
  def coefB(i: Int): Long = (MixB * (i + 1) * (i + 1) + 7) % P

  /** DuckDB twins of coefA/coefB with the index as a SQL expression. */
  def sqlCoefA(i: String): String = s"((${MixA} * (($i) + 1) + 1) % $P)"
  def sqlCoefB(i: String): String =
    s"((${MixB} * (($i) + 1) * (($i) + 1) + 7) % $P)"
}
