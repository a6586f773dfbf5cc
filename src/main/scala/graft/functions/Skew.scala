package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling for joins whose hot keys overwhelm single reducers.
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled` is on in GraftSession);
  * salting is the explicit fallback when the skew is known and
  * extreme (one key >> everything else):
  *
  *  - the LARGE side gets a pseudo-random salt in [0, n) per row, so a
  *    hot key spreads over n reducers;
  *  - the SMALL side replicates each row n times (one per salt);
  *  - joining on (key, salt) is then equivalent to joining on key.
  *
  * The salt is xxhash64 of the whole large-side row — deterministic
  * (replayable runs, no rand()), uniform enough, and free of the
  * "same salt for the same key" failure a hash-of-key would have.
  */
object Skew {

  /** Equi-join `large ⨝ small` on `key`, salted `n` ways. Only join
    * types that never null-pad the REPLICATED side are allowed: a
    * right/full outer join would emit one null-padded row per replica
    * (n duplicates) for each unmatched small-side row.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      n: Int, joinType: String = "inner"): DataFrame = {
    require(n > 0)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not preserve '$joinType' semantics " +
        "(the replicated side would null-pad n times)")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
