package graft.analytics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ManifestV2Sink

/** Generic session-scoped published tables — the build-once/read-many
  * seam behind every nightly-artifact query family ([[NearDupArtifact]]
  * is the near-dup instance; the exact PPJoin pair table and the
  * trained BPE vocabulary ride this directly). A table is built at
  * most once per (JVM, dataset dir, name), published through the
  * graft-manifest sink (transactional commit, snapshot history), and
  * read back by every consumer; [[rebuild]] is the gated build-job
  * path — recompute + republish every call, so the building query's
  * benched cost stays the honest nightly cost and its oracle re-proves
  * the sink round-trip.
  *
  * Correctness never leans on the cache: every consumer keeps its own
  * full-recompute DuckDB oracle, so a stale or wrong artifact diverges
  * each consumer's hash. Fresh JVMs get fresh paths (jvmTag), so a
  * previous run's artifact can never be read against different data.
  */
object SessionArtifact {

  private val slots = new ConcurrentHashMap[String, String]()
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  private def pathOf(spark: SparkSession, dir: String,
      name: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    // scheme-less path: the warehouse conf qualifies to file:/..., which
    // the sink's java.nio side would treat as a relative "file:" dir
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_art_${jvmTag}_${key}_$name").toUri.getPath
  }

  /** Read the session table, building + publishing via `build` on
    * first demand per (JVM, dataset, name). `build` must return a
    * frame that is safe to write when the thunk returns (primitive
    * columns; any caches it holds released by the caller after
    * materialization, or pre-materialized with localCheckpoint).
    */
  def table(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    ManifestV2Sink.readCommitted(spark,
      slots.computeIfAbsent(s"$dir#$name", { _ =>
        val p = pathOf(spark, dir, name)
        build.write.format("graft-manifest").mode("overwrite").save(p)
        p
      }))

  /** The gated build job: recompute, republish (overwrite commit —
    * repeat builds just add snapshots to the same manifest log), and
    * replace the session slot so consumers ride the newest publish.
    */
  def rebuild(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val p = pathOf(spark, dir, name)
    build.write.format("graft-manifest").mode("overwrite").save(p)
    slots.put(s"$dir#$name", p)
    ManifestV2Sink.readCommitted(spark, p)
  }
}
