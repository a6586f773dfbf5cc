package graft.analytics

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.DatasetFingerprint
import graft.sources.ManifestV2Sink

/** Generic session-scoped published tables — the build-once/read-many
  * seam behind every nightly-artifact query family ([[NearDupArtifact]]
  * is the near-dup instance; the exact PPJoin pair table, the trained
  * BPE vocabulary, the NND graph index, and the ANN eval ground truths
  * ride this directly). A table is built at most once per
  * (code, dataset, name) — the root is CONTENT-ADDRESSED by
  * [[DatasetFingerprint]], so a fresh JVM on unchanged data and code
  * REUSES the previously published manifest (the production nightly
  * semantics: an artifact survives restarts), while any data or code
  * change moves the root and forces a rebuild. Publishes go through
  * the graft-manifest sink (transactional commit, snapshot history);
  * [[rebuild]] is the gated build-job path — recompute + republish
  * every call, so the building query's benched cost stays the honest
  * nightly cost and its oracle re-proves the sink round-trip.
  *
  * Correctness never leans on the cache: every consumer keeps its own
  * full-recompute DuckDB oracle, so a stale or wrong artifact diverges
  * each consumer's hash.
  *
  * Concurrency: slots hold FUTURES, so the map's bin lock is never
  * held across a multi-job Spark build — a concurrent first reader
  * parks on the winner's future instead of blocking the whole map bin
  * (and a failed build clears its slot so the next caller retries).
  * CROSS-PROCESS: content-addressing steers two JVMs with identical
  * code+data onto the SAME root, where the in-process slots cannot
  * help; both may race `hasCommitted` false and build. That wastes
  * one build but can no longer tear the table — manifest commits
  * serialize through the sink's cross-process head lock
  * ([[ManifestV2Sink.withHeadLock]]), each overwrite publishes a
  * COMPLETE file list, and identical code+data make the two builds'
  * contents equivalent, so whichever commit lands last is a full,
  * correct artifact.
  */
object SessionArtifact {

  private val slots = new ConcurrentHashMap[String, CompletableFuture[String]]()

  private def pathOf(spark: SparkSession, dir: String,
      name: String): String =
    // scheme-less path: the warehouse conf qualifies to file:/..., which
    // the sink's java.nio side would treat as a relative "file:" dir
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_art_${DatasetFingerprint.codeTag}_" +
        s"${DatasetFingerprint.of(dir)}_$name").toUri.getPath

  /** TEST HOOK: forget the in-session slots, simulating a fresh JVM.
    * The on-disk manifests survive — which is exactly what the
    * cross-session reuse specs exercise.
    */
  private[graft] def resetSlotsForTest(): Unit = slots.clear()

  /** Read the session table, building + publishing via `build` on
    * first demand per (code, dataset, name) — or REUSING a manifest a
    * previous session already published at the same content-addressed
    * root (same data, same code ⇒ same artifact, by construction).
    * `build` must return a frame that is safe to write when the thunk
    * returns (primitive columns; any caches it holds released by the
    * caller after materialization, or pre-materialized with
    * localCheckpoint).
    */
  def table(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    ManifestV2Sink.readCommitted(spark, resolve(spark, dir, name)(build))

  private def resolve(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): String = {
    // the slot key IS the content-addressed path: the fingerprint is
    // recomputed on every resolve, so an IN-SESSION data (or code)
    // change moves the key and the next rider sees a fresh slot —
    // never a stale root cached under the dataset dir alone
    val p = pathOf(spark, dir, name)
    val fut = new CompletableFuture[String]()
    val prev = slots.putIfAbsent(p, fut)
    if (prev != null) joinUnwrapped(prev)
    else
      try {
        if (!ManifestV2Sink.hasCommitted(p))
          build.write.format("graft-manifest").mode("overwrite").save(p)
        fut.complete(p)
        p
      } catch {
        case t: Throwable =>
          slots.remove(p, fut)
          fut.completeExceptionally(t)
          throw t
      }
  }

  /** join() wraps a failed build in CompletionException for every
    * WAITER — unwrap so all threads observe the builder's original
    * exception type, as the pre-future code did.
    */
  private def joinUnwrapped[A](f: CompletableFuture[A]): A =
    try f.join()
    catch {
      case e: java.util.concurrent.CompletionException =>
        throw Option(e.getCause).getOrElse(e)
    }

  /** The gated build job: recompute, republish (overwrite commit —
    * repeat builds just add snapshots to the same manifest log), and
    * replace the session slot so consumers ride the newest publish.
    * Never reuses — this is what keeps the build query's benched cost
    * the honest nightly cost.
    */
  def rebuild(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val p = pathOf(spark, dir, name)
    build.write.format("graft-manifest").mode("overwrite").save(p)
    slots.put(p, CompletableFuture.completedFuture(p))
    ManifestV2Sink.readCommitted(spark, p)
  }
}
