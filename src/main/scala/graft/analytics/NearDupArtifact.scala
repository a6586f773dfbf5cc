package graft.analytics

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DatasetFingerprint
import graft.sources.ManifestV2Sink

/** Session-scoped PERSISTED near-dup artifact: the simhash pair graph,
  * its connected-component labels, and the base-corpus fixpoint,
  * published once through the graft-manifest sink and read back by
  * every consumer — the production shape of a dedup pipeline, where
  * the pair graph and the canonical label table are NIGHTLY-JOB
  * outputs that downstream queries (apply, weighting, split audits,
  * graph analytics) read as tables, not per-query derivations.
  *
  * [[DedupQueries.dedupClustersPersisted]] is the build job: it always
  * recomputes and republishes (paying the honest build cost every run,
  * and re-proving the parquet→manifest round-trip against the shared
  * recursive-CTE oracle). Consumers call [[pairs]]/[[labels]]/
  * [[baseLabels]], which resolve lazily per (code, dataset dir) —
  * reusing a root a previous session published when data and code are
  * unchanged ([[DatasetFingerprint]]), building otherwise — and then
  * only read. Correctness of the riding consumers is NOT assumed:
  * every one of them keeps its own full-recompute DuckDB oracle, so a
  * wrong or stale artifact diverges every consumer's hash.
  *
  * Tables (all primitive long columns — the sink's contract):
  *  - `pairs(doc_a, doc_b, hamming)` — exactly
  *    [[DedupQueries.simhashPairsFrame]] over `documents`;
  *  - `labels(doc_id, cluster_id, cluster_size)` — connected
  *    components incl. singletons, the [[DedupQueries.dedupClusters]]
  *    output (computed by star contraction — O(log² n) rounds,
  *    diameter-independent);
  *  - `base_labels(v, label)` — the fixpoint over edges wholly inside
  *    the base corpus ([[DedupQueries.isDeltaDoc]] complement): "last
  *    night's" labels, the warm seed
  *    [[DedupQueries.dedupClustersIncremental]] folds the delta into.
  *
  * Scale shape: the build is the already-priced banded pair join plus
  * one contraction; each table is keyed by 8-byte ids (text never
  * persists). At 100 TB the same three tables land in the lake and the
  * amortization argument is identical — consumers' cost drops from
  * O(corpus re-derivation) to O(artifact read).
  */
object NearDupArtifact {

  final case class Artifact(pairs: String, labels: String,
      baseLabels: String)

  // keyed by dataset dir; one artifact per (code, dataset). The root
  // is CONTENT-ADDRESSED ([[DatasetFingerprint]]): a fresh JVM on
  // unchanged data and code REUSES last night's published tables —
  // the production semantics — while any data or code change moves
  // the root, so a stale artifact can never be read against different
  // data or a different derivation. Slots hold futures so the map's
  // bin lock is never held across the multi-job Spark build.
  private val builtTables =
    new ConcurrentHashMap[String, CompletableFuture[Artifact]]()

  /** TEST HOOK: forget in-session slots (simulates a fresh JVM; the
    * on-disk manifests survive — the point of the reuse specs).
    */
  private[graft] def resetSlotsForTest(): Unit = builtTables.clear()

  private def rootOf(spark: SparkSession, dir: String): String =
    // scheme-less path: the warehouse conf qualifies to file:/..., which
    // the sink's java.nio side would treat as a relative "file:" dir
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_neardup_${DatasetFingerprint.codeTag}_" +
        DatasetFingerprint.of(dir)).toUri.getPath

  private def artifactAt(root: String): Artifact =
    Artifact(s"$root/pairs", s"$root/labels", s"$root/base_labels")

  /** Build (or rebuild) and publish all three tables at the artifact
    * root for `dir`. Overwrite commits: repeat builds just add
    * snapshots to the same manifest log.
    */
  private def buildAt(spark: SparkSession, dir: String): Artifact = {
    val a = artifactAt(rootOf(spark, dir))
    val docs = QueryUtil.table(spark, dir, "documents")
    val pairs = DedupQueries.simhashPairsFrame(docs).localCheckpoint(true)
    pairs.write.format("graft-manifest").mode("overwrite").save(a.pairs)
    DedupQueries.clustersFromPairs(docs, pairs)
      .write.format("graft-manifest").mode("overwrite").save(a.labels)
    val basePairs = pairs.where(!DedupQueries.isDeltaDoc(col("doc_a")) &&
      !DedupQueries.isDeltaDoc(col("doc_b")))
    val baseEdges = basePairs.select(col("doc_a"), col("doc_b"))
      .union(basePairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint(true)
    DedupQueries
      .propagateLabels(baseEdges, DedupQueries.identityLabels(baseEdges))
      .write.format("graft-manifest").mode("overwrite").save(a.baseLabels)
    a
  }

  /** The nightly build, paid in full — used by the build-job query so
    * its benched cost IS the build cost. Replaces the session slot, so
    * consumers ride the newest publish.
    */
  def rebuild(spark: SparkSession, dir: String): Artifact = {
    val a = buildAt(spark, dir)
    builtTables.put(dir, CompletableFuture.completedFuture(a))
    a
  }

  private def ensure(spark: SparkSession, dir: String): Artifact = {
    val fut = new CompletableFuture[Artifact]()
    val prev = builtTables.putIfAbsent(dir, fut)
    if (prev != null) prev.join()
    else
      try {
        val a = artifactAt(rootOf(spark, dir))
        // content-addressed reuse: all three tables committed at the
        // same (code, data) root ⇒ same artifact — read, don't rebuild
        val committed = Seq(a.pairs, a.labels, a.baseLabels)
          .forall(ManifestV2Sink.hasCommitted)
        val art = if (committed) a else buildAt(spark, dir)
        fut.complete(art)
        art
      } catch {
        case t: Throwable =>
          builtTables.remove(dir, fut)
          fut.completeExceptionally(t)
          throw t
      }
  }

  /** `(doc_a, doc_b, hamming)` — the banded simhash near-dup pairs. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    ManifestV2Sink.readCommitted(spark, ensure(spark, dir).pairs)

  /** `(doc_id, cluster_id, cluster_size)` — components incl.
    * singletons, label = component-minimum doc_id.
    */
  def labels(spark: SparkSession, dir: String): DataFrame =
    ManifestV2Sink.readCommitted(spark, ensure(spark, dir).labels)

  /** `(v, label)` — the base-corpus fixpoint (warm seed). */
  def baseLabels(spark: SparkSession, dir: String): DataFrame =
    ManifestV2Sink.readCommitted(spark, ensure(spark, dir).baseLabels)

}
