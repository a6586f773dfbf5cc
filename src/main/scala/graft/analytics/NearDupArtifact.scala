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
  *    output;
  *  - `base_labels(v, label)` — the fixpoint over edges wholly inside
  *    the base corpus ([[DedupQueries.isDeltaDoc]] complement): "last
  *    night's" labels, the warm seed
  *    [[DedupQueries.dedupClustersIncremental]] folds the delta into.
  *
  * Scale shape: the build is the already-priced banded pair join plus
  * ONE min-label fixpoint solving BOTH labelings simultaneously over
  * a disjoint two-copy union graph (see [[buildAt]] — the per-round
  * job overhead is paid once, rows merely double through the same
  * shuffles); each table is keyed by 8-byte ids (text never
  * persists). At 100 TB the same three tables land in the lake and
  * the amortization argument is identical — consumers' cost drops
  * from O(corpus re-derivation) to O(artifact read).
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
    def sym(p: DataFrame): DataFrame =
      p.select(col("doc_a"), col("doc_b"))
        .union(p.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst").localCheckpoint(true)
    // TWO labelings, ONE fixpoint: the base-subgraph components
    // ("last night's" labels) and the full-graph components are solved
    // SIMULTANEOUSLY over a disjoint two-copy union — vertex v rides
    // as 2v in the base copy and 2v+1 in the full copy (ids stay far
    // below 2⁶² — doc ids, not hashes — so the affine map is exact).
    // The copies share no vertices, so the one iterated fixpoint pays
    // ONE set of per-round jobs (the dominant cost: the per-round
    // checkpoint/probe/broadcast overhead is size-independent once the
    // label table fits its partitions) while moving only 2× the rows
    // through the same shuffles; min-labels decode by the same affine
    // map (min(2a+c, 2b+c) = 2·min(a,b)+c — parity is invariant under
    // component minimum within a copy).
    val isDelta = DedupQueries.isDeltaDoc _
    def copy(p: DataFrame, off: Int): DataFrame =
      p.select((col("doc_a") * 2 + lit(off)).as("doc_a"),
        (col("doc_b") * 2 + lit(off)).as("doc_b"))
    val union2 = copy(pairs.where(
        !isDelta(col("doc_a")) && !isDelta(col("doc_b"))), 0)
      .unionByName(copy(pairs, 1))
    val edges2 = sym(union2)
    val labels2 = DedupQueries
      .propagateLabels(edges2, DedupQueries.identityLabels(edges2))
      .localCheckpoint(true) // decoded twice below
    // integer `div`, not double Divide: ids may exceed 2⁵³ at scale
    labels2.where(col("v") % 2 === 0)
      .select(expr("v div 2").as("v"), expr("label div 2").as("label"))
      .write.format("graft-manifest").mode("overwrite").save(a.baseLabels)
    // `=!= 0`, not `=== 1`: Spark's % returns NEGATIVE remainders, so
    // an odd negative doc id (-3 % 2 = -1) would satisfy neither
    // parity filter under `=== 1` and silently vanish from both
    // labelings — the affine decode below is sign-correct either way
    val fullLabels = labels2.where(col("v") % 2 =!= 0)
      .select(expr("(v - 1) div 2").as("v"),
        expr("(label - 1) div 2").as("label"))
    DedupQueries.clustersFinish(docs, fullLabels)
      .write.format("graft-manifest").mode("overwrite").save(a.labels)
    a
  }

  /** The nightly build, paid in full — used by the build-job query so
    * its benched cost IS the build cost. Replaces the session slot, so
    * consumers ride the newest publish.
    */
  def rebuild(spark: SparkSession, dir: String): Artifact = {
    val a = buildAt(spark, dir)
    builtTables.put(a.pairs, CompletableFuture.completedFuture(a))
    a
  }

  private def ensure(spark: SparkSession, dir: String): Artifact = {
    // slot key = the content-addressed root (via the pairs path): the
    // fingerprint is recomputed per resolve, so an in-session data or
    // code change moves the key and riders never see a stale root
    val a = artifactAt(rootOf(spark, dir))
    val fut = new CompletableFuture[Artifact]()
    val prev = builtTables.putIfAbsent(a.pairs, fut)
    if (prev != null)
      try prev.join()
      catch {
        case e: java.util.concurrent.CompletionException =>
          // waiters must observe the builder's original exception type
          throw Option(e.getCause).getOrElse(e)
      }
    else
      try {
        // content-addressed reuse: all three tables committed at the
        // same (code, data) root ⇒ same artifact — read, don't rebuild
        val committed = Seq(a.pairs, a.labels, a.baseLabels)
          .forall(ManifestV2Sink.hasCommitted)
        val art = if (committed) a else buildAt(spark, dir)
        fut.complete(art)
        art
      } catch {
        case t: Throwable =>
          builtTables.remove(a.pairs, fut)
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
