package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the full operator inventory; each key also appears in
  * `oracleSql` with DuckDB-runnable ANSI SQL over the same tables
  * (column names aliased identically on both sides — the driver's
  * compare is name-sensitive).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = Seq(
      IngestQueries.queries, TpchQueries.queries, TpchDeepQueries.queries,
      TpchSupplyQueries.queries,
      EventQueries.queries, TextQueries.queries, DedupQueries.queries,
      EmbeddingQueries.queries, MultimodalQueries.queries,
      ScalarBreadthQueries.queries, PipelineQueries.queries,
      LakehouseQueries.queries)
    val merged = parts.reduce(_ ++ _)
    // `++` silently drops colliding keys — a collision would skip a
    // query from the correctness gate without any failure signal
    require(merged.size == parts.map(_.size).sum,
      "duplicate query keys across query modules")
    merged
  }

  /** BUILD-JOB queries that (re)publish session artifacts other
    * queries ride (near-dup pair graph/labels, exact-PPJoin pairs,
    * trained BPE vocabulary, NND graph, ANN eval ground truths).
    * [[Bench]] materializes these once UNMEASURED before its timed
    * passes, so riding consumers' samples reflect artifact-READ cost —
    * the scaladoc'd claim — in every pass instead of whichever
    * consumer happens to run first paying a lazy build (bench numbers
    * must not depend on execution order). The build jobs themselves
    * stay rebuild-per-call, so their timed passes keep the honest
    * nightly build cost.
    */
  val artifactWarmup: Seq[String] = Seq(
    "dedup_clusters_persisted", "dedup_setsim_join", "knn_graph_nnd",
    "text_bpe_train",
    // ANN eval ground truths + shared family searches (build jobs),
    // and the searches whose exact baselines build lazily on first
    // demand (knn_gs_exact / knn_fs_exact)
    "knn_brute_force", "knn_brute_heldout", "knn_ivf_trained_heldout",
    "knn_sq8_heldout", "knn_graph_search", "knn_filtered_search",
    "knn_graph_delta",
    // the Vamana build job publishes the pruned serving index its
    // search twin reads
    "knn_graph_prune")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    IngestQueries.oracles ++
      TpchQueries.oracles ++
      TpchDeepQueries.oracles ++
      TpchSupplyQueries.oracles ++
      EventQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      EmbeddingQueries.oracles ++
      MultimodalQueries.oracles ++
      ScalarBreadthQueries.oracles ++
      PipelineQueries.oracles ++
      LakehouseQueries.oracles
}
