package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{DedupQueries, QueryUtil, SessionArtifact}

/** Near-duplicate GATE for arriving documents: each new document is
  * checked against a FROZEN corpus LSH index and emits its verified
  * near-dup partners with exact Jaccard scores — the live twin of the
  * batch `dedup_incremental` delta-vs-corpus pass, on the same
  * vet-on-arrival seam as [[StreamContamGate]] (the batch side builds
  * the index; the stream never re-bands the corpus). This is the gate
  * an ingestion pipeline runs BEFORE a crawled page lands in the
  * training corpus; the nightly batch pass ([[graft.analytics
  * .DedupQueries.dedupIncremental]]) and the cluster-maintenance loop
  * (StreamingDedupSpec's foreachBatch warm-start re-clustering) stay
  * responsible for delta-vs-delta pairs and transitive closure.
  *
  * The plan is STATELESS — append mode, no state store, no watermark:
  *  - per arriving row, one codegen pass derives the shingle set and
  *    the `Bands` band keys ([[DedupQueries.shingleHashesCol]] /
  *    [[DedupQueries.bandKeysOf]] — bit-identical to the batch LSH
  *    derivation, spec-pinned);
  *  - one stream-static equi-join PER BAND against the bucketed index
  *    (`Bands` is a small compile-time constant), left-outer so clean
  *    documents pass through;
  *  - candidate partners from all bands are flattened and deduplicated
  *    INSIDE the row (`array_distinct`), which replaces the batch
  *    query's pair-level `distinct()` without any stream aggregation;
  *  - one more stream-static join fetches the partners' shingle sets
  *    for exact Jaccard verification — only candidate rows pay it.
  *
  * Scale shape: the index tables are corpus-sized but STATIC — Spark
  * plans each stream-static join by size (broadcast under the
  * threshold, shuffled-hash above), and only the arriving micro-batch
  * streams through. Per-document cost is O(tokens) hashing plus
  * `Bands` bucket probes plus |candidates| exact verifications —
  * independent of corpus size, exactly the property a gate needs.
  *
  * Output: ≥1 row per arriving document (clean docs emit one row with
  * a null `doc_old`): `(doc_new, doc_old, n_common, n_union,
  * jaccard_ppm, keep)`. `keep` is per-row — a consumer folds per doc
  * (`min(keep)`), or routes on the pair rows directly. A document
  * whose only LSH partner is itself (replayed corpus member) emits its
  * self-pair row with jaccard 1e6, keep=false — a replay reads as a
  * duplicate, which is the verdict a gate should give it.
  */
object StreamNearDupGate {

  /** Build the frozen corpus index — in production these are the
    * persisted tables a nightly job maintains; here they are derived
    * once per session and checkpointed by the caller. Returns
    * `(buckets, shingles)`:
    *  - `buckets(band, key, partners)`: one row per occupied LSH
    *    bucket with the sorted member list — the probe table;
    *  - `shingles(doc_old, sh_old)`: the corpus shingle sets — the
    *    verification table.
    */
  def corpusIndex(corpus: DataFrame): (DataFrame, DataFrame) = {
    val sh = corpus
      .withColumn("sh", DedupQueries.shingleHashesCol)
      .select(col("doc_id"), col("sh"))
    val buckets = sh
      .select(col("doc_id"),
        posexplode(DedupQueries.bandKeysOf(col("sh"))))
      .toDF("doc_id", "band", "key")
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("partners"))
    (buckets, sh.select(col("doc_id").as("doc_old"), col("sh").as("sh_old")))
  }

  /** The PUBLISHED form of [[corpusIndex]] — the nightly tables the
    * scaladoc above promises: the flattened bucket membership
    * `(band, key, doc_id)` and shingle rows `(doc_id, sh)` are
    * published through the [[SessionArtifact]] manifest seam
    * (primitive columns — the sink's contract) over the BASE corpus
    * (the [[DedupQueries.isDeltaDoc]] complement: exactly the corpus
    * side the batch `dedup_incremental` pass vets deltas against and
    * [[graft.analytics.NearDupArtifact]] persists labels for), then
    * regrouped into the probe/verify tables and checkpointed. The
    * streaming gate and the nightly batch therefore read ONE source of
    * truth for the frozen base-side state: a restarted session reuses
    * the publish iff data and code are unchanged, and a nightly
    * republish is picked up by re-calling this (the gate's contract
    * keeps the index frozen WITHIN a run — re-resolve at epoch/run
    * boundaries, not mid-stream).
    *
    * Regrouping costs one corpus-keyed shuffle per resolve — paid once
    * per session, not per micro-batch (the returned frames are
    * checkpointed); set-valued columns round-trip as exploded rows
    * because Jaccard verification only consumes them as sets.
    */
  def publishedIndex(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    // ONE shingling pass shared by both builds on the cold path (lazy:
    // never forced when both artifacts are already committed) — each
    // build thunk re-deriving the corpus scan + per-shingle md5 would
    // double the cold publish cost
    lazy val baseShingled = QueryUtil.table(spark, dir, "documents")
      .where(!DedupQueries.isDeltaDoc(col("doc_id")))
      .withColumn("sh", DedupQueries.shingleHashesCol)
      .select(col("doc_id"), col("sh"))
      .localCheckpoint(true)
    val flatBuckets =
      SessionArtifact.table(spark, dir, "gate_lsh_buckets") {
        baseShingled
          .select(col("doc_id"),
            posexplode(DedupQueries.bandKeysOf(col("sh"))))
          .toDF("doc_id", "band", "key")
          .select(col("band"), col("key"), col("doc_id"))
      }
    val flatShingles =
      SessionArtifact.table(spark, dir, "gate_lsh_shingles") {
        baseShingled.select(col("doc_id"), explode(col("sh")).as("sh"))
      }
    val buckets = flatBuckets.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("partners"))
      .localCheckpoint(true)
    val shingles = flatShingles.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("sh_old"))
      .select(col("doc_id").as("doc_old"), col("sh_old"))
      .localCheckpoint(true)
    (buckets, shingles)
  }

  /** Gate `stream` (needs `doc_id: long, text: string`) against a
    * [[corpusIndex]]. Pairs at `jaccard_ppm >= thresholdPpm` read
    * keep=false.
    */
  def apply(stream: DataFrame, buckets: DataFrame, shingles: DataFrame,
      thresholdPpm: Long = 600000L): DataFrame = {
    val emptyPartners = array().cast("array<bigint>")
    val withBands = stream
      .withColumn("sh", DedupQueries.shingleHashesCol)
      .withColumn("bks", DedupQueries.bandKeysOf(col("sh")))
    // one left-outer probe per band; band b's bucket rows are filtered
    // and renamed so the joins never collide on column names
    val probed = (0 until DedupQueries.Bands).foldLeft(withBands) { (df, b) =>
      val bucket = buckets.where(col("band") === b)
        .select(col("key").as(s"bk_$b"), col("partners").as(s"p_$b"))
      df.join(bucket, element_at(col("bks"), b + 1) === col(s"bk_$b"),
        "left_outer")
    }
    val partners = array_distinct(flatten(array(
      (0 until DedupQueries.Bands)
        .map(b => coalesce(col(s"p_$b"), emptyPartners)): _*)))
    probed
      .select(col("doc_id").as("doc_new"), col("sh"),
        explode_outer(partners).as("doc_old"))
      .join(shingles, Seq("doc_old"), "left_outer")
      // explicit null-out for clean rows (doc_old null): size() of a
      // null array is conf-dependent (-1 pre-ANSI), so never rely on it
      .select(col("doc_new"), col("doc_old"),
        when(col("doc_old").isNotNull,
          size(array_intersect(col("sh"), col("sh_old"))).cast("long"))
          .as("n_common"),
        when(col("doc_old").isNotNull,
          size(array_union(col("sh"), col("sh_old"))).cast("long"))
          .as("n_union"))
      .withColumn("jaccard_ppm",
        floor(lit(1e6) * col("n_common").cast("double") /
          col("n_union").cast("double")).cast("long"))
      .withColumn("keep",
        col("jaccard_ppm").isNull || col("jaccard_ppm") < thresholdPpm)
  }
}
