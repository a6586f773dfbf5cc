package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.functions.CrossHash

/** Training-data pipeline compositions (round 4): the whole-pipeline
  * operators a 100 TB pretraining corpus build runs AFTER the
  * per-document primitives (TextQueries) and pair generators
  * (DedupQueries) exist —
  *
  *  - benchmark-contamination detection (n-gram overlap between the
  *    corpus and a held-out eval slice),
  *  - chunk-level exact substring dedup (the C4 "three-sentence"
  *    dedup shape at fixed word-window granularity),
  *  - deterministic train/valid/test splitting (hash-bucket
  *    assignment — reproducible across engines and re-runs),
  *  - a composed C4/RefinedWeb-style keep/drop filter (quality rules
  *    + near-dup verdict with a first-reject-reason audit column),
  *  - triangle census over the near-dup graph (how clustered is the
  *    duplicate structure — distinguishes star-shaped template spam
  *    from pairwise-chained crawl dups),
  *  - bloom-filter join pruning (the bounded-size broadcast that
  *    replaces shuffling a 100 TB fact table against a selective
  *    dimension; false-positive rate measured in-band, zero false
  *    negatives asserted in-band).
  *
  * Scale notes: every text-derived join key is pre-hashed to a 56-bit
  * md5 long ([[CrossHash.md5Long]]) so shuffles move 8-byte keys, never
  * text; the eval-gram and bloom-word tables are bounded by
  * construction (eval-set size, m/32 words) so their broadcasts hold at
  * any corpus size; the chunk-dedup output is capped (top duplicated
  * chunks) because at corpus scale the full duplicate list is itself a
  * large dataset — the cap is logged in the plan via the LIMIT.
  */
object PipelineQueries {

  private val Gram = 4 // contamination n-gram width (words)
  private val Chunk = 5 // chunk-dedup window width (words)
  private val BloomBits = 8192 // m: bloom filter size in bits
  private val BloomShift = 13 // log2(BloomBits); md5Long >= 0, so
  // shiftright is exact floor division — long `/` would round through
  // an IEEE double and diverge from the oracle's `//` above 2^53
  private val WordBits = 32 // bits packed per bloom word (sign-safe)
  // the shift and width constants MUST stay in lockstep or the Spark
  // shiftright silently diverges from the oracle's integer division
  require(1L << BloomShift == BloomBits, "BloomShift != log2(BloomBits)")

  private def toks: Column = split(col("text"), " ")

  // ------------------------------------------------ contamination
  /** Benchmark-contamination scan: documents sharing any word 4-gram
    * with the held-out eval slice (doc_id ≡ 0 mod 97 stands in for an
    * external benchmark table). Grams are hashed to 56-bit longs
    * before the join — the eval side is DISTINCT gram hashes, small by
    * construction (eval sets are fixed-size), hence broadcast; the
    * corpus side streams through it without a shuffle of gram text.
    */
  def textContamination(spark: SparkSession, dir: String): DataFrame = {
    val grams = table(spark, dir, "documents")
      .where(size(toks) >= Gram)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(toks) - Gram),
          i => array_join(slice(toks, i + 1, lit(Gram)), " "))).as("gram"))
      .select(col("doc_id"), CrossHash.md5Long(col("gram")).as("gh"))
      .distinct()
    val eval_ = grams.where(col("doc_id") % 97 === 0)
      .select(col("gh")).distinct()
    grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(eval_), "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("n_shared_grams").desc, col("doc_id"))
  }

  val textContaminationSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= $Gram),
       |g AS (SELECT DISTINCT doc_id,
       |    ${CrossHash.sqlMd5Long(s"array_to_string(toks[i:i+${Gram - 1}], ' ')")} AS gh
       |  FROM t, LATERAL (SELECT unnest(generate_series(1,
       |    len(toks) - ${Gram - 1})) AS i) s),
       |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
       |FROM g JOIN ev USING (gh)
       |WHERE doc_id % 97 <> 0
       |GROUP BY doc_id
       |ORDER BY n_shared_grams DESC, doc_id""".stripMargin

  // ------------------------------------------- decontamination apply
  /** Benchmark decontamination APPLIED — [[textContamination]] reports
    * the overlap; this drops every contaminated document and ships the
    * per-source release accounting (the report a dataset card cites:
    * how many documents and tokens each source lost to eval overlap).
    * A document is contaminated if it shares ANY word 4-gram with the
    * eval slice — the GPT-3-style hard rule; the survivors are what a
    * training run may legally touch. The live twin gating ARRIVING
    * documents against the same frozen gram set is
    * [[graft.streaming.StreamContamGate]] (spec-diffed against the
    * batch scan).
    *
    * Scale shape: identical to the report — gram hashes join against
    * the bounded broadcast eval side, the verdict collapses to a
    * distinct doc_id set, and the apply is one key-only LEFT ANTI join
    * on the 8-byte doc key (document bodies never shuffle); the
    * rollup is |sources|-sized.
    */
  def pipelineDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val grams = docs
      .where(size(toks) >= Gram)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(toks) - Gram),
          i => array_join(slice(toks, i + 1, lit(Gram)), " "))).as("gram"))
      .select(col("doc_id"), CrossHash.md5Long(col("gram")).as("gh"))
      .distinct()
    val eval_ = grams.where(col("doc_id") % 97 === 0)
      .select(col("gh")).distinct()
    val contaminated = grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(eval_), "gh")
      .select(col("doc_id")).distinct()
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_toks"))
    corpus.join(contaminated.withColumn("hit", lit(1L)),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("hit").isNull, col("n_toks")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("kept_ppm", ppm(col("n_kept"), col("n_docs")))
  }

  val pipelineDecontaminateSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= $Gram),
       |g AS (SELECT DISTINCT doc_id,
       |    ${CrossHash.sqlMd5Long(s"array_to_string(toks[i:i+${Gram - 1}], ' ')")} AS gh
       |  FROM t, LATERAL (SELECT unnest(generate_series(1,
       |    len(toks) - ${Gram - 1})) AS i) s),
       |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
       |bad AS (SELECT DISTINCT doc_id FROM g JOIN ev USING (gh)
       |  WHERE doc_id % 97 <> 0),
       |corpus AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
       |    (b.doc_id IS NOT NULL) AS hit
       |  FROM documents d LEFT JOIN bad b ON d.doc_id = b.doc_id
       |  WHERE d.doc_id % 97 <> 0)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN hit THEN 0 ELSE n_toks END) AS BIGINT)
       |    AS tokens_kept,
       |  ${sqlPpm("SUM(CASE WHEN hit THEN 0 ELSE 1 END)", "COUNT(*)")}
       |    AS kept_ppm
       |FROM corpus GROUP BY source""".stripMargin

  // ------------------------------------------------ novelty trend
  /** Corpus self-novelty trend — what fraction of each document's
    * word 4-grams has NEVER appeared in an earlier document, bucketed
    * over arrival order (doc_id) into 8 epochs. This is the
    * duplication-over-time signal a crawl pipeline watches: novelty
    * decaying toward zero means the crawler is re-reading the web (or
    * the generator is looping), long before any pairwise dedup job
    * says so. First-seen attribution is exact: a gram's novelty
    * belongs to its MINIMUM doc_id, so every distinct gram is novel
    * exactly once — the conservation identity the spec pins
    * (Σ novel = |distinct grams|).
    *
    * Scale shape: one shuffle on the 8-byte gram hash builds the
    * first-seen table (partial-aggregating min), one doc-keyed join
    * back, an 8-row rollup against a broadcast 1-row max; document
    * text never shuffles.
    */
  def textNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = table(spark, dir, "documents")
      .where(size(toks) >= Gram)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(toks) - Gram),
          i => array_join(slice(toks, i + 1, lit(Gram)), " "))).as("gram"))
      .select(col("doc_id"), CrossHash.md5Long(col("gram")).as("gh"))
      .distinct()
      .cache() // first-seen aggregate + per-doc rollup
    try {
      val first = grams.groupBy(col("gh"))
        .agg(min(col("doc_id")).as("first_doc"))
      val perDoc = grams.join(first, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      val maxDoc = perDoc.agg(max(col("doc_id")).as("mx"))
      // bucket = doc_id div ceil-width, NOT (doc_id*8) div (mx+1):
      // the division-first form cannot overflow int64 for any doc_id
      // (the product form scrambles buckets silently past 2^60); the
      // quotient is still always in [0, 7] since
      // mx < 8*((mx div 8) + 1)
      perDoc.crossJoin(broadcast(maxDoc))
        .withColumn("bucket", expr("doc_id div ((mx div 8) + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("n_grams"),
          sum(col("n_novel")).as("n_novel"))
        .withColumn("novelty_ppm", ppm(col("n_novel"), col("n_grams")))
        .localCheckpoint(true) // lets the finally release the gram cache
    } finally grams.unpersist()
  }

  val textNoveltySql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text
       |  FROM documents WHERE len(string_split(text, ' ')) >= $Gram),
       |g AS (SELECT DISTINCT doc_id,
       |    ${CrossHash.sqlMd5Long(s"array_to_string(toks[i:i+${Gram - 1}], ' ')")} AS gh
       |  FROM t, LATERAL (SELECT unnest(generate_series(1,
       |    len(toks) - ${Gram - 1})) AS i) s),
       |f AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh),
       |pd AS (
       |  SELECT g.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_novel
       |  FROM g JOIN f ON g.gh = f.gh GROUP BY g.doc_id),
       |mx AS (SELECT MAX(doc_id) AS mx FROM pd)
       |SELECT pd.doc_id // ((mx.mx // 8) + 1) AS bucket,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(pd.n_grams) AS BIGINT) AS n_grams,
       |  CAST(SUM(pd.n_novel) AS BIGINT) AS n_novel,
       |  ${sqlPpm("SUM(pd.n_novel)", "SUM(pd.n_grams)")} AS novelty_ppm
       |FROM pd, mx
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------ chunk dedup
  /** Chunk-level exact dedup: each document split into consecutive
    * 5-word windows (last window may be short), windows hashed, and
    * the corpus-wide duplicated windows reported with occurrence and
    * document counts. This is substring-granularity exact dedup (C4
    * removed repeated three-sentence spans the same way). Only 8-byte
    * hashes shuffle; the report is capped at the top 1000 duplicated
    * chunks (at corpus scale the full list is a dataset, not a query
    * result — downstream removal joins against the uncapped frame).
    */
  /** `(doc_id, idx, chunk, chunk_hash)` — the ONE chunk-windowing
    * definition. [[dedupChunk]] (the report) and
    * [[pipelineRemoveChunks]] (the apply) both derive from this frame
    * and from [[sqlChunkCtes]], so their windowing can never drift
    * apart — the removal's correctness claim depends on bit-identical
    * chunk boundaries on both paths.
    */
  private def chunkFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(
        transform(sequence(lit(0),
            ceil(size(toks) / lit(Chunk.toDouble)).cast("int") - 1),
          i => array_join(slice(toks, i * Chunk + 1, lit(Chunk)), " ")))
        .as(Seq("idx", "chunk")))
      .withColumn("chunk_hash", CrossHash.md5Long(col("chunk")))

  /** DuckDB twin of [[chunkFrame]]: CTEs `t` (tokens) and `c`
    * (doc_id, idx, chunk, chunk_hash).
    */
  private val sqlChunkCtes: String = {
    val chunk = s"array_to_string(toks[(i-1)*$Chunk+1:i*$Chunk], ' ')"
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, i AS idx, $chunk AS chunk,
       |    ${CrossHash.sqlMd5Long(chunk)} AS chunk_hash
       |  FROM t, LATERAL (SELECT unnest(generate_series(1,
       |    CAST(ceil(len(toks) / $Chunk.0) AS INT))) AS i) s)"""
  }

  def dedupChunk(spark: SparkSession, dir: String): DataFrame =
    chunkFrame(table(spark, dir, "documents"))
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_occurrences") > 1)
      .orderBy(col("n_occurrences").desc, col("chunk_hash"))
      .limit(1000)

  val dedupChunkSql: String =
    s"""WITH $sqlChunkCtes
       |SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM c
       |GROUP BY chunk_hash
       |HAVING COUNT(*) > 1
       |ORDER BY n_occurrences DESC, chunk_hash
       |LIMIT 1000""".stripMargin

  // ------------------------------------------------ chunk removal
  /** Chunk-level dedup APPLIED: rebuild each document with its
    * corpus-duplicated 5-word windows removed — the C4 "drop repeated
    * spans" write path that [[dedupChunk]] only reports on. This query
    * makes the report's cap claim honest by construction: the
    * duplicate set here is the UNCAPPED aggregate (every hash with
    * more than one occurrence), joined as a left-anti against the
    * exploded chunks, so removal correctness never depends on the
    * report's top-1000 window.
    *
    * Scale shape: one explode pass, one count shuffle keyed by 8-byte
    * chunk hashes, one anti-join on the same key, and a per-document
    * reassembly whose state is bounded by the document itself (the
    * same bound the raw text column already imposes). Output carries
    * md5(clean_text) instead of the rebuilt text so the result is a
    * report, not a second corpus.
    */
  def pipelineRemoveChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFrame(table(spark, dir, "documents"))
    chunks.cache() // duplicate-set aggregate + the anti-join probe side
    val dups = chunks.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .select(col("chunk_hash")) // uncapped — see scaladoc
    val kept = chunks.join(dups, Seq("chunk_hash"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks_kept"),
        md5(array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("chunk")))),
            s => s.getField("chunk")), " ").cast("binary"))
          .as("clean_hash"))
    val totals = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks_total"))
    // a fully-duplicated document vanishes from `kept` — resurface it
    // as an explicit empty survivor rather than a silently missing row
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks_total"),
        coalesce(col("n_chunks_kept"), lit(0L)).as("n_chunks_kept"),
        (col("n_chunks_total") - coalesce(col("n_chunks_kept"), lit(0L)))
          .as("n_chunks_removed"),
        coalesce(col("clean_hash"), md5(lit("").cast("binary")))
          .as("clean_hash"))
  }

  val pipelineRemoveChunksSql: String =
    s"""WITH $sqlChunkCtes,
       |dups AS (
       |  SELECT chunk_hash FROM c GROUP BY chunk_hash HAVING COUNT(*) > 1),
       |kept AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks_kept,
       |    md5(string_agg(chunk, ' ' ORDER BY idx)) AS clean_hash
       |  FROM c ANTI JOIN dups USING (chunk_hash)
       |  GROUP BY doc_id),
       |tot AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks_total
       |  FROM c GROUP BY doc_id)
       |SELECT tot.doc_id, tot.n_chunks_total,
       |  COALESCE(kept.n_chunks_kept, 0) AS n_chunks_kept,
       |  tot.n_chunks_total - COALESCE(kept.n_chunks_kept, 0)
       |    AS n_chunks_removed,
       |  COALESCE(kept.clean_hash, md5('')) AS clean_hash
       |FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id""".stripMargin

  // ------------------------------------------------ provenance scorecard
  /** Per-source corruption scorecard — the "which crawl is dirty"
    * report a pipeline owner runs before deciding where cleaning
    * effort goes: for every source, document/token volume, the
    * exact-duplicate rate (non-canonical copies per [[DedupQueries
    * .dedupExact]]'s min-doc_id convention), the PII incidence (the
    * same four-detector predicate [[TextQueries.textPii]] reports),
    * and mean document length — each signal as integer ppm.
    *
    * Scale shape: one md5(text)-keyed window for duplicate marking
    * (the hash shuffles, the text stays put), then a single
    * partial-aggregatable rollup on the low-cardinality source key.
    * PII counting is pure per-row regex inside the same scan.
    */
  def pipelineProvenance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tok"),
        md5(col("text").cast("binary")).as("h"),
        TextQueries.hasPii.cast("long").as("pii"))
      .withColumn("is_dup", (row_number().over(w) > 1).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        ppm(sum(col("is_dup")), count(lit(1))).as("dup_doc_ppm"),
        ppm(sum(col("pii")), count(lit(1))).as("pii_doc_ppm"),
        ppm(sum(col("n_tok")), count(lit(1))).as("mean_tok_ppm"))
  }

  val pipelineProvenanceSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    md5(text) AS h,
       |    CASE WHEN ${TextQueries.sqlHasPii} THEN 1 ELSE 0 END AS pii
       |  FROM documents),
       |m AS (
       |  SELECT *, CASE WHEN ROW_NUMBER()
       |      OVER (PARTITION BY h ORDER BY doc_id) > 1
       |    THEN 1 ELSE 0 END AS is_dup
       |  FROM d)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  ${sqlPpm("SUM(is_dup)", "COUNT(*)")} AS dup_doc_ppm,
       |  ${sqlPpm("SUM(pii)", "COUNT(*)")} AS pii_doc_ppm,
       |  ${sqlPpm("SUM(n_tok)", "COUNT(*)")} AS mean_tok_ppm
       |FROM m
       |GROUP BY source""".stripMargin

  // ------------------------------------------------ curriculum budget
  /** Token-budget curriculum: rank the (lang, source) strata by mean
    * document length (the integer-exact quality proxy; a learned
    * quality score plugs into the same ORDER BY) and greedily take
    * whole strata until the running total crosses 60% of the corpus'
    * tokens — the "best data first, stop at the compute budget"
    * selection every pretraining run makes, with the cut attributable
    * per stratum. A stratum is taken iff the tokens BEFORE it are
    * under budget, so exactly one stratum straddles the line.
    *
    * Scale shape: one corpus-collapsing groupBy on (lang, source) with
    * map-side combine; the ranking window and prefix sum run over the
    * STRATA frame (tens of rows at any corpus size), never the facts —
    * same bounded-window contract as the dataset card.
    */
  def pipelineCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val strata = table(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"))
      .withColumn("mean_tok_ppm", ppm(col("n_tokens"), col("n_docs")))
    val w = Window.orderBy(col("mean_tok_ppm").desc, col("lang"),
      col("source"))
    val total = strata.agg(sum(col("n_tokens")).as("total_tokens"))
    strata
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .withColumn("cum_before", coalesce(
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("mean_tok_ppm"), col("sel_rank"), col("cum_before"),
        (col("cum_before") < expr("total_tokens * 3 div 5")).as("taken"))
  }

  val pipelineCurriculumSql: String =
    s"""WITH strata AS (
       |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |    ${sqlPpm("SUM(len(string_split(text, ' ')))", "COUNT(*)")}
       |      AS mean_tok_ppm
       |  FROM documents GROUP BY lang, source),
       |ranked AS (
       |  SELECT *,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS sel_rank,
       |    CAST(COALESCE(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM strata
       |  WINDOW w AS (ORDER BY mean_tok_ppm DESC, lang, source))
       |SELECT lang, source, n_docs, n_tokens, mean_tok_ppm, sel_rank,
       |  cum_before,
       |  cum_before < (SELECT SUM(n_tokens) FROM strata) * 3 // 5 AS taken
       |FROM ranked""".stripMargin

  // ------------------------------------------------ split assignment
  /** Deterministic train/valid/test split: hash-bucket each document
    * (900/50/50 of 1000 buckets) and report per-split counts and
    * shares. Pure per-row expression + a 3-group aggregate — the split
    * column itself costs nothing at any scale, and the same hash
    * reproduces the assignment in any engine (no RNG state, no order
    * dependence — the property a training pipeline needs to keep
    * held-out data held out across re-runs and backfills).
    */
  def pipelineSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("bucket",
        CrossHash.md5Long(concat(lit("split:"), col("doc_id").cast("string")))
          % 1000)
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "valid").otherwise("test"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    docs.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("bucket")).as("min_bucket"),
        max(col("bucket")).as("max_bucket"))
      .join(broadcast(total))
      .select(col("split"), col("n_docs"),
        col("min_bucket"), col("max_bucket"),
        ppm(col("n_docs"), col("n_total")).as("share_ppm"))
      .orderBy(col("split"))
  }

  val pipelineSplitSql: String = {
    val bucket = CrossHash.sqlMd5Long("'split:' || CAST(doc_id AS VARCHAR)") +
      " % 1000"
    s"""WITH d AS (SELECT doc_id, $bucket AS bucket,
       |    CASE WHEN $bucket < 900 THEN 'train'
       |         WHEN $bucket < 950 THEN 'valid' ELSE 'test' END AS split
       |  FROM documents)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket,
       |  ${sqlPpm("COUNT(*)", "(SELECT COUNT(*) FROM d)")} AS share_ppm
       |FROM d
       |GROUP BY split
       |ORDER BY split""".stripMargin
  }

  // ------------------------------------- weighted systematic sample
  /** Token-WEIGHTED systematic subsampling — "give me ~1/k of the
    * corpus BY TOKENS, long documents proportionally more likely,
    * deterministically": docs are laid on a per-source line in
    * hash-shuffled order, each occupying its token count, and every
    * doc whose interval contains a multiple of the stride is taken.
    * That is classic systematic (every-k-th) sampling with
    * probability proportional to size — the reproducible alternative
    * to RNG reservoir sampling (same sample on any engine, any run,
    * any partitioning; the property a training pipeline needs for
    * auditable subsets). A doc longer than the stride is taken with
    * certainty — by ≥1 interval multiple, never duplicated (taken is
    * a boolean, not a multiplicity).
    *
    * Scale shape: the running position is a cumulative sum
    * partitioned BY SOURCE (the window never forms a global single
    * partition — each source's line scans independently); everything
    * else is row-wise hashing and one partial-aggregating rollup.
    * The report shows, per source, realized token share ≈ 1/stride ·
    * 10⁶ ppm — the proportionality evidence.
    */
  val SampleStride = 997L

  def pipelineSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_toks"),
        CrossHash.md5Long(concat(lit("samp:"), col("doc_id").cast("string")))
          .as("k"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      // taken ⟺ (cum−n, cum] contains a stride multiple ⟺ the floor
      // quotient strictly advances — each multiple selects exactly ONE
      // doc (the half-open interval partition of the token line)
      .withColumn("taken",
        expr(s"(cum - n_toks) div $SampleStride < cum div $SampleStride"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("taken"), 1L).otherwise(0L)).as("n_sampled"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("taken"), col("n_toks")).otherwise(0L))
          .as("tokens_sampled"))
      .withColumn("sampled_ppm", ppm(col("tokens_sampled"), col("n_tokens")))
      .orderBy(col("source"))
  }

  val pipelineSampleWeightedSql: String = {
    val k = CrossHash.sqlMd5Long("'samp:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    $k AS k
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY source ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d),
       |t AS (
       |  SELECT *, (cum - n_toks) // $SampleStride < cum // $SampleStride
       |    AS taken
       |  FROM c)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN taken THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_sampled,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN taken THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS tokens_sampled,
       |  ${sqlPpm("SUM(CASE WHEN taken THEN n_toks ELSE 0 END)",
                   "SUM(n_toks)")} AS sampled_ppm
       |FROM t GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------- split leakage audit
  /** Cluster-aware split audit — the held-out-integrity check every
    * LLM data pipeline needs and doc-hash splitting silently fails:
    * hashing DOCUMENTS into train/valid/test lets near-duplicate
    * pairs straddle the boundary, so "held-out" eval rows have a
    * train-set twin and the benchmark is contaminated from day one.
    * This query quantifies that leak and proves the fix in one
    * report: the near-dup clustering (the persisted
    * [[NearDupArtifact]] label table — simhash banding + star
    * contraction, built nightly) labels every doc, then both schemes
    * are evaluated — `doc_hash` (each doc hashed independently, the
    * [[pipelineSplit]] rule) and `cluster_hash` (every member hashed
    * by its CLUSTER label, so a component can never straddle). Per
    * scheme: cluster count, multi-doc clusters, straddling clusters
    * (members in ≥2 splits), and the headline number — eval docs
    * sharing a cluster with a train doc. `cluster_hash` reads 0/0 BY
    * CONSTRUCTION (all members share the label hash), and singleton
    * clusters keep their doc-hash assignment (label = doc_id), so the
    * fix moves only documents that were actually entangled.
    *
    * Scale shape: the banding + contraction cost is the nightly
    * artifact build's; the audit itself is one artifact read and one
    * cluster-keyed partial-aggregating groupBy folded to a 2-row
    * report. The split columns are pure row-wise hashes — free at any
    * scale, reproducible in any engine.
    */
  def pipelineSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    // component labels read from the persisted artifact (built by star
    // contraction, every doc present incl. singletons); the audit's
    // full-recompute oracle re-proves the labels every run
    val labels = NearDupArtifact.labels(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    // the same salt and bucket rule as pipelineSplit, so doc_hash IS
    // the production assignment being audited
    def splitOf(key: Column): Column = {
      val bucket = CrossHash.md5Long(
        concat(lit("split:"), key.cast("string"))) % 1000
      when(bucket < 900, "train")
        .when(bucket < 950, "valid").otherwise("test")
    }
    val lab = docs.join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("split_doc", splitOf(col("doc_id")))
      .withColumn("split_cluster", splitOf(col("cluster_id")))
      .cache() // both scheme reports fold the one labeled frame
    try {
      def report(scheme: String, sp: String): DataFrame =
        lab.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("sz"),
            countDistinct(col(sp)).as("nsp"),
            sum(when(col(sp) === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col(sp) =!= "train", 1L).otherwise(0L)).as("n_eval"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(when(col("sz") > 1, 1L).otherwise(0L))
              .as("n_multi_clusters"),
            sum(when(col("nsp") > 1, 1L).otherwise(0L)).as("n_straddling"),
            sum(when(col("n_train") > 0, col("n_eval")).otherwise(0L))
              .as("n_eval_leaked"))
          .select(lit(scheme).as("scheme"), col("n_clusters"),
            col("n_multi_clusters"), col("n_straddling"),
            col("n_eval_leaked"))
      report("doc_hash", "split_doc")
        .unionByName(report("cluster_hash", "split_cluster"))
        .orderBy(col("scheme"))
        .localCheckpoint(true) // 2 rows; frees the labeled cache below
    } finally lab.unpersist()
  }

  val pipelineSplitLeakageSql: String = {
    def splitCase(key: String): String = {
      val bucket =
        CrossHash.sqlMd5Long(s"'split:' || CAST($key AS VARCHAR)") + " % 1000"
      s"""CASE WHEN $bucket < 900 THEN 'train'
         |       WHEN $bucket < 950 THEN 'valid' ELSE 'test' END""".stripMargin
    }
    s"""WITH RECURSIVE ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL SELECT doc_b, doc_a FROM spairs),
       |walk AS (
       |  SELECT doc_id AS v, doc_id AS r FROM documents
       |  UNION
       |  SELECT w.v, e.d AS r FROM walk w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT v AS doc_id, MIN(r) AS cluster_id
       |  FROM walk GROUP BY v),
       |lab AS (SELECT doc_id, cluster_id,
       |  ${splitCase("doc_id")} AS split_doc,
       |  ${splitCase("cluster_id")} AS split_cluster
       |  FROM comp),
       |per AS (SELECT cluster_id, COUNT(*) AS sz,
       |  COUNT(DISTINCT split_doc) AS nsp_d,
       |  COUNT(DISTINCT split_cluster) AS nsp_c,
       |  SUM(CASE WHEN split_doc = 'train' THEN 1 ELSE 0 END) AS tr_d,
       |  SUM(CASE WHEN split_doc <> 'train' THEN 1 ELSE 0 END) AS ev_d,
       |  SUM(CASE WHEN split_cluster = 'train' THEN 1 ELSE 0 END) AS tr_c,
       |  SUM(CASE WHEN split_cluster <> 'train' THEN 1 ELSE 0 END) AS ev_c
       |  FROM lab GROUP BY cluster_id)
       |SELECT 'doc_hash' AS scheme, COUNT(*) AS n_clusters,
       |  CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_multi_clusters,
       |  CAST(SUM(CASE WHEN nsp_d > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_straddling,
       |  CAST(SUM(CASE WHEN tr_d > 0 THEN ev_d ELSE 0 END) AS BIGINT)
       |    AS n_eval_leaked
       |FROM per
       |UNION ALL
       |SELECT 'cluster_hash', COUNT(*),
       |  CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(SUM(CASE WHEN nsp_c > 1 THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(SUM(CASE WHEN tr_c > 0 THEN ev_c ELSE 0 END) AS BIGINT)
       |FROM per
       |ORDER BY scheme""".stripMargin
  }

  // ------------------------------------------------ k-core peeling
  /** 2-core of the near-dup graph by synchronous peeling: each round
    * drops vertices whose CURRENT degree is below k and restricts the
    * edge set to survivors; after [[KcoreRounds]] fixed rounds the
    * surviving vertices and their residual degrees are the dense
    * near-dup neighborhoods — the "everything here duplicates
    * everything" blobs a dedup audit looks at first, with the
    * tree-like fringe (pairs, chains) peeled away. Fixed synchronous
    * rounds, same contract as [[graphLpa]]: each round is one
    * degree-count shuffle + two semi-joins on 8-byte keys, the loop
    * count is a constant in the PLAN (no data-dependent iteration),
    * and the oracle unrolls the identical rounds as nested CTEs.
    */
  val KcoreK = 2
  val KcoreRounds = 3

  // ----------------------------------------- seed hop distance (BFS)
  /** Bounded BFS hop distance from a seed set over the near-dup
    * graph — the "distance from trusted seeds" quality signal web
    * corpus builds use (crawl-frontier distance from curated domains;
    * here seeds are every 10th doc and edges the simhash pairs, so
    * the same relational machinery demonstrates on the tables we
    * have). Per doc: the minimum number of hops to reach a seed, −1
    * if unreachable within [[SeedHops]] hops.
    *
    * Each round is ONE join (current distances × edges) + ONE min
    * aggregate, materialized with `localCheckpoint` so plan depth
    * stays fixed — the iterative-algorithm discipline every other
    * bounded-round query here follows. The hop bound makes the plan
    * 100 TB-safe the way iterate-to-convergence is not: round count
    * fixed, each round shuffles 8-byte ids keyed by vertex. (A
    * frontier-delta variant would shuffle only newly-reached vertices
    * per round; with SeedHops=4 the full-relaxation form is simpler
    * and within 2× of it.)
    */
  val SeedHops = 4

  def graphSeedDistance(spark: SparkSession, dir: String): DataFrame = {
    // edge list read from the persisted near-dup artifact (the graph
    // family's input is nightly-job output, not a per-query re-derive;
    // the full-recompute oracle below re-proves the pairs every run)
    val pairs = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    var dist = docs.where(col("doc_id") % 10 === 1)
      .select(col("doc_id").as("v"), lit(0L).as("d"))
      .localCheckpoint(true)
    for (h <- 1 to SeedHops) {
      dist = dist
        .unionByName(dist.join(edges, col("v") === col("src"))
          .select(col("dst").as("v"), lit(h.toLong).as("d")))
        .groupBy(col("v")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    docs.join(dist.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("d"), lit(-1L)).as("hop_dist"))
  }

  val graphSeedDistanceSql: String =
    s"""WITH RECURSIVE ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM spairs),
       |walk(v, hops) AS (
       |  SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 1
       |  UNION
       |  SELECT e.d, w.hops + 1 FROM walk w JOIN edges e ON w.v = e.s
       |  WHERE w.hops < $SeedHops),
       |mind AS (SELECT v, MIN(hops) AS dist FROM walk GROUP BY v)
       |SELECT d.doc_id,
       |  CAST(COALESCE(m.dist, -1) AS BIGINT) AS hop_dist
       |FROM documents d LEFT JOIN mind m ON d.doc_id = m.v""".stripMargin

  /** HUB report over the near-dup graph: per-doc degree, the corpus
    * degree histogram, and the top hubs with their source and size —
    * the boilerplate detector a pipeline owner reads first (a
    * template page re-crawled everywhere shows up as one doc
    * near-dup-linked to hundreds; its SOURCE tells you which crawl to
    * fix). Output: one row per doc in the top-20 by (degree DESC,
    * doc_id) plus its degree-histogram bucket share, all exact
    * integers.
    *
    * Scale shape: degrees are one partial-aggregating groupBy over
    * the (already banded, never all-pairs) simhash pair list; top-20
    * compiles to TakeOrderedAndProject; the histogram is a
    * broadcast-size rollup joined back by bucket.
    */
  def graphHubs(spark: SparkSession, dir: String): DataFrame = {
    // artifact-read edge list (see graphSeedDistance); checkpoint: deg
    // feeds count(), the doc join, AND the histogram
    val pairs = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true) // three consumers: count, join, histogram
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    // histogram bucket = degree itself at these densities (exact,
    // engine-independent); share in ppm of all linked docs
    val hist = deg.groupBy(col("degree").as("hdeg"))
      .agg(count(lit(1)).as("n_docs_at_degree"))
    val total = deg.count()
    deg.join(docs, "doc_id")
      .join(hist, col("degree") === col("hdeg"))
      .select(col("doc_id"), col("degree"), col("source"), col("n_toks"),
        col("n_docs_at_degree"),
        ppm(col("n_docs_at_degree"), lit(total)).as("degree_share_ppm"))
      .orderBy(col("degree").desc, col("doc_id").asc)
      .limit(20)
  }

  val graphHubsSql: String =
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |deg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |    SELECT doc_a AS doc_id FROM spairs
       |    UNION ALL SELECT doc_b FROM spairs) u
       |  GROUP BY doc_id),
       |hist AS (SELECT degree AS hdeg, CAST(COUNT(*) AS BIGINT)
       |  AS n_docs_at_degree FROM deg GROUP BY degree),
       |tot AS (SELECT COUNT(*) AS t FROM deg)
       |SELECT d.doc_id, d.degree, doc.source,
       |  CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS n_toks,
       |  h.n_docs_at_degree,
       |  ${QueryUtil.sqlPpm("h.n_docs_at_degree", "(SELECT t FROM tot)")}
       |    AS degree_share_ppm
       |FROM deg d
       |JOIN documents doc ON d.doc_id = doc.doc_id
       |JOIN hist h ON d.degree = h.hdeg
       |ORDER BY d.degree DESC, d.doc_id ASC LIMIT 20""".stripMargin

  /** Newman MODULARITY of the near-dup clustering — the one-number
    * answer to "are these clusters real structure or banding
    * artifacts": Q = Σ_c [e_c/m − (d_c/2m)²] over the star-contraction
    * components of the simhash pair graph. High Q (near the
    * theoretical max for disjoint cliques) is what near-dup clusters
    * SHOULD read, since connected components put every edge inside a
    * cluster — the e_c/m term saturates and Q measures how evenly the
    * degree mass spreads; a Q collapse would mean a giant hub
    * component ate the graph (the boilerplate failure `graph_hubs`
    * attributes). Exact arithmetic: Q·4m² = Σ_c [4·m·e_c − d_c²] is
    * an integer (counts and their squares, order-independent sum);
    * one final IEEE division emits ppm.
    *
    * Scale shape: everything expensive is the pair generation and the
    * O(log² n) contraction already priced in dedup_clusters_star; on
    * top are two cluster-keyed partial-aggregating rollups (edge
    * endpoints → cluster, degrees → cluster) folded to one row.
    */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    // both inputs read from the persisted artifact: the pair list AND
    // the component labels (joins below restrict to edge endpoints, so
    // the artifact's singleton rows are inert)
    val pairs = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    val labels = NearDupArtifact.labels(spark, dir)
      .select(col("doc_id"), col("cluster_id").as("label"))
    val m = pairs.count() // undirected edge count
    // within-cluster edges: both endpoints share a label (components
    // ⇒ every edge qualifies; computed, not assumed — the join is the
    // audit)
    val la = labels.select(col("doc_id").as("doc_a"), col("label"))
    val lb = labels.select(col("doc_id").as("doc_b"),
      col("label").as("label_b"))
    val ec = pairs.join(la, "doc_a").join(lb, "doc_b")
      .where(col("label") === col("label_b"))
      .groupBy(col("label")).agg(count(lit(1)).as("e_c"))
    val dc = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
      .groupBy(col("label")).agg(count(lit(1)).as("d_c"))
    dc.join(ec, Seq("label"), "left_outer")
      .select((lit(4L) * m * coalesce(col("e_c"), lit(0L)) -
        col("d_c") * col("d_c")).as("q_num"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("q_num")).as("qn"))
      .select(col("n_clusters"), lit(m).as("n_edges"),
        floor(lit(1e6) * col("qn").cast("double") /
          (lit(4.0) * lit(m.toDouble) * lit(m.toDouble)))
          .cast("long").as("modularity_ppm"))
  }

  val graphModularitySql: String =
    s"""WITH RECURSIVE ${DedupQueries.sqlSimhashPairCtes},
       |gmp AS (SELECT doc_a, doc_b FROM spairs),
       |gme AS (SELECT doc_a AS src, doc_b AS dst FROM gmp
       |  UNION ALL SELECT doc_b, doc_a FROM gmp),
       |gmwalk AS (
       |  SELECT src AS v, src AS r FROM gme
       |  UNION
       |  SELECT w.v, g.dst AS r FROM gmwalk w JOIN gme g ON w.r = g.src),
       |gmcomp AS (
       |  SELECT v AS doc_id, MIN(r) AS label FROM gmwalk GROUP BY v),
       |gmm AS (SELECT COUNT(*) AS m FROM gmp),
       |gmec AS (
       |  SELECT la.label, COUNT(*) AS e_c
       |  FROM gmp p JOIN gmcomp la ON p.doc_a = la.doc_id
       |  JOIN gmcomp lb ON p.doc_b = lb.doc_id
       |  WHERE la.label = lb.label GROUP BY la.label),
       |gmdc AS (
       |  SELECT c.label, COUNT(*) AS d_c
       |  FROM gme g JOIN gmcomp c ON g.src = c.doc_id GROUP BY c.label),
       |gmq AS (
       |  SELECT d.label,
       |    4 * (SELECT m FROM gmm) * COALESCE(e.e_c, 0)
       |      - d.d_c * d.d_c AS q_num
       |  FROM gmdc d LEFT JOIN gmec e ON d.label = e.label)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST((SELECT m FROM gmm) AS BIGINT) AS n_edges,
       |  CAST(floor(1e6 * CAST(SUM(q_num) AS DOUBLE)
       |    / (4.0 * CAST((SELECT m FROM gmm) AS DOUBLE)
       |       * CAST((SELECT m FROM gmm) AS DOUBLE))) AS BIGINT)
       |    AS modularity_ppm
       |FROM gmq""".stripMargin

  def graphKcore(spark: SparkSession, dir: String): DataFrame = {
    // each round is materialized (localCheckpoint, as in the CC
    // queries): without it round i's degree count re-executes every
    // earlier round's semi-join chain — measured 14 s vs ~2 s at sf0.1.
    // Edge list read from the persisted artifact (see graphSeedDistance)
    var edges = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("doc_a").as("v"))
        .union(e.select(col("doc_b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    var deg = degrees(edges)
    for (_ <- 2 to KcoreRounds) {
      val keep = deg.where(col("deg") >= KcoreK).select(col("v"))
      edges = edges
        .join(keep.select(col("v").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(keep.select(col("v").as("doc_b")), Seq("doc_b"), "left_semi")
        .localCheckpoint(true)
      deg = degrees(edges)
    }
    deg.where(col("deg") >= KcoreK)
      .select(col("v").as("doc_id"), col("deg"))
  }

  val graphKcoreSql: String = {
    def round(i: Int, prevEdges: String): String =
      s"""deg$i AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS v FROM $prevEdges
         |    UNION ALL SELECT doc_b AS v FROM $prevEdges) u
         |  GROUP BY v),
         |keep$i AS (SELECT v FROM deg$i WHERE deg >= $KcoreK),
         |e${i + 1} AS (
         |  SELECT doc_a, doc_b FROM e$i
         |  WHERE doc_a IN (SELECT v FROM keep$i)
         |    AND doc_b IN (SELECT v FROM keep$i))"""
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |e1 AS (SELECT doc_a, doc_b FROM spairs),
       |${round(1, "e1")},
       |${round(2, "e2")},
       |deg3 AS (
       |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT doc_a AS v FROM e3
       |    UNION ALL SELECT doc_b AS v FROM e3) u
       |  GROUP BY v)
       |SELECT v AS doc_id, deg FROM deg3 WHERE deg >= $KcoreK""".stripMargin
  }

  // ------------------------------------------------ composed filter
  /** C4/RefinedWeb-style keep/drop pipeline: length floor, stopword
    * ceiling, repetition ceiling, then near-dup removal (keep the
    * lowest doc_id of each simhash near-dup pair), with the FIRST
    * failing rule recorded — the audit column every production filter
    * pipeline carries so corpus composition changes are attributable.
    * All ratios are integer ppm; the near-dup verdict reuses the
    * banded simhash pair generator, so the only non-trivial cost is
    * the pair join the dedup stage already pays. The dup-id set scales
    * with the corpus (duplicate fraction of 100 TB is itself huge), so
    * its join shuffles on the 8-byte doc_id — deliberately NOT hinted
    * broadcast; AQE may still choose broadcast when it measures small.
    */
  def pipelineFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val base = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      size(filter(toks, t => t === "the" || t === "a")).cast("long")
        .as("n_stop"))
    val topShare = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    // near-dup verdicts read from the persisted pair artifact (docs
    // here is the full documents table — the artifact's exact input)
    val dupB = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val reason = when(col("n_tok") < 15, "too_short")
      .when(ppm(col("n_stop"), col("n_tok")) >= 150000, "stopwordy")
      .when(ppm(col("top_cnt"), col("n_tok")) >= 200000, "repetitive")
      .when(col("is_dup"), "near_dup")
    base.join(topShare, "doc_id")
      .join(dupB, Seq("doc_id"), "left_outer")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      .select(col("doc_id"), reason.as("reason"))
      .withColumn("keep", col("reason").isNull)
      .orderBy(col("doc_id"))
  }

  val pipelineFilterSql: String =
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
       |  FROM documents),
       |tc AS (
       |  SELECT doc_id, MAX(c) AS top_cnt FROM (
       |    SELECT doc_id, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |          FROM documents) x
       |    GROUP BY doc_id, tok) y
       |  GROUP BY doc_id),
       |dup AS (SELECT DISTINCT doc_b AS doc_id FROM spairs),
       |verdict AS (
       |  SELECT base.doc_id,
       |    CASE WHEN n_tok < 15 THEN 'too_short'
       |         WHEN ${sqlPpm("n_stop", "n_tok")} >= 150000 THEN 'stopwordy'
       |         WHEN ${sqlPpm("top_cnt", "n_tok")} >= 200000 THEN 'repetitive'
       |         WHEN dup.doc_id IS NOT NULL THEN 'near_dup'
       |         ELSE NULL END AS reason
       |  FROM base
       |  JOIN tc ON base.doc_id = tc.doc_id
       |  LEFT JOIN dup ON base.doc_id = dup.doc_id)
       |SELECT doc_id, reason, reason IS NULL AS keep
       |FROM verdict
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ triangle census
  /** Triangle census of the simhash near-dup graph: nodes, edges,
    * wedges (open 2-paths), triangles, and the global clustering
    * coefficient as ppm. Distinguishes template spam (dense cliques →
    * high clustering) from chained crawl dups (paths → low). The
    * triangle join is edge⨝edge⨝edge on oriented edges (doc_a <
    * doc_b), the standard distributed formulation — each join shuffles
    * 16-byte edge rows on one endpoint, and orientation means every
    * triangle is counted exactly once.
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    // artifact-read edge list (see graphSeedDistance); cached for the
    // three-way self-join
    val edges = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).cache()
    val deg = edges.select(col("doc_a").as("node"))
      .union(edges.select(col("doc_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val counts = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(shiftright(col("deg") * (col("deg") - 1), 1)).as("n_wedges"))
    val e1 = edges.as("e1"); val e2 = edges.as("e2"); val e3 = edges.as("e3")
    val tri = e1.join(e2, col("e1.doc_b") === col("e2.doc_a"))
      .join(e3, col("e3.doc_a") === col("e1.doc_a") &&
        col("e3.doc_b") === col("e2.doc_b"))
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    counts.join(broadcast(nEdges)).join(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, 0L)
          .otherwise(ppm(col("n_triangles") * 3, col("n_wedges")))
          .as("clustering_ppm"))
  }

  val graphTrianglesSql: String =
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (SELECT doc_a, doc_b FROM spairs),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT doc_a AS node FROM edges
       |    UNION ALL SELECT doc_b AS node FROM edges) u
       |  GROUP BY node),
       |tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM edges e1
       |  JOIN edges e2 ON e1.doc_b = e2.doc_a
       |  JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
       |SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       |  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
       |  (SELECT n_triangles FROM tri) AS n_triangles,
       |  CASE WHEN SUM(deg * (deg - 1) // 2) = 0 THEN 0
       |       ELSE ${sqlPpm("(SELECT n_triangles FROM tri) * 3",
        "SUM(deg * (deg - 1) // 2)")} END AS clustering_ppm
       |FROM deg""".stripMargin

  // ------------------------------------------------ bloom pruning
  /** Bloom-filter join pruning: build an m=8192-bit, k=2 bloom filter
    * over a selective dimension key set (BUILDING-segment customers)
    * as 256 packed 32-bit words — a byte-bounded structure at ANY
    * dimension size — then pre-filter the fact table (orders) through
    * it before the real join. The report row carries the measured
    * false-positive count and asserts zero false negatives in-band
    * (n_missed — rows the exact join matches but the bloom rejected —
    * must be 0, the bloom guarantee). At 100 TB this is the pattern
    * that turns a full fact shuffle into a broadcast prefilter: the
    * bloom words table never exceeds m/32 rows no matter how large the
    * dimension grows, unlike broadcasting the dimension itself.
    */
  def bloomJoinPrune(spark: SparkSession, dir: String): DataFrame = {
    val m = BloomBits
    def h(c: Column): Column = CrossHash.md5Long(concat(lit("bloom:"),
      c.cast("string")))
    val dim = table(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key")).distinct()
    val positions = dim.select(col("key"), h(col("key")).as("hv"))
      .select(explode(array(col("hv") % m, shiftright(col("hv"), BloomShift) % m))
        .as("pos"))
    val words = positions
      .select((col("pos") / WordBits).cast("long").as("word_idx"),
        (col("pos") % WordBits).cast("int").as("bit"))
      .groupBy(col("word_idx"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("wv"))
    val facts = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), h(col("o_custkey")).as("hv"))
      .withColumn("p1", col("hv") % m)
      .withColumn("p2", shiftright(col("hv"), BloomShift) % m)
    val w1 = words.select(col("word_idx").as("wi1"), col("wv").as("wv1"))
    val w2 = words.select(col("word_idx").as("wi2"), col("wv").as("wv2"))
    val truth = dim.withColumn("true_match", lit(true))
    val probed = facts
      .join(broadcast(w1), (col("p1") / WordBits).cast("long") === col("wi1"),
        "left_outer")
      .join(broadcast(w2), (col("p2") / WordBits).cast("long") === col("wi2"),
        "left_outer")
      .withColumn("pass_bloom",
        expr(s"(coalesce(wv1, 0L) div shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(p1 % $WordBits AS INT))) % 2 = 1") &&
        expr(s"(coalesce(wv2, 0L) div shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(p2 % $WordBits AS INT))) % 2 = 1"))
      .join(broadcast(truth), col("o_custkey") === col("key"), "left_outer")
      .withColumn("true_match", coalesce(col("true_match"), lit(false)))
    probed.agg(
      count(lit(1)).as("n_fact"),
      count(when(col("pass_bloom"), 1)).as("n_pass_bloom"),
      count(when(col("true_match"), 1)).as("n_true_match"),
      count(when(col("pass_bloom") && !col("true_match"), 1))
        .as("n_false_pos"),
      count(when(col("true_match") && !col("pass_bloom"), 1))
        .as("n_missed"))
  }

  val bloomJoinPruneSql: String = {
    val m = BloomBits
    def h(x: String): String =
      CrossHash.sqlMd5Long(s"'bloom:' || CAST($x AS VARCHAR)")
    s"""WITH dim AS (
       |  SELECT DISTINCT c_custkey AS key FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |pos AS (
       |  SELECT p.pos FROM (
       |    SELECT ${h("key")} % $m AS pos FROM dim
       |    UNION ALL
       |    SELECT (${h("key")} // $m) % $m AS pos FROM dim) p),
       |words AS (
       |  SELECT pos // $WordBits AS word_idx,
       |    bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT)) AS wv
       |  FROM pos GROUP BY pos // $WordBits),
       |facts AS (
       |  SELECT o_orderkey, o_custkey,
       |    ${h("o_custkey")} % $m AS p1,
       |    (${h("o_custkey")} // $m) % $m AS p2
       |  FROM orders),
       |probed AS (
       |  SELECT f.o_custkey,
       |    (COALESCE(w1.wv, 0) // (CAST(1 AS BIGINT) <<
       |       CAST(f.p1 % $WordBits AS INT))) % 2 = 1
       |    AND (COALESCE(w2.wv, 0) // (CAST(1 AS BIGINT) <<
       |       CAST(f.p2 % $WordBits AS INT))) % 2 = 1 AS pass_bloom,
       |    dim.key IS NOT NULL AS true_match
       |  FROM facts f
       |  LEFT JOIN words w1 ON f.p1 // $WordBits = w1.word_idx
       |  LEFT JOIN words w2 ON f.p2 // $WordBits = w2.word_idx
       |  LEFT JOIN dim ON f.o_custkey = dim.key)
       |SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_fact,
       |  CAST(COUNT(CASE WHEN pass_bloom THEN 1 END) AS BIGINT)
       |    AS n_pass_bloom,
       |  CAST(COUNT(CASE WHEN true_match THEN 1 END) AS BIGINT)
       |    AS n_true_match,
       |  CAST(COUNT(CASE WHEN pass_bloom AND NOT true_match THEN 1 END)
       |    AS BIGINT) AS n_false_pos,
       |  CAST(COUNT(CASE WHEN true_match AND NOT pass_bloom THEN 1 END)
       |    AS BIGINT) AS n_missed
       |FROM probed""".stripMargin
  }

  // ------------------------------------------------ distributed scan
  /** Exclusive prefix sum of `n_tok` over the global (ord, doc_id)
    * order WITHOUT a single-partition window: the classic two-phase
    * scan. Phase 1 windows within each of 256 order-preserving buckets
    * (the top 8 bits of the 56-bit order hash — the bucket is a prefix
    * of the sort key, so bucket order == global order); phase 2
    * computes per-bucket offsets on a (|partCols distinct| × 256)-row
    * frame — bounded regardless of corpus size, safe to broadcast —
    * and adds them back. A plain global `Window.orderBy` would move
    * the entire corpus through one task; this shape keeps every
    * executor busy on ~0.4% of the data and is how packing/budgeting
    * stays feasible at 100 TB. Input must carry `ord` (56-bit
    * nonnegative hash), `doc_id`, `n_tok` and `partCols`; output adds
    * `pos`, the tokens strictly before this doc in its partition's
    * global order.
    */
  private def scanPos(df: DataFrame, partCols: Seq[String]): DataFrame = {
    // the explicit not-null filter on the join keys is a no-op for
    // callers (hash keys are never null) but keeps BOTH consumers of
    // the exchange textually identical — without it the join injects
    // IsNotNull on the streamed side only and ReuseExchange can't fire
    val withB = df.withColumn("bkt", shiftright(col("ord"), 48))
      .where((partCols :+ "bkt").map(col(_).isNotNull).reduce(_ && _))
    val part = (partCols :+ "bkt").map(col)
    val inW = Window.partitionBy(part: _*)
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = withB.withColumn("pre_in",
      coalesce(sum(col("n_tok")).over(inW), lit(0L)))
    val offW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals are derived from the WINDOWED frame, not the
    // source: pre_in + n_tok is nondecreasing in window order, so its
    // max is the bucket's token total, and because this aggregate
    // consumes the same (partCols, bkt) exchange the window produced,
    // ReuseExchange serves both from ONE scan of the source
    val offs = within.groupBy(part: _*)
      .agg(max(col("pre_in") + col("n_tok")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(offW), lit(0L)))
      .select(part :+ col("boff"): _*)
    within.join(broadcast(offs), partCols :+ "bkt")
      .withColumn("pos", col("boff") + col("pre_in"))
      .drop("bkt", "pre_in", "boff")
  }

  // ------------------------------------------------ sequence packing
  private val SeqLen = 512 // tokens per packed training sequence
  private val SeqShift = 9 // log2(SeqLen): exact floor div, pos >= 0
  require(1L << SeqShift == SeqLen, "SeqShift != log2(SeqLen)")

  /** Sequence packing — the GPT-style "concatenate the corpus in a
    * fixed shuffle order, then split into SeqLen-token training
    * sequences" operator. Each document's placement is determined by
    * an exclusive prefix sum of token counts over a deterministic
    * hash order ([[scanPos]] — two-phase scan, no global-sort
    * bottleneck), from which its first/last sequence index and the
    * number of sequence boundaries it straddles follow by integer
    * division. Padding-free by construction (documents flow across
    * boundaries), which is why this shape beats per-bin first-fit at
    * corpus scale: placement is one scan + one broadcast join,
    * embarrassingly parallel, and reproducible across engines.
    */
  def pipelinePack(spark: SparkSession, dir: String): DataFrame = {
    // NULL text would make size(split) = -1, corrupting the running
    // totals (scanPos assumes n_tok >= 0) — coalesce to the empty
    // string on BOTH engines so such a row counts one empty token
    val base = table(spark, dir, "documents").select(
      col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " "))
        .cast("long").as("n_tok"),
      CrossHash.md5Long(concat(lit("pack:"), col("doc_id").cast("string")))
        .as("ord"))
    scanPos(base, Nil)
      .select(col("doc_id"), col("n_tok"),
        shiftright(col("pos"), SeqShift).as("start_seq"),
        shiftright(col("pos") + col("n_tok") - 1, SeqShift).as("end_seq"))
      .withColumn("n_crossed", col("end_seq") - col("start_seq"))
      .orderBy(col("doc_id"))
  }

  val pipelinePackSql: String = {
    val h = CrossHash.sqlMd5Long("'pack:' || CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
       |      AS n_tok,
       |    $h AS ord
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (
       |    ORDER BY ord, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS pos
       |  FROM base)
       |SELECT doc_id, n_tok,
       |  pos // $SeqLen AS start_seq,
       |  (pos + n_tok - 1) // $SeqLen AS end_seq,
       |  (pos + n_tok - 1) // $SeqLen - pos // $SeqLen AS n_crossed
       |FROM pos ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ shard planning
  private val ShardTok = 16384L // target tokens per output shard
  private val ShardShift = 14 // log2(ShardTok): exact floor div, pos >= 0
  require(1L << ShardShift == ShardTok, "ShardShift != log2(ShardTok)")

  /** Token-balanced output sharding — the writer-side plan for "emit
    * the corpus as N shards of ~[[ShardTok]] tokens each, whole
    * documents only": a document belongs to the shard its first token
    * lands in under the same exclusive prefix scan as [[pipelinePack]]
    * (hash order, [[scanPos]] — no global-sort bottleneck), so shard
    * sizes are ShardTok ± one document and assignment is one scan +
    * one broadcast join at any corpus size. The report is one row per
    * planned shard: document count, token count, and fill vs target in
    * exact ppm — the skew a shard-writer watches (the final shard runs
    * underfull by construction).
    */
  def pipelineShard(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "documents").select(
      col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " "))
        .cast("long").as("n_tok"),
      CrossHash.md5Long(concat(lit("shard:"), col("doc_id").cast("string")))
        .as("ord"))
    scanPos(base, Nil)
      .select(col("doc_id"), col("n_tok"),
        shiftright(col("pos"), ShardShift).as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("fill_ppm", ppm(col("n_tokens"), lit(ShardTok)))
      .orderBy(col("shard_id"))
  }

  val pipelineShardSql: String = {
    val h = CrossHash.sqlMd5Long("'shard:' || CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
       |      AS n_tok,
       |    $h AS ord
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (
       |    ORDER BY ord, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS pos
       |  FROM base)
       |SELECT pos // $ShardTok AS shard_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  ${sqlPpm("SUM(n_tok)", ShardTok.toString)} AS fill_ppm
       |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------ corpus mixture
  private val MixBudget = 20000L // token budget for the mixture
  private val MixWeights = Seq( // ppm of the budget per language
    "de" -> 150000L, "en" -> 400000L, "es" -> 150000L,
    "fr" -> 150000L, "zh" -> 150000L)

  /** Corpus mixing — fill a per-language token budget (ppm weights of
    * a total budget) by taking documents in deterministic hash order
    * until the next whole document would overflow the language's
    * allocation. This is the data-mixture step of a pretraining run
    * (so many tokens of each language/domain), made reproducible: the
    * hash order is engine-independent, and the per-language running
    * token total comes from the same two-phase scan as
    * [[pipelinePack]] (partitioned by lang), so no global sort exists
    * at any scale. Reports per-language fill: docs kept, tokens kept,
    * and attained fraction of target in ppm.
    */
  def pipelineMix(spark: SparkSession, dir: String): DataFrame = {
    val wtCol = MixWeights.foldRight(lit(0L): Column) {
      case ((l, w), e) => when(col("lang") === l, lit(w)).otherwise(e)
    }
    // lang is nullable in the schema; a NULL key would be dropped by
    // the scan's equi-join while the oracle's GROUP BY keeps it — map
    // NULL to a sentinel group on both sides so no document is lost
    val base = table(spark, dir, "documents").select(
      col("doc_id"), coalesce(col("lang"), lit("<null>")).as("lang"),
      size(split(coalesce(col("text"), lit("")), " "))
        .cast("long").as("n_tok"),
      CrossHash.md5Long(concat(lit("mix:"), col("doc_id").cast("string")))
        .as("ord"))
    scanPos(base, Seq("lang"))
      .withColumn("wt", wtCol)
      .withColumn("tgt_tok", expr(s"(wt * $MixBudget) div 1000000"))
      .withColumn("keep", col("pos") + col("n_tok") <= col("tgt_tok"))
      .groupBy(col("lang"))
      .agg(max(col("tgt_tok")).as("tgt_tok"),
        count(when(col("keep"), 1)).as("n_docs_kept"),
        coalesce(sum(when(col("keep"), col("n_tok"))), lit(0L))
          .as("n_tok_kept"))
      .withColumn("fill_ppm",
        when(col("tgt_tok") > 0, ppm(col("n_tok_kept"), col("tgt_tok")))
          .otherwise(lit(0L)))
      .orderBy(col("lang"))
  }

  val pipelineMixSql: String = {
    val h = CrossHash.sqlMd5Long("'mix:' || CAST(doc_id AS VARCHAR)")
    val wt = MixWeights
      .map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH base AS (
       |  SELECT doc_id, COALESCE(lang, '<null>') AS lang,
       |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
       |      AS n_tok,
       |    $h AS ord
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, lang, n_tok, CAST(COALESCE(SUM(n_tok) OVER (
       |    PARTITION BY lang ORDER BY ord, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS pos
       |  FROM base),
       |k AS (
       |  SELECT lang, n_tok,
       |    (CAST(($wt) AS BIGINT) * $MixBudget) // 1000000 AS tgt_tok,
       |    pos + n_tok <= (CAST(($wt) AS BIGINT) * $MixBudget) // 1000000 AS keep
       |  FROM pos)
       |SELECT lang, MAX(tgt_tok) AS tgt_tok,
       |  CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_docs_kept,
       |  CAST(COALESCE(SUM(CASE WHEN keep THEN n_tok END), 0) AS BIGINT)
       |    AS n_tok_kept,
       |  CASE WHEN MAX(tgt_tok) > 0
       |    THEN ${sqlPpm("COALESCE(SUM(CASE WHEN keep THEN n_tok END), 0)",
        "MAX(tgt_tok)")}
       |    ELSE 0 END AS fill_ppm
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------------------- temperature-sampled mixing
  /** Temperature-sampled mixture weights — the multilingual/multi-
    * source pretraining recipe (p_i ∝ n_i^(1/T)) that upsamples the
    * tail without letting the head drown it. T = 2 ⇒ √n scaling,
    * chosen deliberately: `sqrt` of an exact integer is ONE correctly-
    * rounded IEEE op in both engines (any other exponent goes through
    * libm's `pow` and drifts by ulps — the cross-engine hazard class
    * the survey bans). The √-weights are floored to integer
    * milli-units BEFORE the cross-group normalizer sum, so the
    * normalizer is an exact long — the groups frame is
    * vocabulary-sized (|langs| rows), making every downstream step
    * metadata-scale arithmetic on one broadcast row.
    *
    * Output per language: corpus counts, temperature weight vs
    * natural share (both exact ppm), tokens drawn from this language
    * under [[MixBudget]], and the oversampling factor
    * (`epochs_ppm` > 1e6 ⇔ the language's data repeats within one
    * pass of the mixture — the number the curriculum designer
    * actually reads). `draw_tok · w_total` stays far inside int64 here;
    * at extreme budgets divide before multiplying or route the product
    * through DECIMAL(38,0).
    */
  def pipelineTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "documents")
      .select(coalesce(col("lang"), lit("<null>")).as("lang"),
        size(split(coalesce(col("text"), lit("")), " "))
          .cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"))
    val scaled = counts.withColumn("w_scaled",
      floor(sqrt(col("n_tok").cast("double")) * 1000).cast("long"))
    val totals = scaled.agg(sum(col("w_scaled")).as("w_total"),
      sum(col("n_tok")).as("tok_total"))
    scaled.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tok"),
        ppm(col("w_scaled"), col("w_total")).as("weight_ppm"),
        ppm(col("n_tok"), col("tok_total")).as("natural_ppm"),
        expr(s"(w_scaled * $MixBudget) div w_total").as("draw_tok"))
      .withColumn("epochs_ppm", ppm(col("draw_tok"), col("n_tok")))
      .orderBy(col("lang"))
  }

  val pipelineTemperatureMixSql: String =
    s"""WITH counts AS (
       |  SELECT COALESCE(lang, '<null>') AS lang,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT)
       |      AS n_tok
       |  FROM documents GROUP BY 1),
       |s AS (
       |  SELECT lang, n_docs, n_tok,
       |    CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000) AS BIGINT)
       |      AS w_scaled
       |  FROM counts),
       |t AS (
       |  SELECT CAST(SUM(w_scaled) AS BIGINT) AS w_total,
       |    CAST(SUM(n_tok) AS BIGINT) AS tok_total
       |  FROM s)
       |SELECT lang, n_docs, n_tok,
       |  ${sqlPpm("w_scaled", "w_total")} AS weight_ppm,
       |  ${sqlPpm("n_tok", "tok_total")} AS natural_ppm,
       |  (w_scaled * $MixBudget) // w_total AS draw_tok,
       |  ${sqlPpm(s"(w_scaled * $MixBudget) // w_total", "n_tok")}
       |    AS epochs_ppm
       |FROM s, t ORDER BY lang""".stripMargin

  // ------------------------------------------------ graph centrality
  private val PrIters = 3 // fixed power-iteration count
  private val PrBase = 150000L // (1 - d) scaled by 1e6
  private val PrDamp = 850000L // damping d scaled by 1e6

  /** PageRank over the near-dup graph (top 20 hub documents): which
    * documents sit at the center of duplicate clusters — the
    * template/boilerplate detector that degree alone misses (a hub of
    * hubs outranks a leaf of one big star). Fixed 3-round power
    * iteration in integer arithmetic scaled by 1e6: per-edge
    * contribution `(d * (pr div deg)) div 1e6` keeps every
    * intermediate within int64 for realistic rank magnitudes (damping
    * applied BEFORE the aggregate, so the summed column is bounded by
    * total rank mass, not 1e6× it) and makes all three rounds
    * bit-identical across engines — no float fixpoint to disagree on.
    * Each round is one shuffle of (dst, contribution) pairs keyed by
    * 8-byte ids; the edge and degree frames are computed once and
    * cached. Unrolled, not iterated-to-convergence: round count fixed
    * means plan depth fixed — the 100 TB-safe choice.
    */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankFrame(NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")))
      .orderBy(col("pr").desc, col("node")).limit(20)

  /** The iteration itself over an undirected pair list (doc_a, doc_b),
    * one row per edge — factored so specs can drive it on synthetic
    * graphs (star/chain shape checks).
    */
  private[analytics] def pagerankFrame(undirected: DataFrame): DataFrame = {
    val pairs = undirected.toDF("doc_a", "doc_b").cache()
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) computed ONCE: the degree join is loop-invariant,
    // so hoisting it halves the per-iteration stage count — each round
    // is exactly one join (edge × rank on src) plus one aggregate
    // (sum of damped contributions on dst)
    val wEdges = edges.join(deg, "src").cache()
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = wEdges.join(pr, col("src") === col("node"))
        .select(col("dst"),
          expr(s"($PrDamp * (pr div deg)) div 1000000").as("c"))
      pr = contrib.groupBy(col("dst"))
        .agg((lit(PrBase) + sum(col("c"))).as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
    pr
  }

  val graphPagerankSql: String = {
    val iters = (1 to PrIters).map { i =>
      s"""p$i AS (
         |  SELECT e.dst AS node,
         |    CAST($PrBase + SUM(($PrDamp * (p.pr // d.deg)) // 1000000)
         |      AS BIGINT) AS pr
         |  FROM edges e
         |  JOIN p${i - 1} p ON e.src = p.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM spairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM spairs),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
       |        FROM edges GROUP BY src),
       |p0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$iters
       |SELECT node, pr FROM p$PrIters
       |ORDER BY pr DESC, node LIMIT 20""".stripMargin
  }

  // ---------------------------------- label propagation communities
  /** Label-propagation community detection (LPA) over the near-dup
    * graph — the fourth graph family next to connectivity
    * (dedup_clusters), census (graph_triangles), and centrality
    * (graph_pagerank): communities are DENSITY structures, so a
    * bridge edge that joins two clusters into one connected component
    * still leaves them as two communities (proven on a
    * bridged-triangles fixture in the spec).
    *
    * Determinism: synchronous rounds with a total-ordered vote —
    * neighbor-label counts ranked by (count DESC, label ASC), so the
    * classic random tie-break is replaced by min-label and both
    * engines unroll the identical [[LpaIters]] rounds.
    *
    * Scale shape: per round, one join of the edge list against the
    * label table (both keyed on the vertex — co-partitioned after the
    * first shuffle) and one (node, label) count with map-side
    * combine; the argmax window partitions by node. Rounds are fixed
    * (LPA converges in a handful of sweeps; fixed rounds keep the
    * cross-engine unroll exact).
    */
  val LpaIters = 3

  def graphLpa(spark: SparkSession, dir: String): DataFrame =
    lpaFrame(NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b")))

  private[analytics] def lpaFrame(undirected: DataFrame): DataFrame = {
    val pairs = undirected.toDF("doc_a", "doc_b").cache()
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").cache() // reused every round
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cnt").desc, col("label").asc)
    for (_ <- 1 to LpaIters) {
      lab = edges.join(lab, col("dst") === col("node"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("src").as("node"), col("label"))
    }
    val sizes = lab.groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    lab.join(sizes, "label")
      .select(col("node"), col("label").as("community"),
        col("community_size"))
  }

  val graphLpaSql: String = {
    val rounds = (1 to LpaIters).map { i =>
      s"""v$i AS (
         |  SELECT e.src, l.label, COUNT(*) AS cnt
         |  FROM edges e JOIN l${i - 1} l ON e.dst = l.node
         |  GROUP BY 1, 2),
         |l$i AS (
         |  SELECT src AS node, label FROM (
         |    SELECT src, label,
         |      ROW_NUMBER() OVER (PARTITION BY src
         |        ORDER BY cnt DESC, label) AS rn
         |    FROM v$i)
         |  WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM spairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM spairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |$rounds,
       |sz AS (SELECT label, COUNT(*) AS community_size
       |       FROM l$LpaIters GROUP BY 1)
       |SELECT l.node, l.label AS community,
       |  CAST(sz.community_size AS BIGINT) AS community_size
       |FROM l$LpaIters l JOIN sz ON l.label = sz.label""".stripMargin
  }

  // ------------------------------------------- linear quality classifier
  /** Model-based quality filtering, the inference half: a linear
    * classifier with FIXED integer weights over per-document features
    * (lexical diversity, stopword rate, mean token length, digit
    * density) — the fasttext-classifier shape every pretraining
    * pipeline runs (keep/drop + a margin score), with the training
    * externalized (weights arrive as constants, exactly like a shipped
    * model artifact). The score is a pure integer dot product of
    * ppm-scaled features, so classify-then-threshold is bit-identical
    * in both engines; a logistic sigmoid would add nothing but libm
    * drift — it is monotone, so the threshold is equivalent.
    *
    * Plan: one scan, zero shuffles, all codegen'd built-ins — per-doc
    * inference stays embarrassingly parallel at any corpus size.
    */
  def pipelineClassifier(spark: SparkSession, dir: String): DataFrame = {
    val ts = split(col("text"), " ")
    val stop = size(filter(ts, t => t === "the" || t === "a"))
    val feats = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(ts).cast("long").as("n_tokens"),
        ppm(size(array_distinct(ts)), size(ts)).as("diversity_ppm"),
        ppm(stop, size(ts)).as("stop_ppm"),
        ppm(length(regexp_replace(col("text"), " ", "")), size(ts))
          .as("mean_len_ppm"),
        ppm(length(regexp_replace(col("text"), "[^0-9]", "")),
          length(col("text"))).as("digit_ppm"))
    feats.withColumn("score",
        lit(2L) * col("diversity_ppm") - lit(3L) * col("stop_ppm") +
          col("mean_len_ppm") - lit(2L) * col("digit_ppm") - lit(400000L))
      .withColumn("verdict",
        when(col("score") > 5400000L, "high")
          .when(col("score") > 4500000L, "mid")
          .otherwise("drop"))
      .orderBy(col("doc_id"))
  }

  val pipelineClassifierSql: String = {
    val ntok = "len(string_split(text, ' '))"
    val ndis = "len(list_distinct(string_split(text, ' ')))"
    val stop = "len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))"
    val letters = "length(regexp_replace(text, ' ', '', 'g'))"
    val digits = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    s"""WITH f AS (
       |  SELECT doc_id, lang, CAST($ntok AS BIGINT) AS n_tokens,
       |    ${sqlPpm(ndis, ntok)} AS diversity_ppm,
       |    ${sqlPpm(stop, ntok)} AS stop_ppm,
       |    ${sqlPpm(letters, ntok)} AS mean_len_ppm,
       |    ${sqlPpm(digits, "length(text)")} AS digit_ppm
       |  FROM documents)
       |SELECT doc_id, lang, n_tokens, diversity_ppm, stop_ppm,
       |  mean_len_ppm, digit_ppm,
       |  2 * diversity_ppm - 3 * stop_ppm + mean_len_ppm
       |    - 2 * digit_ppm - 400000 AS score,
       |  CASE WHEN 2 * diversity_ppm - 3 * stop_ppm + mean_len_ppm
       |    - 2 * digit_ppm - 400000 > 5400000 THEN 'high'
       |       WHEN 2 * diversity_ppm - 3 * stop_ppm + mean_len_ppm
       |    - 2 * digit_ppm - 400000 > 4500000 THEN 'mid'
       |       ELSE 'drop' END AS verdict
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------- classifier ROC-AUC audit
  /** Exact ROC AUC of the quality classifier against an INDEPENDENT
    * weak label — the audit every model-based filter needs before its
    * verdicts gate a corpus: does the score actually rank clean
    * documents above degenerate ones? The weak label is 3-gram
    * repetition (Gopher's boilerplate signal, [[TextQueries
    * .textRepetition]]) — deliberately OUTSIDE the classifier's
    * feature set (unigram diversity / stopword rate / token length /
    * digit density), so the AUC measures generalization to a signal
    * the model never saw, not feature recall. Positives = zero
    * repeated trigrams.
    *
    * AUC is computed EXACTLY as the Mann-Whitney pair statistic,
    * all-integer: group docs by (lang, score) → per-score class
    * counts; a running window over ascending score gives each score
    * level the negatives strictly below it, so
    * `concordant = Σ n_pos·cum_neg_below` and `tied = Σ n_pos·n_neg`
    * count score-pairs without materializing pairs;
    * `AUC = (2·concordant + tied) / (2·n_pos·n_neg)` (ties at half
    * weight — the trapezoid ROC), shipped as exact-floor ppm. No
    * float ranks, no midrank halves, no sampling.
    *
    * Score formula mirrors [[pipelineClassifier]] verbatim (its
    * oracle pins the shared rule); both signals come from the same
    * row, so the plan is ONE scan, zero joins, a groupBy bounded by
    * the ppm-scale score range (not the corpus), and a per-lang
    * window over that bounded table — at 100 TB the only corpus-sized
    * work is the scan.
    */
  /** `(lang, score, is_pos)` per eligible doc — the AUC query's input,
    * exposed so the spec can brute-force the definitional all-pairs
    * statistic against the windowed rewrite.
    */
  private[analytics] def classifierAucScored(spark: SparkSession,
      dir: String): DataFrame = {
    val ts = split(col("text"), " ")
    val tri = transform(sequence(lit(1), size(ts) - 2),
      i => concat_ws(" ", slice(ts, i, lit(3))))
    val stop = size(filter(ts, t => t === "the" || t === "a"))
    table(spark, dir, "documents")
      .where(size(ts) >= 3) // trigram label needs ≥3 tokens
      .select(col("lang"),
        (lit(2L) * ppm(size(array_distinct(ts)), size(ts)) -
          lit(3L) * ppm(stop, size(ts)) +
          ppm(length(regexp_replace(col("text"), " ", "")), size(ts)) -
          lit(2L) * ppm(length(regexp_replace(col("text"), "[^0-9]", "")),
            length(col("text"))) - lit(400000L)).as("score"),
        when(size(tri) === size(array_distinct(tri)), lit(1L))
          .otherwise(lit(0L)).as("is_pos"))
  }

  def pipelineClassifierAuc(spark: SparkSession, dir: String): DataFrame = {
    val perScore = classifierAucScored(spark, dir)
      .groupBy(col("lang"), col("score"))
      .agg(sum(col("is_pos")).as("n_pos"),
        sum(lit(1L) - col("is_pos")).as("n_neg"))
    val below = Window.partitionBy(col("lang")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cum_neg",
        coalesce(sum(col("n_neg")).over(below), lit(0L)))
      .groupBy(col("lang"))
      .agg(sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        (sum(col("n_pos")) * sum(col("n_neg"))).as("n_pairs"),
        sum(col("n_pos") * col("cum_neg")).as("n_concordant"),
        sum(col("n_pos") * col("n_neg")).as("n_tied"))
      .withColumn("auc_ppm",
        when(col("n_pairs") > 0,
          ppm(lit(2L) * col("n_concordant") + col("n_tied"),
            lit(2L) * col("n_pairs"))))
      .orderBy(col("lang"))
  }

  // --------------------------------- classifier reliability diagram
  /** The threshold-level twin of [[pipelineClassifierAuc]]: a
    * reliability diagram — decile buckets of the classifier score with
    * each bucket's empirical clean rate against the same out-of-feature
    * weak label. AUC says the RANKING works; this says WHERE to put the
    * keep/drop threshold and whether the score is monotone in quality
    * along its whole range (a high AUC can hide a flat or inverted
    * mid-range, exactly where the mid/drop cut sits).
    *
    * Deciles WITHOUT a global doc-level sort (ntile over an unpartitioned
    * window is the single-partition scale cliff): docs collapse to
    * per-score class counts first — a table bounded by the ppm score
    * range, not the corpus — then a running count over ascending score
    * places each whole score level in bucket ⌊10·cum_before/total⌋.
    * A score level is never split across buckets, so the assignment is
    * deterministic under ties (an engine-order-dependent ntile split is
    * not), and the only corpus-sized work is the one scan.
    */
  def pipelineClassifierCalibration(spark: SparkSession,
      dir: String): DataFrame = {
    val perScore = classifierAucScored(spark, dir)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"))
    val asc = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    perScore
      .withColumn("cum_before",
        coalesce(sum(col("n")).over(asc), lit(0L)))
      .withColumn("total", sum(col("n")).over(all))
      .withColumn("bucket",
        least(floor(lit(10L) * col("cum_before") / col("total")), lit(9L))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(min(col("score")).as("score_lo"),
        max(col("score")).as("score_hi"),
        sum(col("n")).as("n_docs"),
        sum(col("n_pos")).as("n_pos"))
      .withColumn("clean_ppm", ppm(col("n_pos"), col("n_docs")))
      .orderBy(col("bucket"))
  }

  val pipelineClassifierCalibrationSql: String = {
    val ntok = "len(string_split(text, ' '))"
    val ndis = "len(list_distinct(string_split(text, ' ')))"
    val stop =
      "len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))"
    val letters = "length(regexp_replace(text, ' ', '', 'g'))"
    val digits = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    val tri = "list_transform(generate_series(1, len(toks) - 2)," +
      " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
    s"""WITH t AS (
       |  SELECT text, string_split(text, ' ') AS toks
       |  FROM documents WHERE $ntok >= 3),
       |s AS (
       |  SELECT
       |    2 * ${sqlPpm(ndis, ntok)} - 3 * ${sqlPpm(stop, ntok)}
       |      + ${sqlPpm(letters, ntok)}
       |      - 2 * ${sqlPpm(digits, "length(text)")} - 400000 AS score,
       |    CASE WHEN len($tri) = len(list_distinct($tri))
       |      THEN 1 ELSE 0 END AS is_pos
       |  FROM t),
       |g AS (
       |  SELECT score, COUNT(*) AS n, SUM(is_pos) AS n_pos
       |  FROM s GROUP BY 1),
       |b AS (
       |  SELECT score, n, n_pos,
       |    COALESCE(SUM(n) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_before,
       |    SUM(n) OVER () AS total
       |  FROM g)
       |SELECT CAST(LEAST(cum_before * 10 // total, 9) AS BIGINT)
       |    AS bucket,
       |  MIN(score) AS score_lo, MAX(score) AS score_hi,
       |  CAST(SUM(n) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       |  ${sqlPpm("SUM(n_pos)", "SUM(n)")} AS clean_ppm
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val pipelineClassifierAucSql: String = {
    val ntok = "len(string_split(text, ' '))"
    val ndis = "len(list_distinct(string_split(text, ' ')))"
    val stop =
      "len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))"
    val letters = "length(regexp_replace(text, ' ', '', 'g'))"
    val digits = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    val tri = "list_transform(generate_series(1, len(toks) - 2)," +
      " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
    s"""WITH t AS (
       |  SELECT lang, text, string_split(text, ' ') AS toks
       |  FROM documents WHERE $ntok >= 3),
       |s AS (
       |  SELECT lang,
       |    2 * ${sqlPpm(ndis, ntok)} - 3 * ${sqlPpm(stop, ntok)}
       |      + ${sqlPpm(letters, ntok)}
       |      - 2 * ${sqlPpm(digits, "length(text)")} - 400000 AS score,
       |    CASE WHEN len($tri) = len(list_distinct($tri))
       |      THEN 1 ELSE 0 END AS is_pos
       |  FROM t),
       |g AS (
       |  SELECT lang, score, SUM(is_pos) AS n_pos,
       |    SUM(1 - is_pos) AS n_neg
       |  FROM s GROUP BY 1, 2),
       |w AS (
       |  SELECT lang, n_pos, n_neg,
       |    COALESCE(SUM(n_neg) OVER (PARTITION BY lang ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_neg
       |  FROM g)
       |SELECT lang,
       |  CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       |  CAST(SUM(n_pos) * SUM(n_neg) AS BIGINT) AS n_pairs,
       |  CAST(SUM(n_pos * cum_neg) AS BIGINT) AS n_concordant,
       |  CAST(SUM(n_pos * n_neg) AS BIGINT) AS n_tied,
       |  CASE WHEN SUM(n_pos) * SUM(n_neg) > 0 THEN
       |    ${sqlPpm("2 * SUM(n_pos * cum_neg) + SUM(n_pos * n_neg)",
                     "2 * SUM(n_pos) * SUM(n_neg)")}
       |  END AS auc_ppm
       |FROM w GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------------------------------- dataset card
  /** Dataset-card aggregate — the datasheet table every corpus release
    * ships: per (lang, source) cell plus per-lang and grand-total
    * rollup rows, each with document/token/char counts and mean
    * document length, in ONE pass (ROLLUP plans a single Expand +
    * aggregate, not three scans — the only shape that works when the
    * corpus is 100 TB and every extra scan costs hours). GROUPING ids
    * disambiguate a real NULL dimension from a rolled-up one.
    */
  def pipelineDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val ts = split(col("text"), " ")
    table(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(ts).cast("long").as("toks"), col("n_chars"))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"))
      .withColumn("mean_doc_tokens_x1e6", ppm(col("n_tokens"), col("n_docs")))
  }

  val pipelineDatasetCardSql: String =
    s"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
       |  CAST(GROUPING(source) AS BIGINT) AS g_source,
       |  ${sqlPpm("SUM(len(string_split(text, ' ')))", "COUNT(*)")}
       |    AS mean_doc_tokens_x1e6
       |FROM documents
       |GROUP BY ROLLUP(lang, source)""".stripMargin

  // ------------------------------------------- end-to-end funnel
  /** The WHOLE training-data prep pipeline composed in one DAG —
    * language filter → quality filter → normalized exact dedup →
    * simhash near-dup dedup — reported as the stage funnel a corpus
    * release publishes: per stage, surviving documents and tokens.
    * Every stage applies to the SURVIVORS of the previous one (the
    * dedups run within the filtered subset, not the raw corpus), and
    * every stage reuses the exact primitive the standalone query
    * ships: [[TextQueries.langScored]]/[[TextQueries.langPred]],
    * textQuality's stopword rule, [[DedupQueries.normText]], and
    * [[DedupQueries.simhashPairsFrame]] +
    * [[DedupQueries.starContractLabels]] — so this is a composition
    * proof, not a reimplementation.
    *
    * Scale shape: stages 1-2 are row-wise predicates fused into the
    * scan (no shuffle); stage 3 is one shuffle on the 16-byte norm
    * hash; stage 4 is the banded simhash self-join (shuffles the
    * 8-byte band key, never text) plus the iterative CC whose rounds
    * are label-keyed and checkpointed. The funnel rows themselves are
    * partial-aggregated counts — five 1-row aggregates over the
    * cached survivor frames.
    */
  /** The funnel's five stage frames, in order — shared by
    * [[pipelineE2e]] (the report) and [[pipelineE2eMaterialized]]
    * (the corpus release through the transactional sink), so the two
    * can never disagree about what "survivor" means.
    */
  private def e2eStages(spark: SparkSession,
      dir: String): Seq[(Long, String, DataFrame)] = {
    val nToks = size(split(col("text"), " ")).cast("long")
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), nToks.as("n_toks"))
      .cache() // five stage aggregates + the clustering all read it
    val s1 = TextQueries.langScored(docs)
      .where(TextQueries.langPred === "en")
      .select(col("doc_id"), col("text"), col("n_toks"))
    val nStop = size(filter(split(col("text"), " "),
      t => t === "the" || t === "a")).cast("long")
    val s2 = s1.where(ppm(nStop, col("n_toks")) <= 120000)
    // canonical-per-norm-hash via min_by AGGREGATION, not a window:
    // same survivors, but partial aggregation combines map-side — a
    // pathological duplicate group (the one a real crawl always has)
    // ships ONE row per map partition instead of its whole membership
    // to a single sorting reducer (ProbeE2e measured the swap at 100×;
    // the skew resistance is the 100-TB point)
    val s3 = s2
      .withColumn("norm_hash", md5(DedupQueries.normText.cast("binary")))
      .groupBy(col("norm_hash"))
      .agg(min_by(struct(col("doc_id"), col("text"), col("n_toks")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.n_toks").as("n_toks"))
      .cache() // feeds the pair generator, the CC join, and its count
    val pairs = DedupQueries.simhashPairsFrame(s3)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint(true)
    // star contraction, not min-label propagation: identical labels
    // (component minimum — the shared clusters oracle re-proves the
    // equality every run) at the O(log² n) diameter-independent round
    // bound, and ~1.7× cheaper at sf0.1 — the dedupApply discipline
    val labels = DedupQueries.starContractLabels(edges)
      .withColumnRenamed("v", "doc_id")
    // docs with no near-dup edge are singletons: label defaults to self
    val s4 = s3.join(labels, Seq("doc_id"), "left_outer")
      .where(col("doc_id") === coalesce(col("label"), col("doc_id")))
    Seq((0L, "raw", docs), (1L, "lang", s1), (2L, "quality", s2),
      (3L, "exact_dedup", s3), (4L, "neardup_dedup", s4))
  }

  def pipelineE2e(spark: SparkSession, dir: String): DataFrame =
    e2eStages(spark, dir).map { case (ord, name, df) =>
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .select(lit(ord).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))
    }.reduce(_ union _)

  /** Oracle CTE chain `scored → s1 → s2 → s3 → spairs → comp → s4`,
    * shared by [[pipelineE2eSql]] and [[pipelineE2eMaterializedSql]]
    * (prefix with `WITH RECURSIVE` — the near-dup walk recurses).
    */
  private val sqlE2eCtes: String = {
    val ntok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    val nstop = "len(list_filter(string_split(text, ' '), " +
      "t -> t = 'the' OR t = 'a'))"
    s"""scored AS (
       |  SELECT doc_id, text, $ntok AS n_toks,
       |  ${TextQueries.sqlLangScoreList},
       |  $nstop AS nstop
       |  FROM documents),
       |s1 AS (
       |  SELECT doc_id, text, n_toks, nstop FROM scored
       |  WHERE (${TextQueries.sqlLangPred}) = 'en'),
       |s2 AS (
       |  SELECT doc_id, text, n_toks FROM s1
       |  WHERE ${sqlPpm("nstop", "n_toks")} <= 120000),
       |s3 AS (
       |  SELECT doc_id, text, n_toks FROM (
       |    SELECT *, MIN(doc_id) OVER (
       |      PARTITION BY md5(${DedupQueries.sqlNormText})) AS canon
       |    FROM s2)
       |  WHERE doc_id = canon),
       |${DedupQueries.sqlSimhashPairCtesFrom("s3")},
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL SELECT doc_b, doc_a FROM spairs),
       |walk AS (
       |  SELECT doc_id AS v, doc_id AS r FROM s3
       |  UNION
       |  SELECT w.v, e2.d AS r FROM walk w JOIN edges e2 ON w.r = e2.s),
       |comp AS (SELECT v, MIN(r) AS cluster_id FROM walk GROUP BY v),
       |s4 AS (
       |  SELECT t.doc_id, t.text, t.n_toks
       |  FROM s3 t JOIN comp c ON t.doc_id = c.v
       |  WHERE t.doc_id = c.cluster_id)""".stripMargin
  }

  val pipelineE2eSql: String =
    s"""WITH RECURSIVE $sqlE2eCtes
       |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM scored
       |UNION ALL SELECT 1, 'lang', COUNT(*),
       |  CAST(SUM(n_toks) AS BIGINT) FROM s1
       |UNION ALL SELECT 2, 'quality', COUNT(*),
       |  CAST(SUM(n_toks) AS BIGINT) FROM s2
       |UNION ALL SELECT 3, 'exact_dedup', COUNT(*),
       |  CAST(SUM(n_toks) AS BIGINT) FROM s3
       |UNION ALL SELECT 4, 'neardup_dedup', COUNT(*),
       |  CAST(SUM(n_toks) AS BIGINT) FROM s4""".stripMargin

  /** The funnel MATERIALIZED: stage-4 survivors flow through the
    * manifest-committed transactional sink
    * ([[graft.sources.ManifestV2Sink]] — staged files, commit,
    * manifest publish) and the release summary is computed from
    * `readCommitted` (manifest-listed files only), closing the
    * analytics→connector loop for the pipeline the way
    * `sink_manifest_roundtrip` closes it for raw tables. The DuckDB
    * twin derives the SAME survivor set straight from the documents
    * table, so any loss, duplication, or text mangling in the sink
    * round-trip diverges the hashes — `sum_chars` rides along
    * precisely so the document BODIES must survive, not just keys.
    *
    * Scale shape: identical to [[pipelineE2e]] up to stage 4, then
    * one append-mode distributed write (no extra shuffle — files
    * stage per task, the manifest commit is one atomic rename) and a
    * 10-key rollup over the read-back.
    */
  def pipelineE2eMaterialized(spark: SparkSession, dir: String): DataFrame = {
    val s4 = e2eStages(spark, dir).last._3
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_e2e_release_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      s4.select(col("doc_id"), col("text"), col("n_toks"))
        .write.format("graft-manifest").mode("append").save(out)
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(length(col("text"))).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val pipelineE2eMaterializedSql: String =
    s"""WITH RECURSIVE $sqlE2eCtes
       |SELECT doc_id % 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
       |FROM s4 GROUP BY 1""".stripMargin

  // --------------------------------- overlapping context chunking
  /** Sliding-window training-context chunking: each document splits
    * into [[CtxWindow]]-token windows advancing [[CtxStride]] tokens
    * (16-token overlap) — the step that turns cleaned documents into
    * fixed-size training/RAG contexts where truncation would discard
    * tails and disjoint splits would orphan boundary-straddling
    * spans. Output: one row per chunk with its exact token count and
    * a 56-bit md5 of the chunk TEXT, so the oracle compare proves the
    * engines cut byte-identical chunks, not merely equal counts.
    *
    * Scale shape: scan → per-row codegen'd expressions → generate;
    * ZERO shuffles at any corpus size (the chunk count is derived
    * per row, the windows come from one `sequence` + `slice` — no
    * self-join, no window function, no exchange anywhere).
    */
  val CtxWindow = 64
  val CtxStride = 48

  def pipelineContextChunk(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("nchunks",
        when(col("n") <= CtxWindow, lit(1L)).otherwise(
          expr(s"(n - $CtxWindow + $CtxStride - 1) div $CtxStride + 1")))
    d.select(col("doc_id"), col("n"), col("toks"),
        posexplode(expr("sequence(0L, nchunks - 1)")).as(Seq("pos", "ci")))
      .select(col("doc_id"), col("ci").as("chunk_id"),
        least(lit(CtxWindow.toLong), col("n") - col("ci") * CtxStride)
          .as("n_chunk_toks"),
        CrossHash.md5Long(array_join(
          slice(col("toks"), (col("ci") * CtxStride + 1).cast("int"),
            lit(CtxWindow)), " ")).as("chunk_hash"))
  }

  val pipelineContextChunkSql: String = {
    val (w, s) = (CtxWindow, CtxStride)
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n, toks,
       |    CASE WHEN n <= $w THEN 1 ELSE (n - $w + $s - 1) // $s + 1 END
       |      AS nchunks
       |  FROM t),
       |e AS (
       |  SELECT doc_id, n, toks, u.ci FROM c,
       |    LATERAL (SELECT unnest(generate_series(0, nchunks - 1)) AS ci) u)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
       |  CAST(least($w, n - ci * $s) AS BIGINT) AS n_chunk_toks,
       |  ${CrossHash.sqlMd5Long(
          s"array_to_string(list_slice(toks, ci * $s + 1, " +
            s"least(ci * $s + $w, n)), ' ')")} AS chunk_hash
       |FROM e""".stripMargin
  }

  // --------------------------------- per-source quantile normalization
  /** Within-source quantile normalization of a quality signal
    * (n_chars here): each document gets its percentile rank INSIDE its
    * own source, in ppm — the distribution-alignment step that makes
    * quality thresholds comparable across sources whose raw score
    * distributions differ (a fixed global cutoff over-prunes the
    * terser source; per-source percentiles don't).
    *
    * No per-source global sort: scores histogram into 256 fixed-width
    * buckets per source (a partial-aggregatable groupBy), the CDF is a
    * window over the BOUNDED ≤256·|sources| histogram, and documents
    * take their bucket's strictly-below cumulative count via a
    * broadcast join back — the [[scanPos]] two-phase trick applied per
    * source. Everything is exact integer counts and one ppm floor.
    */
  def pipelineQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        least(floor(col("n_chars").cast("double") / 16).cast("long"),
          lit(255L)).as("bkt"))
    val hist = d.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wsrc = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = hist
      .withColumn("below", coalesce(sum(col("c")).over(wsrc), lit(0L)))
    val totals = hist.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    d.join(broadcast(cdf.join(totals, "source")), Seq("source", "bkt"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        ppm(col("below"), col("n_src")).as("pct_ppm"))
  }

  val pipelineQuantileNormSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars,
       |    LEAST(CAST(floor(CAST(n_chars AS DOUBLE) / 16) AS BIGINT),
       |      255) AS bkt
       |  FROM documents),
       |h AS (SELECT source, bkt, COUNT(*) AS c FROM d GROUP BY 1, 2),
       |cdf AS (
       |  SELECT source, bkt, COALESCE(SUM(c) OVER (PARTITION BY source
       |    ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0) AS below
       |  FROM h),
       |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
       |  FROM h GROUP BY 1)
       |SELECT doc_id, d.source, n_chars,
       |  ${sqlPpm("below", "n_src")} AS pct_ppm
       |FROM d
       |JOIN cdf ON d.source = cdf.source AND d.bkt = cdf.bkt
       |JOIN t ON d.source = t.source""".stripMargin

  // --------------------------------------- deterministic global shuffle
  /** The pre-training global shuffle, made deterministic and auditable:
    * every document lands in shard `md5(doc_id) mod 64` (the shared
    * [[CrossHash]] order, so reruns and engines agree), and the query
    * reports each shard's composition — document count, distinct
    * sources, and the largest single-source share in ppm. A shuffle
    * that WORKED decorrelates adjacent training examples: every shard's
    * max-source share should sit near the source's global share, not
    * near 10⁶ (which would mean source-runs survived).
    *
    * Scale shape: the hash is per-row map-side; the (shard, source)
    * rollup is partial-aggregatable over a ≤64·|sources| key space,
    * and the final per-shard fold runs on that bounded frame. One
    * corpus-sized shuffle of 24-byte rows — the minimum any global
    * re-shard pays — then metadata.
    */
  def pipelineShuffle(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (CrossHash.md5Long(col("doc_id").cast("string")) % 64).as("shard"))
      .groupBy(col("shard"), col("source")).agg(count(lit(1)).as("c"))
    perSrc.groupBy(col("shard"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_sources"),
        max(col("c")).as("max_src"))
      .select(col("shard"), col("n_docs"), col("n_sources"),
        ppm(col("max_src"), col("n_docs")).as("max_source_share_ppm"))
  }

  val pipelineShuffleSql: String = {
    val h = CrossHash.sqlMd5Long("CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source, ($h) % 64 AS shard FROM documents),
       |ps AS (SELECT shard, source, COUNT(*) AS c FROM d GROUP BY 1, 2)
       |SELECT shard, CAST(SUM(c) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_sources,
       |  ${sqlPpm("MAX(c)", "SUM(c)")} AS max_source_share_ppm
       |FROM ps GROUP BY shard""".stripMargin
  }

  // ------------------------------- quantile filtering, applied + compared
  /** The APPLY step of [[pipelineQuantileNorm]], with the fairness
    * comparison that motivates it: per source, how many documents
    * survive (a) a GLOBAL length cutoff (n_chars ≥ 500 — what a naive
    * pipeline ships) versus (b) the per-source percentile cutoff
    * (bottom decile dropped within each source). The fair rule keeps
    * ≈90% of EVERY source by construction; the global rule's kept
    * share swings with each source's length distribution — the skew
    * this query makes visible is the argument for normalizing before
    * thresholding.
    *
    * Scale shape: everything downstream of the normalization is one
    * partial-aggregatable rollup on the low-cardinality source key.
    */
  def pipelineQuantileFilter(spark: SparkSession, dir: String): DataFrame =
    pipelineQuantileNorm(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") >= 500, 1L).otherwise(0L))
          .as("n_kept_global"),
        sum(when(col("pct_ppm") >= 100000, 1L).otherwise(0L))
          .as("n_kept_fair"))
      .select(col("source"), col("n_docs"),
        col("n_kept_global"), col("n_kept_fair"),
        ppm(col("n_kept_global"), col("n_docs")).as("kept_global_ppm"),
        ppm(col("n_kept_fair"), col("n_docs")).as("kept_fair_ppm"))

  val pipelineQuantileFilterSql: String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_global,
       |  CAST(SUM(CASE WHEN pct_ppm >= 100000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_fair,
       |  ${sqlPpm("SUM(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END)",
            "COUNT(*)")} AS kept_global_ppm,
       |  ${sqlPpm("SUM(CASE WHEN pct_ppm >= 100000 THEN 1 ELSE 0 END)",
            "COUNT(*)")} AS kept_fair_ppm
       |FROM ($pipelineQuantileNormSql) norm
       |GROUP BY source""".stripMargin

  // ------------------------------------------------ epoch planner
  /** Token-budget epoch plan: given a training budget of
    * [[EpochBudgetX]]× the corpus's total tokens, split it across
    * sources by temperature-τ=½ weights (w_s = ⌊√tokens_s⌋ — the
    * standard upsample-the-tail mixture rule) and report, per source,
    * the allocated tokens, the implied epoch count, and whether the
    * source would be repeated past the ~4-epoch mark where repeated
    * data stops helping (the scaling-law guardrail for
    * data-constrained training). This is the planning table a mixture
    * owner derives BEFORE launching a run — the static twin of
    * [[pipelineTemperatureMix]]'s sampled realization.
    *
    * Determinism: weights are ⌊√t⌋ on exact integer token counts
    * (one IEEE sqrt on identical operands per source), so the weight
    * SUM is an exact integer — order-independent, unlike a float
    * share sum. The allocation `⌊B·w/W⌋` is computed by the two-term
    * identity `(B div W)·w + ((B mod W)·w) div W` so no intermediate
    * exceeds ~W·w (no overflow headroom needed even at 10¹⁴-token
    * corpora), and epochs are reported in exact milli-units the same
    * way. Scale shape: one partial-aggregating groupBy to
    * |sources| rows; everything after is arithmetic on the
    * metadata-sized frame against a broadcast 1-row total.
    */
  val EpochBudgetX = 3L

  def pipelineEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val per = table(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("tokens"))
      .withColumn("weight",
        floor(sqrt(col("tokens").cast("double"))).cast("long"))
    val tot = per.agg(sum(col("tokens")).as("tt"), sum(col("weight")).as("ww"))
    per.crossJoin(broadcast(tot))
      .withColumn("budget", col("tt") * lit(EpochBudgetX))
      .withColumn("share_ppm", expr(
        "((1000000 div ww) * weight) + (((1000000 % ww) * weight) div ww)"))
      .withColumn("alloc_tokens", expr(
        "(budget div ww) * weight + (((budget % ww) * weight) div ww)"))
      .withColumn("epochs_milli", expr(
        "(alloc_tokens div tokens) * 1000 + " +
          "(((alloc_tokens % tokens) * 1000) div tokens)"))
      .withColumn("over_repeat", col("epochs_milli") > 4000L)
      .select(col("source"), col("n_docs"), col("tokens"), col("weight"),
        col("share_ppm"), col("alloc_tokens"), col("epochs_milli"),
        col("over_repeat"))
  }

  val pipelineEpochPlanSql: String =
    s"""WITH per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, n_docs, tokens,
       |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS weight
       |  FROM per),
       |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
       |    CAST(SUM(weight) AS BIGINT) AS ww FROM w),
       |alloc AS (
       |  SELECT source, n_docs, tokens, weight,
       |    (1000000 // ww) * weight + (((1000000 % ww) * weight) // ww)
       |      AS share_ppm,
       |    ((tt * $EpochBudgetX) // ww) * weight +
       |      ((((tt * $EpochBudgetX) % ww) * weight) // ww) AS alloc_tokens
       |  FROM w, tot)
       |SELECT source, n_docs, tokens, weight, share_ppm, alloc_tokens,
       |  (alloc_tokens // tokens) * 1000 +
       |    (((alloc_tokens % tokens) * 1000) // tokens) AS epochs_milli,
       |  ((alloc_tokens // tokens) * 1000 +
       |    (((alloc_tokens % tokens) * 1000) // tokens)) > 4000
       |    AS over_repeat
       |FROM alloc""".stripMargin

  // ------------------------------------------- perplexity filtering
  /** LM-score ("perplexity") filtering, the CCNet recipe: score every
    * document with the corpus-trained language model — here
    * [[TextQueries.textLmScore]]'s exact mean-bigram-frequency
    * fluency score, where LOW means unusual text — then drop each
    * source's bottom decile BY ITS OWN distribution, and report the
    * realized per-source cut. Per-source percentiles (not a global
    * cutoff) are the load-bearing choice, same as
    * [[pipelineQuantileFilter]]: a global fluency bar would gut the
    * sources whose register differs from the majority. Documents too
    * short to score (< 2 tokens) score 0 — the most-droppable bucket,
    * which is what a filter should do with unscoreable text.
    *
    * Scale shape: the scorer is one vocabulary-keyed count shuffle +
    * one doc rollup; the percentile comes from the shared ≤256·
    * |sources| histogram-CDF pattern (one broadcast join, no
    * per-source sort), so the decision is bucket-granular — documents
    * sharing a 2¹⁸-wide score bucket share their fate, the price of
    * never sorting the corpus. The report is |sources| rows;
    * `cutoff_score` (−1 when a source keeps nothing) is the realized
    * threshold a pipeline owner audits.
    */
  def pipelinePerplexityFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(TextQueries.textLmScore(spark, dir)
        .select(col("doc_id"), col("mean_bigram_freq_x1e6").as("score")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("bkt", least(expr("score div 262144"), lit(255L)))
    val hist = d.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wsrc = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = hist
      .withColumn("below", coalesce(sum(col("c")).over(wsrc), lit(0L)))
    val totals = hist.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    d.join(broadcast(cdf.join(totals, "source")), Seq("source", "bkt"))
      .withColumn("pct_ppm", ppm(col("below"), col("n_src")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("pct_ppm") < 100000L, lit(1))).as("n_dropped"),
        ppm(count(when(col("pct_ppm") < 100000L, lit(1))),
          count(lit(1))).as("dropped_ppm"),
        coalesce(min(when(col("pct_ppm") >= 100000L, col("score"))),
          lit(-1L)).as("cutoff_score"))
  }

  val pipelinePerplexityFilterSql: String =
    s"""WITH sc AS (${TextQueries.textLmScoreSql}),
       |d AS (
       |  SELECT doc.doc_id, doc.source,
       |    COALESCE(sc.mean_bigram_freq_x1e6, 0) AS score
       |  FROM documents doc LEFT JOIN sc ON doc.doc_id = sc.doc_id),
       |b AS (SELECT doc_id, source, score,
       |    LEAST(score // 262144, 255) AS bkt FROM d),
       |hist AS (SELECT source, bkt, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |cdf AS (
       |  SELECT source, bkt, c, COALESCE(SUM(c) OVER (
       |    PARTITION BY source ORDER BY bkt
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       |  FROM hist),
       |tot AS (SELECT source, SUM(c) AS n_src FROM hist GROUP BY 1),
       |pct AS (
       |  SELECT b.doc_id, b.source, b.score,
       |    ${sqlPpm("cdf.below", "tot.n_src")} AS pct_ppm
       |  FROM b JOIN cdf ON b.source = cdf.source AND b.bkt = cdf.bkt
       |  JOIN tot ON b.source = tot.source)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(CASE WHEN pct_ppm < 100000 THEN 1 END) AS BIGINT)
       |    AS n_dropped,
       |  ${sqlPpm("COUNT(CASE WHEN pct_ppm < 100000 THEN 1 END)",
            "COUNT(*)")} AS dropped_ppm,
       |  COALESCE(MIN(CASE WHEN pct_ppm >= 100000 THEN score END), -1)
       |    AS cutoff_score
       |FROM pct GROUP BY source""".stripMargin

  // ------------------------------------ bounded per-source contribution
  /** Bounded-contribution capping: no source may contribute more than
    * CapDocs documents — the pre-aggregation step of user-level
    * differential privacy (each unit's influence on any downstream
    * statistic is bounded before noise is even considered) and the
    * standard defense against a single crawl domain dominating a mix.
    * The kept subset is chosen by a per-doc hash order (uniform over
    * the source's docs — arrival order would bias toward old crawls),
    * deterministic across engines and re-runs. Reports each source's
    * before/after doc and token counts and whether the cap bit.
    *
    * Scale: one window over the source partition. If a hot source
    * overwhelms a reducer, the same selection is computable with
    * bounded state via the [[graft.functions.BottomKAgg]] pattern
    * (top-CapDocs by hash, partial-aggregating) — the window form is
    * kept because it also EMITS the kept flag per doc for downstream
    * stages without a second join.
    */
  def pipelineContributionCap(spark: SparkSession, dir: String): DataFrame = {
    val CapDocs = 20
    val w = Window.partitionBy(col("source")).orderBy(
      CrossHash.md5Long(concat(lit("cap:"), col("doc_id").cast("string")))
        .asc, col("doc_id").asc)
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_toks"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= CapDocs, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("rn") <= CapDocs, col("n_toks")).otherwise(0L))
          .as("n_tokens_kept"))
      .withColumn("cap_applied",
        when(col("n_docs") > CapDocs, 1L).otherwise(0L))
  }

  val pipelineContributionCapSql: String = {
    val h = CrossHash.sqlMd5Long("'cap:' || CAST(doc_id AS VARCHAR)")
    s"""WITH r AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY $h ASC, doc_id ASC) AS rn
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_kept,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN rn <= 20 THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS n_tokens_kept,
       |  CAST(CASE WHEN COUNT(*) > 20 THEN 1 ELSE 0 END AS BIGINT)
       |    AS cap_applied
       |FROM r GROUP BY source""".stripMargin
  }

  // -------------------------------------- duplicate-aware weighting
  /** Duplicate-aware example WEIGHTING — the soft alternative to
    * [[DedupQueries.dedupApply]]'s hard drop: every document stays in
    * the corpus, but its training weight is 1/|cluster| of its
    * near-dup cluster, so each piece of CONTENT contributes one unit
    * of loss mass no matter how many times the crawl re-collected it
    * (Σ weight over a cluster ≈ 1, exactly 1e6 ppm up to integer
    * floor). Pipelines prefer this over dropping when duplicates
    * carry signal (popular pages) but must not dominate the loss.
    *
    * Weights are integer ppm (`1000000 div cluster_size`) so the frame
    * hashes identically in any engine. Scale shape: the clustering
    * cost lives in the nightly artifact build
    * ([[DedupQueries.dedupClustersPersisted]]); this query is one
    * artifact read, one 8-byte-keyed join against documents, and a
    * pure row-wise weight expression — its full-recompute oracle
    * re-proves the persisted labels every verify run.
    */
  def pipelineDedupWeight(spark: SparkSession, dir: String): DataFrame = {
    // label table read from the persisted artifact — a weighting job
    // consumes the nightly clustering, it does not recompute it
    val clusters = NearDupArtifact.labels(spark, dir)
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    docs.join(clusters, "doc_id")
      .select(col("doc_id"), col("source"), col("cluster_id"),
        col("cluster_size"),
        expr("1000000 div cluster_size").as("weight_ppm"), col("n_toks"))
  }

  val pipelineDedupWeightSql: String =
    s"""WITH RECURSIVE ${DedupQueries.sqlSimhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL SELECT doc_b, doc_a FROM spairs),
       |walk AS (
       |  SELECT doc_id AS v, doc_id AS r FROM documents
       |  UNION
       |  SELECT w.v, e.d AS r FROM walk w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT v, MIN(r) AS cluster_id FROM walk GROUP BY v),
       |sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id)
       |SELECT d.doc_id, d.source, c.cluster_id,
       |  CAST(s.n AS BIGINT) AS cluster_size,
       |  CAST(1000000 // s.n AS BIGINT) AS weight_ppm,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
       |FROM documents d
       |JOIN comp c ON d.doc_id = c.v
       |JOIN sz s ON c.cluster_id = s.cluster_id""".stripMargin

  // ------------------------------------------ padding-waste analysis
  /** PADDING WASTE under length bucketing — the measurement that
    * decides how a training pipeline batches: with one global max
    * length, every short document pays (max − len) pad tokens; with
    * power-of-two length buckets (the bucketed-batching compromise
    * between padding loss and batch-shape churn), each doc pads only
    * to its bucket cap. One scan computes both schemes side by side:
    * per (scheme, bucket cap) — docs, real tokens, padded slots, and
    * waste ppm — plus what the decision needs most, the TOTAL waste
    * ratio of each scheme on one line ('zz_total' rows order last).
    * (The third option, sequence PACKING, is [[pipelinePack]]; this
    * report is what justifies it.)
    *
    * The bucket cap is a CASE chain over fixed powers of two (16..4096
    * covers any tokenizer-bounded document; longer docs are the
    * chunker's job upstream) — exact integers, no libm log2, so both
    * engines bucket identically. Scale shape: one corpus scan, a
    * per-row cap expression, one low-cardinality partial-aggregating
    * groupBy.
    */
  def pipelinePackWaste(spark: SparkSession, dir: String): DataFrame = {
    val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    val docs = table(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_toks"))
    val bucketCap = caps.reverse.tail.foldLeft(lit(caps.last)) {
      (acc, c) => when(col("n_toks") <= c, c).otherwise(acc)
    }
    val bucketed = docs.withColumn("cap", bucketCap).cache()
    try {
      val globalCap = bucketed.agg(max(col("n_toks"))).head.getLong(0)
      def report(scheme: String, capCol: Column) = bucketed
        .groupBy(capCol.as("bucket_cap"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .select(lit(scheme).as("scheme"), col("bucket_cap"),
          col("n_docs"), col("n_tokens"),
          (col("bucket_cap") * col("n_docs")).as("n_padded"))
      val per = report("bucket_pow2", col("cap"))
        .unionByName(report("global_max", lit(globalCap)))
      val totals = per.groupBy(col("scheme"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_padded")).as("n_padded"))
        .select(concat(lit("zz_total_"), col("scheme")).as("scheme"),
          lit(0L).as("bucket_cap"), col("n_docs"), col("n_tokens"),
          col("n_padded"))
      per.unionByName(totals)
        .withColumn("waste_ppm",
          ppm(col("n_padded") - col("n_tokens"), col("n_padded")))
        .orderBy(col("scheme"), col("bucket_cap"))
        .localCheckpoint(true) // small; frees the cache in finally
    } finally bucketed.unpersist()
  }

  val pipelinePackWasteSql: String = {
    val caps = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
    val capCase = "CASE " + caps.dropRight(1)
      .map(c => s"WHEN n_toks <= $c THEN $c").mkString(" ") +
      s" ELSE ${caps.last} END"
    s"""WITH d AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |b AS (SELECT n_toks, CAST($capCase AS BIGINT) AS cap FROM d),
       |per AS (
       |  SELECT 'bucket_pow2' AS scheme, cap AS bucket_cap,
       |    COUNT(*) AS n_docs, SUM(n_toks) AS n_tokens,
       |    cap * COUNT(*) AS n_padded
       |  FROM b GROUP BY cap
       |  UNION ALL
       |  SELECT 'global_max', (SELECT MAX(n_toks) FROM d),
       |    COUNT(*), SUM(n_toks),
       |    (SELECT MAX(n_toks) FROM d) * COUNT(*)
       |  FROM b),
       |tot AS (
       |  SELECT 'zz_total_' || scheme AS scheme, CAST(0 AS BIGINT)
       |    AS bucket_cap, SUM(n_docs) AS n_docs,
       |    SUM(n_tokens) AS n_tokens, SUM(n_padded) AS n_padded
       |  FROM per GROUP BY scheme),
       |f AS (SELECT * FROM per UNION ALL SELECT * FROM tot)
       |SELECT scheme, CAST(bucket_cap AS BIGINT) AS bucket_cap,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_padded AS BIGINT) AS n_padded,
       |  ${sqlPpm("n_padded - n_tokens", "n_padded")} AS waste_ppm
       |FROM f ORDER BY scheme, bucket_cap""".stripMargin
  }

  // ------------------------------------------- token-budget allocation
  /** GREEDY TOKEN-BUDGET ALLOCATION across sources — the mixture
    * owner's capacity plan: given a training budget of half the
    * corpus, fill sources in quality order (fraction of docs passing
    * the admission token floor, as ppm), but cap any single source at
    * 10% of the budget (concentration cap: no crawl may dominate the
    * mixture, the C4→Pile lesson) and at its own availability. Output
    * per source: score, availability, cap, fill rank, the allocation
    * the greedy fill actually grants, and whether the source
    * saturated its cap — all exact integers.
    *
    * Scale shape: one corpus scan folds to a SOURCE-cardinality frame
    * (partial-aggregating); the greedy fill is a running sum over
    * that tiny frame — the single-partition window is over |sources|
    * rows, not data (same rationale as pipeline_pack's 256-row
    * exchange), and the budget scalar is a 1-row broadcast.
    */
  def pipelineBudgetAlloc(spark: SparkSession, dir: String): DataFrame = {
    val src = table(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(sum(col("n_toks")).as("avail_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("n_toks") >= 20, 1L).otherwise(0L)).as("n_pass"))
      .withColumn("score_ppm", ppm(col("n_pass"), col("n_docs")))
    // integer div, not IEEE `/`: above 2^53 a double quotient rounds
    // before the cast while the oracle's `//` stays exact
    val budget = src.agg(expr("sum(avail_tokens) div 2").as("budget"))
    val capped = src.crossJoin(broadcast(budget))
      .withColumn("cap_tokens",
        least(col("avail_tokens"), expr("budget * 10 div 100")))
    val w = Window.orderBy(col("score_ppm").desc, col("source").asc)
    capped
      .withColumn("fill_rank", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("cap_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("score_ppm"), col("avail_tokens"),
        col("cap_tokens"), col("fill_rank"),
        greatest(lit(0L), least(col("cap_tokens"),
          col("budget") - col("cum_before"))).as("alloc_tokens"))
      .withColumn("saturated", col("alloc_tokens") === col("cap_tokens"))
  }

  val pipelineBudgetAllocSql: String =
    s"""WITH d AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT)
       |    AS n_toks FROM documents),
       |s AS (
       |  SELECT source, SUM(n_toks) AS avail_tokens, COUNT(*) AS n_docs,
       |    SUM(CASE WHEN n_toks >= 20 THEN 1 ELSE 0 END) AS n_pass
       |  FROM d GROUP BY source),
       |sc AS (SELECT source, avail_tokens,
       |  ${sqlPpm("n_pass", "n_docs")} AS score_ppm FROM s),
       |b AS (SELECT CAST(SUM(avail_tokens) // 2 AS BIGINT) AS budget
       |  FROM s),
       |c AS (
       |  SELECT sc.*, b.budget,
       |    LEAST(avail_tokens, b.budget * 10 // 100) AS cap_tokens
       |  FROM sc CROSS JOIN b),
       |r AS (
       |  SELECT *,
       |    CAST(row_number() OVER (ORDER BY score_ppm DESC, source ASC)
       |      AS BIGINT) AS fill_rank,
       |    COALESCE(SUM(cap_tokens) OVER (
       |      ORDER BY score_ppm DESC, source ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_before
       |  FROM c)
       |SELECT source, score_ppm, CAST(avail_tokens AS BIGINT)
       |    AS avail_tokens,
       |  CAST(cap_tokens AS BIGINT) AS cap_tokens, fill_rank,
       |  CAST(GREATEST(0, LEAST(cap_tokens, budget - cum_before))
       |    AS BIGINT) AS alloc_tokens,
       |  GREATEST(0, LEAST(cap_tokens, budget - cum_before))
       |    = cap_tokens AS saturated
       |FROM r""".stripMargin

  // --------------------------------------------- DSIR importance weights
  /** DSIR-style data selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 —
    * public paper): score every raw document by how target-like its
    * HASHED N-GRAM profile is, then select the docs that beat the
    * corpus-average target share. The target distribution here is the
    * English slice (`lang = 'en'` — in production, a trusted
    * high-quality corpus); features are word bigrams hashed into
    * B=256 buckets ([[graft.functions.CrossHash.md5Long]] mod B, so
    * both engines bucket identically).
    *
    * The paper's importance weight is a log-likelihood ratio under
    * two bag-of-hashed-ngrams models; logs are libm (ulp drift across
    * engines), so the checked formulation uses the EXACT-INTEGER
    * monotone equivalent: per bucket, the smoothed target share
    * `score(b) = 1e6·(ct(b)+1) div (cr(b)+2)` (ct = target gram
    * occurrences in the bucket, cr = all — Laplace-smoothed, bounded
    * in (0, 1e6)); per document, the gram-count-weighted mean bucket
    * score; selection keeps docs whose weight beats the global target
    * share `g = 1e6·(T+1) div (R+2)`. Every quantity is an integer
    * ratio of counts — bit-identical cross-engine, no logarithm.
    *
    * Scale shape: ONE gram explode feeds two aggregations — the
    * bucket table (B=256 rows: map-side combine then a 256-key
    * shuffle) and the per-(doc,bucket) counts (shuffle keyed by
    * doc_id×bucket, combine-heavy since docs repeat buckets). The
    * score join is a 256-row BROADCAST, the global share one
    * broadcast row, the final rollup a source-keyed partial agg —
    * nothing corpus-sized crosses an exchange twice, no sort anywhere.
    */
  def pipelineDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val B = 256
    val grams = table(spark, dir, "documents")
      .where(size(toks) >= 2)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, (i + 1).cast("int")),
            element_at(toks, (i + 2).cast("int"))))).as("bg"))
      .select(col("doc_id"), col("source"), col("lang"),
        (CrossHash.md5Long(col("bg")) % B).as("b"))
      .cache() // feeds the bucket table, the doc profile, and the total
    val scores = grams.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      .select(col("b"),
        expr("(1000000 * (ct + 1)) div (cr + 2)").as("score"))
    val weights = grams.groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(scores), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c") * col("score")).as("num"), sum(col("c")).as("den"))
      .select(col("doc_id"), col("source"),
        expr("num div den").as("weight_ppm"))
    val global = grams.agg(count(lit(1)).as("r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"))
      .select(expr("(1000000 * (t + 1)) div (r + 2)").as("gshare"))
    val out = weights.crossJoin(broadcast(global))
      .groupBy(col("source"), col("gshare"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("weight_ppm")).as("sum_weight"),
        sum(when(col("weight_ppm") >= col("gshare"), 1L).otherwise(0L))
          .as("n_selected"))
      .select(col("source"), col("n_docs"), col("sum_weight"),
        col("n_selected"), col("gshare").as("target_share_ppm"))
    grams.unpersist()
    out
  }

  val pipelineDsirWeightsSql: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("bg")
    s"""WITH t AS (
       |  SELECT doc_id, source, lang, string_split(text, ' ') AS ts
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |g AS (
       |  SELECT doc_id, source, lang, ($h) % 256 AS b
       |  FROM (SELECT doc_id, source, lang, unnest(list_transform(
       |    generate_series(1, len(ts) - 1),
       |    i -> ts[i] || ' ' || ts[i+1])) AS bg FROM t)),
       |sc AS (
       |  SELECT b, CAST((1000000 * (SUM(CASE WHEN lang = 'en' THEN 1
       |      ELSE 0 END) + 1)) // (COUNT(*) + 2) AS BIGINT) AS score
       |  FROM g GROUP BY b),
       |db AS (
       |  SELECT doc_id, source, b, COUNT(*) AS c
       |  FROM g GROUP BY doc_id, source, b),
       |w AS (
       |  SELECT doc_id, source,
       |    CAST(SUM(c * score) // SUM(c) AS BIGINT) AS weight_ppm
       |  FROM db JOIN sc USING (b) GROUP BY doc_id, source),
       |gl AS (
       |  SELECT CAST((1000000 * (SUM(CASE WHEN lang = 'en' THEN 1
       |      ELSE 0 END) + 1)) // (COUNT(*) + 2) AS BIGINT) AS gshare
       |  FROM g)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(weight_ppm) AS BIGINT) AS sum_weight,
       |  CAST(SUM(CASE WHEN weight_ppm >= gshare THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_selected,
       |  gshare AS target_share_ppm
       |FROM w, gl GROUP BY source, gshare""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dsir_weights" -> (pipelineDsirWeights _),
    "pipeline_budget_alloc" -> (pipelineBudgetAlloc _),
    "pipeline_pack_waste" -> (pipelinePackWaste _),
    "pipeline_dedup_weight" -> (pipelineDedupWeight _),
    "pipeline_contribution_cap" -> (pipelineContributionCap _),
    "pipeline_epoch_plan" -> (pipelineEpochPlan _),
    "pipeline_perplexity_filter" -> (pipelinePerplexityFilter _),
    "pipeline_shuffle" -> (pipelineShuffle _),
    "pipeline_quantile_filter" -> (pipelineQuantileFilter _),
    "pipeline_quantile_norm" -> (pipelineQuantileNorm _),
    "pipeline_e2e" -> (pipelineE2e _),
    "pipeline_e2e_materialized" -> (pipelineE2eMaterialized _),
    "pipeline_context_chunk" -> (pipelineContextChunk _),
    "pipeline_dataset_card" -> (pipelineDatasetCard _),
    "pipeline_classifier" -> (pipelineClassifier _),
    "pipeline_classifier_auc" -> (pipelineClassifierAuc _),
    "pipeline_classifier_calibration" -> (pipelineClassifierCalibration _),
    "pipeline_pack" -> (pipelinePack _),
    "pipeline_shard" -> (pipelineShard _),
    "pipeline_mix" -> (pipelineMix _),
    "pipeline_temperature_mix" -> (pipelineTemperatureMix _),
    "graph_pagerank" -> (graphPagerank _),
    "graph_seed_distance" -> (graphSeedDistance _),
    "graph_lpa" -> (graphLpa _),
    "text_contamination" -> (textContamination _),
    "pipeline_decontaminate" -> (pipelineDecontaminate _),
    "text_novelty" -> (textNovelty _),
    "dedup_chunk" -> (dedupChunk _),
    "pipeline_remove_chunks" -> (pipelineRemoveChunks _),
    "pipeline_split" -> (pipelineSplit _),
    "pipeline_split_leakage" -> (pipelineSplitLeakage _),
    "pipeline_sample_weighted" -> (pipelineSampleWeighted _),
    "pipeline_filter" -> (pipelineFilter _),
    "graph_triangles" -> (graphTriangles _),
    "graph_kcore" -> (graphKcore _),
    "graph_hubs" -> (graphHubs _),
    "graph_modularity" -> (graphModularity _),
    "pipeline_curriculum" -> (pipelineCurriculum _),
    "pipeline_provenance" -> (pipelineProvenance _),
    "bloom_join_prune" -> (bloomJoinPrune _))

  val oracles: Map[String, String] = Map(
    "pipeline_dsir_weights" -> pipelineDsirWeightsSql,
    "pipeline_budget_alloc" -> pipelineBudgetAllocSql,
    "pipeline_pack_waste" -> pipelinePackWasteSql,
    "pipeline_dedup_weight" -> pipelineDedupWeightSql,
    "pipeline_contribution_cap" -> pipelineContributionCapSql,
    "pipeline_epoch_plan" -> pipelineEpochPlanSql,
    "pipeline_perplexity_filter" -> pipelinePerplexityFilterSql,
    "pipeline_shuffle" -> pipelineShuffleSql,
    "pipeline_quantile_filter" -> pipelineQuantileFilterSql,
    "pipeline_quantile_norm" -> pipelineQuantileNormSql,
    "pipeline_e2e" -> pipelineE2eSql,
    "pipeline_e2e_materialized" -> pipelineE2eMaterializedSql,
    "pipeline_context_chunk" -> pipelineContextChunkSql,
    "pipeline_dataset_card" -> pipelineDatasetCardSql,
    "pipeline_classifier" -> pipelineClassifierSql,
    "pipeline_classifier_auc" -> pipelineClassifierAucSql,
    "pipeline_classifier_calibration" -> pipelineClassifierCalibrationSql,
    "pipeline_pack" -> pipelinePackSql,
    "pipeline_shard" -> pipelineShardSql,
    "pipeline_mix" -> pipelineMixSql,
    "pipeline_temperature_mix" -> pipelineTemperatureMixSql,
    "graph_pagerank" -> graphPagerankSql,
    "graph_seed_distance" -> graphSeedDistanceSql,
    "graph_lpa" -> graphLpaSql,
    "text_contamination" -> textContaminationSql,
    "pipeline_decontaminate" -> pipelineDecontaminateSql,
    "text_novelty" -> textNoveltySql,
    "dedup_chunk" -> dedupChunkSql,
    "pipeline_remove_chunks" -> pipelineRemoveChunksSql,
    "pipeline_split" -> pipelineSplitSql,
    "pipeline_split_leakage" -> pipelineSplitLeakageSql,
    "pipeline_sample_weighted" -> pipelineSampleWeightedSql,
    "pipeline_filter" -> pipelineFilterSql,
    "graph_triangles" -> graphTrianglesSql,
    "graph_kcore" -> graphKcoreSql,
    "graph_hubs" -> graphHubsSql,
    "graph_modularity" -> graphModularitySql,
    "pipeline_curriculum" -> pipelineCurriculumSql,
    "pipeline_provenance" -> pipelineProvenanceSql,
    "bloom_join_prune" -> bloomJoinPruneSql)
}
