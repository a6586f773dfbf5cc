package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._
import QueryUtil._

/** Deduplication operators over `documents` — the core of a
  * training-data pipeline at 100 TB:
  *
  *  - exact dedup: hash-groupBy on content (one shuffle on text hash);
  *  - MinHash signatures: pure per-row array expressions, NO explode
  *    and NO shuffle — each doc's K-wide signature is computed inside
  *    whole-stage codegen from its shingle set;
  *  - LSH banding: signatures → (band, band_key) buckets; candidate
  *    pairs come from a self-join on the bucket key (shuffle on
  *    bucket, never all-pairs n²), then exact Jaccard verification
  *    on just the candidates;
  *  - SimHash: one explode pass, 64 conditional aggregates, then the
  *    bits reassemble into a 64-bit fingerprint (two 32-bit halves).
  *
  * All hashes are [[graft.functions.CrossHash]] md5-based so the
  * DuckDB oracle reproduces them bit-for-bit.
  *
  * Self-join strategy: every pair query self-joins a derived table
  * whose derivation (md5 shingling, minhash) dwarfs the join itself.
  * The join strategy is deliberately left to Catalyst: below
  * `autoBroadcastJoinThreshold` it broadcasts one side and keeps the
  * post-join verification as parallel as the probe side; above it —
  * any real corpus — it switches to a shuffled join on the block key
  * by itself. (Forcing the shuffled join locally was measured SLOWER:
  * AQE coalesces the small shuffle to ~2 partitions, serializing the
  * array-intersect verification, and ReuseExchange does not kick in
  * across the hint.) The shared derivation is `cache()`d: the
  * broadcast build materializes it, so the streamed side and the
  * verification joins reuse it instead of recomputing the md5
  * pipeline per consumer — measured ~2× on the pair queries. Callers
  * running many queries in one session must `spark.catalog
  * .clearCache()` after materializing each result (Verify and Bench
  * both do); at cluster scale the equivalent is writing the signature
  * table once and joining against it.
  */
object DedupQueries {

  val K = 16 // minhash signature width
  val Bands = 4 // LSH bands (rows per band = K / Bands = 4)
  val SimBits = 32 // simhash bits PER HALF; two halves = 64-bit fingerprint

  // --------------------------------------------------------- shingles
  /** Distinct 3-token shingle hashes of a document, as a pure column
    * expression. Docs with <3 tokens fall back to the whole text as
    * one shingle.
    */
  private def shingleHashes: Column = {
    val t = split(col("text"), " ")
    val shingles = when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3)))))
      .otherwise(array(col("text")))
    array_distinct(transform(shingles, s => md5Long(s) % P))
  }

  /** [[shingleHashes]] exposed for [[graft.streaming.StreamNearDupGate]]
    * — the arriving-document gate must derive shingle sets bit-identically
    * to the batch LSH queries (StreamNearDupGateSpec pins the gate's
    * output against [[dedupIncremental]]'s corpus rows, so the call
    * sites cannot drift silently).
    */
  private[graft] def shingleHashesCol: Column = shingleHashes

  /** The K minhash signatures banded into `Bands` '-'-joined keys, as
    * one `Bands`-long array column (index = band) over a shingle-hash
    * array column — the same (band, key) derivation [[dedupLshPairs]]
    * and [[dedupIncremental]] inline, factored as a column so the
    * streaming gate shares it.
    */
  private[graft] def bandKeysOf(sh: Column): Column = {
    val R = K / Bands
    val sigs = (0 until K).map(i => array_min(transform(sh, h => affine(h, i))))
    array((0 until Bands).map(b =>
      concat_ws("-", sigs.slice(b * R, b * R + R).map(_.cast("string")): _*)): _*)
  }

  /** DuckDB twin of [[shingleHashes]] given a `toks` list column. */
  private def sqlShingleHashes(toks: String, text: String): String = {
    val sh = s"""CASE WHEN len($toks) >= 3
      THEN list_transform(generate_series(1, len($toks) - 2),
             i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])
      ELSE [$text] END"""
    s"list_distinct(list_transform($sh, s -> ${sqlMd5Long("s")} % $P))"
  }

  // ------------------------------------------------------ exact dedup
  /** Exact dedup: canonical = min doc_id among identical texts. A
    * window over the content hash — at scale this is one shuffle on
    * md5(text), never on the text bytes themselves.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    table(spark, dir, "documents")
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("text_hash"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_duplicate"))
  }

  val dedupExactSql: String =
    """SELECT doc_id, md5(text) AS text_hash,
      |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
      |FROM documents""".stripMargin

  // ------------------------------------------- normalized exact dedup
  /** Exact dedup under text NORMALIZATION — the C4 recipe: lowercase,
    * strip punctuation, collapse runs of whitespace, trim, THEN hash.
    * Catches the near-identical pairs raw hashing misses (same page
    * re-crawled with different casing/punctuation artifacts) while
    * staying one shuffle on an 8-byte-equivalent hash. The
    * `caught_by_norm_only` flag isolates exactly the pairs
    * normalization added over [[dedupExact]] — the number that tells
    * a pipeline owner whether the normalization pass pays for itself.
    * Normalization is three simple character-class regex passes that
    * Java and RE2-family engines agree on for ASCII input.
    */
  /** The frame on any `(doc_id, text)` input — factored so the spec
    * can prove the normalization semantics on a constructed fixture
    * (the synthetic corpus happens to contain no casing/punctuation
    * twins, so the oracle gate alone would leave the flags vacuous).
    */
  /** The C4-style text normalization (lowercase, strip punctuation,
    * collapse whitespace, trim) and its DuckDB twin — shared with the
    * composed pipeline so the two exact-dedup call sites can't drift.
    */
  private[analytics] def normText: Column =
    trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
      " +", " "))
  private[analytics] val sqlNormText: String =
    "trim(regexp_replace(regexp_replace(lower(text), " +
      "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  private[analytics] def dedupExactNormFrame(docs: DataFrame): DataFrame = {
    val norm = normText
    val wN = Window.partitionBy(col("norm_hash"))
    val wR = Window.partitionBy(col("raw_hash"))
    docs
      .withColumn("norm_hash", md5(norm.cast("binary")))
      .withColumn("raw_hash", md5(col("text").cast("binary")))
      .withColumn("canonical_id", min(col("doc_id")).over(wN))
      .withColumn("raw_canonical", min(col("doc_id")).over(wR))
      .select(col("doc_id"), col("norm_hash"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_duplicate"),
        (col("doc_id") =!= col("canonical_id") &&
          col("doc_id") === col("raw_canonical"))
          .as("caught_by_norm_only"))
  }

  def dedupExactNorm(spark: SparkSession, dir: String): DataFrame =
    dedupExactNormFrame(table(spark, dir, "documents"))

  val dedupExactNormSql: String = {
    val norm = sqlNormText
    s"""SELECT doc_id, md5($norm) AS norm_hash,
       |  MIN(doc_id) OVER (PARTITION BY md5($norm)) AS canonical_id,
       |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5($norm))
       |    AS is_duplicate,
       |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5($norm))
       |    AND doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
       |    AS caught_by_norm_only
       |FROM documents""".stripMargin
  }

  // ------------------------------------------------- minhash signature
  /** K-wide MinHash signature per document. sig_i = min over shingles
    * of h_i(shingle) where h_i is an affine universal hash over the P
    * field. Pure expression — scales linearly, no shuffle.
    */
  def dedupMinhashSig(spark: SparkSession, dir: String): DataFrame = {
    val sigs = (0 until K).map(i =>
      array_min(transform(col("sh"), h => affine(h, i))).as(s"sig_$i"))
    table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id") +: sigs: _*)
  }

  val dedupMinhashSigSql: String = {
    val sigs = (0 until K).map(i =>
      s"list_aggregate(list_transform(sh, h -> ${sqlAffine("h", i)}), 'min') AS sig_$i")
      .mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t)
       |SELECT doc_id,
       |  $sigs
       |FROM s""".stripMargin
  }

  // ------------------------------------------------------- LSH pairs
  /** LSH candidate pairs + exact Jaccard verification.
    *
    * Pipeline: signature → `Bands` band keys per doc → self-join on
    * (band, key) → distinct candidate pairs → join each side's
    * shingle set → exact Jaccard in ppm. The self-join shuffles on
    * the band key only; with B bands of R rows a pair collides iff
    * some band matches entirely — the classic (B,R) S-curve.
    */
  def dedupLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), col("sh"))
    docs.cache() // shared by banded + both verification sides
    val R = K / Bands
    val sigCols = (0 until K).map(i =>
      array_min(transform(col("sh"), h => affine(h, i))))
    val bandKey = (b: Int) => concat_ws("-",
      sigCols.slice(b * R, b * R + R).map(_.cast("string")): _*)
    val banded = docs.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map(b => bandKey(b)): _*))
        .as(Seq("band", "key")))
      .cache() // feeds both sides of the self-join
    val a = banded.as("a")
    val b = banded.as("b")
    // join strategy left to Catalyst — see the object doc
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("n_common"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("n_union"))
      .withColumn("jaccard_ppm",
        floor(lit(1e6) * col("n_common").cast("double") /
          col("n_union").cast("double")).cast("long"))
  }

  val dedupLshPairsSql: String = {
    val R = K / Bands
    val sig = (i: Int) =>
      s"list_aggregate(list_transform(sh, h -> ${sqlAffine("h", i)}), 'min')"
    val bandRows = (0 until Bands).map { b =>
      val key = (b * R until b * R + R)
        .map(i => s"CAST(${sig(i)} AS VARCHAR)").mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $key AS key, sh FROM s"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |banded AS (
       |  $bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
       |  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT) AS n_union,
       |  CAST(floor(1e6 * CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)) AS BIGINT)
       |    AS jaccard_ppm
       |FROM pairs p
       |JOIN s sa ON p.doc_a = sa.doc_id
       |JOIN s sb ON p.doc_b = sb.doc_id""".stripMargin
  }

  // ------------------------------------------------- LSH tuning curve
  /** Band/row tuning curve for MinHash LSH — the dedup twin of the
    * ANN side's nprobe/re-rank curves, so every approximate family in
    * the engine ships the frontier its knobs trade on. All
    * [[K]] = 16 signature rows split as (bands, rows) ∈
    * [[LshCurve]]; more bands with shorter keys collide MORE
    * (recall↑, precision↓) — the classic 1−(1−s^r)^b S-curve —
    * and this measures where the corpus actually sits on it.
    *
    * The TRUTH side is the exact prefix-filtered set-similarity join
    * ([[dedupSetsimJoin]]: zero false negatives at the 0.6 threshold
    * by theorem, candidate-proportional cost), over the SAME distinct
    * shingle-hash universe the signatures sketch, so the curve's
    * recall denominators are exact — no sampled ground truth. Per
    * point: candidate count, exact-verified hits (≥ 0.6 Jaccard),
    * precision and recall in exact ppm.
    *
    * Scale shape: one cached shingle frame feeds every config; each
    * point is the [[dedupLshPairs]] dataflow (band-key self-join —
    * hot keys never concat across bands — then candidate-
    * proportional verification); the truth join is computed ONCE.
    */
  val LshCurve = Seq(8 -> 2, 4 -> 4, 2 -> 8)

  def dedupLshCurve(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), col("sh"))
    val released = scala.collection.mutable.ArrayBuffer[DataFrame](docs)
    docs.cache() // banding ×3 configs + both verify sides read it
    try {
      // exact truth read from the persisted PPJoin artifact (built by
      // dedup_setsim_join, the gated build job) — the curve audits the
      // LSH configs, it does not re-derive the exact join
      val truth = SessionArtifact.table(spark, dir, "setsim")(
        setsimJoinFrame(spark, dir))
        .select(col("doc_a"), col("doc_b"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val sigCols = (0 until K).map(i =>
        array_min(transform(col("sh"), h => affine(h, i))))
      LshCurve.map { case (nb, r) =>
        val bandKey = (b: Int) => concat_ws("-",
          sigCols.slice(b * r, b * r + r).map(_.cast("string")): _*)
        val banded = docs.select(col("doc_id"),
          posexplode(array((0 until nb).map(b => bandKey(b)): _*))
            .as(Seq("band", "key")))
        val a = banded.as("a")
        val b = banded.as("b")
        val pairs = a.join(b,
            col("a.band") === col("b.band") &&
              col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .cache() // candidate count + the verify join read it;
                   // released in the finally with the shingle frame
        released += pairs
        val sa = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val sb = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        val nHit = pairs.join(sa, "doc_a").join(sb, "doc_b")
          .where(floor(lit(1e6) *
            size(array_intersect(col("sh_a"), col("sh_b")))
              .cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
            .cast("long") >= 600000L)
          .agg(count(lit(1)).as("n_hit"))
        val nCand = pairs.agg(count(lit(1)).as("n_candidates"))
        nCand.crossJoin(nHit).crossJoin(nTruth)
          .select(lit(nb.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"),
            col("n_candidates"), col("n_hit"), col("n_truth"),
            when(col("n_candidates") > 0,
              ppm(col("n_hit"), col("n_candidates"))).otherwise(0L)
              .as("precision_ppm"),
            when(col("n_truth") > 0, ppm(col("n_hit"), col("n_truth")))
              .otherwise(0L).as("recall_ppm"))
      }.reduce(_ unionByName _).orderBy(col("bands").desc)
        .localCheckpoint(true)
    } finally released.foreach(_.unpersist())
  }

  // lazy: embeds dedupSetsimJoinSql, which is declared LATER in this
  // object — an eager val would interpolate null at init order
  lazy val dedupLshCurveSql: String = {
    val sig = (i: Int) =>
      s"list_aggregate(list_transform(sh, h -> ${sqlAffine("h", i)}), 'min')"
    val points = LshCurve.map { case (nb, r) =>
      val bandRows = (0 until nb).map { b =>
        val key = (b * r until b * r + r)
          .map(i => s"CAST(${sig(i)} AS VARCHAR)").mkString(" || '-' || ")
        s"SELECT doc_id, $b AS band, $key AS key FROM s"
      }.mkString("\n    UNION ALL\n    ")
      s"""SELECT CAST($nb AS BIGINT) AS bands,
         |  CAST($r AS BIGINT) AS rows_per_band,
         |  c.n_candidates, h.n_hit, t.n_truth,
         |  CASE WHEN c.n_candidates > 0
         |    THEN ${sqlPpm("h.n_hit", "c.n_candidates")} ELSE 0 END
         |    AS precision_ppm,
         |  CASE WHEN t.n_truth > 0
         |    THEN ${sqlPpm("h.n_hit", "t.n_truth")} ELSE 0 END
         |    AS recall_ppm
         |FROM
         |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM (
         |    SELECT DISTINCT a.doc_a, a.doc_b FROM (
         |      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |      FROM ($bandRows) x
         |      JOIN ($bandRows) y
         |        ON x.band = y.band AND x.key = y.key
         |        AND x.doc_id < y.doc_id) a)) c,
         |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit FROM (
         |    SELECT DISTINCT a.doc_a, a.doc_b FROM (
         |      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |      FROM ($bandRows) x
         |      JOIN ($bandRows) y
         |        ON x.band = y.band AND x.key = y.key
         |        AND x.doc_id < y.doc_id) a) p
         |    JOIN s sa ON p.doc_a = sa.doc_id
         |    JOIN s sb ON p.doc_b = sb.doc_id
         |    WHERE CAST(floor(1e6 *
         |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
         |        AS DOUBLE)) AS BIGINT) >= 600000) h,
         |  tcount t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text
       |  FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |tcount AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth
       |  FROM (${dedupSetsimJoinSql}) z)
       |$points
       |ORDER BY bands DESC""".stripMargin
  }

  // --------------------------------------------------------- simhash
  /** 64-bit SimHash per document, stored as two non-negative 32-bit
    * halves (`simhash_lo`, `simhash_hi`). One explode pass over token
    * hashes, 64 signed bit-sums as parallel aggregates, bits with
    * sum >= 0 set. Near-dup docs differ in few bits (compare via
    * Hamming distance over both halves downstream).
    *
    * Why two 32-bit columns instead of one signed 64-bit value: bit 63
    * of a single-column fingerprint would be the BIGINT sign bit,
    * dragging arithmetic-shift sign-fill, `%`-of-negative semantics
    * and DuckDB's overflow-checked/HUGEINT-promoting literals into the
    * cross-engine contract. Two halves keep every value in [0, 2^32)
    * where `>>`/`%` agree everywhere, at zero cost to the banding math.
    * The halves draw their bits from two DISJOINT 56-bit chunks of the
    * same md5 (hex digits 1-14 and 15-28), so they are independent.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashFrame(table(spark, dir, "documents"))

  /** The simhash core over any `(doc_id, text)` frame — shared with
    * the streaming dedup pipeline (StreamingDedupSpec feeds arriving
    * micro-batches through it).
    */
  def simhashFrame(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val hashed = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), md5(col("tok").cast("binary")).as("hex"))
      .select(col("doc_id"),
        conv(substring(col("hex"), 1, 14), 16, 10).cast("long").as("h1"),
        conv(substring(col("hex"), 15, 14), 16, 10).cast("long").as("h2"))
    val loSums = (0 until SimBits).map(b =>
      sum(shiftright(col("h1"), b) % 2 * 2 - 1).as(s"lo_$b"))
    val hiSums = (0 until SimBits).map(b =>
      sum(shiftright(col("h2"), b) % 2 * 2 - 1).as(s"hi_$b"))
    def assemble(prefix: String): Column = (0 until SimBits).map(b =>
      when(col(s"${prefix}_$b") >= 0, 1L << b).otherwise(0L)).reduce(_ + _)
    hashed.groupBy(col("doc_id"))
      .agg((loSums ++ hiSums).head, (loSums ++ hiSums).tail: _*)
      .select(col("doc_id"), assemble("lo").as("simhash_lo"),
        assemble("hi").as("simhash_hi"))
  }

  val dedupSimhashSql: String =
    s"""WITH $sqlSimhashCtes
       |SELECT doc_id, simhash_lo, simhash_hi FROM sims""".stripMargin

  /** SimHash near-dup pairs by bit-sampling LSH: split the 64-bit
    * fingerprint into 4 bands of 16 bits; by pigeonhole, any pair
    * within Hamming distance 3 shares at least one band intact, so
    * the self-join on (band, band_key) finds all such pairs without
    * n² — then exact Hamming distance (bit_count of xor, summed over
    * both halves) filters. The 4×65536-value key space (vs 4×256 for
    * a 32-bit/8-bit-band scheme) is what keeps the within-bucket
    * self-join subquadratic on a web-scale corpus: expected bucket
    * size is n/65536 per band, and widening the fingerprint further
    * (more halves) scales the key space without touching the
    * dataflow. The shuffle key is the band key.
    */
  def dedupSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsFrame(table(spark, dir, "documents"))

  /** 16-bit banding of [[simhashFrame]] output: one row per (doc,
    * band) keyed for the LSH self-join. Exposed so an INCREMENTAL
    * pipeline can band only newly arrived docs and join them against
    * a persisted banded corpus (new×all instead of all×all — the
    * foreachBatch dataflow StreamingDedupSpec proves).
    */
  def simhashBanded(docs: DataFrame): DataFrame =
    simhashFrame(docs).select(col("doc_id"), col("simhash_lo"),
      col("simhash_hi"),
      posexplode(array(
        col("simhash_lo") % 65536,
        shiftright(col("simhash_lo"), 16),
        col("simhash_hi") % 65536,
        shiftright(col("simhash_hi"), 16)))
        .as(Seq("band", "key")))

  /** Exact Hamming distance between two banded rows' fingerprints. */
  def simhashHamming(a: String, b: String): Column =
    (bit_count(col(s"$a.simhash_lo").bitwiseXOR(col(s"$b.simhash_lo"))) +
      bit_count(col(s"$a.simhash_hi").bitwiseXOR(col(s"$b.simhash_hi"))))
      .cast("long")

  def simhashPairsFrame(docs: DataFrame): DataFrame = {
    val banded = simhashBanded(docs)
      .cache() // the explode+64-bit-sum aggregation feeds both sides
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        simhashHamming("a", "b").as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
  }

  /** Shared oracle CTE chain ending in `sims(doc_id, simhash_lo,
    * simhash_hi)`. Reused by [[dedupSimhashSql]] and
    * [[sqlSimhashPairCtes]].
    */
  private[analytics] def sqlSimhashCtesFrom(src: String): String = {
    val bitSums = ((0 until SimBits).map(b =>
      s"SUM((h1 >> $b) % 2 * 2 - 1) AS lo_$b") ++
      (0 until SimBits).map(b =>
        s"SUM((h2 >> $b) % 2 * 2 - 1) AS hi_$b")).mkString(",\n  ")
    def assemble(prefix: String): String = (0 until SimBits).map(b =>
      s"CASE WHEN ${prefix}_$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""e AS (
       |  SELECT doc_id, md5(tok.t) AS hex
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
       |    LATERAL (SELECT unnest(toks) AS t) tok),
       |hs AS (SELECT doc_id,
       |  CAST('0x' || substr(hex, 1, 14) AS BIGINT) AS h1,
       |  CAST('0x' || substr(hex, 15, 14) AS BIGINT) AS h2 FROM e),
       |bs AS (SELECT doc_id,
       |  $bitSums
       |  FROM hs GROUP BY doc_id),
       |sims AS (SELECT doc_id, ${assemble("lo")} AS simhash_lo,
       |  ${assemble("hi")} AS simhash_hi FROM bs)""".stripMargin
  }

  /** Shared oracle CTE chain ending in
    * `spairs(doc_a, doc_b, hamming)` — the simhash near-dup pairs.
    * Reused by [[dedupSimhashPairsSql]] and [[dedupClustersSql]].
    */
  private lazy val sqlSimhashCtes: String = sqlSimhashCtesFrom("documents")

  private[analytics] def sqlSimhashPairCtesFrom(src: String): String = {
    val ham = "bit_count(xor(a.simhash_lo, b.simhash_lo)) + " +
      "bit_count(xor(a.simhash_hi, b.simhash_hi))"
    s"""${sqlSimhashCtesFrom(src)},
       |banded AS (
       |  SELECT doc_id, simhash_lo, simhash_hi, band.b AS band,
       |         CASE band.b
       |           WHEN 0 THEN simhash_lo % 65536
       |           WHEN 1 THEN simhash_lo // 65536
       |           WHEN 2 THEN simhash_hi % 65536
       |           ELSE simhash_hi // 65536 END AS key
       |  FROM sims, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) band),
       |spairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST($ham AS BIGINT) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE $ham <= 3)""".stripMargin
  }

  private[analytics] lazy val sqlSimhashPairCtes: String =
    sqlSimhashPairCtesFrom("documents")

  val dedupSimhashPairsSql: String =
    s"""WITH $sqlSimhashPairCtes
       |SELECT doc_a, doc_b, hamming FROM spairs""".stripMargin

  // --------------------------------------------- minhash accuracy eval
  /** Sketch-accuracy evaluation of the minhash signature itself: over
    * the LSH candidate pairs, the K-position signature agreement rate
    * (the classic minhash Jaccard estimator, exact ppm since K divides
    * 10^6) against the TRUE shingle-set Jaccard, reported as corpus
    * aggregates — pair count, mean estimate, mean truth, mean and max
    * absolute error. This is the number that justifies K: if the mean
    * error drifts (bad hash family, signature bug), this row moves
    * while every individual query can still look plausible — the same
    * monitor role as [[graft.analytics.EmbeddingQueries
    * .knnRecallReport]] and `text_langid_eval`.
    *
    * Scale shape: the candidate set is the banding join's output
    * (never all pairs), the signature join adds two broadcast-or-
    * shuffle joins on 8-byte doc ids, and the final aggregate is one
    * row. Runs on candidates only — at 100 TB this is the nightly QA
    * job over the pair stream the dedup already produces.
    */
  def dedupMinhashEval(spark: SparkSession, dir: String): DataFrame = {
    val est = lit(1000000L / K) // 62500: exact, K divides 10^6
    val sigs = dedupMinhashSig(spark, dir)
      .cache() // K-column signature derivation feeds both join sides
    def side(tag: String) = sigs.select(
      col("doc_id").as(s"doc_$tag") +:
        (0 until K).map(i => col(s"sig_$i").as(s"${tag}_sig_$i")): _*)
    val nMatch = (0 until K)
      .map(i => when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    dedupLshPairs(spark, dir)
      .join(side("a"), "doc_a").join(side("b"), "doc_b")
      .select((nMatch * est).as("est_ppm"), col("jaccard_ppm"))
      .withColumn("abs_err",
        abs(col("est_ppm") - col("jaccard_ppm")))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("est_ppm")).as("se"), sum(col("jaccard_ppm")).as("sj"),
        sum(col("abs_err")).as("sa"), max(col("abs_err")).as("max_abs_err_ppm"))
      .select(col("n_pairs"),
        expr("se div n_pairs").as("mean_est_ppm"),
        expr("sj div n_pairs").as("mean_exact_ppm"),
        expr("sa div n_pairs").as("mean_abs_err_ppm"),
        col("max_abs_err_ppm"))
  }

  val dedupMinhashEvalSql: String = {
    val nMatch = (0 until K)
      .map(i => s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ev AS (
       |  SELECT CAST(($nMatch) * ${1000000L / K} AS BIGINT) AS est_ppm,
       |    v.jaccard_ppm
       |  FROM ($dedupLshPairsSql) v
       |  JOIN ($dedupMinhashSigSql) a ON v.doc_a = a.doc_id
       |  JOIN ($dedupMinhashSigSql) b ON v.doc_b = b.doc_id)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(est_ppm) // COUNT(*) AS BIGINT) AS mean_est_ppm,
       |  CAST(SUM(jaccard_ppm) // COUNT(*) AS BIGINT) AS mean_exact_ppm,
       |  CAST(SUM(abs(est_ppm - jaccard_ppm)) // COUNT(*) AS BIGINT)
       |    AS mean_abs_err_ppm,
       |  CAST(MAX(abs(est_ppm - jaccard_ppm)) AS BIGINT)
       |    AS max_abs_err_ppm
       |FROM ev""".stripMargin
  }

  // ------------------------------------------------ dedup clustering
  /** Connected components over the simhash near-dup pairs: the step a
    * pipeline runs AFTER pair generation — transitive closure groups
    * near-dups into clusters, and the minimum doc_id in each cluster
    * is the canonical representative to keep. Every document appears
    * in the output; docs with no near-dup form singleton clusters.
    *
    * Algorithm: min-label propagation to a fixpoint. Each round, every
    * vertex takes the minimum label among itself and its neighbors —
    * one shuffle per round, keyed by vertex, converging in O(graph
    * diameter) rounds (near-dup components are dense, so the diameter
    * is small in practice). Each round is materialized with
    * `localCheckpoint` so the plan does not grow with the iteration
    * count and the convergence check does not recompute the chain.
    * This is the transparent formulation of the Kiveris et al.
    * "Connected Components in MapReduce" family; [[dedupClustersStar]]
    * is its large-star/small-star sibling, which bounds rounds by
    * O(log² n) independent of diameter — the per-round dataflow
    * (join, min-aggregate, re-key) is identical.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersWith(e => propagateLabels(e, identityLabels(e)))(spark, dir)

  /** [[dedupClusters]] computed by large-star/small-star contraction
    * instead of min-label propagation — same output (both are exact
    * connected components, so the shared oracle re-proves agreement
    * every verify run), different round bound: O(log² n) regardless
    * of graph DIAMETER, which is what survives pathological chain
    * components in a trillion-edge dedup graph.
    */
  def dedupClustersStar(spark: SparkSession, dir: String): DataFrame =
    clustersWith(starContractLabels)(spark, dir)

  /** Shared clusters pipeline: simhash near-dup pairs → symmetric
    * edge list → `labeler` → singleton rejoin → cluster sizes. Only
    * pair endpoints iterate — singletons (no edges) can never change
    * label, so they rejoin as fixed clusters of one at the end.
    */
  private def clustersWith(labeler: DataFrame => DataFrame)(
      spark: SparkSession, dir: String): DataFrame =
    clustersOver(table(spark, dir, "documents"),
      dedupSimhashPairs(spark, dir), labeler)

  private def clustersOver(docs: DataFrame, pairs0: DataFrame,
      labeler: DataFrame => DataFrame): DataFrame = {
    val pairs = pairs0.select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    clustersFinish(docs, labeler(edges))
  }

  /** The singleton-rejoin + cluster-size tail shared by every
    * clustering path: docs with no edge can never change label, so
    * they rejoin precomputed `labels(v, label)` as fixed clusters of
    * one, and each cluster's size attaches from one label-keyed count.
    */
  private[analytics] def clustersFinish(docs: DataFrame,
      labels: DataFrame): DataFrame = {
    val singletons = docs
      .select(col("doc_id").as("v"))
      .join(labels.select(col("v")), Seq("v"), "left_anti")
      .withColumn("label", col("v"))
    val all = labels.select(col("v"), col("label")).union(singletons)
    val sizes = all.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "label")
      .select(col("v").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** Min-label propagation to a fixpoint over `edges(src, dst)`
    * (directed rows; callers pass both directions), starting from
    * `init(v, label)`.
    *
    * The warm-start parameter is what makes clustering INCREMENTAL:
    * when a new batch of near-dup pairs arrives, seed with the
    * previous fixpoint's labels (new vertices labeled by themselves)
    * and only the components the new edges touch move — convergence
    * in 1-2 rounds instead of re-clustering the corpus. Valid because
    * a previous fixpoint label is always a vertex of the same
    * component, and adding edges only ever MERGES components (labels
    * keep strictly decreasing toward the new minimum). This is the
    * `foreachBatch` maintenance loop of a streaming dedup pipeline —
    * see IncrementalClusterSpec.
    *
    * Each round: neighbor-min join + pointer jumping (path halving:
    * label(v) ← label(label(v)), turning O(diameter) rounds into
    * O(log d)), materialized with `localCheckpoint` so the plan does
    * not grow, converged when the strictly-decreasing Σlabel is
    * unchanged.
    */
  def propagateLabels(edges: DataFrame, init: DataFrame): DataFrame =
    propagateLabelsWithRounds(edges, init)._1

  /** Cold-start seed for [[propagateLabels]]: every vertex of
    * `edges(src, dst)` labeled by itself.
    */
  def identityLabels(edges: DataFrame): DataFrame =
    edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))

  /** Warm-start seed for [[propagateLabels]] over a grown edge set:
    * every current vertex keeps its previous fixpoint label; vertices
    * the previous run never saw start as themselves.
    */
  def warmStart(edges: DataFrame, prev: DataFrame): DataFrame =
    identityLabels(edges).as("i")
      .join(prev.as("p"), col("i.v") === col("p.v"), "left_outer")
      .select(col("i.v"), coalesce(col("p.label"), col("i.label"))
        .as("label"))

  /** [[propagateLabels]] plus the number of rounds run — the
    * observable that proves a warm start converges faster than a cold
    * one (see IncrementalClusterSpec).
    *
    * Task-count discipline: the iterated frames are 16-byte (v, label)
    * rows, so the per-round cost at any scale where they fit a few
    * partitions is pure JOB overhead — task scheduling, broadcast
    * builds, the checkpoint and probe jobs. The round therefore sizes
    * its task count from the data (≈500k rows/partition, measured 30%
    * faster than inheriting the session's 32 shuffle partitions at
    * test scale) instead of letting every tiny stage schedule 32
    * tasks; at 10⁹ vertices the same rule yields thousands of
    * partitions, so nothing here caps scale. The step itself stays ONE
    * materialization per round — composing two steps lazily was
    * measured SLOWER, because the outer step references the inner plan
    * three times (nbr-min, left side, pointer table) and recomputes it
    * each time.
    */
  def propagateLabelsWithRounds(edges: DataFrame,
      init: DataFrame): (DataFrame, Int) = {
    val parts = sizedParts(edges)
    // THE ROUND-STRUCTURE DISCIPLINE (guide §2.4 — remove shuffles
    // outright; measured per ProbeCc job counts, not argued):
    //  - the STATIC edge table is hash-partitioned by dst ONCE, before
    //    the loop; Dataset.localCheckpoint preserves outputPartitioning
    //    through LogicalRDD, so every round's neighbor join reads it
    //    CO-PARTITIONED — the per-round shuffle of the edge set (the
    //    big frame at 100 TB) is gone;
    //  - labels leave each round hash-partitioned by v with the SAME
    //    partition count, so the neighbor join (keyed dst = renamed v)
    //    needs no exchange on either side;
    //  - own-label ∪ neighbor-labels collapse in ONE min-aggregation
    //    (identical result to the old nbr-min groupBy + left-outer
    //    least(): min over {own} ∪ neighbors == least(own, nbr_min),
    //    and every v appears because labels carries every v);
    //  - checkpoints are LAZY: the convergence probe that follows is
    //    the action that materializes them, so each round is one job
    //    wave, not an eager-checkpoint job plus a probe job.
    import org.apache.spark.sql.graftbridge.bridge.checkpointKeyed
    val e = checkpointKeyed(edges, parts, "dst")
    var labels = checkpointKeyed(
      init.select(col("v"), col("label")), parts, "v")
    var currentSum = sumLabels(labels)
    var converged = false
    var round = 0
    val maxRounds = 64 // >> any real near-dup component diameter
    while (!converged && round < maxRounds) {
      // shuffle_hash on the label side: both sides arrive
      // co-partitioned (zero exchange), and hashing the label slice
      // streams the EDGE slice unsorted — sort-merge would re-sort the
      // big edge frame every round for nothing
      val nbr = e
        .join(labels.withColumnRenamed("v", "dst").hint("shuffle_hash"),
          "dst")
        .select(col("src").as("v"), col("label"))
      val stepped = labels.unionByName(nbr)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
      val ptr = stepped.select(col("v").as("pv"), col("label").as("plabel"))
      labels = checkpointKeyed(
        stepped.join(ptr, stepped("label") === ptr("pv"), "left_outer")
          .select(stepped("v"),
            coalesce(col("plabel"), stepped("label")).as("label")),
        parts, "v") // materialized by the probe below
      val nextSum = sumLabels(labels)
      converged = nextSum == currentSum
      currentSum = nextSum
      round += 1
    }
    (labels, round)
  }

  /** Data-sized task count for an iterated fixpoint frame: ~500k
    * 16-byte rows per partition, at least 1, never more than the
    * frame already has. One count job against a (checkpointed) input
    * buys every subsequent round its right-sized stages.
    */
  private def sizedParts(edges: DataFrame): Int =
    sizedPartsOf(edges.count(), edges.rdd.getNumPartitions)

  private def sizedPartsOf(n: Long, numParts: Int): Int =
    (((n + 499999L) / 500000L).toInt.max(1)).min(numParts.max(1))

  /** Scalar Σlabel of a (small, checkpointed) label table — the
    * per-round convergence probe of [[propagateLabels]]. Empty input
    * (no near-dup pairs at all) reads as converged immediately.
    */
  private def sumLabels(labels: DataFrame): Long =
    Option(labels.agg(sum(col("label"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  // ---------------------------------- large-star/small-star contraction
  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the variant whose round count is
    * O(log² n) INDEPENDENT of graph diameter, where
    * [[propagateLabels]]' pointer-jumped propagation is O(log d).
    * Near-dup components are dense (small d), so propagation wins
    * there; on adversarial chain-shaped components — exactly what
    * web-boilerplate edges produce at trillion-edge scale — this is
    * the safe bound. Per round: two self-joins keyed on the vertex,
    * each a single shuffle; edges stay canonically oriented
    * src > dst, so the edge set only ever contracts toward the stars
    * that ARE the final labeling (no separate label table).
    *
    * Input: `edges(src, dst)` in either or both directions;
    * self-loops ignored. Output: `(v, label)` for every vertex with
    * at least one edge, label = component minimum — identical to
    * [[propagateLabels]] on the same edges (spec-proven, and the
    * shared dedup_clusters oracle re-proves it every verify run).
    */
  def starContractLabels(edges: DataFrame): DataFrame =
    starContractWithRounds(edges)._1

  /** [[starContractLabels]] plus rounds run — the observable for the
    * diameter-independence spec.
    */
  def starContractWithRounds(edges0: DataFrame): (DataFrame, Int) = {
    // LAZY checkpoint + count probe fused into one job per round (the
    // propagateLabels discipline): the count that immediately follows
    // is the action that materializes the checkpoint.
    var edges = edges0.where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct().localCheckpoint(false)
    var count = edges.count()
    // data-sized per-round task count — the propagateLabels discipline:
    // the iterated edge set only ever CONTRACTS, so sizing once from
    // the input bounds every round. coalesce is NARROW on top of the
    // existing checkpoint — no second materialization, no second count
    val parts = sizedPartsOf(count, edges.rdd.getNumPartitions)
    edges = edges.coalesce(parts)
    var converged = count == 0L // no edges ⇒ nothing to label
    var round = 0
    val maxRounds = 64 // >> log²(any real corpus)
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges, parts)).coalesce(parts)
        .localCheckpoint(false) // materialized by the count below
      val nextCount = next.count()
      // EXACT set-equality fixpoint probe: both sets are distinct, so
      // equal cardinality + empty one-sided difference ⇔ equal sets (a
      // scalar signature could in principle collide and stop early on
      // a non-star edge set — this can't). One extra key-only join per
      // round, against checkpointed frames.
      converged = nextCount == count && next.except(edges).isEmpty
      edges = next
      count = nextCount
      round += 1
    }
    val labels = edges.select(col("src").as("v"), col("dst").as("label"))
      .union(edges.select(col("dst").as("v"), col("dst").as("label")))
      .distinct()
    (labels, round)
  }

  /** Large-star: every vertex points its LARGER neighbors at the
    * minimum of its closed neighborhood. Output keeps the src > dst
    * invariant (v > u ≥ m).
    *
    * The output is explicitly hash-partitioned by `src` so the
    * trailing distinct runs exchange-free on that partitioning (same
    * src ⇒ same (src, dst) colocated) AND [[smallStar]]'s min-
    * aggregation + join — both keyed src — inherit it: one exchange
    * where the naive composition pays three (guide §2.4).
    */
  private def largeStar(e: DataFrame, parts: Int): DataFrame = {
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("nm"))
      .select(col("u"), least(col("u"), col("nm")).as("m"))
    sym.join(mins, "u").where(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .repartition(parts, col("src"))
      .distinct()
  }

  /** Small-star: every vertex points its smaller neighbors (and
    * itself) at the minimum of its closed neighborhood. Input and
    * output both satisfy src > dst. Input comes src-partitioned from
    * [[largeStar]], so the aggregation and the join plan no exchange.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    e.join(mins, "src").where(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
      .distinct()
  }


  val dedupClustersSql: String =
    s"""WITH RECURSIVE $sqlSimhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM spairs),
       |walk AS (
       |  SELECT doc_id AS v, doc_id AS r FROM documents
       |  UNION
       |  SELECT w.v, e.d AS r FROM walk w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT v, MIN(r) AS cluster_id FROM walk GROUP BY v),
       |sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id)
       |SELECT c.v AS doc_id, c.cluster_id, CAST(s.n AS BIGINT) AS cluster_size
       |FROM comp c JOIN sz s ON c.cluster_id = s.cluster_id""".stripMargin

  // ------------------------------------------------ Bloom pre-gate
  /** BLOOM PRE-GATE for exact dedup — the constant-space membership
    * screen that stands in front of the exact hash join when the seen
    * set no longer fits a broadcast: k=4 affine probes over the
    * content hash into an m = 8·|corpus| bit space (fill ≤ 50%, FP ≈
    * fill⁴ ≈ 2-3%). Both Bloom guarantees are measured IN-BAND and
    * hash-gated every verify run: the corpus replayed against its own
    * filter must read `n_missed = 0` (no false negatives — the
    * guarantee that makes a Bloom screen SAFE to put in front of
    * dedup), and the fresh cohort's `maybe_ppm` is the false-positive
    * rate the exact verifier then pays for.
    *
    * Scale shape: the filter is the DISTINCT occupied-position table
    * — 8-byte keys, ≤ m rows, partial-aggregating; probes join it on
    * the position key (shuffle on positions, never on text). In
    * production the position table compacts to a bitmap broadcast;
    * the relational form here is what a multi-executor build of that
    * bitmap shuffles anyway.
    */
  val BloomK = 4

  def dedupBloomGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), md5Long(col("text")).as("h"),
        (col("doc_id") % 17 === 0).as("is_fresh"))
    docs.cache()
    try {
      val corpus = docs.where(!col("is_fresh"))
      val m = 8L * corpus.count()
      def posOf(j: Int): Column = affine(col("h"), j) % m
      val positions = array((0 until BloomK).map(posOf): _*)
      val bits = corpus.select(explode(positions).as("p")).distinct()
      val probes = docs
        .select(col("doc_id"), col("is_fresh"),
          explode(array_distinct(positions)).as("p"))
      probes
        .join(bits.withColumn("hit", lit(1L)), Seq("p"), "left_outer")
        .groupBy(col("doc_id"), col("is_fresh"))
        .agg(count(lit(1)).as("n_probes"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .withColumn("maybe", (col("n_hits") === col("n_probes"))
          .cast("long"))
        .groupBy(col("is_fresh"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("maybe")).as("n_maybe_seen"))
        .select(
          when(col("is_fresh"), lit("fresh")).otherwise(lit("replay"))
            .as("cohort"),
          col("n_docs"), col("n_maybe_seen"),
          (col("n_docs") - col("n_maybe_seen")).as("n_missed"),
          ppm(col("n_maybe_seen"), col("n_docs")).as("maybe_ppm"))
        // 2 rows; materialize while the shared hash scan is still
        // cached (both the bits and probes sides read it)
        .localCheckpoint(true)
    } finally docs.unpersist()
  }

  val dedupBloomGateSql: String = {
    val posList = (0 until BloomK)
      .map(j => s"(${sqlAffine("h", j)}) % (SELECT m FROM mm)")
      .mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, ${sqlMd5Long("text")} AS h,
       |    doc_id % 17 = 0 AS is_fresh
       |  FROM documents),
       |mm AS (SELECT 8 * COUNT(*) AS m FROM d WHERE NOT is_fresh),
       |bits AS (
       |  SELECT DISTINCT unnest($posList) AS p FROM d WHERE NOT is_fresh),
       |probes AS (
       |  SELECT doc_id, is_fresh, unnest(list_distinct($posList)) AS p
       |  FROM d),
       |per AS (
       |  SELECT pr.doc_id, pr.is_fresh, COUNT(*) AS n_probes,
       |    SUM(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
       |  FROM probes pr LEFT JOIN bits b ON pr.p = b.p
       |  GROUP BY pr.doc_id, pr.is_fresh),
       |coh AS (
       |  SELECT is_fresh, COUNT(*) AS n_docs,
       |    SUM(CASE WHEN n_hits = n_probes THEN 1 ELSE 0 END)
       |      AS n_maybe_seen
       |  FROM per GROUP BY is_fresh)
       |SELECT CASE WHEN is_fresh THEN 'fresh' ELSE 'replay' END AS cohort,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_maybe_seen AS BIGINT) AS n_maybe_seen,
       |  CAST(n_docs - n_maybe_seen AS BIGINT) AS n_missed,
       |  ${QueryUtil.sqlPpm("n_maybe_seen", "n_docs")} AS maybe_ppm
       |FROM coh""".stripMargin
  }

  // --------------------------------------- incremental clustering
  /** The base/delta split every incremental dedup query shares: delta
    * docs are `doc_id % 17 = 0`, the base is everything else.
    * [[NearDupArtifact]]'s build persists the base fixpoint under the
    * same predicate, so seed and fold always agree on the split.
    */
  private[graft] def isDeltaDoc(c: Column): Column = c % 17 === 0

  /** INCREMENTAL cluster maintenance under the oracle gate — the
    * NIGHTLY half only: the base corpus (`doc_id % 17 ≠ 0`) was
    * clustered by last night's build job and its fixpoint PERSISTED
    * ([[NearDupArtifact.baseLabels]] — the amortized cost lives in
    * [[dedupClustersPersisted]], the query that pays a full build);
    * tonight the delta's vertices and edges are folded in with a WARM
    * START from that persisted seed ([[warmStart]] — the foreachBatch
    * maintenance loop StreamingDedupSpec drives live). The claim the
    * hash gate proves every verify run: the maintained labels are
    * IDENTICAL to clustering everything from scratch (warm-start
    * validity: a previous fixpoint label is a vertex of the same
    * component, and new edges only ever merge components) — so the
    * oracle is the SAME full-corpus recursive CTE as
    * [[dedupClusters]], while the Spark side only ever propagates from
    * the warm seed. The benched number is therefore the honest nightly
    * cost: artifact reads plus a 1-2 round fold over the components
    * the delta touches, not a corpus re-clustering.
    */
  def dedupClustersIncremental(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupArtifact.pairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    val baseLabels = NearDupArtifact.baseLabels(spark, dir)
    // nightly pass: the full edge set, seeded from the persisted base
    // fixpoint (checkpointed once — the fold iterates over it)
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint(true)
    val labels = propagateLabels(edges, warmStart(edges, baseLabels))
    val singletons = docs
      .select(col("doc_id").as("v"))
      .join(labels.select(col("v")), Seq("v"), "left_anti")
      .withColumn("label", col("v"))
    val all = labels.union(singletons)
    val sizes = all.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "label")
      .select(col("v").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** Same recursive-CTE oracle as [[dedupClusters]]: label equality
    * with the cold full recompute IS the incremental-validity claim.
    */
  val dedupClustersIncrementalSql: String = dedupClustersSql

  // ------------------------------------------- persisted clustering
  /** The NIGHTLY BUILD JOB of the near-dup artifact, under the oracle
    * gate: recompute the simhash pair graph, the full component
    * labels, and the base fixpoint; publish all three through the
    * graft-manifest sink ([[NearDupArtifact.rebuild]] — transactional
    * commit, snapshot history); read the label table BACK and return
    * it. Output ≡ [[dedupClusters]] by construction, so it shares the
    * recursive-CTE oracle — the hash gate re-proves the sink
    * round-trip is exact every run, the same pattern as
    * `knn_ivf_persisted`. Every consumer that rides the artifact
    * (apply, weighting, split audit, the graph family) keeps its own
    * full-recompute oracle on top.
    *
    * This query's benched time IS the amortized cost the riding
    * consumers no longer pay — build once nightly, read many.
    */
  def dedupClustersPersisted(spark: SparkSession, dir: String): DataFrame = {
    val a = NearDupArtifact.rebuild(spark, dir)
    graft.sources.ManifestV2Sink.readCommitted(spark, a.labels)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  val dedupClustersPersistedSql: String = dedupClustersSql

  // ------------------------------------------------ dedup APPLIED
  /** Near-dup dedup APPLIED: the write path after [[dedupClusters]] —
    * keep the canonical document of every cluster (the minimum
    * doc_id, which IS the cluster label under min-label propagation)
    * and report, per source, what survives: document and token counts
    * before/after. This is the number a pipeline owner actually acts
    * on ("dedup dropped 7% of crawl-B tokens"), and it closes the
    * report→apply gap the same way [[PipelineQueries
    * .pipelineRemoveChunks]] does for chunk-level dedup.
    *
    * Scale shape: the clusters frame is corpus-keyed (doc_id), the
    * documents join shuffles both sides on that same 8-byte key, and
    * the survivor decision `doc_id == cluster_id` is a per-row
    * comparison — no new state beyond the clustering itself. The
    * per-source rollup is a partial-aggregatable groupBy on a
    * low-cardinality key.
    */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    // rides the persisted label table ([[NearDupArtifact]] — built by
    // star contraction, published via the manifest sink): an apply job
    // reads the nightly labels, it does not re-cluster the corpus. The
    // full-recompute oracle below re-proves the labels every run.
    val clusters = NearDupArtifact.labels(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    docs.join(clusters, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L))
          .as("n_docs_kept"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("doc_id") === col("cluster_id"), col("n_toks"))
          .otherwise(0L)).as("n_tokens_kept"))
  }

  val dedupApplySql: String =
    s"""WITH RECURSIVE $sqlSimhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM spairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM spairs),
       |walk AS (
       |  SELECT doc_id AS v, doc_id AS r FROM documents
       |  UNION
       |  SELECT w.v, e.d AS r FROM walk w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT v, MIN(r) AS cluster_id FROM walk GROUP BY v)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN d.doc_id = c.cluster_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_docs_kept,
       |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN d.doc_id = c.cluster_id
       |    THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
       |    AS n_tokens_kept
       |FROM documents d JOIN comp c ON d.doc_id = c.v
       |GROUP BY d.source""".stripMargin

  // --------------------------------------- blocked n-gram jaccard
  /** N-gram Jaccard near-dup with min-hash blocking: pairs are only
    * formed within a block (docs sharing the same minimum shingle
    * hash), so the join shuffles on the block key — linear-ish in
    * practice vs. the n² all-pairs.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), col("sh"), array_min(col("sh")).as("block"))
      .cache() // the md5 shingle pipeline feeds both self-join sides
    val a = docs.select(col("block"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val b = docs.select(col("block"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        floor(lit(1e6) *
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .cast("long").as("jaccard_ppm"))
      .where(col("jaccard_ppm") >= 100000)
  }

  val dedupNgramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |blocked AS (SELECT doc_id, sh, list_aggregate(sh, 'min') AS block FROM s)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(floor(1e6 * CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)) AS BIGINT)
       |    AS jaccard_ppm
       |FROM blocked a JOIN blocked b
       |  ON a.block = b.block AND a.doc_id < b.doc_id
       |WHERE CAST(floor(1e6 * CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)) AS BIGINT)
       |  >= 100000""".stripMargin

  // --------------------------------- exact set-similarity join (prefix)
  /** EXACT shingle-set Jaccard join at threshold 0.6 via prefix
    * filtering — the AllPairs/PPJoin family, the deterministic
    * complement of the probabilistic MinHash-LSH path: no false
    * negatives by THEOREM, not by banding probability. Shingles rank
    * globally rarest-first; a document of m distinct shingles exposes
    * only its first `m − ⌈0.6·m⌉ + 1` as candidate keys (any pair
    * with J ≥ 0.6 must share one — pigeonhole on the overlap bound),
    * then candidates verify by exact intersection counting.
    *
    * Scale shape: the candidate self-join shuffles on the PREFIX
    * shingle key, and prefixes are rarest-first by construction — the
    * hot template shingles that would explode a naive join are
    * exactly the ones prefix filtering keeps OUT of the join. The
    * per-doc ranking window is bounded by document length; df and
    * verify joins shuffle on shingle/doc keys unhinted; the verify
    * cost is candidate-proportional.
    */
  def dedupSetsimJoin(spark: SparkSession, dir: String): DataFrame =
    // this query IS the nightly build job of the exact-pair artifact
    // (the dedup_clusters_persisted pattern): recompute, publish
    // through the manifest sink, read BACK — so the benched cost is
    // the honest build and the oracle re-proves the round-trip every
    // run. dedup_lsh_curve's truth denominators ride the published
    // table instead of re-deriving the PPJoin per sweep.
    SessionArtifact.rebuild(spark, dir, "setsim")(
      setsimJoinFrame(spark, dir))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("jaccard_ppm"))

  private def setsimJoinFrame(spark: SparkSession, dir: String): DataFrame = {
    // the set universe is SHINGLES (3-grams, already distinct), not
    // unigram tokens: a tiny shared vocabulary makes unigram sets
    // near-identical across unrelated docs (quadratic output); the
    // shingle space keeps exact Jaccard selective — same universe the
    // MinHash path sketches, so the two families are comparable
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), explode(shingleHashes).as("tok"))
      .cache() // feeds ranking, prefixes, and both verify sides;
               // released in the finally below — without it each call
               // would pin a corpus×shingles frame for the session
    try {
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("tok"))
    val pref = toks.join(dfreq, "tok")
      .withColumn("rn", row_number().over(wDoc))
      .join(sizes, "doc_id")
      .where(col("rn") <= col("m") - ceil(lit(0.6) * col("m")) + 1)
      .select(col("tok"), col("doc_id"), col("m"))
    val cand = pref
      .select(col("tok"), col("doc_id").as("doc_a"), col("m").as("m_a"))
      .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
        col("m").as("m_b")), Seq("tok"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "m_a", "m_b").distinct()
    // verify by ARRAY intersection on the per-doc shingle sets (one
    // narrow re-derivation pass — shingle sets are array_distinct, so
    // |sh_a ∩ sh_b| is exactly the exploded-join match count the
    // oracle computes): the two verify joins shuffle ONE array row per
    // document instead of every (doc, shingle) token row — O(corpus)
    // rows through the exchange, not O(corpus·shingles)
    val arrs = table(spark, dir, "documents")
      .select(col("doc_id"), shingleHashes.as("sh"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(arrs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("m_a"), col("m_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("n_common"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        ppm(col("n_common"), col("m_a") + col("m_b") - col("n_common"))
          .as("jaccard_ppm"))
      .where(col("jaccard_ppm") >= 600000L)
      // eager: the near-dup pair set is orders smaller than the
      // shingle frame; materializing it here lets the finally release
      // the cache (ContextCleaner reclaims these blocks on deref,
      // unlike CacheManager entries, which pin until unpersist)
      .localCheckpoint(true)
    } finally toks.unpersist()
  }

  val dedupSetsimJoinSql: String = {
    val jac = sqlPpm("n_common", "m_a + m_b - n_common")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks, text
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, u.tok
       |  FROM (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh
       |        FROM t) s,
       |    LATERAL (SELECT unnest(sh) AS tok) u),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m
       |  FROM tk GROUP BY 1),
       |dfr AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY 1),
       |pr AS (
       |  SELECT tok, doc_id, m FROM (
       |    SELECT t.tok, t.doc_id, s.m,
       |      row_number() OVER (PARTITION BY t.doc_id
       |        ORDER BY d.df, t.tok) AS rn
       |    FROM tk t JOIN dfr d ON t.tok = d.tok
       |    JOIN sz s ON t.doc_id = s.doc_id)
       |  WHERE rn <= m - CAST(ceil(0.6 * m) AS BIGINT) + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.m AS m_a, b.m AS m_b
       |  FROM pr a JOIN pr b ON a.tok = b.tok AND a.doc_id < b.doc_id),
       |com AS (
       |  SELECT c.doc_a, c.doc_b, c.m_a, c.m_b, COUNT(*) AS n_common
       |  FROM cand c
       |  JOIN tk ta ON ta.doc_id = c.doc_a
       |  JOIN tk tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, n_common, $jac AS jaccard_ppm
       |FROM com WHERE $jac >= 600000""".stripMargin
  }

  // --------------------------------------- asymmetric containment
  /** Shingle CONTAINMENT — the asymmetric near-dup metric:
    * `|A∩B| / min(|A|,|B|)`. Jaccard misses a short document quoted
    * inside a much longer one (the union denominator dilutes the
    * overlap); containment is exactly the quote/excerpt/boilerplate
    * detector used alongside Jaccard in corpus dedup (Broder's
    * original resemblance/containment pair). Same min-shingle
    * blocking and shuffle shape as [[dedupNgramJaccard]] — one
    * self-join on the block key; `shingleHashes` is already distinct,
    * so `size()` is the set cardinality.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), col("sh"), array_min(col("sh")).as("block"))
      .cache() // shingle pipeline feeds both self-join sides
    val a = docs.select(col("block"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val b = docs.select(col("block"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        floor(lit(1e6) *
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double"))
          .cast("long").as("containment_ppm"))
      .where(col("containment_ppm") >= 300000)
  }

  val dedupContainmentSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |blocked AS (SELECT doc_id, sh, list_aggregate(sh, 'min') AS block FROM s)
       |SELECT doc_a, doc_b, containment_ppm FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(floor(1e6 * CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE)) AS BIGINT)
       |      AS containment_ppm
       |  FROM blocked a JOIN blocked b
       |    ON a.block = b.block AND a.doc_id < b.doc_id)
       |WHERE containment_ppm >= 300000""".stripMargin

  /** Edit-distance verification of blocked candidate pairs: the same
    * min-shingle blocking as [[dedupNgramJaccard]], scored by
    * Levenshtein distance over a 200-char prefix instead of set
    * Jaccard. The prefix bound caps the O(len²) DP per pair — the
    * standard trick that keeps character-level verification affordable
    * once the blocker has cut candidates from n² to ~linear.
    * Levenshtein is integer-exact in both engines, so no quantization
    * is needed.
    */
  def dedupEditdist(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("prefix"),
        array_min(col("sh")).as("block"))
      .cache() // shingle pipeline feeds both self-join sides
    val a = docs.select(col("block"), col("doc_id").as("doc_a"),
      col("prefix").as("pa"))
    val b = docs.select(col("block"), col("doc_id").as("doc_b"),
      col("prefix").as("pb"))
    a.join(b, Seq("block"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"))
      .where(col("edit_dist") <= 80)
  }

  val dedupEditdistSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, substr(text, 1, 200) AS prefix,
       |  ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |blocked AS (SELECT doc_id, prefix, list_aggregate(sh, 'min') AS block FROM s)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
       |FROM blocked a JOIN blocked b
       |  ON a.block = b.block AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.prefix, b.prefix) <= 80""".stripMargin

  /** Cross-modal near-dup verification: candidate pairs from text
    * blocking (min-shingle-hash) scored by BOTH n-gram Jaccard and
    * embedding cosine (documents ⨝ embeddings on doc_id = vec_id).
    * This is the production dedup shape: a cheap text blocker
    * generates candidates, independent signals confirm — disagreement
    * between the signals is exactly what a human reviews.
    */
  def dedupCrossmodal(spark: SparkSession, dir: String): DataFrame = {
    val textPairs = dedupNgramJaccard(spark, dir)
    val emb = EmbeddingQueries.quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2"))
    val ea = emb.select(col("vec_id").as("doc_a"), col("q").as("qa"),
      col("norm2").as("na"))
    val eb = emb.select(col("vec_id").as("doc_b"), col("q").as("qb"),
      col("norm2").as("nb"))
    textPairs.join(ea, "doc_a")
      .join(eb, "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"),
        floor((lit(1e6) * graft.functions.DotLong(col("qa"), col("qb"))
            .cast("double")) /
          sqrt((col("na") * col("nb")).cast("double"))).cast("long")
          .as("cosine_ppm"))
  }

  val dedupCrossmodalSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |blocked AS (SELECT doc_id, sh, list_aggregate(sh, 'min') AS block FROM s),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(floor(1e6 * CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)) AS BIGINT)
       |      AS jaccard_ppm
       |  FROM blocked a JOIN blocked b
       |    ON a.block = b.block AND a.doc_id < b.doc_id),
       |emb AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q,
       |  list_sum(list_transform(q, x -> x * x)) AS norm2 FROM emb)
       |SELECT p.doc_a, p.doc_b, p.jaccard_ppm,
       |  CAST(floor((1e6 * CAST(list_sum(list_transform(
       |      generate_series(1, 64), i -> a.q[i] * b.q[i])) AS DOUBLE))
       |    / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE))) AS BIGINT) AS cosine_ppm
       |FROM pairs p
       |JOIN n a ON p.doc_a = a.vec_id
       |JOIN n b ON p.doc_b = b.vec_id
       |WHERE p.jaccard_ppm >= 100000""".stripMargin

  // ------------------------------------------------ incremental dedup
  /** Incremental (delta-vs-corpus) near-dup detection — the nightly
    * operational shape at 100 TB: a new shard arrives and must be
    * deduplicated against the existing corpus AND against itself,
    * WITHOUT ever re-pairing corpus docs with each other. The delta is
    * modeled as `doc_id % 17 == 0` (a hash split in production).
    *
    * Candidate generation is the same (band, key) LSH collision as
    * [[dedupLshPairs]], but the join predicate admits ONLY pairs with
    * a delta doc on the new side: corpus×corpus collisions are never
    * generated, so per-night work scales with |delta| · collision
    * rate, not |corpus|². In production the corpus side is the
    * PERSISTED signature/band table maintained by previous runs — one
    * linear scan here stands in for that read; nothing else touches
    * corpus content. The delta side is corpus-proportional, so it
    * carries NO broadcast hint (the same data-growing-hint rule
    * PlanAuditSpec pins for pipeline_filter); AQE broadcasts it at
    * runtime while it measures small.
    *
    * Output: one row per verified candidate pair — the new doc, the
    * existing doc it collides with (`vs` = corpus|delta), and the
    * exact Jaccard over shingle sets, same verification as
    * [[dedupLshPairs]].
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("sh", shingleHashes)
      .select(col("doc_id"), col("sh"),
        (col("doc_id") % 17 === 0).as("is_delta"))
    docs.cache() // banding + both verification sides
    val R = K / Bands
    val sigCols = (0 until K).map(i =>
      array_min(transform(col("sh"), h => affine(h, i))))
    val bandKey = (b: Int) => concat_ws("-",
      sigCols.slice(b * R, b * R + R).map(_.cast("string")): _*)
    val banded = docs.select(
      col("doc_id"), col("is_delta"),
      posexplode(array((0 until Bands).map(b => bandKey(b)): _*))
        .as(Seq("band", "key")))
      .cache() // delta slice + full side of the collision join
    val delta = banded.where(col("is_delta")).as("a")
    val full = banded.as("b")
    // delta-vs-delta pairs orient doc_b < doc_a so each pair appears
    // once; delta-vs-corpus pairs keep every corpus partner
    val pairs = delta.join(full,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          (!col("b.is_delta") || col("b.doc_id") < col("a.doc_id")))
      .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_old"),
        when(col("b.is_delta"), lit("delta")).otherwise(lit("corpus"))
          .as("vs"))
      .distinct()
    val sa = docs.select(col("doc_id").as("doc_new"), col("sh").as("sh_a"))
    val sb = docs.select(col("doc_id").as("doc_old"), col("sh").as("sh_b"))
    pairs.join(sa, "doc_new").join(sb, "doc_old")
      .select(col("doc_new"), col("doc_old"), col("vs"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("n_common"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("n_union"))
      .withColumn("jaccard_ppm",
        floor(lit(1e6) * col("n_common").cast("double") /
          col("n_union").cast("double")).cast("long"))
  }

  val dedupIncrementalSql: String = {
    val R = K / Bands
    val sig = (i: Int) =>
      s"list_aggregate(list_transform(sh, h -> ${sqlAffine("h", i)}), 'min')"
    val bandRows = (0 until Bands).map { b =>
      val key = (b * R until b * R + R)
        .map(i => s"CAST(${sig(i)} AS VARCHAR)").mkString(" || '-' || ")
      s"SELECT doc_id, doc_id % 17 = 0 AS is_delta, $b AS band, $key AS key FROM s"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
       |s AS (SELECT doc_id, ${sqlShingleHashes("toks", "text")} AS sh FROM t),
       |banded AS (
       |  $bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old,
       |    CASE WHEN b.is_delta THEN 'delta' ELSE 'corpus' END AS vs
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key
       |    AND a.is_delta AND (NOT b.is_delta OR b.doc_id < a.doc_id))
       |SELECT p.doc_new, p.doc_old, p.vs,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
       |  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT) AS n_union,
       |  CAST(floor(1e6 * CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)) AS BIGINT)
       |    AS jaccard_ppm
       |FROM pairs p
       |JOIN s sa ON p.doc_new = sa.doc_id
       |JOIN s sb ON p.doc_old = sb.doc_id""".stripMargin
  }

  // --------------------------------------- cross-source dup matrix
  /** Cross-source contamination matrix: for every unordered source
    * pair (a ≤ b), how many VERIFIED near-duplicate document pairs
    * (exact shingle-Jaccard ≥ 0.6, from [[dedupSetsimJoin]] — the
    * no-false-negative join, so a zero cell is a PROOF of
    * non-contamination at the threshold, not a sketch artifact)
    * straddle it, how many distinct documents are implicated, and the
    * mean overlap strength. This is the view a mixture owner reads
    * before weighting sources — an eval source that pair-counts
    * against a train source is a leak, and the diagonal says which
    * crawls self-duplicate. Built ON the pair join's output frame,
    * so the matrix can never disagree with the pair report about
    * what "near-duplicate" means.
    *
    * Scale shape: the prefix-filtered join cost lives in the nightly
    * artifact build ([[dedupSetsimJoin]], the gated build job); this
    * query reads the published pair table, adds two broadcast-able
    * doc→source lookups (8-byte key + a short source string), and
    * rolls up to a |sources|²-bounded frame.
    */
  def dedupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = table(spark, dir, "documents").select(col("doc_id"),
      col("source"))
    // doc columns swap WITH their sources, so n_docs_a counts only
    // source_a's documents and n_docs_b only source_b's (on the
    // diagonal both columns count the one source's left/right
    // appearances — a doc in both positions is implicated in both)
    val swap = col("src_a") > col("src_b")
    // pair table read from the persisted PPJoin artifact (built by
    // dedup_setsim_join); the full-recompute oracle re-proves it
    SessionArtifact.table(spark, dir, "setsim")(setsimJoinFrame(spark, dir))
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), Seq("doc_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"),
        when(swap, col("doc_b")).otherwise(col("doc_a")).as("doc_sa"),
        when(swap, col("doc_a")).otherwise(col("doc_b")).as("doc_sb"),
        col("jaccard_ppm"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_sa")).as("n_docs_a"),
        countDistinct(col("doc_sb")).as("n_docs_b"),
        ppm(sum(col("jaccard_ppm")), count(lit(1)) * lit(1000000L))
          .as("mean_jaccard_ppm"))
  }

  val dedupSourceMatrixSql: String =
    s"""WITH pairs AS ($dedupSetsimJoinSql)
       |SELECT least(sa.source, sb.source) AS source_a,
       |  greatest(sa.source, sb.source) AS source_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(COUNT(DISTINCT CASE WHEN sa.source > sb.source
       |    THEN p.doc_b ELSE p.doc_a END) AS BIGINT) AS n_docs_a,
       |  CAST(COUNT(DISTINCT CASE WHEN sa.source > sb.source
       |    THEN p.doc_a ELSE p.doc_b END) AS BIGINT) AS n_docs_b,
       |  ${sqlPpm("SUM(jaccard_ppm)", "COUNT(*) * 1000000")}
       |    AS mean_jaccard_ppm
       |FROM pairs p
       |JOIN documents sa ON p.doc_a = sa.doc_id
       |JOIN documents sb ON p.doc_b = sb.doc_id
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------- exact duplicated substrings
  /** Window width, in tokens, of the exact-substring pass. The
    * published pipelines use 50; the synthetic docs are short, so 8
    * keeps the audit non-vacuous (~10% of windows duplicated) while
    * the shape is width-independent.
    */
  val SubW = 8

  /** Every SubW-token window of every document, hashed: (doc_id, pos,
    * h) with pos 1-based. The per-doc window array is built inside
    * whole-stage codegen (transform+slice+md5 — no UDF), then ONE
    * posexplode emits the corpus-wide window stream; docs shorter
    * than SubW contribute no windows (restored by the callers' left
    * joins). This is the relational re-expression of the ExactSubstr
    * suffix-array pass (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better"): where the paper sorts suffixes,
    * we shuffle window hashes — same duplicate detection, but
    * partition-parallel with no global sort and no driver state.
    */
  private def windowHashes(spark: SparkSession, dir: String): DataFrame = {
    val t = table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    t.select(col("doc_id"),
        posexplode(
          // sequence(1, n) DESCENDS when n < 1 — guard short docs to
          // an empty window set, not a phantom [1, 0] walk
          when(size(col("toks")) >= SubW,
            transform(sequence(lit(1), size(col("toks")) - (SubW - 1)),
              i => md5Long(concat_ws(" ", slice(col("toks"), i, lit(SubW))))))
            .otherwise(array().cast("array<long>")))
          .as(Seq("off", "h")))
      .select(col("doc_id"), (col("off") + 1).as("pos"), col("h"))
  }

  private val sqlWindowCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (
       |  SELECT t.doc_id, g.i AS pos,
       |    ${sqlMd5Long(s"array_to_string(t.toks[g.i:g.i+${SubW - 1}], ' ')")} AS h
       |  FROM t, LATERAL (SELECT unnest(generate_series(1,
       |    len(t.toks) - ${SubW - 1})) AS i) g)""".stripMargin

  /** Per-document duplicated-substring audit: a window is DUPLICATED
    * iff its content occurs ≥2 times anywhere in the corpus
    * (including twice in one doc). Reports, per doc, the window
    * counts and the number of token positions covered by at least one
    * duplicated window — the fraction of the doc that is verbatim
    * boilerplate, the signal the ExactSubstr filter thresholds on.
    *
    * Scale: the only corpus-sized shuffle is the groupBy on the
    * 56-bit window hash (partial-aggregating); the duplicate tag
    * joins back on the same key. The coverage explode is SubW× the
    * DUPLICATED windows only, never the corpus. Work is linear in
    * total tokens — the suffix array's O(n log n) sort becomes a hash
    * shuffle.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val wins = windowHashes(spark, dir)
    wins.cache() // corpus-wide window stream feeds count + tag + coverage
    try {
      val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2).select(col("h"), lit(1L).as("is_dup"))
      val tagged = wins.join(dup, Seq("h"), "left")
      val perdoc = tagged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_windows"))
      val cov = tagged.where(col("is_dup") === 1L)
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (SubW - 1))).as("p"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_positions"))
      table(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(perdoc, Seq("doc_id"), "left")
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
          ppm(coalesce(col("n_dup_positions"), lit(0L)), col("n_tokens"))
            .as("dup_ppm"))
        .localCheckpoint(true)
    } finally wins.unpersist()
  }

  val dedupSubstringSql: String =
    s"""WITH $sqlWindowCtes,
       |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
       |pd AS (
       |  SELECT w.doc_id, COUNT(*) AS nw, COUNT(d.h) AS nd
       |  FROM w LEFT JOIN dup d USING (h) GROUP BY w.doc_id),
       |cov AS (
       |  SELECT DISTINCT dw.doc_id, dw.pos + o.k AS p
       |  FROM (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)) dw,
       |    LATERAL (SELECT unnest(generate_series(0, ${SubW - 1})) AS k) o),
       |cv AS (SELECT doc_id, COUNT(*) AS np FROM cov GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(pd.nw, 0) AS BIGINT) AS n_windows,
       |  CAST(COALESCE(pd.nd, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(COALESCE(cv.np, 0) AS BIGINT) AS n_dup_positions,
       |  ${sqlPpm("COALESCE(cv.np, 0)", "len(string_split(d.text, ' '))")}
       |    AS dup_ppm
       |FROM documents d
       |LEFT JOIN pd ON d.doc_id = pd.doc_id
       |LEFT JOIN cv ON d.doc_id = cv.doc_id""".stripMargin

  /** The REMOVAL half of ExactSubstr dedup: for each duplicated
    * window content, the first occurrence in (doc_id, pos) order is
    * canonical; every other occurrence marks its covered positions
    * for removal. Rolled up per source: docs touched, tokens, tokens
    * removed (union of removed spans — overlapping windows count each
    * position once), and the removal rate. Canonical selection is a
    * row_number over the hash partition — scale-safe (no packed-key
    * arithmetic, no bound on doc_id/pos) and expressible identically
    * in both engines.
    *
    * The first-occurrence keep rule is what makes removal SAFE: every
    * duplicated content survives somewhere, so corpus token coverage
    * (the set of distinct w-grams) is unchanged — only repeats go.
    */
  def dedupSubstringApply(spark: SparkSession, dir: String): DataFrame = {
    val wins = windowHashes(spark, dir)
    wins.cache() // feeds the rank window + the removal coverage
    try {
      val byH = Window.partitionBy(col("h"))
      val ranked = wins.select(col("doc_id"), col("pos"),
        count(lit(1)).over(byH).as("cnt"),
        row_number().over(byH.orderBy(col("doc_id"), col("pos"))).as("rn"))
      val removedPos = ranked
        .where(col("cnt") >= 2 && col("rn") > 1)
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (SubW - 1))).as("p"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_removed"))
      table(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .join(removedPos, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_removed").isNotNull, 1L).otherwise(0L))
            .as("n_docs_touched"),
          sum(col("n_toks")).as("n_tokens"),
          sum(coalesce(col("n_removed"), lit(0L))).as("n_tokens_removed"),
          ppm(sum(coalesce(col("n_removed"), lit(0L))), sum(col("n_toks")))
            .as("removed_ppm"))
        .localCheckpoint(true)
    } finally wins.unpersist()
  }

  val dedupSubstringApplySql: String =
    s"""WITH $sqlWindowCtes,
       |r AS (
       |  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS cnt,
       |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM w),
       |cov AS (
       |  SELECT DISTINCT rr.doc_id, rr.pos + o.k AS p
       |  FROM (SELECT doc_id, pos FROM r WHERE cnt >= 2 AND rn > 1) rr,
       |    LATERAL (SELECT unnest(generate_series(0, ${SubW - 1})) AS k) o),
       |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rm.n_removed IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_docs_touched,
       |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(SUM(COALESCE(rm.n_removed, 0)) AS BIGINT) AS n_tokens_removed,
       |  ${sqlPpm("SUM(COALESCE(rm.n_removed, 0))",
                   "SUM(len(string_split(d.text, ' ')))")} AS removed_ppm
       |FROM documents d LEFT JOIN rm ON d.doc_id = rm.doc_id
       |GROUP BY d.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_source_matrix" -> (dedupSourceMatrix _),
    "dedup_exact" -> (dedupExact _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_exact_norm" -> (dedupExactNorm _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_lsh_pairs" -> (dedupLshPairs _),
    "dedup_lsh_curve" -> (dedupLshCurve _),
    "dedup_minhash_eval" -> (dedupMinhashEval _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_pairs" -> (dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_setsim_join" -> (dedupSetsimJoin _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_crossmodal" -> (dedupCrossmodal _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_clusters_incremental" -> (dedupClustersIncremental _),
    "dedup_clusters_persisted" -> (dedupClustersPersisted _),
    "dedup_bloom_gate" -> (dedupBloomGate _),
    "dedup_apply" -> (dedupApply _),
    "dedup_clusters_star" -> (dedupClustersStar _),
    "dedup_editdist" -> (dedupEditdist _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_apply" -> (dedupSubstringApply _))

  val oracles: Map[String, String] = Map(
    "dedup_source_matrix" -> dedupSourceMatrixSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_exact_norm" -> dedupExactNormSql,
    "dedup_minhash_sig" -> dedupMinhashSigSql,
    "dedup_lsh_pairs" -> dedupLshPairsSql,
    "dedup_lsh_curve" -> dedupLshCurveSql,
    "dedup_minhash_eval" -> dedupMinhashEvalSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_simhash_pairs" -> dedupSimhashPairsSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_setsim_join" -> dedupSetsimJoinSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_crossmodal" -> dedupCrossmodalSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_clusters_incremental" -> dedupClustersIncrementalSql,
    // the persisted build ≡ dedup_clusters through the manifest sink:
    // the shared oracle re-proves the round-trip every run
    "dedup_clusters_persisted" -> dedupClustersPersistedSql,
    "dedup_bloom_gate" -> dedupBloomGateSql,
    "dedup_apply" -> dedupApplySql,
    // exact CC is exact CC: the star-contraction variant must produce
    // the SAME clustering, so it shares the recursive-CTE oracle
    "dedup_clusters_star" -> dedupClustersSql,
    "dedup_editdist" -> dedupEditdistSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_substring_apply" -> dedupSubstringApplySql)
}
