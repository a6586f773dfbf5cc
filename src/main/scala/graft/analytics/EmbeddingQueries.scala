package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{coefA, coefB, P}
import QueryUtil._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline, a
  * random-hyperplane LSH bucketed variant as the scale path, and a
  * label-blocked near-duplicate pair search.
  *
  * Determinism strategy: float components are quantized to integers
  * (`floor(x · 4096)`) before any arithmetic, so dot products and
  * norms are EXACT int64 sums — order-independent, engine-independent
  * — and the final cosine is one IEEE-exact divide+sqrt on identical
  * operands in both engines. Norms stay < 2^53 so the double cast is
  * lossless. Scores are emitted as ppm (floor(1e6·cos)).
  *
  * Scale notes: the query side is tiny and broadcast; brute force is
  * one pass over the corpus per query batch (the right baseline up to
  * ~10^7 vectors/executor); the LSH variant buckets the corpus once
  * (8 hyperplanes → 256 buckets) and probes only the query's bucket —
  * the shuffle moves (bucket, vec) instead of all-pairs.
  */
object EmbeddingQueries {

  val Scale = 4096
  val TopK = 10
  val Planes = 8

  /** Quantized vector + exact squared norm (`norm² = dot(q, q)` via
    * the native [[graft.functions.DotLong]] expression). Shared with
    * the cross-modal dedup verifier, which scores the same vectors.
    */
  private[analytics] def quantized(spark: SparkSession,
      dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .withColumn("norm2", graft.functions.DotLong(col("q"), col("q")))

  private val sqlQuantized: String =
    s"""q AS (SELECT vec_id, label,
       |  list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, qv,
       |  list_sum(list_transform(qv, x -> x * x)) AS norm2 FROM q)""".stripMargin

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[graft.functions.DotLong]] (one fused loop, no
    * intermediate array; bit-identical to the `aggregate`/`zip_with`
    * composition the oracle mirrors, since int addition is
    * associative).
    */
  private[analytics] def dot(a: Column, b: Column): Column =
    graft.functions.DotLong(a, b)

  /** ppm cosine from exact integer dot/norms — identical IEEE ops on
    * identical operands in both engines.
    */
  private def scorePpm(d: Column, na: Column, nb: Column): Column =
    floor((lit(1e6) * d.cast("double")) /
      sqrt((na * nb).cast("double"))).cast("long")

  private def sqlScorePpm(d: String, na: String, nb: String): String =
    s"CAST(floor((1e6 * CAST($d AS DOUBLE)) / sqrt(CAST($na * $nb AS DOUBLE))) AS BIGINT)"

  private val sqlDot =
    "list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i]))"

  // -------------------------------------- deterministic corpus sample
  /** The ONE hash order behind every deterministic corpus sample
    * (IVF seeds, trained-IVF seeds, PQ codebook): md5(vec_id) with
    * vec_id tiebreak. Centralized so the Spark and oracle sides can
    * never drift one site at a time.
    */
  private def hashOrder: Seq[Column] = Seq(
    graft.functions.CrossHash.md5Long(col("vec_id").cast("string")).asc,
    col("vec_id").asc)

  /** Bottom-k of the corpus by [[hashOrder]] — a uniform,
    * engine-reproducible sample that compiles to
    * TakeOrderedAndProject (O(k) state per partition, no shuffle of
    * vector payloads).
    */
  private def hashBottomK(e: DataFrame, k: Int): DataFrame =
    e.orderBy(hashOrder: _*).limit(k)

  /** Oracle twin: the corpus ranked by the same hash order. */
  private val sqlCranked: String =
    s"""cranked AS (
       |  SELECT vec_id, qv, norm2, row_number() OVER (
       |    ORDER BY ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(vec_id AS VARCHAR)")}, vec_id) AS hrnk
       |  FROM n)""".stripMargin

  /** Oracle twin of [[centK]]: the clamped ⌈√n⌉ nlist rule. */
  private def sqlCentK: String =
    s"GREATEST($CentKMin, LEAST($CentKMax, " +
      "CAST(ceil(sqrt((SELECT COUNT(*) FROM n))) AS BIGINT)))"

  // ------------------------------------------------- brute-force kNN
  /** The raw brute-force derivation behind [[knnBruteForce]]: one
    * corpus scan against the broadcast query block, per-query window
    * rank. Shared by the gated build (publish every run) and the
    * artifact slot (build lazily on a cold session).
    */
  private[analytics] def bruteForceFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir)
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"))
    val scored = broadcast(qs).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  /** Top-10 cosine neighbors for each query vector (vec_id < 10) by
    * full corpus scan — AND the eval family's GROUND-TRUTH BUILD JOB:
    * the exact top-k is the one table every tuning curve
    * ([[knnNprobeCurve]], [[knnRerankCurve]], [[knnDimCurve]]) grades
    * against, so it is published once per sweep through the
    * [[SessionArtifact]] manifest seam (rebuild = recompute +
    * republish + read back, so this query's benched cost is the
    * honest build and its oracle re-proves the sink round-trip) and
    * READ by every consumer instead of re-derived per query. The
    * consumers keep their full-recompute DuckDB oracles, so a wrong
    * published truth diverges every rider's hash.
    */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.rebuild(spark, dir, "knn_brute_topk")(
      bruteForceFrame(spark, dir))

  /** The published in-corpus exact top-k `(query_id, vec_id,
    * score_ppm, rnk)` — artifact-read for riders, built lazily on a
    * cold session.
    */
  private def bruteTopk(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "knn_brute_topk")(
      bruteForceFrame(spark, dir))

  val knnBruteForceSql: String =
    s"""WITH $sqlQuantized,
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id,
       |    ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS score_ppm
       |  FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin

  // ------------------------------------------------- LSH bucketed kNN
  /** Random-hyperplane LSH: 8 pseudo-random ±1 hyperplanes (signs from
    * the shared CrossHash affine family, so the oracle derives the
    * same planes), vector → 8-bit bucket; neighbors searched only
    * within the query's bucket, then exact-cosine ranked. Recall is
    * bucket-limited by design — this is the n >> 10^7 scale path where
    * brute force stops being an option.
    */
  /** Hyperplane bucket of the quantized vector column `q`:
    * sign(p, j) for 1-based dim j is ±1 from affine-hash parity; the
    * p-th bit is set when the signed projection is non-negative.
    * Shared by both LSH variants (and mirrored by [[sqlBucketed]]).
    */
  private[graft] def bucketColForProbe: Column = bucketCol
  private def bucketCol: Column = {
    def sign(p: Int, i: Column): Column =
      ((lit(coefA(p)) * (i + 1) + lit(coefB(p))) % P % 2) * 2 - 1
    (0 until Planes).map { p =>
      val s = aggregate(
        transform(col("q"), (x, i) => x * sign(p, i)),
        lit(0L), (acc, x) => acc + x)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Shared oracle CTE chain: quantized vectors → per-plane signed
    * projections → `bucketed(vec_id, qv, norm2, bucket)`. The sign
    * formula is built from [[graft.functions.CrossHash.sqlCoefA]]/
    * [[graft.functions.CrossHash.sqlCoefB]] so the coefficients can
    * never drift from the Scala side.
    */
  private val sqlBucketed: String = {
    val sgn = s"((${graft.functions.CrossHash.sqlCoefA("p.p")} * d.d + " +
      s"${graft.functions.CrossHash.sqlCoefB("p.p")}) % $P % 2) * 2 - 1"
    s"""$sqlQuantized,
       |planesum AS (
       |  SELECT vec_id, p.p, SUM(qv[d.d] * ($sgn)) AS s
       |  FROM n,
       |    LATERAL (SELECT unnest(generate_series(0, ${Planes - 1})) AS p) p,
       |    LATERAL (SELECT unnest(generate_series(1, 64)) AS d) d
       |  GROUP BY 1, 2),
       |bucketed AS (
       |  SELECT n.vec_id, n.label, n.qv, n.norm2, b.bucket
       |  FROM n JOIN (
       |    SELECT vec_id,
       |      CAST(SUM(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
       |    FROM planesum GROUP BY 1) b ON n.vec_id = b.vec_id)""".stripMargin
  }

  def knnLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).withColumn("bucket", bucketCol)
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"), col("bucket"))
    val scored = broadcast(qs).join(e,
        Seq("bucket")).where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  val knnLshBucketedSql: String = {
    s"""WITH $sqlBucketed,
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id, a.bucket,
       |    ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS score_ppm
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < 10 AND a.vec_id <> b.vec_id)
       |SELECT query_id, vec_id, bucket, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, bucket, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  /** Multi-probe LSH kNN: the query probes its own bucket AND every
    * Hamming-1 neighbor bucket (flip each of the 8 plane bits) — the
    * standard recall fix for hyperplane LSH without adding tables.
    * Probe fan-out is Planes+1 rows per QUERY only (the corpus stays
    * single-bucketed), so the shuffle grows with queries, not corpus —
    * exactly the asymmetry you want at 10^9 vectors.
    */
  def knnLshMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).withColumn("bucket", bucketCol)
    val probes = array(lit(0L) +: (0 until Planes).map(p => lit(1L << p)): _*)
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    val scored = broadcast(qs).join(e, Seq("bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
      .distinct() // a candidate can land in several probed buckets
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  val knnLshMultiprobeSql: String = {
    s"""WITH $sqlBucketed,
       |probes AS (
       |  SELECT vec_id AS query_id, qv, norm2,
       |    xor(bucket, m.m) AS bucket
       |  FROM bucketed,
       |    LATERAL (SELECT unnest([${(0L +: (0 until Planes)
             .map(p => 1L << p)).mkString(", ")}]) AS m) m
       |  WHERE vec_id < 10),
       |scored AS (
       |  SELECT DISTINCT a.query_id, b.vec_id,
       |    ${sqlScorePpm(
             "list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i]))",
             "a.norm2", "b.norm2")} AS score_ppm
       |  FROM probes a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.query_id <> b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  // ----------------------------------------------------- IVF kNN
  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * centroids, search only the query's nearest `NProbe` cells.
    *
    * Centroids are a BOUNDED deterministic sample of the corpus: the
    * k vectors with the smallest `md5Long(vec_id)` (vec_id tiebreak),
    * with k = ⌈√n⌉ clamped to [[CentKMin]]..[[CentKMax]] — the
    * standard IVF sizing rule (nlist ≈ √n balances cell count against
    * cell size). A hash-ordered bottom-k is a uniform sample and is
    * engine-reproducible (no k-means float iteration between us and
    * the oracle). Unlike an arithmetic filter such as `vec_id % m`
    * (whose output GROWS with the corpus), k is capped, so the n×k
    * assignment pass is O(n·√n) worst case with a broadcast bounded
    * at `CentKMax` rows (~2 MB) at any corpus size. The *search*
    * dataflow is identical to a trained IVF: assignment (the real IVF
    * build cost), a cell-keyed corpus layout, and a probe that
    * touches `NProbe` cells, so the probe-side join reads ~NProbe/k
    * of the data. The bottom-k itself compiles to
    * TakeOrderedAndProject: O(k) state per partition, no shuffle of
    * vector payloads.
    */
  val NProbe = 4
  val CentKMin = 4
  val CentKMax = 4096
  /** nlist = clamp(⌈√n⌉): both engines evaluate ceil∘sqrt on the same
    * integer with correctly-rounded IEEE ops, so they agree exactly.
    */
  private def centK(n: Long): Int =
    math.max(CentKMin,
      math.min(CentKMax, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
  /** Per-vector argmax cell as a partial-aggregating `max_by` instead
    * of a `row_number` window. The assignment frame is built by a
    * broadcast join, so all k candidate rows of a vector sit in ONE
    * input partition: map-side combine collapses them to a single row
    * before the exchange, and the shuffle moves |corpus| rows — not
    * |corpus|·k through a sort, which at k = [[CentKMax]] = 4096 is a
    * 4096× amplification the window plan would pay. Tie-break matches
    * the windows' `ORDER BY cscore DESC, cell ASC`: max of the
    * ordering struct `(cscore, -cell)` is unique per vector because
    * cell ids are distinct. Output: `(vec_id, cell, payload…)`.
    */
  private def argmaxCell(assign: DataFrame, cellCol: String,
      payload: Seq[String] = Seq("q", "norm2")): DataFrame =
    assign.groupBy(col("vec_id"))
      .agg(max_by(
        struct((col(cellCol).as("cell") +: payload.map(col)): _*),
        struct(col("cscore"), (-col(cellCol)).as("tie"))).as("top"))
      .select(col("vec_id") +:
        ("cell" +: payload).map(n => col(s"top.$n").as(n)): _*)
  /** The IVF coarse stage shared by [[knnIvf]] and [[knnIvfPq]]:
    * bottom-k hash-sampled centroids, n×k assignment (centroid table
    * tiny and broadcast), argmax cell per vector. Returns
    * `cells(vec_id, cell, q, norm2)` and the query-side
    * `qprobe(query_id, qq, qnorm2, cell)` probing [[NProbe]] cells.
    * One implementation (and one [[sqlIvfCtes]] oracle text) so the
    * two pipelines can never drift one site at a time.
    */
  private def ivfCoarse(e: DataFrame,
      maxProbe: Int = NProbe): (DataFrame, DataFrame) = {
    val (_, cells, qprobe) = ivfCoarseFull(e, maxProbe)
    (cells, qprobe)
  }

  /** [[ivfCoarse]] plus the centroid frame itself — the residual
    * encoder needs the centroid VECTORS, not just the assignment.
    * Returns `(cents(centroid_id, cq, cnorm2), cells, qprobe)`.
    */
  private def ivfCoarseFull(e: DataFrame,
      maxProbe: Int = NProbe): (DataFrame, DataFrame, DataFrame) = {
    val cents = hashBottomK(e, centK(e.count()))
      .select(col("vec_id").as("centroid_id"), col("q").as("cq"),
        col("norm2").as("cnorm2"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("norm2"), col("centroid_id"),
        scorePpm(dot(col("q"), col("cq")), col("norm2"), col("cnorm2"))
          .as("cscore"))
    val cells = argmaxCell(assigned, "centroid_id")
    // query-side probe: filter to the 10 query vectors BEFORE scoring,
    // so the probe window runs over 10·k rows, never the corpus.
    // cell_rank (1 = closest probed cell) rides along so the nprobe
    // tuning curve can grade candidates by probe depth; the plain
    // searches ignore it
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("centroid_id").asc)
    val qprobe = e.where(col("vec_id") < 10).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("norm2"), col("centroid_id"),
        scorePpm(dot(col("q"), col("cq")), col("norm2"), col("cnorm2"))
          .as("cscore"))
      .withColumn("crnk", row_number().over(wProbe))
      .where(col("crnk") <= maxProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"), col("centroid_id").as("cell"),
        col("crnk").as("cell_rank"))
    (cents, cells, qprobe)
  }

  /** Oracle twin of [[ivfCoarse]]: `cents` → `assigned` → `ranked` →
    * `cells(vec_id, cell, qv, norm2)` + `qprobe(query_id, qq, qn,
    * cell)`.
    */
  private def sqlIvfCtes(maxProbe: Int = NProbe): String = {
    val cdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.cq[i]))"
    s"""cents AS (
       |  SELECT vec_id AS centroid_id, qv AS cq, norm2 AS cnorm2
       |  FROM cranked WHERE hrnk <= $sqlCentK),
       |assigned AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
       |    ${sqlScorePpm(cdot, "v.norm2", "c.cnorm2")} AS cscore
       |  FROM n v, cents c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC, centroid_id ASC) AS crnk
       |  FROM assigned),
       |cells AS (
       |  SELECT vec_id, centroid_id AS cell, qv, norm2
       |  FROM ranked WHERE crnk = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, qv AS qq, norm2 AS qn,
       |    centroid_id AS cell, crnk AS cell_rank
       |  FROM ranked WHERE vec_id < 10 AND crnk <= $maxProbe)""".stripMargin
  }

  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    // count + bottom-k + assignment + probe all read the quantized
    // table: cache it (callers clearCache per materialization — the
    // object-doc contract; at cluster scale, write the signature table
    // once instead)
    val e = quantized(spark, dir).cache()
    val (cells, qprobe) = ivfCoarse(e)
    val scored = broadcast(qprobe).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  val knnIvfSql: String = {
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * b.qv[i]))"
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |${sqlIvfCtes()},
       |scored AS (
       |  SELECT p.query_id, b.vec_id,
       |    ${sqlScorePpm(pdot, "p.qn", "b.norm2")} AS score_ppm
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  // ---------------------------------------------- trained-IVF kNN
  /** IVF with a TRAINED coarse quantizer: one Lloyd (k-means)
    * refinement round on top of [[knnIvf]]'s hash-sampled seeds —
    * the step a real IVF build performs so cells sit at data-density
    * centroids instead of on sample points.
    *
    * Determinism is the whole trick: the refinement runs in EXACT
    * integer arithmetic. Assignment maximizes the same ppm cosine as
    * the search; the updated centroid is the component-wise
    * `floor(Σq_d / count)` of its members — sums and counts are exact
    * int64, the one division is IEEE-exact on identical operands — so
    * both engines train the IDENTICAL quantizer and the oracle can
    * hash-check the full pipeline (a float k-means would diverge by
    * ulps and be uncheckable). Dataflow per round: one O(n·k)
    * assignment against a ≤[[CentKMax]]-row broadcast, one groupBy
    * producing 64 per-dimension sums (partial-aggregatable, no
    * explode), and the same probe as [[knnIvf]] — adding rounds
    * repeats the same two shuffles, nothing grows with n.
    */
  /** The trained coarse quantizer over any quantized corpus frame:
    * hash-sampled seeds + one exact-integer Lloyd round (see
    * [[knnIvfTrained]] for why the arithmetic is exact). Output:
    * `(cell, tq, tnorm2)`, ≤[[CentKMax]] rows. Shared by the
    * in-corpus search and the held-out variant, which trains on the
    * query-free corpus only.
    */
  private def trainIvf(corpus: DataFrame): DataFrame = {
    val seeds = hashBottomK(corpus, centK(corpus.count()))
      .select(col("vec_id").as("centroid_id"), col("q").as("cq"),
        col("norm2").as("cnorm2"))
    val assign0 = corpus.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("q"), col("norm2"), col("centroid_id"),
        scorePpm(dot(col("q"), col("cq")), col("norm2"), col("cnorm2"))
          .as("cscore"))
    val cell0 = argmaxCell(assign0, "centroid_id")
    // Lloyd update: integer mean per dimension over each cell's members
    val dimSums = (0 until 64).map(d => sum(col("q")(d)).as(s"d_$d"))
    cell0.groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), dimSums: _*)
      .select(col("cell"), array((0 until 64).map(d =>
        floor(col(s"d_$d").cast("double") / col("cnt")).cast("long")): _*)
        .as("tq"))
      .withColumn("tnorm2", graft.functions.DotLong(col("tq"), col("tq")))
      .where(col("tnorm2") > 0) // a zero centroid has no direction
  }

  def knnIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    // five consumers of the quantized table (count, seeds, both
    // assignment passes, probe) — cache it; see knnIvf
    val e = quantized(spark, dir).cache()
    val trained = trainIvf(e).cache() // corpus assignment + query probe
    // re-assignment + probe against the trained quantizer
    val assign1 = e.crossJoin(broadcast(trained))
      .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
    val cells = argmaxCell(assign1, "cell")
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val qprobe = e.where(col("vec_id") < 10).crossJoin(broadcast(trained))
      .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
      .withColumn("crnk", row_number().over(wProbe))
      .where(col("crnk") <= NProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"), col("cell"))
    val scored = broadcast(qprobe).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  /** Shared oracle CTE chain for the trained quantizer: quantize →
    * hash-rank → seeds → assign → Lloyd update → re-assign, ending at
    * `ranked` (every vector × trained centroid, crnk) and `cells`
    * (each vector's home cell) — the twin of [[trainIvf]] + the
    * re-assignment pass. Used by the trained-IVF searches and the
    * semantic-dedup query so the trained quantizer can never drift
    * between oracles one site at a time.
    */
  private val sqlTrainedCells: String = {
    val sdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.cq[i]))"
    val tdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.tq[i]))"
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val meanList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / cnt) AS BIGINT)").mkString(", ")
    s"""$sqlQuantized,
       |$sqlCranked,
       |seeds AS (
       |  SELECT vec_id AS centroid_id, qv AS cq, norm2 AS cnorm2
       |  FROM cranked WHERE hrnk <= $sqlCentK),
       |assign0 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
       |    ${sqlScorePpm(sdot, "v.norm2", "c.cnorm2")} AS cscore
       |  FROM n v, seeds c),
       |cell0 AS (
       |  SELECT vec_id, qv, norm2, centroid_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, centroid_id ASC) AS crnk
       |    FROM assign0) WHERE crnk = 1),
       |sums AS (
       |  SELECT cell, COUNT(*) AS cnt, $dimSums
       |  FROM cell0 GROUP BY cell),
       |trained0 AS (
       |  SELECT cell, [$meanList] AS tq FROM sums),
       |trained AS (
       |  SELECT cell, tq,
       |    list_sum(list_transform(tq, x -> x * x)) AS tnorm2
       |  FROM trained0
       |  WHERE list_sum(list_transform(tq, x -> x * x)) > 0),
       |assign1 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.cell,
       |    ${sqlScorePpm(tdot, "v.norm2", "c.tnorm2")} AS cscore
       |  FROM n v, trained c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC, cell ASC) AS crnk
       |  FROM assign1),
       |cells AS (
       |  SELECT vec_id, cell, qv, norm2 FROM ranked WHERE crnk = 1)""".stripMargin
  }

  val knnIvfTrainedSql: String = {
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * b.qv[i]))"
    s"""WITH $sqlTrainedCells,
       |qprobe AS (
       |  SELECT vec_id AS query_id, qv AS qq, norm2 AS qn, cell
       |  FROM ranked WHERE vec_id < 10 AND crnk <= $NProbe),
       |scored AS (
       |  SELECT p.query_id, b.vec_id,
       |    ${sqlScorePpm(pdot, "p.qn", "b.norm2")} AS score_ppm
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  // --------------------------------------------------- PQ (ADC) kNN
  /** Product-quantization ANN with asymmetric distance computation —
    * the third classic ANN family beside hyperplane LSH and IVF (the
    * FAISS `IndexPQ` core). The 64-dim space splits into [[PqSub]]
    * subspaces of [[PqSubDim]] dims; each subspace gets a
    * [[PqCodeK]]-entry codebook (subvectors of a deterministic
    * bottom-k hash sample, so both engines hold the identical
    * codebook); a corpus vector compresses to [[PqSub]] 4-bit codes —
    * 4 bytes instead of 256, the memory ratio that lets 10^10 vectors
    * sit in RAM. Search is ADC: the query builds a
    * [[PqSub]]×[[PqCodeK]] dot-product lookup table against the
    * UNCOMPRESSED codebook, scores every code tuple by summing 8
    * table entries, takes the top-[[PqRerank]] candidates, and
    * re-ranks them with exact cosine.
    *
    * Everything is exact integer arithmetic: encode = argmin of
    * `c·c − 2v·c` per subspace (the shared `v·v` term cannot change
    * the argmin), with the (distance, code) pair packed into one
    * int64 so a plain MIN is the deterministic tie-broken argmin in
    * both engines. Scale shape: encoding is O(n·k) against a 16-row
    * broadcast; ADC scoring shuffles (query, vec) partial sums — at
    * production scale PQ composes with IVF (probe cells first, ADC
    * within), which is exactly the [[knnIvf]] dataflow upstream.
    */
  val PqSub = 8
  val PqSubDim = 8
  val PqCodeK = 16
  val PqRerank = 50
  private val PqOffset = 1000000000L // makes the packed distance key positive

  /** Integer dot product restricted to subspace `s`. */
  private def subDot(a: Column, b: Column, s: Int): Column =
    graft.functions.DotLong(slice(a, s * PqSubDim + 1, PqSubDim),
      slice(b, s * PqSubDim + 1, PqSubDim))

  /** Deterministic 16-vector codebook sample, ranked for stable codes
    * (the row_number window runs over 16 rows, never the corpus).
    */
  private def pqSeeds(e: DataFrame): DataFrame =
    hashBottomK(e, PqCodeK)
      .withColumn("cid", row_number().over(Window.orderBy(hashOrder: _*)))
      .select(col("cid"), col("q").as("cq"))

  /** PQ encode: per (vector, subspace) the argmin code via packed MIN.
    * Output: one row per (vec_id, s) with its 4-bit code `cid`.
    *
    * The ×8 exploded output is DELIBERATE — it was re-measured in
    * round 7 against two "obvious" improvements and beat both at
    * sf0.1 (min-of-3, quiet host): packed 8-element code arrays +
    * a broadcast LUT array column ran 1.75 s vs 1.54 s (the array
    * join is a non-codegen BroadcastNestedLoopJoin paying a ~1 KiB
    * array copy per candidate row, and the `aggregate` HOF fold is
    * interpreted — higher-order functions sit outside whole-stage
    * codegen), and fully UNROLLED literal-LUT lookups ran 2.50 s
    * (10 queries × 8 `element_at` per row blows the generated method
    * past JIT limits). Narrow exploded rows through a codegen'd
    * BroadcastHashJoin + partial aggregation are the shape Tungsten
    * is built to chew; keep them.
    */
  /** The packed-MIN encode keys shared by [[pqCodes]] and the
    * distortion report: per subspace, `(|cb|² − 2v·cb + offset)·K +
    * (cid−1)` — one MIN is the tie-broken argmin AND carries the
    * minimal distance in its high bits.
    */
  private def pqKeyCols: Seq[Column] = (0 until PqSub).map { s =>
    ((subDot(col("cq"), col("cq"), s) -
      lit(2L) * subDot(col("q"), col("cq"), s)
      + lit(PqOffset)) * PqCodeK + (col("cid") - 1)).as(s"k_$s")
  }

  /** Per-vector packed mins `(vec_id, m_0 … m_7)` over the codebook. */
  private def pqMins(e: DataFrame, seeds: DataFrame): DataFrame =
    e.crossJoin(broadcast(seeds))
      .select(col("vec_id") +: pqKeyCols: _*)
      .groupBy(col("vec_id"))
      .agg(min(col("k_0")).as("m_0"),
        (1 until PqSub).map(s => min(col(s"k_$s")).as(s"m_$s")): _*)

  private def pqCodes(e: DataFrame, seeds: DataFrame): DataFrame =
    pqMins(e, seeds)
      .select(col("vec_id"),
        posexplode(array((0 until PqSub).map(s =>
          col(s"m_$s") % PqCodeK + 1): _*)).as(Seq("s", "cid")))

  /** ADC lookup table: per (query, subspace, code) the exact dot of
    * the query's subvector with the code's UNCOMPRESSED centroid.
    * `queries` must carry (query_id, qq).
    */
  private def pqLut(queries: DataFrame, seeds: DataFrame): DataFrame =
    queries.crossJoin(broadcast(seeds))
      .select(col("query_id"), col("cid"),
        posexplode(array((0 until PqSub).map(s =>
          subDot(col("qq"), col("cq"), s)): _*)).as(Seq("s", "qd")))

  /** Top-[[TopK]] per query by exact cosine over a candidate set. */
  private def exactRerank(e: DataFrame, cands: DataFrame): DataFrame =
    exactRerankWith(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2")), e, cands)

  /** Same exact-cosine tail against an explicit query frame
    * `(query_id, qq, qnorm2)` — the held-out searches pass queries
    * that are NOT drawn from the candidate corpus.
    */
  private def exactRerankWith(qs: DataFrame, e: DataFrame,
      cands: DataFrame): DataFrame = {
    val scored = cands
      .join(broadcast(qs), "query_id")
      .join(e, "vec_id")
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  def knnPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // encode + LUT + re-rank reads
    val seeds = pqSeeds(e)
    val codes = pqCodes(e, seeds)
    val lut = pqLut(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq")), seeds)
    val approx = codes.join(broadcast(lut), Seq("s", "cid"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("approx_dot"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val cands = approx.withColumn("crnk", row_number().over(wCand))
      .where(col("crnk") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerank(e, cands)
  }

  /** Shared oracle CTE text for the PQ machinery: `pqseeds` (ranked
    * codebook sample off `cranked`), `keys`/`mins`/`codes` (packed-MIN
    * encode) and `lut` (query-side ADC table). Reused verbatim by
    * [[knnPqAdcSql]] and [[knnIvfPqSql]] so the two pipelines can
    * never drift one site at a time.
    */
  private def sqlSubDot(a: String, b: String, s: Int): String =
    s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
      s"i -> $a[${s * PqSubDim} + i] * $b[${s * PqSubDim} + i]))"

  private lazy val sqlPqCtes: String = {
    val keyCols = (0 until PqSub).map { s =>
      s"((${sqlSubDot("c.cq", "c.cq", s)} - 2 * ${sqlSubDot("v.qv", "c.cq", s)}" +
        s" + $PqOffset) * $PqCodeK + (c.cid - 1)) AS k_$s"
    }.mkString(",\n    ")
    val mins = (0 until PqSub).map(s => s"MIN(k_$s) AS m_$s").mkString(", ")
    val codeCase = (0 until PqSub).map(s =>
      s"WHEN ${s} THEN m_$s % $PqCodeK + 1").mkString(" ")
    val qdCase = (0 until PqSub).map(s =>
      s"WHEN ${s} THEN ${sqlSubDot("q.qq", "c.cq", s)}").mkString(" ")
    s"""pqseeds AS (
       |  SELECT hrnk AS cid, qv AS cq FROM cranked
       |  WHERE hrnk <= $PqCodeK),
       |keys AS (
       |  SELECT v.vec_id, c.cid,
       |    $keyCols
       |  FROM n v, pqseeds c),
       |mins AS (SELECT vec_id, $mins FROM keys GROUP BY vec_id),
       |codes AS (
       |  SELECT vec_id, sp.s,
       |    CASE sp.s $codeCase END AS cid
       |  FROM mins, LATERAL (SELECT unnest(generate_series(0, ${PqSub - 1}))
       |    AS s) sp),
       |lut AS (
       |  SELECT q.vec_id AS query_id, c.cid, sp.s,
       |    CASE sp.s $qdCase END AS qd
       |  FROM (SELECT vec_id, qv AS qq FROM n WHERE vec_id < 10) q,
       |    pqseeds c,
       |    LATERAL (SELECT unnest(generate_series(0, ${PqSub - 1})) AS s) sp)""".stripMargin
  }

  /** Shared oracle tail: exact re-rank of `cands(query_id, vec_id)`. */
  private lazy val sqlExactRerank: String = {
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> a.qq[i] * b.qv[i]))"
    s"""scored AS (
       |  SELECT t.query_id, t.vec_id,
       |    ${sqlScorePpm(pdot, "a.norm2", "b.norm2")} AS score_ppm
       |  FROM cands t
       |  JOIN (SELECT vec_id, qv AS qq, norm2 FROM n) a
       |    ON t.query_id = a.vec_id
       |  JOIN n b ON t.vec_id = b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  val knnPqAdcSql: String =
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |$sqlPqCtes,
       |approx AS (
       |  SELECT l.query_id, c.vec_id, CAST(SUM(l.qd) AS BIGINT) AS approx_dot
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
       |  WHERE l.query_id <> c.vec_id
       |  GROUP BY 1, 2),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY approx_dot DESC, vec_id ASC) AS crnk
       |    FROM approx) WHERE crnk <= $PqRerank),
       |$sqlExactRerank""".stripMargin

  // --------------------------------------------------- IVF-PQ kNN
  /** The production composition — FAISS `IndexIVFPQ`: the IVF cell
    * layout prunes WHICH vectors are scored (probe `NProbe` of k
    * cells ⇒ ~NProbe/k of the corpus), and PQ codes shrink WHAT is
    * scored (8 table lookups per candidate instead of a 64-dim dot),
    * with exact-cosine re-rank of the survivors. Both stages are the
    * already-verified [[knnIvf]] and [[knnPqAdc]] dataflows; this
    * query chains them so the candidate generation never touches the
    * full corpus and the scoring never touches full vectors — the
    * shape that serves 10^10-vector search.
    */
  def knnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val (cells, qprobe) = ivfCoarse(e)
    val cand = broadcast(qprobe.select(col("query_id"), col("cell")))
      .join(cells.select(col("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val seeds = pqSeeds(e)
    val codes = pqCodes(e, seeds)
    val lut = pqLut(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq")), seeds)
    val approx = cand.join(codes, "vec_id")
      .join(broadcast(lut), Seq("query_id", "s", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("approx_dot"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val cands = approx.withColumn("crnk2", row_number().over(wCand))
      .where(col("crnk2") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerank(e, cands)
  }

  val knnIvfPqSql: String = {
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |${sqlIvfCtes()},
       |cand AS (
       |  SELECT p.query_id, b.vec_id
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id),
       |$sqlPqCtes,
       |approx AS (
       |  SELECT cd.query_id, cd.vec_id, CAST(SUM(l.qd) AS BIGINT) AS approx_dot
       |  FROM cand cd
       |  JOIN codes c ON c.vec_id = cd.vec_id
       |  JOIN lut l ON l.query_id = cd.query_id AND l.s = c.s AND l.cid = c.cid
       |  GROUP BY 1, 2),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY approx_dot DESC, vec_id ASC) AS crnk2
       |    FROM approx) WHERE crnk2 <= $PqRerank),
       |$sqlExactRerank""".stripMargin
  }

  // --------------------------------------------- residual IVF-PQ
  /** IVF-PQ with RESIDUAL encoding — the actual FAISS `IVFADC`
    * dataflow (Jégou et al., TPAMI 2011): each vector's PQ code
    * compresses `v − centroid(cell(v))`, not `v` itself, and search
    * scores a candidate as `q·centroid + Σₛ LUT[s, codeₛ]`. Centering
    * each cell's population first removes the cell mean from what the
    * 4-bit codes must express, so the shared codebook spends its
    * whole budget on within-cell offsets — the reason every
    * production IVFPQ index encodes residuals while [[knnIvfPq]]
    * (kept as the ablation twin) codes raw vectors. Same output shape
    * and re-rank tail as the other families, so recall is directly
    * comparable — and [[knnPqDistortion]] measures the raw-vs-residual
    * reconstruction error on THIS corpus (where weak clustering makes
    * raw coding win; see its scaladoc), so the choice is data-driven.
    *
    * Exactness: residuals are int64 component differences, the
    * codebook is the residuals of the same bottom-[[PqCodeK]] hash
    * sample every PQ family seeds from, encode/LUT/score reuse the
    * packed-MIN argmin and integer dots of [[pqCodes]]/[[pqLut]]
    * verbatim — the whole pipeline hash-checks. Scale shape: one
    * extra broadcast join against the ≤[[CentKMax]]-row centroid
    * frame to form residuals and one to add `q·centroid` per probed
    * cell (10×[[NProbe]] rows); everything else is exactly the
    * [[knnIvfPq]] plan — candidates only from probed cells, ADC over
    * 8 narrow lookup rows per candidate, broadcast-only joins.
    */
  /** Residual-PQ codebook: residuals of the [[PqCodeK]] vectors ranked
    * JUST PAST the centroid sample. The bottom-[[centK]] hash ranks
    * ARE the coarse centroids, and a centroid is its own cell's
    * argmax, so its residual is identically zero — sampling those
    * ranks would hand the codebook 16 zero rows and make residual
    * coding vacuous (caught by [[knnPqDistortion]]: the residual
    * error collapsed to the centroid-only error exactly).
    */
  private def residSeeds(resid: DataFrame, k: Int): DataFrame =
    resid.orderBy(hashOrder: _*).limit(k + PqCodeK)
      .withColumn("hr", row_number().over(Window.orderBy(hashOrder: _*)))
      .where(col("hr") > k)
      .select((col("hr") - k).as("cid"), col("q").as("cq"))

  def knnIvfResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val (cents, cells, qprobe) = ivfCoarseFull(e)
    val resid = cells.join(broadcast(cents),
        col("cell") === col("centroid_id"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))
    val rseeds = residSeeds(resid, centK(e.count()))
    val codes = pqCodes(resid.select(col("vec_id"), col("q")), rseeds)
    val lut = pqLut(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq")), rseeds)
    // q·centroid per probed (query, cell): 10×NProbe metadata rows
    val qc = qprobe.join(broadcast(cents), col("cell") === col("centroid_id"))
      .select(col("query_id"), col("cell"),
        dot(col("qq"), col("cq")).as("qcdot"))
    val cand = broadcast(qprobe.select(col("query_id"), col("cell")))
      .join(cells.select(col("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cell"))
    val approx = cand.join(codes, "vec_id")
      .join(broadcast(lut), Seq("query_id", "s", "cid"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(sum(col("qd")).as("rdot"))
      .join(broadcast(qc), Seq("query_id", "cell"))
      .withColumn("approx_dot", col("rdot") + col("qcdot"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val cands = approx.withColumn("crnk2", row_number().over(wCand))
      .where(col("crnk2") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerank(e, cands)
  }

  /** Shared oracle CTE text for the RESIDUAL PQ machinery: `resid`
    * (per-vector residual vs its home centroid), `rseeds` (residuals
    * of the same bottom-k hash sample every codebook seeds from),
    * `rkeys`/`rmins`/`rcodes` (packed-MIN encode over residuals) and
    * `rlut` (query-side ADC table). Reused verbatim by
    * [[knnIvfResidualSql]] and [[knnPqDistortionSql]].
    */
  private lazy val sqlResidCtes: String = {
    val rKeyCols = (0 until PqSub).map { s =>
      s"((${sqlSubDot("c.cq", "c.cq", s)} - 2 * ${sqlSubDot("v.rv", "c.cq", s)}" +
        s" + $PqOffset) * $PqCodeK + (c.cid - 1)) AS k_$s"
    }.mkString(",\n    ")
    val rMins = (0 until PqSub).map(s => s"MIN(k_$s) AS m_$s").mkString(", ")
    val rCodeCase = (0 until PqSub).map(s =>
      s"WHEN ${s} THEN m_$s % $PqCodeK + 1").mkString(" ")
    val rQdCase = (0 until PqSub).map(s =>
      s"WHEN ${s} THEN ${sqlSubDot("q.qq", "c.cq", s)}").mkString(" ")
    s"""resid AS (
       |  SELECT l.vec_id, l.cell,
       |    list_transform(generate_series(1, 64), i -> l.qv[i] - c.cq[i])
       |      AS rv
       |  FROM cells l JOIN cents c ON l.cell = c.centroid_id),
       |rseeds AS (
       |  SELECT k.hrnk - ($sqlCentK) AS cid, r.rv AS cq
       |  FROM resid r JOIN cranked k ON r.vec_id = k.vec_id
       |  WHERE k.hrnk > ($sqlCentK)
       |    AND k.hrnk <= ($sqlCentK) + $PqCodeK),
       |rkeys AS (
       |  SELECT v.vec_id, c.cid,
       |    $rKeyCols
       |  FROM resid v, rseeds c),
       |rmins AS (SELECT vec_id, $rMins FROM rkeys GROUP BY vec_id),
       |rcodes AS (
       |  SELECT vec_id, sp.s,
       |    CASE sp.s $rCodeCase END AS cid
       |  FROM rmins, LATERAL (SELECT unnest(generate_series(0, ${PqSub - 1}))
       |    AS s) sp),
       |rlut AS (
       |  SELECT q.vec_id AS query_id, c.cid, sp.s,
       |    CASE sp.s $rQdCase END AS qd
       |  FROM (SELECT vec_id, qv AS qq FROM n WHERE vec_id < 10) q,
       |    rseeds c,
       |    LATERAL (SELECT unnest(generate_series(0, ${PqSub - 1})) AS s) sp)"""
      .stripMargin
  }

  val knnIvfResidualSql: String = {
    val qcdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * c.cq[i]))"
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |${sqlIvfCtes()},
       |$sqlResidCtes,
       |qc AS (
       |  SELECT p.query_id, p.cell, $qcdot AS qcdot
       |  FROM qprobe p JOIN cents c ON p.cell = c.centroid_id),
       |cand AS (
       |  SELECT p.query_id, b.vec_id, b.cell
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id),
       |approx AS (
       |  SELECT cd.query_id, cd.vec_id, cd.cell,
       |    CAST(SUM(l.qd) AS BIGINT) AS rdot
       |  FROM cand cd
       |  JOIN rcodes c ON c.vec_id = cd.vec_id
       |  JOIN rlut l ON l.query_id = cd.query_id AND l.s = c.s
       |    AND l.cid = c.cid
       |  GROUP BY 1, 2, 3),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT a.query_id, a.vec_id, row_number() OVER (
       |      PARTITION BY a.query_id
       |      ORDER BY a.rdot + q.qcdot DESC, a.vec_id ASC) AS crnk2
       |    FROM approx a JOIN qc q
       |      ON a.query_id = q.query_id AND a.cell = q.cell)
       |  WHERE crnk2 <= $PqRerank),
       |$sqlExactRerank""".stripMargin
  }

  // ---------------------------------------------- PQ distortion
  /** Reconstruction-distortion report — the index-quality number that
    * justifies residual coding with data instead of folklore: for
    * each compression scheme, the exact total and per-vector mean of
    * `Σ_d (v_d − reconstruct(v)_d)²` over the corpus. Three rows:
    * `pq_raw` (codes compress the raw vector — [[knnIvfPq]]'s
    * scheme), `ivf_centroid` (no codes at all: the vector is its cell
    * centroid — what pure IVF "knows"), and `ivfpq_residual` (cell
    * centroid + residual codes — [[knnIvfResidual]]'s scheme, whose
    * error is centroid error MINUS what the codes explain). The FAISS
    * quantization-error diagnostic, exact because the packed-MIN
    * encode key already carries the minimal subspace distance in its
    * high bits: `m_s div K − offset = |cb|² − 2v·cb` for the chosen
    * code, so per-vector error folds to `Σ_s (m_s div K − offset) +
    * |v|²` — no reconstruction join at all.
    *
    * Scale shape: the same O(n·k) broadcast encode as the searches,
    * one partial-aggregating per-vector groupBy, then a 3-row
    * rollup. Error magnitudes stay < 2⁶² at any corpus size the
    * int64 dot products themselves admit.
    *
    * Measured finding on THIS corpus (pinned by the from-scratch spec
    * recompute): raw PQ beats residual PQ (6.4e9 vs 8.8e9 at
    * sf0.001) — near-uniform synthetic embeddings cluster so weakly
    * that |v − c|² > |v|² on average, so centering INFLATES what the
    * codes must express. On genuinely clustered production embeddings
    * the inequality flips, which is exactly the decision this report
    * lets an index builder make from data instead of folklore.
    */
  /** Corpus PQ error fold: Σ_s (m_s div K − offset) + |v|² — the
    * encode's packed mins carry the subspace distances, fold them
    * against the vector norm. One partial-aggregating groupBy + a
    * 1-row agg; shared by [[knnPqDistortion]] and [[knnPqBalanced]].
    */
  private def pqErrAgg(frame: DataFrame, seeds: DataFrame,
      n2: String): DataFrame =
    pqMins(frame, seeds)
      .join(frame.select(col("vec_id"), col(n2).as("_n2")), "vec_id")
      .select(((0 until PqSub)
        .map(s => expr(s"m_$s div $PqCodeK") - lit(PqOffset))
        .reduce(_ + _) + col("_n2")).as("err"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("err")).as("total_err"))

  def knnPqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    try {
      val (cents, cells, _) = ivfCoarseFull(e)
      val resid = cells.join(broadcast(cents),
          col("cell") === col("centroid_id"))
        .select(col("vec_id"),
          zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))
        .withColumn("rnorm2", graft.functions.DotLong(col("q"), col("q")))
        .cache() // seeds sample + encode + centroid-only row all read it
      try {
        val rseeds = residSeeds(resid, centK(e.count()))
        val raw = pqErrAgg(e, pqSeeds(e), "norm2")
          .select(lit("pq_raw").as("family"), col("n_vecs"),
            col("total_err"))
        val cent = resid
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("rnorm2")).as("total_err"))
          .select(lit("ivf_centroid").as("family"), col("n_vecs"),
            col("total_err"))
        val res = pqErrAgg(resid, rseeds, "rnorm2")
          .select(lit("ivfpq_residual").as("family"), col("n_vecs"),
            col("total_err"))
        raw.unionByName(cent).unionByName(res)
          .withColumn("mean_err", expr("total_err div n_vecs"))
          .orderBy(col("family"))
          // eager 3-row materialization so the finally can release the
          // corpus-sized buffers — the dedupLshCurve discipline
          .localCheckpoint(true)
      } finally resid.unpersist()
    } finally e.unpersist()
  }

  val knnPqDistortionSql: String = {
    def errExpr(n2: String) = (0 until PqSub)
      .map(s => s"(m_$s // $PqCodeK - $PqOffset)").mkString(" + ") +
      s" + $n2"
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |${sqlIvfCtes()},
       |$sqlResidCtes,
       |$sqlPqCtes,
       |rn AS (
       |  SELECT vec_id,
       |    list_sum(list_transform(rv, x -> x * x)) AS rnorm2
       |  FROM resid),
       |rawerr AS (
       |  SELECT ${errExpr("n.norm2")} AS err
       |  FROM mins m JOIN n ON m.vec_id = n.vec_id),
       |riderr AS (
       |  SELECT ${errExpr("rn.rnorm2")} AS err
       |  FROM rmins m JOIN rn ON m.vec_id = rn.vec_id),
       |fam AS (
       |  SELECT 'pq_raw' AS family, COUNT(*) AS n_vecs,
       |    CAST(SUM(err) AS BIGINT) AS total_err FROM rawerr
       |  UNION ALL
       |  SELECT 'ivf_centroid', COUNT(*),
       |    CAST(SUM(rnorm2) AS BIGINT) FROM rn
       |  UNION ALL
       |  SELECT 'ivfpq_residual', COUNT(*),
       |    CAST(SUM(err) AS BIGINT) FROM riderr)
       |SELECT family, n_vecs, total_err,
       |  total_err // n_vecs AS mean_err
       |FROM fam ORDER BY family""".stripMargin
  }

  // ------------------------------------------- balanced-subspace PQ
  /** Variance-balanced subspace PQ — OPQ's non-parametric
    * initialization (Ge et al., CVPR 2013): plain PQ splits dims
    * [0..7], [8..15], … as they happen to lie, so a few high-variance
    * dims can land in one subspace and starve the rest; this query
    * RANKS dims by exact corpus variance and deals them to the 8
    * subspaces in snake order (1st..8th to s=0..7, 9th..16th back to
    * s=7..0), then reports the raw-PQ reconstruction error in the
    * permuted space beside the unpermuted baseline — the measured
    * answer to "does dimension allocation matter for MY data".
    *
    * Exactness: the variance NUMERATOR `n·Σx² − (Σx)²` is computed in
    * DECIMAL(38,0)/HUGEINT (32 digits at 10¹² vectors — exact; ties
    * break on the dim index), and the winning permutation is a 64-row
    * METADATA collect that becomes a STATIC projection — the permuted
    * vector is pure codegen, no shuffle, no per-row explode. Encode
    * and error fold reuse [[pqMins]]/[[pqErrAgg]] verbatim; the
    * permutation preserves norms, so the error columns are directly
    * comparable. Scale shape: one 64-key variance aggregate
    * (map-side combine), one O(n·k) broadcast encode per family.
    *
    * Measured finding on THIS corpus (spec recomputes both families
    * from scratch): the permutation moves the error < 1% — the
    * synthetic embeddings are near-isotropic (per-dim variances are
    * uniform), so there is nothing to rebalance. That nil result is
    * the point of reporting against the baseline: anisotropic
    * production embeddings (where a few PCA-heavy dims dominate) are
    * where the snake deal pays, and the report shows whether YOUR
    * data is in that regime before you rebuild an index around it.
    */
  def knnPqBalanced(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val varRows = e.select(posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"),
        sum(dec(col("x") * col("x"))).as("sxx"))
      .select(col("d"),
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")).as("v"))
      .collect().map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1)))
    // snake deal by (variance DESC, dim ASC) rank
    val ranked = varRows.sortBy { case (d, v) => (-v, d) }.map(_._1)
    val bySub = Array.fill(PqSub)(Vector.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (d, i) =>
      val block = i / PqSub
      val o = i % PqSub
      bySub(if (block % 2 == 0) o else PqSub - 1 - o) += d
    }
    val perm: Seq[Int] = bySub.toSeq.flatMap(_.result())
    val pe = e.select(col("vec_id"),
        array(perm.map(d => col("q")(d)): _*).as("q"), col("norm2"))
    val raw = pqErrAgg(e, pqSeeds(e), "norm2")
      .select(lit("pq_raw").as("family"), col("n_vecs"), col("total_err"))
    val bal = pqErrAgg(pe, pqSeeds(pe), "norm2")
      .select(lit("pq_balanced").as("family"), col("n_vecs"),
        col("total_err"))
    raw.unionByName(bal)
      .withColumn("mean_err", expr("total_err div n_vecs"))
      .orderBy(col("family"))
  }

  val knnPqBalancedSql: String = {
    // keys/mins CTE text over an arbitrary (vec frame, seeds) pair —
    // the SQL twin of pqKeyCols/pqMins parametrized the same way
    def keysMins(prefix: String, src: String): String = {
      val keyCols = (0 until PqSub).map { s =>
        s"((${sqlSubDot("c.cq", "c.cq", s)} - 2 * ${sqlSubDot("v.qv", "c.cq", s)}" +
          s" + $PqOffset) * $PqCodeK + (c.cid - 1)) AS k_$s"
      }.mkString(",\n    ")
      val mins = (0 until PqSub).map(s => s"MIN(k_$s) AS m_$s")
        .mkString(", ")
      s"""${prefix}seeds AS (
         |  SELECT k.hrnk AS cid, p.qv AS cq
         |  FROM $src p JOIN cranked k ON p.vec_id = k.vec_id
         |  WHERE k.hrnk <= $PqCodeK),
         |${prefix}keys AS (
         |  SELECT v.vec_id, c.cid,
         |    $keyCols
         |  FROM $src v, ${prefix}seeds c),
         |${prefix}mins AS (SELECT vec_id, $mins FROM ${prefix}keys
         |  GROUP BY vec_id)""".stripMargin
    }
    def errExpr(n2: String) = (0 until PqSub)
      .map(s => s"(m_$s // $PqCodeK - $PqOffset)").mkString(" + ") +
      s" + $n2"
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |dx AS (
       |  SELECT vec_id, unnest(generate_series(1, 64)) AS d,
       |    unnest(qv) AS x
       |  FROM n),
       |vr AS (
       |  SELECT d, COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx,
       |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
       |  FROM dx GROUP BY d),
       |rk AS (
       |  SELECT d, row_number() OVER (
       |    ORDER BY n * sxx - sx * sx DESC, d ASC) AS r
       |  FROM vr),
       |perm AS (
       |  SELECT d AS olddim,
       |    CASE WHEN ((r - 1) // $PqSub) % 2 = 0 THEN (r - 1) % $PqSub
       |      ELSE ${PqSub - 1} - (r - 1) % $PqSub END AS s, r
       |  FROM rk),
       |permpos AS (
       |  SELECT olddim, s * $PqSub + row_number() OVER (
       |    PARTITION BY s ORDER BY r) AS newpos
       |  FROM perm),
       |np AS (
       |  SELECT t.vec_id, list(t.x ORDER BY p.newpos) AS qv,
       |    ANY_VALUE(n2.norm2) AS norm2
       |  FROM dx t JOIN permpos p ON t.d = p.olddim
       |  JOIN n n2 ON t.vec_id = n2.vec_id
       |  GROUP BY t.vec_id),
       |${keysMins("raw", "n")},
       |${keysMins("bal", "np")},
       |fam AS (
       |  SELECT 'pq_raw' AS family, COUNT(*) AS n_vecs,
       |    CAST(SUM(${errExpr("n.norm2")}) AS BIGINT) AS total_err
       |  FROM rawmins m JOIN n ON m.vec_id = n.vec_id
       |  UNION ALL
       |  SELECT 'pq_balanced', COUNT(*),
       |    CAST(SUM(${errExpr("np.norm2")}) AS BIGINT)
       |  FROM balmins m JOIN np ON m.vec_id = np.vec_id)
       |SELECT family, n_vecs, total_err,
       |  total_err // n_vecs AS mean_err
       |FROM fam ORDER BY family""".stripMargin
  }

  // --------------------------------------------------- SQ8 kNN
  /** Scalar-quantization ANN (the FAISS `IndexScalarQuantizer`
    * QT_8bit shape) — the fourth ANN family beside hyperplane LSH,
    * IVF, and PQ. Each dimension compresses to ONE byte via a
    * per-dimension affine map over corpus min/max statistics: 64
    * bytes/vector, the memory cut that is usually tried before PQ
    * because it needs no codebook training and decodes with two
    * flops. Candidates are ranked by the exact integer dot of the
    * CENTERED int8 codes (symmetric distance in the quantized
    * domain; centering kills the DC term `b·Σ(aᵢ+cᵢ)` that an
    * unsigned-code dot adds to every pair — measured 28%→100%
    * candidate recall on the fixture), top-[[PqRerank]] re-ranked by
    * exact cosine.
    *
    * Determinism: per-dim min/max are exact longs; the code
    * `floor((x−mn)·255/(mx−mn))` is two IEEE ops on identical
    * operands in both engines; code dots are exact int64 sums
    * (≤ 64·255² per pair). Scale shape: the stats pass is a 64-key
    * aggregate with map-side combine (each partition collapses to 64
    * rows pre-shuffle); the 1-row packed stats broadcast back; coding
    * is pure per-row expressions; candidate scoring is the same
    * broadcast-query corpus pass as brute force but over 8× smaller
    * payloads — and at 10^10 vectors SQ composes with IVF cells the
    * same way PQ does upstream.
    */
  def knnSq8(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // stats + coding + re-rank reads
    val stats = e.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val packed = stats
      .agg(sort_array(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("st"))
      .select(transform(col("st"), s => s.getField("mn")).as("mins"),
        transform(col("st"), s => s.getField("mx")).as("maxs"))
    val coded = e.crossJoin(broadcast(packed))
      .select(col("vec_id"),
        transform(col("q"), (x, i) => {
          val mn = element_at(col("mins"), (i + 1).cast("int"))
          val mx = element_at(col("maxs"), (i + 1).cast("int"))
          when(mx > mn,
            floor((x - mn).cast("double") * lit(255.0) /
              (mx - mn).cast("double")).cast("long") - lit(128L))
            .otherwise(lit(0L))
        }).as("cv"))
    val qs = coded.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("cv").as("qc"))
    val approx = broadcast(qs).join(coded, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("qc"), col("cv")).as("approx_dot"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val cands = approx.withColumn("crnk", row_number().over(wCand))
      .where(col("crnk") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerank(e, cands)
  }

  val knnSq8Sql: String =
    s"""WITH $sqlQuantized,
       |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
       |stats AS (
       |  SELECT i, MIN(qv[i]) AS mn, MAX(qv[i]) AS mx
       |  FROM n, dims GROUP BY i),
       |packed AS (
       |  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
       |  FROM stats),
       |coded AS (
       |  SELECT vec_id, list_transform(generate_series(1, 64),
       |    i -> CASE WHEN maxs[i] > mins[i]
       |      THEN CAST(floor(CAST(qv[i] - mins[i] AS DOUBLE) * 255.0 /
       |        CAST(maxs[i] - mins[i] AS DOUBLE)) AS BIGINT) - 128
       |      ELSE 0 END) AS cv
       |  FROM n, packed),
       |approx AS (
       |  SELECT a.vec_id AS query_id, b.vec_id,
       |    list_sum(list_transform(generate_series(1, 64),
       |      i -> a.cv[i] * b.cv[i])) AS approx_dot
       |  FROM coded a JOIN coded b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY approx_dot DESC, vec_id ASC) AS crnk
       |    FROM approx) WHERE crnk <= $PqRerank),
       |$sqlExactRerank""".stripMargin

  // ------------------------------------- held-out query search
  /** Held-out split: ~1/[[HeldoutMod]] of the corpus (by the same md5
    * family as every other deterministic sample) becomes a disjoint
    * QUERY table; everything else is the searchable corpus. This is
    * how a retrieval user actually calls ANN — queries that were
    * never seen at index-build time — and it proves the quantizers
    * generalize: training (IVF centroids, SQ8 stats) runs on the
    * corpus side ONLY, so a query can't leak into its own index.
    */
  val HeldoutMod = 20L
  val HeldoutQueries = 10

  private def isHeldout: Column =
    graft.functions.CrossHash.md5Long(col("vec_id").cast("string")) %
      HeldoutMod === 0

  /** The 10-query held-out probe set `(query_id, qq, qnorm2)`. */
  private def heldoutQueries(e: DataFrame): DataFrame =
    hashBottomK(e.where(isHeldout), HeldoutQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"))

  /** Oracle CTEs: `corpus`, and `queries(query_id, qq, qn)` ranked by
    * the shared hash order within the held-out slice.
    */
  private lazy val sqlHeldoutCtes: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("CAST(vec_id AS VARCHAR)")
    s"""ho AS (SELECT vec_id, qv, norm2 FROM n WHERE $h % $HeldoutMod = 0),
       |corpus AS (
       |  SELECT vec_id, qv, norm2 FROM n WHERE $h % $HeldoutMod <> 0),
       |hq AS (
       |  SELECT vec_id, qv, norm2,
       |    row_number() OVER (ORDER BY $h, vec_id) AS qrnk FROM ho),
       |queries AS (
       |  SELECT vec_id AS query_id, qv AS qq, norm2 AS qn
       |  FROM hq WHERE qrnk <= $HeldoutQueries)""".stripMargin
  }

  private[analytics] def bruteHeldoutFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // split + queries read it twice
    val corpus = e.where(!isHeldout)
    val scored = corpus.crossJoin(broadcast(heldoutQueries(e)))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  /** Brute-force exact top-k for the held-out queries — the recall
    * baseline the approximate held-out searches are measured against
    * (Round6OpsSpec asserts the floor), and the HELD-OUT ground
    * truth's build job: published once per sweep through the
    * [[SessionArtifact]] seam; [[knnRecallReport]] and
    * [[knnMrrReport]] ride the publish instead of re-paying the
    * |queries|×n exact scan each (their full-recompute oracles keep
    * re-proving the published table).
    */
  def knnBruteHeldout(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.rebuild(spark, dir, "knn_brute_heldout")(
      bruteHeldoutFrame(spark, dir))

  /** The published held-out exact top-k — artifact-read for riders. */
  private def bruteHeldoutArt(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "knn_brute_heldout")(
      bruteHeldoutFrame(spark, dir))

  val knnBruteHeldoutSql: String = {
    val qdot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qq[i] * b.qv[i]))"
    s"""WITH $sqlQuantized,
       |$sqlHeldoutCtes,
       |scored AS (
       |  SELECT q.query_id, b.vec_id,
       |    ${sqlScorePpm(qdot, "q.qn", "b.norm2")} AS score_ppm
       |  FROM queries q, corpus b)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  /** Trained-IVF search for held-out queries: the quantizer trains on
    * the corpus side only ([[trainIvf]]); the query is assigned its
    * [[NProbe]] nearest TRAINED cells in a separate tiny pass (queries
    * × ≤[[CentKMax]]-row broadcast) — exactly how a production IVF
    * serves out-of-corpus traffic. Same dataflow scale shape as
    * [[knnIvfTrained]]; only the probe side changed provenance.
    */
  def knnIvfTrainedHeldout(spark: SparkSession, dir: String): DataFrame =
    // the held-out IVF search output is SHARED by knn_recall_report
    // and knn_mrr_report — published per sweep like the ground truth,
    // so the eval reports join tables instead of re-running searches
    SessionArtifact.rebuild(spark, dir, "knn_ivf_heldout")(
      ivfTrainedHeldoutFrame(spark, dir))

  /** The published held-out IVF search — artifact-read for riders. */
  private def ivfHeldoutArt(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "knn_ivf_heldout")(
      ivfTrainedHeldoutFrame(spark, dir))

  private[analytics] def ivfTrainedHeldoutFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val corpus = e.where(!isHeldout)
    val trained = trainIvf(corpus)
      .cache() // feeds corpus assignment AND the query probe pass
    val cells = argmaxCell(
      corpus.crossJoin(broadcast(trained))
        .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
          scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
            .as("cscore")),
      "cell")
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val qprobe = heldoutQueries(e).crossJoin(broadcast(trained))
      .select(col("query_id"), col("qq"), col("qnorm2"), col("cell"),
        scorePpm(dot(col("qq"), col("tq")), col("qnorm2"), col("tnorm2"))
          .as("cscore"))
      .withColumn("crnk", row_number().over(wq))
      .where(col("crnk") <= NProbe)
      .select(col("query_id"), col("qq"), col("qnorm2"), col("cell"))
    val scored = broadcast(qprobe).join(cells, Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  val knnIvfTrainedHeldoutSql: String = {
    val sdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.cq[i]))"
    val tdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.tq[i]))"
    val qtdot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qq[i] * c.tq[i]))"
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * b.qv[i]))"
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val meanList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / cnt) AS BIGINT)").mkString(", ")
    val centK = s"GREATEST($CentKMin, LEAST($CentKMax, " +
      "CAST(ceil(sqrt((SELECT COUNT(*) FROM corpus))) AS BIGINT)))"
    s"""WITH $sqlQuantized,
       |$sqlHeldoutCtes,
       |crankedc AS (
       |  SELECT vec_id, qv, norm2, row_number() OVER (
       |    ORDER BY ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(vec_id AS VARCHAR)")}, vec_id) AS hrnk
       |  FROM corpus),
       |seeds AS (
       |  SELECT vec_id AS centroid_id, qv AS cq, norm2 AS cnorm2
       |  FROM crankedc WHERE hrnk <= $centK),
       |assign0 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
       |    ${sqlScorePpm(sdot, "v.norm2", "c.cnorm2")} AS cscore
       |  FROM corpus v, seeds c),
       |cell0 AS (
       |  SELECT vec_id, qv, norm2, centroid_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, centroid_id ASC) AS crnk
       |    FROM assign0) WHERE crnk = 1),
       |sums AS (
       |  SELECT cell, COUNT(*) AS cnt, $dimSums
       |  FROM cell0 GROUP BY cell),
       |trained0 AS (
       |  SELECT cell, [$meanList] AS tq FROM sums),
       |trained AS (
       |  SELECT cell, tq,
       |    list_sum(list_transform(tq, x -> x * x)) AS tnorm2
       |  FROM trained0
       |  WHERE list_sum(list_transform(tq, x -> x * x)) > 0),
       |cassign AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.cell,
       |    ${sqlScorePpm(tdot, "v.norm2", "c.tnorm2")} AS cscore
       |  FROM corpus v, trained c),
       |cells AS (
       |  SELECT vec_id, cell, qv, norm2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, cell ASC) AS crnk
       |    FROM cassign) WHERE crnk = 1),
       |qassign AS (
       |  SELECT q.query_id, q.qq, q.qn, c.cell,
       |    ${sqlScorePpm(qtdot, "q.qn", "c.tnorm2")} AS cscore
       |  FROM queries q, trained c),
       |qprobe AS (
       |  SELECT query_id, qq, qn, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cscore DESC, cell ASC) AS crnk
       |    FROM qassign) WHERE crnk <= $NProbe),
       |scored AS (
       |  SELECT p.query_id, b.vec_id,
       |    ${sqlScorePpm(pdot, "p.qn", "b.norm2")} AS score_ppm
       |  FROM qprobe p JOIN cells b ON p.cell = b.cell)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  /** Recall@k of the trained-IVF held-out search, measured IN-BAND and
    * under the oracle gate — the retrieval-quality number the spec's
    * recall floor asserts, now a first-class report: per held-out
    * query, how many of brute force's exact top-k the approximate
    * search returned. Both sides run their normal plans (broadcast
    * query/centroid sets, corpus never SMJ'd); the comparison is a
    * left-semi join on (query, vec) pairs — 2·k·|queries| rows, a
    * constant. Queries where the probe missed everything still report
    * (zero hits), via the left join on the brute side's query list.
    */
  def knnRecallReport(spark: SparkSession, dir: String): DataFrame = {
    // both sides are PUBLISHED session artifacts (the ground-truth and
    // search build jobs above) — this report is two joins over
    // k·|queries|-row tables, not three corpus scans. The oracle below
    // still recomputes everything from the raw corpus, so a wrong
    // artifact diverges this hash.
    val brute = bruteHeldoutArt(spark, dir)
      .select(col("query_id"), col("vec_id"))
    val hits = ivfHeldoutArt(spark, dir)
      .select(col("query_id"), col("vec_id"))
      .join(broadcast(brute), Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      .join(broadcast(hits), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        ppm(coalesce(col("n_hits"), lit(0L)), col("k")).as("recall_ppm"))
  }

  val knnRecallReportSql: String =
    s"""SELECT b.query_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  ${sqlPpm("COALESCE(h.n_hits, 0)", "b.k")} AS recall_ppm
       |FROM (
       |  SELECT query_id, COUNT(*) AS k
       |  FROM ($knnBruteHeldoutSql) GROUP BY query_id) b
       |LEFT JOIN (
       |  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM ($knnIvfTrainedHeldoutSql) a
       |  SEMI JOIN ($knnBruteHeldoutSql) x
       |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
       |  GROUP BY a.query_id) h
       |ON b.query_id = h.query_id""".stripMargin

  // ------------------------------------------------ IVF index health
  /** Index-health report over the trained coarse quantizer — the
    * occupancy profile an index operator watches to know when to
    * retrain: trained/occupied/empty cell counts, corpus size, the
    * min/max cell occupancy, and the imbalance factor max/mean as
    * exact integer ppm (10^6 = perfectly balanced; the partition-skew
    * number that bounds the worst probe's work). A quantizer whose
    * imbalance drifts up as the corpus grows is assigning new data to
    * old density — the retrain signal, same monitor role as
    * [[knnRecallReport]] on the recall side.
    *
    * Scale shape: the same O(n·k) assignment against the ≤[[CentKMax]]
    * -row broadcast the searches run, then a cell-keyed count (partial
    * aggregation collapses each partition to ≤k rows) folded to ONE
    * report row; the trained-cell count joins in from a 1-row
    * broadcast. Nothing here grows beyond k rows past the scan.
    */
  def knnIvfStats(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // count + seeds + 2 assignments
    val trained = trainIvf(e).cache() // assignment broadcast + cell count
    val assign = e.crossJoin(broadcast(trained))
      .select(col("vec_id"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
    val cells = argmaxCell(assign, "cell", payload = Nil)
    val occ = cells.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
    val nTrained = trained.agg(count(lit(1)).as("n_cells"))
    occ.agg(count(lit(1)).as("n_occupied"),
        sum(col("occ")).as("n_vecs"),
        min(col("occ")).as("min_occ"),
        max(col("occ")).as("max_occ"))
      .crossJoin(broadcast(nTrained))
      .select(col("n_cells"), col("n_occupied"),
        (col("n_cells") - col("n_occupied")).as("n_empty"),
        col("n_vecs"), col("min_occ"), col("max_occ"),
        ppm(col("max_occ") * col("n_occupied"), col("n_vecs"))
          .as("imbalance_ppm"))
  }

  val knnIvfStatsSql: String =
    s"""WITH $sqlTrainedCells,
       |occ AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS occ
       |  FROM cells GROUP BY cell),
       |tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM trained),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_occupied,
       |    CAST(SUM(occ) AS BIGINT) AS n_vecs,
       |    MIN(occ) AS min_occ, MAX(occ) AS max_occ
       |  FROM occ)
       |SELECT tn.n_cells, agg.n_occupied,
       |  tn.n_cells - agg.n_occupied AS n_empty,
       |  agg.n_vecs, agg.min_occ, agg.max_occ,
       |  ${sqlPpm("agg.max_occ * agg.n_occupied", "agg.n_vecs")}
       |    AS imbalance_ppm
       |FROM agg, tn""".stripMargin

  // --------------------------------------- incremental IVF (delta)
  /** Nightly index maintenance without retraining: the quantizer
    * trains on the BASE corpus only (~10/11 of vectors by the shared
    * md5 split), the remaining delta — the night's new arrivals — is
    * assigned to the FROZEN centroids in the same single assignment
    * pass that re-homes the base, and searches run over the union
    * index. This is how a production IVF absorbs new data between
    * retrains: assignment is O(|corpus|·k) against the same
    * ≤[[CentKMax]]-row broadcast, no Lloyd round re-runs, and the
    * delta needs no co-location with the base — exactly one scan's
    * worth of work per night. [[knnIvfStats]] is the monitor that
    * says when frozen centroids have drifted too far from the data
    * and a retrain is due; the spec pins that delta vectors are
    * reachable (they appear in results) and that recall holds up
    * against brute force.
    */
  val DeltaMod = 11L
  private[analytics] def isDeltaId(c: Column): Column =
    graft.functions.CrossHash.md5Long(c.cast("string")) % DeltaMod === 3
  private def isDelta: Column = isDeltaId(col("vec_id"))

  def knnIvfDelta(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // split + assignment + probe
    val base = e.where(!isDelta)
    val trained = trainIvf(base).cache() // frozen: the delta never trains
    val assign = e.crossJoin(broadcast(trained))
      .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
    val cells = argmaxCell(assign, "cell")
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val qprobe = e.where(col("vec_id") < 10).crossJoin(broadcast(trained))
      .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
      .withColumn("crnk", row_number().over(wProbe))
      .where(col("crnk") <= NProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"), col("cell"))
    val scored = broadcast(qprobe).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= TopK)
  }

  val knnIvfDeltaSql: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("CAST(vec_id AS VARCHAR)")
    val sdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.cq[i]))"
    val tdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.tq[i]))"
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * b.qv[i]))"
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val meanList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / cnt) AS BIGINT)").mkString(", ")
    val centKb = s"GREATEST($CentKMin, LEAST($CentKMax, " +
      "CAST(ceil(sqrt((SELECT COUNT(*) FROM base))) AS BIGINT)))"
    s"""WITH $sqlQuantized,
       |base AS (
       |  SELECT vec_id, qv, norm2 FROM n WHERE $h % $DeltaMod <> 3),
       |crankedb AS (
       |  SELECT vec_id, qv, norm2, row_number() OVER (
       |    ORDER BY $h, vec_id) AS hrnk
       |  FROM base),
       |seeds AS (
       |  SELECT vec_id AS centroid_id, qv AS cq, norm2 AS cnorm2
       |  FROM crankedb WHERE hrnk <= $centKb),
       |assign0 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
       |    ${sqlScorePpm(sdot, "v.norm2", "c.cnorm2")} AS cscore
       |  FROM base v, seeds c),
       |cell0 AS (
       |  SELECT vec_id, qv, norm2, centroid_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, centroid_id ASC) AS crnk
       |    FROM assign0) WHERE crnk = 1),
       |sums AS (
       |  SELECT cell, COUNT(*) AS cnt, $dimSums
       |  FROM cell0 GROUP BY cell),
       |trained0 AS (
       |  SELECT cell, [$meanList] AS tq FROM sums),
       |trained AS (
       |  SELECT cell, tq,
       |    list_sum(list_transform(tq, x -> x * x)) AS tnorm2
       |  FROM trained0
       |  WHERE list_sum(list_transform(tq, x -> x * x)) > 0),
       |assign1 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.cell,
       |    ${sqlScorePpm(tdot, "v.norm2", "c.tnorm2")} AS cscore
       |  FROM n v, trained c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC, cell ASC) AS crnk
       |  FROM assign1),
       |cells AS (
       |  SELECT vec_id, cell, qv, norm2 FROM ranked WHERE crnk = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, qv AS qq, norm2 AS qn, cell
       |  FROM ranked WHERE vec_id < 10 AND crnk <= $NProbe),
       |scored AS (
       |  SELECT p.query_id, b.vec_id,
       |    ${sqlScorePpm(pdot, "p.qn", "b.norm2")} AS score_ppm
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id)
       |SELECT query_id, vec_id, score_ppm, rnk FROM (
       |  SELECT query_id, vec_id, score_ppm,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  }

  /** SQ8 search for held-out queries: per-dimension min/max stats come
    * from the CORPUS only; queries are coded through the same affine
    * map with codes clamped to [0, 255] (an out-of-corpus query can
    * exceed the corpus range — the clamp is what a real scalar
    * quantizer does to out-of-distribution components; corpus codes
    * are unaffected since the stats bound them by construction).
    */
  def knnSq8Heldout(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.rebuild(spark, dir, "knn_sq8_heldout")(
      sq8HeldoutFrame(spark, dir))

  /** The published held-out SQ8 search — artifact-read for riders. */
  private def sq8HeldoutArt(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "knn_sq8_heldout")(
      sq8HeldoutFrame(spark, dir))

  private[analytics] def sq8HeldoutFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val corpus = e.where(!isHeldout)
    val stats = corpus.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val packed = stats
      .agg(sort_array(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("st"))
      .select(transform(col("st"), s => s.getField("mn")).as("mins"),
        transform(col("st"), s => s.getField("mx")).as("maxs"))
    def code(df: DataFrame): DataFrame = df.crossJoin(broadcast(packed))
      .select(col("vec_id"),
        transform(col("q"), (x, i) => {
          val mn = element_at(col("mins"), (i + 1).cast("int"))
          val mx = element_at(col("maxs"), (i + 1).cast("int"))
          when(mx > mn,
            greatest(lit(0L), least(lit(255L),
              floor((x - mn).cast("double") * lit(255.0) /
                (mx - mn).cast("double")).cast("long"))) - lit(128L))
            .otherwise(lit(0L))
        }).as("cv"))
    val qs = heldoutQueries(e).cache() // coding + exact re-rank
    val codedQ = code(qs.select(col("query_id").as("vec_id"),
      col("qq").as("q")))
      .select(col("vec_id").as("query_id"), col("cv").as("qc"))
    val approx = code(corpus).crossJoin(broadcast(codedQ))
      .select(col("query_id"), col("vec_id"),
        dot(col("qc"), col("cv")).as("approx_dot"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val cands = approx.withColumn("crnk", row_number().over(wCand))
      .where(col("crnk") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerankWith(qs, e, cands)
  }

  val knnSq8HeldoutSql: String =
    s"""WITH $sqlQuantized,
       |$sqlHeldoutCtes,
       |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
       |stats AS (
       |  SELECT i, MIN(qv[i]) AS mn, MAX(qv[i]) AS mx
       |  FROM corpus, dims GROUP BY i),
       |packed AS (
       |  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
       |  FROM stats),
       |codedc AS (
       |  SELECT vec_id, list_transform(generate_series(1, 64),
       |    i -> CASE WHEN maxs[i] > mins[i]
       |      THEN GREATEST(0, LEAST(255,
       |        CAST(floor(CAST(qv[i] - mins[i] AS DOUBLE) * 255.0 /
       |          CAST(maxs[i] - mins[i] AS DOUBLE)) AS BIGINT))) - 128
       |      ELSE 0 END) AS cv
       |  FROM corpus, packed),
       |codedq AS (
       |  SELECT query_id, list_transform(generate_series(1, 64),
       |    i -> CASE WHEN maxs[i] > mins[i]
       |      THEN GREATEST(0, LEAST(255,
       |        CAST(floor(CAST(qq[i] - mins[i] AS DOUBLE) * 255.0 /
       |          CAST(maxs[i] - mins[i] AS DOUBLE)) AS BIGINT))) - 128
       |      ELSE 0 END) AS qc
       |  FROM queries, packed),
       |approx AS (
       |  SELECT a.query_id, b.vec_id,
       |    list_sum(list_transform(generate_series(1, 64),
       |      i -> a.qc[i] * b.cv[i])) AS approx_dot
       |  FROM codedq a, codedc b),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY approx_dot DESC, vec_id ASC) AS crnk
       |    FROM approx) WHERE crnk <= $PqRerank),
       |$sqlExactRerank""".stripMargin

  // ------------------------------------- SQL front door, native fns
  /** The native expressions through the SQL front door: `md5long56`
    * and `dot_long` are injected by
    * [[graft.functions.GraftExtensions]] (via `withExtensions` /
    * `spark.sql.extensions`), so a SQL user gets the same codegen'd
    * hot loops as the Column API. The oracle runs the composed
    * engine-neutral twins — every verify run re-proves the native ↔
    * composed equivalence through the registry path too.
    */
  def sqlNativeFuncs(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT vec_id,
         |  dot_long(q, q) AS norm2,
         |  md5long56(CAST(vec_id AS STRING)) AS id_hash
         |FROM (
         |  SELECT vec_id,
         |    transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS q
         |  FROM embeddings)""".stripMargin)
  }

  val sqlNativeFuncsSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS qv
       |  FROM embeddings)
       |SELECT vec_id,
       |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2,
       |  ${graft.functions.CrossHash.sqlMd5Long(
           "CAST(vec_id AS VARCHAR)")} AS id_hash
       |FROM q""".stripMargin

  // ------------------------------------------- near-dup pair search
  /** Embedding-cosine near-duplicate pairs, blocked on the COMPOSED
    * key (label, hyperplane bucket). Label alone is a property of the
    * data, not the corpus size — its blocks grow linearly with the
    * corpus, making the within-block self-join quadratic. Composing
    * with the 8-plane LSH [[bucketCol]] multiplies the key space by
    * 256 and, crucially, the bucket key DOES scale with the corpus
    * distribution (more planes can be added without touching the
    * dataflow). High-cosine pairs collide in the same bucket with
    * probability (1 - θ/π)^8, so the block is where the near-dups
    * actually live; the join shuffles on (label, bucket), never
    * all-pairs within a label.
    */
  def embNeardupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).withColumn("bucket", bucketCol)
    val a = e.select(col("label"), col("bucket"), col("vec_id").as("vec_a"),
      col("q").as("qa"), col("norm2").as("na"))
    val b = e.select(col("label"), col("bucket"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("norm2").as("nb"))
    a.join(b, Seq("label", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        scorePpm(dot(col("qa"), col("qb")), col("na"), col("nb"))
          .as("score_ppm"))
      .where(col("score_ppm") >= 250000)
  }

  val embNeardupPairsSql: String =
    s"""WITH $sqlBucketed
       |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS score_ppm
       |FROM bucketed a JOIN bucketed b
       |  ON a.label = b.label AND a.bucket = b.bucket
       |  AND a.vec_id < b.vec_id
       |WHERE ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} >= 250000""".stripMargin

  // --------------------------------------------- semantic dedup
  /** SemDeDup-style semantic deduplication: cluster the corpus with
    * the trained coarse quantizer ([[trainIvf]] — the SAME quantizer
    * the IVF searches use), then compare vectors ONLY within their
    * home cell and mark each one a duplicate iff an earlier (smaller
    * vec_id) cell-mate sits above the cosine threshold. This is the
    * published SemDeDup recipe (Abbas et al., 2023: k-means the
    * embeddings, dedup inside clusters): the clustering turns the n²
    * all-pairs problem into Σ|cell|² with ~√n-sized cells — O(n^1.5)
    * total, each cell's pairing an independent task, no corpus-sized
    * state anywhere.
    *
    * Output is one row per CORPUS vector (row count is corpus-stable,
    * threshold only moves the flags): home cell, how many earlier
    * cell-mates clear the threshold, the earliest such mate
    * (`dup_of`, = own id when none), and the keep/drop flag.
    */
  val SemThresh = 250000 // ppm cosine — same bar as emb_neardup_pairs
  def embSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // quantized feeds count + seeds + two assignment passes (knnIvf
    // doc); cells feeds both pair sides + the final left join
    val e = quantized(spark, dir).cache()
    val trained = trainIvf(e)
    val assign = e.crossJoin(broadcast(trained))
      .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val cells = assign.withColumn("crnk", row_number().over(w))
      .where(col("crnk") === 1)
      .select(col("vec_id"), col("cell"), col("q"), col("norm2"))
      .cache()
    val a = cells.select(col("cell"), col("vec_id"),
      col("q").as("qa"), col("norm2").as("na"))
    val b = cells.select(col("cell"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("norm2").as("nb"))
    // within-cell pairs against earlier ids only — the join shuffles
    // on the cell key, never all-pairs (strategy left to Catalyst,
    // same reasoning as the object doc's self-join note)
    val dups = a.join(b, Seq("cell"))
      .where(col("vec_b") < col("vec_id"))
      .select(col("vec_id"), col("vec_b"),
        scorePpm(dot(col("qa"), col("qb")), col("na"), col("nb")).as("s"))
      .where(col("s") >= SemThresh)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("nd"), min(col("vec_b")).as("df"))
    cells.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("nd"), lit(0L)).as("n_earlier_dups"),
        coalesce(col("df"), col("vec_id")).as("dup_of"),
        col("df").isNotNull.as("is_duplicate"))
  }

  val embSemanticDedupSql: String = {
    val pairDot =
      "list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i]))"
    s"""WITH $sqlTrainedCells,
       |dups AS (
       |  SELECT a.vec_id, COUNT(*) AS nd, MIN(b.vec_id) AS df
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND b.vec_id < a.vec_id
       |  WHERE ${sqlScorePpm(pairDot, "a.norm2", "b.norm2")} >= $SemThresh
       |  GROUP BY a.vec_id)
       |SELECT c.vec_id, c.cell,
       |  COALESCE(d.nd, 0) AS n_earlier_dups,
       |  COALESCE(d.df, c.vec_id) AS dup_of,
       |  d.vec_id IS NOT NULL AS is_duplicate
       |FROM cells c LEFT JOIN dups d ON c.vec_id = d.vec_id""".stripMargin
  }

  // ------------------------------------ contrastive pair batches
  /** In-batch contrastive pair generation — the data-prep step for
    * embedding training (SimCLR/InfoNCE-style): vectors are hash-
    * assigned to training batches, and within each batch every pair
    * is emitted labeled positive (same class) or negative (different
    * class) with its exact cosine — the margin the loss will see.
    *
    * Batch COUNT scales with the corpus (`n div 8` batches from a
    * 1-row count broadcast ⇒ batch SIZE stays ~8 at any scale) — the
    * same adaptive rule as knn_ivf's √n centroid cap, avoiding the
    * fixed-key-space trap where buckets grow with the corpus and
    * within-bucket pairing turns quadratic. One shuffle on the batch
    * key; per-batch work is a constant ~8² regardless of corpus size.
    */
  def embContrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir).cache() // count + batching + both sides
    val n = q
      .agg(greatest(floor(count(lit(1)) / 8).cast("long"), lit(1L))
        .as("nb"))
    val batched = q
      .crossJoin(broadcast(n))
      .select((graft.functions.CrossHash
        .md5Long(col("vec_id").cast("string")) % col("nb")).as("batch"),
        col("vec_id"), col("label"), col("q"), col("norm2"))
      .cache() // both self-join sides
    val a = batched.select(col("batch"), col("vec_id").as("vec_a"),
      col("label").as("la"), col("q").as("qa"), col("norm2").as("na"))
    val b = batched.select(col("batch"), col("vec_id").as("vec_b"),
      col("label").as("lb"), col("q").as("qb"), col("norm2").as("nb2"))
    a.join(b, Seq("batch"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("batch"), col("vec_a"), col("vec_b"),
        (col("la") === col("lb")).as("is_positive"),
        scorePpm(dot(col("qa"), col("qb")), col("na"), col("nb2"))
          .as("cos_ppm"))
  }

  val embContrastivePairsSql: String =
    s"""WITH $sqlQuantized,
       |nb AS (
       |  SELECT greatest(CAST(floor(COUNT(*) / 8) AS BIGINT), 1) AS nb
       |  FROM n),
       |batched AS (
       |  SELECT ${graft.functions.CrossHash.sqlMd5Long(
            "CAST(vec_id AS VARCHAR)")} % nb.nb AS batch,
       |    vec_id, label, qv, norm2
       |  FROM n, nb)
       |SELECT a.batch, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  a.label = b.label AS is_positive,
       |  ${sqlScorePpm(
            "list_sum(list_transform(generate_series(1, 64), " +
              "i -> a.qv[i] * b.qv[i]))",
            "a.norm2", "b.norm2")} AS cos_ppm
       |FROM batched a JOIN batched b
       |  ON a.batch = b.batch AND a.vec_id < b.vec_id""".stripMargin

  // ---------------------------------------- centroid outlier scan
  /** Label-centroid outlier detection — the mislabel/contamination
    * scan run before training on labeled embeddings: each vector's
    * cosine to its OWN label's centroid; low cosine ⇒ the vector
    * doesn't belong where its label says (annotation error, near-OOD
    * sample, poisoning candidate).
    *
    * The centroid is the per-dimension TRUNCATED mean of the quantized
    * components (`sum div count` — truncation toward zero is identical
    * in Spark's `div` and DuckDB's `//`, verified on negatives), so
    * centroid components stay in the same bounded range as vector
    * components and every overflow bound is corpus-size-independent:
    * the exact-int64 dot/norm machinery of the kNN family applies
    * unchanged at any corpus size.
    *
    * Scale shape: one posexplode + (label, dim) aggregate with
    * map-side combine — 64·|labels| cells — then a broadcast join of
    * the label-cardinality centroid table back onto the corpus. No
    * self-join, no per-pair work; linear in corpus size.
    */
  val OutlierPpm = 250000L

  def embOutliers(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val cents = v
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("s div n"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cent"))
      .withColumn("cnorm2", dot(col("cent"), col("cent")))
    v.join(broadcast(cents), "label")
      .withColumn("cos_ppm",
        scorePpm(dot(col("q"), col("cent")), col("norm2"), col("cnorm2")))
      .select(col("vec_id"), col("label"), col("cos_ppm"),
        (col("cos_ppm") < OutlierPpm).as("is_outlier"))
  }

  val embOutliersSql: String =
    s"""WITH $sqlQuantized,
       |comps AS (
       |  SELECT label, i AS pos, qv[i] AS x
       |  FROM n, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) g),
       |csum AS (
       |  SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS nn
       |  FROM comps GROUP BY 1, 2),
       |cent AS (
       |  SELECT label, list(s // CAST(nn AS BIGINT) ORDER BY pos) AS cent
       |  FROM csum GROUP BY label),
       |scored AS (
       |  SELECT n.vec_id, n.label,
       |    ${sqlScorePpm(
      "list_sum(list_transform(generate_series(1, 64), i -> n.qv[i] * c.cent[i]))",
      "n.norm2",
      "list_sum(list_transform(c.cent, x -> x * x))")} AS cos_ppm
       |  FROM n JOIN cent c ON n.label = c.label)
       |SELECT vec_id, label, cos_ppm, cos_ppm < $OutlierPpm AS is_outlier
       |FROM scored""".stripMargin

  // ------------------------------------------- covariance matrix
  /** Upper-triangle covariance matrix of the quantized embedding
    * corpus — the distributed-Gramian front-end of PCA / whitening /
    * dimensionality audits. For every dim pair (i ≤ j):
    * `cov·n² = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`, every operand an EXACT integer
    * (components quantized like every query here; sums accumulate
    * through DECIMAL(38,0), so no corpus size can overflow them —
    * DuckDB's HUGEINT plays the same role in the twin), then ONE
    * nearest-double cast + divide by n² and a milli-scale floor, which
    * is bit-identical in both engines. The output magnitude is
    * n-independent (a per-pair covariance), so the final long never
    * grows with the corpus.
    *
    * Scale shape: the d²/2-per-row pair expansion is map-side
    * (codegen'd posexplode twice, no UDF), and partial aggregation
    * collapses every partition to ≤ d(d+1)/2 = 2080 rows before the
    * one shuffle — the reduce side sees 2080 keys total regardless of
    * corpus size. (A `mapPartitions` Gramian accumulator would shave
    * the transient row inflation, at the cost of leaving whole-stage
    * codegen; the expression form is the right default.)
    */
  /** Upper-triangle Gramian/covariance over any quantized frame —
    * shared by [[embCovariance]] (the report) and [[embPcaPower]]
    * (which mirrors it to a full matrix and iterates on it).
    */
  private def covUpper(e: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast(org.apache.spark.sql.types
      .DecimalType(38, 0))
    val dd = (c: Column) => c.cast("double")
    val pairs = e
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
      .where(col("j") >= col("i"))
    pairs.groupBy(col("i").cast("long").as("i"),
        col("j").cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("qi"))).as("si"),
        sum(dec(col("qj"))).as("sj"),
        sum(dec(col("qi")) * dec(col("qj"))).as("sij"))
      .select(col("i"), col("j"),
        floor(lit(1e3) * dd(col("n") * col("sij") - col("si") * col("sj")) /
          dd(dec(col("n")) * dec(col("n")))).cast("long").as("cov_milli"))
  }

  def embCovariance(spark: SparkSession, dir: String): DataFrame =
    covUpper(quantized(spark, dir))

  /** Oracle CTE chain for the upper-triangle covariance, ending at
    * `cov(i, j, cov_milli)`. Expects [[sqlQuantized]]'s `q` CTE in
    * scope (both texts quantize identically by construction).
    */
  private val sqlCovCtes: String =
    s"""ce AS (
       |  SELECT gi.i, gj.j, qv[gi.i + 1] AS qi, qv[gj.j + 1] AS qj
       |  FROM q,
       |    LATERAL (SELECT unnest(generate_series(0, len(qv) - 1)) AS i) gi,
       |    LATERAL (SELECT unnest(generate_series(0, len(qv) - 1)) AS j) gj
       |  WHERE gj.j >= gi.i),
       |cs AS (
       |  SELECT i, j, CAST(COUNT(*) AS HUGEINT) AS n,
       |    SUM(CAST(qi AS HUGEINT)) AS si,
       |    SUM(CAST(qj AS HUGEINT)) AS sj,
       |    SUM(CAST(qi AS HUGEINT) * CAST(qj AS HUGEINT)) AS sij
       |  FROM ce GROUP BY 1, 2),
       |cov AS (
       |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |    CAST(FLOOR(1000.0 * CAST(n * sij - si * sj AS DOUBLE)
       |      / CAST(n * n AS DOUBLE)) AS BIGINT) AS cov_milli
       |  FROM cs)""".stripMargin

  val embCovarianceSql: String =
    s"""WITH $sqlQuantized,
       |$sqlCovCtes
       |SELECT i, j, cov_milli FROM cov""".stripMargin

  // ------------------------------------------- PCA power iteration
  /** Top principal direction of the embedding corpus by power
    * iteration on the distributed Gramian, plus the corpus projected
    * onto it — the dimensionality-audit / whitening front-end
    * ([[embCovariance]] builds the matrix; this query USES it). Output
    * per label: member count, mean projection onto the principal
    * direction (milli), and the Rayleigh-quotient eigenvalue estimate
    * — the one-number "how much variance does direction one carry"
    * answer.
    *
    * Determinism: the Gramian entries are exact int64
    * ([[embCovariance]]); each of the [[PowRounds]] matvecs is an
    * exact int64 sum; renormalization divides by the exact
    * `max(|u|)` in ONE IEEE double step (identical operands → identical
    * bits in both engines), flooring back to ≤2²⁰-bounded integers so
    * the next matvec cannot overflow. The Rayleigh quotient
    * accumulates vᵀAv and vᵀv through DECIMAL(38,0)/HUGEINT — exact,
    * order-independent — with one final double division.
    *
    * Scale shape: TWO corpus passes total (the Gramian build and the
    * projection — both map-side-collapsing aggregations). The
    * iteration itself runs on the DRIVER over the collected d(d+1)/2
    * = 2080-row Gramian: the matrix is corpus-INDEPENDENT metadata
    * (64×64 regardless of n — this is the one collect a power
    * iteration should make), and iterating it through Spark jobs
    * would pay ~3·PowRounds scheduler round-trips for arithmetic
    * that is microseconds locally. The trained direction returns to
    * the cluster as a 64-element literal; the projection is a per-row
    * codegen'd [[functions.DotLong]] against it — no shuffle beyond
    * the label groupBy.
    *
    * Determinism is unchanged: the driver replays the SAME exact
    * integer matvec (|A|·2²⁰·64 < 2⁶³, no overflow), the same single
    * IEEE floor-divide renormalization, and a BigInt Rayleigh
    * quotient — identical operands, identical bits as the HUGEINT /
    * DECIMAL(38,0) paths the oracle runs.
    */
  val PowRounds = 3

  def embPcaPower(spark: SparkSession, dir: String): DataFrame = {
    val dec = (c: Column) => c.cast(org.apache.spark.sql.types
      .DecimalType(38, 0))
    val dd = (c: Column) => c.cast("double")
    val e = quantized(spark, dir)
    // corpus pass 1: the distributed Gramian, collapsed to 2080 rows
    // before its one shuffle; collect is metadata-sized by theorem
    val a = Array.ofDim[Long](64, 64)
    covUpper(e).collect().foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val c = r.getLong(2); a(i)(j) = c; a(j)(i) = c
    }
    def matvec(v: Array[Long]): Array[Long] =
      Array.tabulate(64)(i => (0 until 64).map(j => a(i)(j) * v(j)).sum)
    var v = Array.fill(64)(1L)
    (1 to PowRounds).foreach { _ =>
      val u = matvec(v)
      val um = u.map(math.abs).max
      v = u.map(x =>
        if (um == 0L) 0L else math.floor(1048576.0 * x / um).toLong)
    }
    val uf = matvec(v)
    // A's entries are already milli-scaled covariances, so the raw
    // Rayleigh quotient IS the milli eigenvalue — no extra factor
    val vav = (0 until 64).map(i => BigInt(uf(i)) * BigInt(v(i))).sum
    val vv = (0 until 64).map(i => BigInt(v(i)) * BigInt(v(i))).sum
    val lambdaMilli =
      if (vv == 0) 0L else math.floor(vav.toDouble / vv.toDouble).toLong
    // corpus pass 2: project onto the trained direction (literal)
    e.select(col("label"),
        graft.functions.DotLong(col("q"), typedlit(v.toSeq)).as("p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(dec(col("p"))).as("sp"))
      .select(col("label"), col("n"),
        floor(lit(1e3) * dd(col("sp")) / dd(col("n"))).cast("long")
          .as("mean_proj_milli"),
        lit(lambdaMilli).as("lambda_milli"))
  }

  val embPcaPowerSql: String = {
    // one CTE block per power round, generated from the SAME PowRounds
    val rounds = (1 to PowRounds).map { r =>
      s"""u$r AS (
         |  SELECT a.i, SUM(a.cov_milli * v.vj) AS u
         |  FROM afull a JOIN v${r - 1} v ON a.j = v.j GROUP BY a.i),
         |m$r AS (SELECT MAX(ABS(u)) AS um FROM u$r),
         |v$r AS (
         |  SELECT i AS j,
         |    CASE WHEN um = 0 THEN 0
         |      ELSE CAST(floor(1048576.0 * CAST(u AS DOUBLE)
         |        / CAST(um AS DOUBLE)) AS BIGINT) END AS vj
         |  FROM u$r, m$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $sqlQuantized,
       |$sqlCovCtes,
       |afull AS (
       |  SELECT i, j, cov_milli FROM cov
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov_milli FROM cov WHERE i < j),
       |v0 AS (SELECT unnest(generate_series(0, 63)) AS j,
       |  CAST(1 AS BIGINT) AS vj),
       |$rounds,
       |uf AS (
       |  SELECT a.i, SUM(a.cov_milli * v.vj) AS u
       |  FROM afull a JOIN v$PowRounds v ON a.j = v.j GROUP BY a.i),
       |ray AS (
       |  SELECT CASE
       |    WHEN SUM(CAST(v.vj AS HUGEINT) * CAST(v.vj AS HUGEINT)) = 0 THEN 0
       |    ELSE CAST(floor(
       |      CAST(SUM(CAST(u.u AS HUGEINT) * CAST(v.vj AS HUGEINT)) AS DOUBLE)
       |      / CAST(SUM(CAST(v.vj AS HUGEINT) * CAST(v.vj AS HUGEINT)) AS DOUBLE))
       |      AS BIGINT) END AS lambda_milli
       |  FROM uf u JOIN v$PowRounds v ON u.i = v.j),
       |varr AS (SELECT list(vj ORDER BY j) AS vl FROM v$PowRounds),
       |proj AS (
       |  SELECT n.label,
       |    list_sum(list_transform(generate_series(1, 64),
       |      i -> n.qv[i] * a.vl[i])) AS p
       |  FROM n, varr a)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(floor(1000.0 * CAST(SUM(CAST(p AS HUGEINT)) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mean_proj_milli,
       |  (SELECT lambda_milli FROM ray) AS lambda_milli
       |FROM proj GROUP BY label""".stripMargin
  }

  // ------------------------------------------- k-means training
  /** Full multi-round Lloyd k-means over the quantized corpus — the
    * standalone clustering trainer behind [[knnIvfTrained]]'s
    * single-round quantizer (a production IVF/semantic-dedup build
    * runs Lloyd to convergence, not once). [[KmRounds]] rounds of
    * assign → integer-mean update, then a final assignment that
    * reports each surviving cell's population and exact cohesion
    * (Σ member ppm-cosine to its centroid, an int64).
    *
    * Every round is EXACT: assignment maximizes the integer-operand
    * ppm cosine, the update is the component-wise `floor(Σq_d/cnt)`
    * (int64 sums, one IEEE-exact division), so both engines train the
    * identical model for [[KmRounds]] rounds and the oracle
    * hash-checks the whole trajectory — the unrolled-CTE twin is
    * GENERATED from the same round count, so Spark and SQL can never
    * disagree on the number of rounds.
    *
    * Scale shape per round (×[[KmRounds]]+1, nothing grows with n):
    * one O(n·k) map-side assignment against a ≤[[CentKMax]]-row
    * broadcast, one partial-aggregating `max_by` argmax (shuffles
    * |corpus| rows, not |corpus|·k — see [[argmaxCell]]), and one
    * 64-sum centroid groupBy that collapses to ≤k rows map-side. The
    * corpus is cached once; centroid frames are k-row metadata.
    */
  val KmRounds = 3

  def embKmeansTrain(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val seeds = hashBottomK(e, centK(e.count()))
      .select(col("vec_id").as("cell"), col("q").as("tq"),
        col("norm2").as("tnorm2"))
    def assign(cents: DataFrame): DataFrame =
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("norm2"), col("cell"),
          scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
            .as("cscore"))
    val dimSums = (0 until 64).map(d => sum(col("q")(d)).as(s"d_$d"))
    val trained = (1 to KmRounds).foldLeft(seeds) { (cents, _) =>
      argmaxCell(assign(cents), "cell")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"), dimSums: _*)
        .select(col("cell"), array((0 until 64).map(d =>
          floor(col(s"d_$d").cast("double") / col("cnt")).cast("long")): _*)
          .as("tq"))
        .withColumn("tnorm2", graft.functions.DotLong(col("tq"), col("tq")))
        .where(col("tnorm2") > 0) // a zero centroid has no direction
        // checkpoint the ≤k-row centroid table per round: the next
        // round's broadcast build would otherwise re-evaluate every
        // prior round's corpus assignment through the lazy chain —
        // O(R²) corpus passes instead of the scaladoc'd R+1. LAZY:
        // the next round's broadcast build is the action that
        // materializes it, so each round costs one job, not two.
        .coalesce(1).localCheckpoint(false)
    }
    argmaxCell(assign(trained), "cell", Seq("cscore"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), sum(col("cscore")).as("cohesion_ppm"))
  }

  val embKmeansTrainSql: String = {
    val cdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.tq[i]))"
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val meanList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / cnt) AS BIGINT)").mkString(", ")
    // one CTE block per Lloyd round, generated from the SAME KmRounds
    val rounds = (1 to KmRounds).map { r =>
      s"""assign$r AS (
         |  SELECT v.vec_id, v.qv, c.cell,
         |    ${sqlScorePpm(cdot, "v.norm2", "c.tnorm2")} AS cscore
         |  FROM n v, cent${r - 1} c),
         |home$r AS (
         |  SELECT vec_id, qv, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cscore DESC, cell ASC) AS crnk FROM assign$r)
         |  WHERE crnk = 1),
         |sums$r AS (
         |  SELECT cell, COUNT(*) AS cnt, $dimSums FROM home$r GROUP BY cell),
         |mean$r AS (SELECT cell, [$meanList] AS tq FROM sums$r),
         |cent$r AS (
         |  SELECT cell, tq,
         |    list_sum(list_transform(tq, x -> x * x)) AS tnorm2
         |  FROM mean$r
         |  WHERE list_sum(list_transform(tq, x -> x * x)) > 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |cent0 AS (
       |  SELECT vec_id AS cell, qv AS tq, norm2 AS tnorm2
       |  FROM cranked WHERE hrnk <= $sqlCentK),
       |$rounds,
       |fin AS (
       |  SELECT v.vec_id, c.cell,
       |    ${sqlScorePpm(cdot, "v.norm2", "c.tnorm2")} AS cscore
       |  FROM n v, cent$KmRounds c),
       |homef AS (
       |  SELECT vec_id, cell, cscore FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, cell ASC) AS crnk FROM fin)
       |  WHERE crnk = 1)
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  CAST(SUM(cscore) AS BIGINT) AS cohesion_ppm
       |FROM homef GROUP BY cell""".stripMargin
  }

  // ------------------------------------------- chunk→doc pooling
  /** Chunk→document embedding aggregation: vectors are grouped five
    * to a document (`doc_id = ⌊vec_id/5⌋` on this corpus) and
    * mean-pooled per dimension — the step that turns chunk-level
    * embeddings into the document-level vectors that doc-level
    * semantic dedup / retrieval operate on. Rides along: the pooled
    * vector's exact norm and the document's majority label (ties to
    * the lower label — deterministic in both engines).
    *
    * Exactness: the pool is the component-wise `floor(Σq_d/n)` (int64
    * sums, one IEEE-exact division), the norm is the native integer
    * [[graft.functions.DotLong]], the majority is an integer count
    * argmax. Scale shape: one partial-aggregatable 64-sum groupBy on
    * the doc key (the pooled matrix never exists as an intermediate),
    * one (doc,label) count + per-doc `max_by` argmax — both shuffles
    * carry doc-keyed rows only; nothing is vocabulary- or
    * corpus-squared.
    */
  def embDocPool(spark: SparkSession, dir: String): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    // integer floor-div: exact at any vec_id (a double round-trip
    // loses exactness above 2^53), and nonneg ids make div == floor
    val e = quantized(spark, dir)
      .withColumn("doc_id", expr("vec_id div 5"))
    val dimSums = (0 until 64).map(d => sum(col("q")(d)).as(s"d_$d"))
    val pooled = e.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), dimSums: _*)
      .select(col("doc_id"), col("n_chunks"),
        array((0 until 64).map(d =>
          floor(dd(col(s"d_$d")) / col("n_chunks")).cast("long")): _*)
          .as("pq"))
      .select(col("doc_id"), col("n_chunks"),
        graft.functions.DotLong(col("pq"), col("pq")).as("pool_norm2"))
    val maj = e.groupBy(col("doc_id"), col("label"))
      .agg(count(lit(1)).as("lc"))
      .groupBy(col("doc_id"))
      .agg(max_by(col("label").cast("long"),
        struct(col("lc"), (-col("label")).as("tie"))).as("maj_label"))
    pooled.join(maj, "doc_id")
  }

  val embDocPoolSql: String = {
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val poolList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / n_chunks) AS BIGINT)")
      .mkString(", ")
    s"""WITH $sqlQuantized,
       |c AS (
       |  SELECT vec_id, label, qv,
       |    CAST(vec_id // 5 AS BIGINT) AS doc_id
       |  FROM n),
       |s AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, $dimSums
       |  FROM c GROUP BY doc_id),
       |p AS (SELECT doc_id, n_chunks, [$poolList] AS pq FROM s),
       |pool AS (
       |  SELECT doc_id, n_chunks,
       |    CAST(list_sum(list_transform(pq, x -> x * x)) AS BIGINT)
       |      AS pool_norm2
       |  FROM p),
       |lc AS (SELECT doc_id, label, COUNT(*) AS lc FROM c GROUP BY 1, 2),
       |maj AS (
       |  SELECT doc_id, CAST(label AS BIGINT) AS maj_label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY lc DESC, label ASC) AS r FROM lc)
       |  WHERE r = 1)
       |SELECT pool.doc_id, n_chunks, pool_norm2, maj_label
       |FROM pool JOIN maj USING (doc_id)""".stripMargin
  }

  // --------------------------------------------------- binary kNN
  /** Binary-quantization ANN (the 1-bit family — FAISS
    * `IndexBinaryFlat` after sign quantization, and the "binary
    * quantization" mode shipping in production vector stores): each
    * dimension compresses to ONE bit (is the component above the
    * corpus mean for that dimension?), the 64 bits pack into two
    * 32-bit words, and candidates are ranked by Hamming distance —
    * two XOR+popcount ops per pair, the cheapest candidate scan of
    * any quantization family (8 bytes/vector vs SQ8's 64, PQ's 8 +
    * LUT). Top-[[PqRerank]] re-ranked by exact cosine, same tail as
    * every other family so recall is directly comparable.
    *
    * Determinism: the threshold test `qᵢ·n > Σᵢ` is an exact integer
    * comparison (no division), bit packing is an exact integer sum of
    * distinct powers of two ≤ 2³¹, and Hamming is popcount over
    * bit-identical words in both engines. Scale shape: the stats pass
    * is a 64-key aggregate with map-side combine; the 2-row packed
    * stats broadcast back; coding is pure per-row expressions; the
    * candidate scan streams 16 bytes/vector past the broadcast
    * queries — and at 10¹⁰ vectors binary codes compose with IVF
    * cells the same way SQ8/PQ do upstream.
    */
  def knnBinary(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // stats + coding + re-rank reads
    val stats = e.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
    val packed = stats
      .agg(sort_array(collect_list(struct(col("i"), col("s")))).as("st"),
        max(col("cnt")).as("cn"))
      .select(transform(col("st"), s => s.getField("s")).as("sums"),
        col("cn"))
    val codes = e.crossJoin(broadcast(packed))
      .withColumn("bits", transform(col("q"), (x, i) =>
        when(x * col("cn") > element_at(col("sums"), (i + 1).cast("int")),
          lit(1L)).otherwise(lit(0L))))
      .withColumn("w1", expr("aggregate(sequence(1, 32), 0L, " +
        "(acc, i) -> acc + element_at(bits, i) * shiftleft(1L, i - 1))"))
      .withColumn("w2", expr("aggregate(sequence(33, 64), 0L, " +
        "(acc, i) -> acc + element_at(bits, i) * shiftleft(1L, i - 33))"))
      .select(col("vec_id"), col("w1"), col("w2"))
    val qs = codes.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("w1").as("qw1"),
        col("w2").as("qw2"))
    val approx = broadcast(qs).join(codes, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (bit_count(col("qw1").bitwiseXOR(col("w1"))) +
          bit_count(col("qw2").bitwiseXOR(col("w2")))).as("hamming"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    val cands = approx.withColumn("crnk", row_number().over(wCand))
      .where(col("crnk") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    exactRerank(e, cands)
  }

  val knnBinarySql: String =
    s"""WITH $sqlQuantized,
       |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
       |stats AS (
       |  SELECT i, CAST(SUM(qv[i]) AS BIGINT) AS s FROM n, dims GROUP BY i),
       |cnt AS (SELECT COUNT(*) AS cn FROM n),
       |packed AS (SELECT list(s ORDER BY i) AS sums FROM stats),
       |bits AS (
       |  SELECT vec_id, list_transform(generate_series(1, 64),
       |    i -> CASE WHEN qv[i] * cn > sums[i]
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS b
       |  FROM n, packed, cnt),
       |codes AS (
       |  SELECT vec_id,
       |    list_sum(list_transform(generate_series(1, 32),
       |      i -> b[i] * (CAST(1 AS BIGINT) << CAST(i - 1 AS INT)))) AS w1,
       |    list_sum(list_transform(generate_series(33, 64),
       |      i -> b[i] * (CAST(1 AS BIGINT) << CAST(i - 33 AS INT)))) AS w2
       |  FROM bits),
       |approx AS (
       |  SELECT a.vec_id AS query_id, c.vec_id,
       |    bit_count(xor(a.w1, c.w1)) + bit_count(xor(a.w2, c.w2)) AS hamming
       |  FROM codes a JOIN codes c ON a.vec_id < 10 AND a.vec_id <> c.vec_id),
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY hamming ASC, vec_id ASC) AS crnk
       |    FROM approx) WHERE crnk <= $PqRerank),
       |$sqlExactRerank""".stripMargin

  // --------------------------------------------------- MRR report
  /** Mean-reciprocal-rank report: for each held-out query and each
    * approximate family (trained IVF, SQ8), where did the TRUE
    * nearest neighbor land in the approximate top-[[TopK]]? Recall@k
    * ([[knnRecallReport]]) says how much of the answer set survives;
    * MRR says whether the single best answer surfaces FIRST — the
    * metric that matters when a RAG pipeline only reads the top hit.
    * `rr_ppm = ⌊10⁶/rank⌋` exactly (integer division), 0 when the
    * true top-1 is missed entirely; per-(family, query) rows so the
    * mean and the worst query are both one aggregation away.
    *
    * Scale shape: three held-out searches (each already scale-audited
    * in its own query) + two broadcast-sized joins on (query, id) —
    * the report itself is |families|·|queries| rows.
    */
  def knnMrrReport(spark: SparkSession, dir: String): DataFrame = {
    // ground truth AND both family searches are published session
    // artifacts — the report is |families|·|queries| rows of joins
    // over tables other build jobs already paid for; the oracle still
    // recomputes all three sides from the raw corpus
    val bt = bruteHeldoutArt(spark, dir).where(col("rnk") === 1)
      .select(col("query_id"), col("vec_id").as("true_top1"))
    def fam(name: String, df: DataFrame): DataFrame = {
      val hits = df.select(col("query_id"),
        col("vec_id").as("true_top1"), col("rnk").as("found"))
      bt.join(broadcast(hits), Seq("query_id", "true_top1"), "left")
        .select(lit(name).as("family"), col("query_id"), col("true_top1"),
          coalesce(col("found"), lit(0L)).as("found_rank"),
          coalesce(expr("1000000 div found"), lit(0L)).as("rr_ppm"))
    }
    fam("ivf_trained", ivfHeldoutArt(spark, dir))
      .unionByName(fam("sq8", sq8HeldoutArt(spark, dir)))
  }

  val knnMrrReportSql: String = {
    def block(name: String, sql: String): String =
      s"""SELECT '$name' AS family, bt.query_id, bt.true_top1,
         |  COALESCE(a.rnk, 0) AS found_rank,
         |  COALESCE(1000000 // a.rnk, 0) AS rr_ppm
         |FROM bt LEFT JOIN ($sql) a
         |  ON bt.query_id = a.query_id AND a.vec_id = bt.true_top1"""
        .stripMargin
    s"""WITH bt AS (
       |  SELECT query_id, vec_id AS true_top1
       |  FROM ($knnBruteHeldoutSql) WHERE rnk = 1)
       |${block("ivf_trained", knnIvfTrainedHeldoutSql)}
       |UNION ALL
       |${block("sq8", knnSq8HeldoutSql)}""".stripMargin
  }

  // ------------------------------------------- nprobe tuning curve
  /** IVF nprobe tuning curve: recall@[[TopK]] and candidate-scan cost
    * at nprobe ∈ {1, 2, 4, 8} — the accuracy/cost frontier an
    * operator reads to SET [[NProbe]] instead of inheriting it. Each
    * row is one operating point: how much of the exact top-k the
    * probe admits, and how many candidate rows the search had to
    * score to get it.
    *
    * Cost shape: this is ONE search at the maximum nprobe, not four —
    * candidates are scored once with their cell's probe rank
    * attached, and each curve point is a filter + re-rank over that
    * cached pool (pool size = the 10 queries' probed-cell mass, ~
    * maxP/k of the corpus). The exact baseline is the same
    * broadcast-query brute scan as [[knnBruteForce]]. Everything
    * downstream of the two scans aggregates to 4 rows.
    */
  val NprobeCurve = Seq(1, 2, 4, 8)

  def knnNprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    // the exact baseline is the PUBLISHED ground truth (knn_brute_force
    // is its build job) — k·|queries| rows read, not a corpus scan;
    // the oracle still derives it from the raw corpus
    val exact = bruteTopk(spark, dir)
      .select(col("query_id"), col("vec_id"))
    // the SHARED coarse stage at the deepest probe — the curve grades
    // the very index knn_ivf searches, by construction
    val (cells, qprobe) = ivfCoarse(e, NprobeCurve.max)
    val cand = broadcast(qprobe).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cell_rank"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
      .cache() // 8 curve aggregates read the one scored pool
    NprobeCurve.map { p =>
      val sel = cand.where(col("cell_rank") <= lit(p.toLong))
      val hits = sel
        .withColumn("rnk", row_number().over(wTop)).where(col("rnk") <= TopK)
        .join(broadcast(exact), Seq("query_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val scanned = sel.agg(count(lit(1)).as("n_scanned"))
      hits.crossJoin(scanned)
        .select(lit(p.toLong).as("nprobe"),
          ppm(col("n_hits"), lit(10L * TopK)).as("recall_ppm"),
          col("n_scanned"))
    }.reduce(_ unionByName _)
  }

  // ------------------------------------------- rerank-depth curve
  /** Re-rank-depth tuning curve — the SECOND IVFPQ knob beside
    * [[knnNprobeCurve]]'s probe depth: recall@10 of the raw-coded
    * IVF×PQ chain as the exact-re-rank tail widens over
    * [[RerankCurve]] candidates. ADC approximation error is what the
    * re-rank repairs, so recall climbs with depth and saturates at
    * the probed-cell pool's ceiling (the nprobe curve's territory);
    * where it saturates on YOUR data is how you size the only
    * full-vector reads the search performs. One ADC-scored candidate
    * pool (the very [[knnIvfPq]] dataflow, shared helpers) feeds
    * every curve point — each point is a filter + re-rank over the
    * cached frame, the [[knnNprobeCurve]] discipline.
    *
    * Recall is monotone in depth BY CONSTRUCTION (a deeper re-rank
    * set contains the shallower one; exact top-10 of a superset can
    * only hit more of the true top-10 — spec-pinned along with the
    * deepest point's agreement ceiling).
    */
  val RerankCurve = Seq(10, 20, 50, 100)

  def knnRerankCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    try {
    // exact baseline = the published ground truth (see knnNprobeCurve)
    val exact = bruteTopk(spark, dir)
      .select(col("query_id"), col("vec_id"))
    val (cells, qprobe) = ivfCoarse(e)
    val cand = broadcast(qprobe.select(col("query_id"), col("cell")))
      .join(cells.select(col("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val seeds = pqSeeds(e)
    val codes = pqCodes(e, seeds)
    val lut = pqLut(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq")), seeds)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    val ranked = cand.join(codes, "vec_id")
      .join(broadcast(lut), Seq("query_id", "s", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("approx_dot"))
      .withColumn("crnk", row_number().over(wApprox))
      .cache() // every curve point filters the one scored pool
    try {
      // exact-score the DEEPEST pool once — every curve point is then
      // a filter + window over this ≤|queries|·max(RerankCurve)-row
      // frame instead of its own corpus join (the knnNprobeCurve
      // score-once discipline, applied to the re-rank tail too)
      val qs = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qq"),
          col("norm2").as("qnorm2"))
      val scoredAll = ranked.where(col("crnk") <= RerankCurve.max)
        .select(col("query_id"), col("vec_id"), col("crnk"))
        .join(broadcast(qs), "query_id")
        .join(e.select(col("vec_id"), col("q"), col("norm2")), "vec_id")
        .select(col("query_id"), col("vec_id"), col("crnk"),
          scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
            .as("score_ppm"))
        .coalesce(1) // ≤ 10·100 rows
        .localCheckpoint(true)
      val wExact = Window.partitionBy(col("query_id"))
        .orderBy(col("score_ppm").desc, col("vec_id").asc)
      RerankCurve.map { rr =>
        val sel = scoredAll.where(col("crnk") <= rr)
        val hits = sel.withColumn("rnk", row_number().over(wExact))
          .where(col("rnk") <= TopK)
          .join(broadcast(exact), Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        val scanned = sel.agg(count(lit(1)).as("n_reranked"))
        hits.crossJoin(scanned)
          .select(lit(rr.toLong).as("rerank"),
            ppm(col("n_hits"), lit(10L * TopK)).as("recall_ppm"),
            col("n_reranked"))
      }.reduce(_ unionByName _)
        // eager 4-row materialization so the finally can release the
        // scored pool — the dedupLshCurve discipline
        .localCheckpoint(true)
    } finally ranked.unpersist()
    } finally e.unpersist()
  }

  val knnRerankCurveSql: String = {
    val adot =
      "list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i]))"
    val points = RerankCurve.map { rr =>
      s"""SELECT CAST($rr AS BIGINT) AS rerank,
         |  ${sqlPpm("h.n_hits", s"10 * $TopK")} AS recall_ppm,
         |  s.n_reranked
         |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_reranked
         |      FROM rankedapprox WHERE crnk <= $rr) s,
         |  (SELECT COUNT(*) AS n_hits FROM (
         |     SELECT query_id, vec_id FROM (
         |       SELECT c.query_id, c.vec_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |           ORDER BY ${sqlScorePpm(adot, "a.norm2", "b.norm2")} DESC,
         |             c.vec_id ASC) AS rnk
         |       FROM rankedapprox c
         |       JOIN n a ON c.query_id = a.vec_id
         |       JOIN n b ON c.vec_id = b.vec_id
         |       WHERE c.crnk <= $rr) WHERE rnk <= $TopK) t
         |   WHERE EXISTS (SELECT 1 FROM exact e
         |     WHERE e.query_id = t.query_id AND e.vec_id = t.vec_id)) h"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |exact AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} DESC,
       |          b.vec_id ASC) AS rnk
       |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
       |  WHERE rnk <= $TopK),
       |${sqlIvfCtes()},
       |cand AS (
       |  SELECT p.query_id, b.vec_id
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id),
       |$sqlPqCtes,
       |approx AS (
       |  SELECT cd.query_id, cd.vec_id, CAST(SUM(l.qd) AS BIGINT) AS approx_dot
       |  FROM cand cd
       |  JOIN codes c ON c.vec_id = cd.vec_id
       |  JOIN lut l ON l.query_id = cd.query_id AND l.s = c.s AND l.cid = c.cid
       |  GROUP BY 1, 2),
       |rankedapprox AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY approx_dot DESC, vec_id ASC) AS crnk
       |  FROM approx)
       |$points""".stripMargin
  }

  val knnNprobeCurveSql: String = {
    val pdot =
      "list_sum(list_transform(generate_series(1, 64), i -> p.qq[i] * b.qv[i]))"
    val points = NprobeCurve.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
         |  ${sqlPpm("h.n_hits", s"10 * $TopK")} AS recall_ppm,
         |  s.n_scanned
         |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_scanned
         |      FROM cand WHERE cell_rank <= $p) s,
         |  (SELECT COUNT(*) AS n_hits FROM (
         |     SELECT query_id, vec_id FROM (
         |       SELECT query_id, vec_id, row_number() OVER (
         |         PARTITION BY query_id
         |         ORDER BY score_ppm DESC, vec_id ASC) AS rnk
         |       FROM cand WHERE cell_rank <= $p) WHERE rnk <= $TopK) t
         |   WHERE EXISTS (SELECT 1 FROM exact e
         |     WHERE e.query_id = t.query_id AND e.vec_id = t.vec_id)) h"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |exact AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} DESC,
       |          b.vec_id ASC) AS rnk
       |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
       |  WHERE rnk <= $TopK),
       |${sqlIvfCtes(NprobeCurve.max)},
       |cand AS (
       |  SELECT p.query_id, b.vec_id, p.cell_rank,
       |    ${sqlScorePpm(pdot, "p.qn", "b.norm2")} AS score_ppm
       |  FROM qprobe p JOIN cells b
       |    ON p.cell = b.cell AND p.query_id <> b.vec_id)
       |$points""".stripMargin
  }

  // ------------------------------------------- filtered search eval
  /** Attribute-FILTERED vector search, pre- vs post-filter: for each
    * query, the truth is the exact top-[[TopK]] restricted to corpus
    * vectors sharing the query's label (pre-filtering — search the
    * predicate's subset); the contender is the production shortcut of
    * searching unfiltered, keeping the top [[PqRerank]], then
    * applying the label predicate (post-filtering). The report says,
    * per query, how much of the true filtered answer the shortcut
    * recovers and how many of its k slots it even fills — THE
    * operational question of filtered ANN: post-filtering collapses
    * exactly when the predicate is selective, and `n_matching` (the
    * predicate's corpus selectivity) is printed beside the damage so
    * the correlation is visible in the report itself.
    *
    * Scale shape: ONE broadcast-query corpus scan scores everything;
    * both variants are windows over that scored frame (the label
    * rides along — no second scan, no join). Exact integer scores;
    * recall in ppm of k.
    */
  def knnFilteredEval(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("q").as("qq"), col("norm2").as("qnorm2"))
    val scored = broadcast(qs).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("score_ppm"))
      .cache() // both variants + selectivity read the one scan
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    val pre = scored.where(col("label") === col("qlabel"))
      .withColumn("rnk", row_number().over(wTop)).where(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id"))
    val post = scored
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= PqRerank && col("label") === col("qlabel"))
      .withColumn("frnk", row_number().over(wTop)).where(col("frnk") <= TopK)
      .select(col("query_id"), col("vec_id"))
    val nMatch = scored.where(col("label") === col("qlabel"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_matching"))
    val nPost = post.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_post_filled"))
    val nHit = post.join(pre, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    qs.select(col("query_id"), col("qlabel").cast("long").as("label"))
      .join(nMatch, Seq("query_id"), "left")
      .join(nPost, Seq("query_id"), "left")
      .join(nHit, Seq("query_id"), "left")
      .select(col("query_id"), col("label"),
        coalesce(col("n_matching"), lit(0L)).as("n_matching"),
        coalesce(col("n_post_filled"), lit(0L)).as("n_post_filled"),
        ppm(coalesce(col("n_hits"), lit(0L)), lit(TopK.toLong))
          .as("recall_ppm"))
  }

  val knnFilteredEvalSql: String =
    s"""WITH $sqlQuantized,
       |qs AS (
       |  SELECT vec_id AS query_id, label AS qlabel, qv AS qq,
       |    norm2 AS qn
       |  FROM n WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, q.qlabel, b.vec_id, b.label,
       |    ${sqlScorePpm(
            "list_sum(list_transform(generate_series(1, 64), " +
              "i -> q.qq[i] * b.qv[i]))", "q.qn", "b.norm2")} AS score_ppm
       |  FROM qs q JOIN n b ON q.query_id <> b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_ppm DESC, vec_id ASC) AS rnk
       |  FROM scored),
       |pre AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS prnk
       |    FROM scored WHERE label = qlabel) WHERE prnk <= $TopK),
       |post AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY score_ppm DESC, vec_id ASC) AS frnk
       |    FROM ranked WHERE rnk <= $PqRerank AND label = qlabel)
       |  WHERE frnk <= $TopK),
       |nmatch AS (
       |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_matching
       |  FROM scored WHERE label = qlabel GROUP BY query_id),
       |npost AS (
       |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_post_filled
       |  FROM post GROUP BY query_id),
       |nhit AS (
       |  SELECT p.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM post p JOIN pre e
       |    ON p.query_id = e.query_id AND p.vec_id = e.vec_id
       |  GROUP BY p.query_id)
       |SELECT q.query_id, CAST(q.qlabel AS BIGINT) AS label,
       |  COALESCE(m.n_matching, 0) AS n_matching,
       |  COALESCE(f.n_post_filled, 0) AS n_post_filled,
       |  ${sqlPpm("COALESCE(h.n_hits, 0)", s"$TopK")} AS recall_ppm
       |FROM qs q
       |LEFT JOIN nmatch m ON q.query_id = m.query_id
       |LEFT JOIN npost f ON q.query_id = f.query_id
       |LEFT JOIN nhit h ON q.query_id = h.query_id""".stripMargin

  // ------------------------------------------- embedding drift
  /** Embedding-space drift monitor: split the corpus into an "old"
    * and a "new" half (md5 parity — the deterministic stand-in for
    * yesterday/today), train the quantizer on the OLD half only,
    * assign BOTH halves to its frozen cells, and report the cells
    * whose occupancy SHARE moved most (|new share − old share| in
    * ppm, top [[DriftTop]], ties to the lower cell id). This is the
    * retrieval-side distribution-drift alarm: an embedding model
    * update, a crawler regime change, or a new content type shows up
    * as mass migrating between cells long before recall metrics
    * move — the embedding twin of `dq_distribution_drift`'s histogram
    * L1, with the trained quantizer as the binning.
    *
    * Scale shape: one train pass on the old half (the same bounded
    * ⌈√n⌉-clamped broadcast Lloyd as every trained search) + one
    * O(n·k) assignment of the full corpus + a ≤k-row occupancy
    * rollup; shares are exact integer ppm.
    */
  val DriftTop = 16

  private def isNewHalf: Column =
    graft.functions.CrossHash.md5Long(col("vec_id").cast("string")) % 2 === 1

  def embDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // split + train + assignment
    val trained = trainIvf(e.where(!isNewHalf))
    val assign = e.crossJoin(broadcast(trained))
      .select(col("vec_id"), isNewHalf.as("is_new"), col("cell"),
        scorePpm(dot(col("q"), col("tq")), col("norm2"), col("tnorm2"))
          .as("cscore"))
    val cells = argmaxCell(assign, "cell", Seq("is_new"))
    val counts = cells.groupBy(col("cell"))
      .agg(count(when(!col("is_new"), lit(1))).as("n_old"),
        count(when(col("is_new"), lit(1))).as("n_new"))
    val totals = counts
      .agg(sum(col("n_old")).as("tot_old"), sum(col("n_new")).as("tot_new"))
    counts.crossJoin(broadcast(totals))
      .select(col("cell"), col("n_old"), col("n_new"),
        ppm(col("n_old"), col("tot_old")).as("share_old_ppm"),
        ppm(col("n_new"), col("tot_new")).as("share_new_ppm"))
      .withColumn("drift_ppm",
        abs(col("share_new_ppm") - col("share_old_ppm")))
      .orderBy(col("drift_ppm").desc, col("cell").asc)
      .limit(DriftTop)
  }

  val embDriftSql: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("CAST(vec_id AS VARCHAR)")
    val sdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.cq[i]))"
    val tdot =
      "list_sum(list_transform(generate_series(1, 64), i -> v.qv[i] * c.tq[i]))"
    val dimSums = (0 until 64).map(d => s"SUM(qv[${d + 1}]) AS d_$d")
      .mkString(", ")
    val meanList = (0 until 64).map(d =>
      s"CAST(floor(CAST(d_$d AS DOUBLE) / cnt) AS BIGINT)").mkString(", ")
    s"""WITH $sqlQuantized,
       |old AS (SELECT vec_id, qv, norm2 FROM n WHERE $h % 2 = 0),
       |crankedo AS (
       |  SELECT vec_id, qv, norm2, row_number() OVER (
       |    ORDER BY $h, vec_id) AS hrnk
       |  FROM old),
       |seeds AS (
       |  SELECT vec_id AS centroid_id, qv AS cq, norm2 AS cnorm2
       |  FROM crankedo
       |  WHERE hrnk <= GREATEST($CentKMin, LEAST($CentKMax,
       |    CAST(ceil(sqrt((SELECT COUNT(*) FROM old))) AS BIGINT)))),
       |assign0 AS (
       |  SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
       |    ${sqlScorePpm(sdot, "v.norm2", "c.cnorm2")} AS cscore
       |  FROM old v, seeds c),
       |cell0 AS (
       |  SELECT vec_id, qv, norm2, centroid_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, centroid_id ASC) AS crnk
       |    FROM assign0) WHERE crnk = 1),
       |sums AS (
       |  SELECT cell, COUNT(*) AS cnt, $dimSums
       |  FROM cell0 GROUP BY cell),
       |trained0 AS (
       |  SELECT cell, [$meanList] AS tq FROM sums),
       |trained AS (
       |  SELECT cell, tq,
       |    list_sum(list_transform(tq, x -> x * x)) AS tnorm2
       |  FROM trained0
       |  WHERE list_sum(list_transform(tq, x -> x * x)) > 0),
       |assignall AS (
       |  SELECT v.vec_id, ($h % 2 = 1) AS is_new, c.cell,
       |    ${sqlScorePpm(tdot, "v.norm2", "c.tnorm2")} AS cscore
       |  FROM n v, trained c),
       |acells AS (
       |  SELECT vec_id, is_new, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, cell ASC) AS crnk
       |    FROM assignall) WHERE crnk = 1),
       |counts AS (
       |  SELECT cell,
       |    CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS n_old,
       |    CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new
       |  FROM acells GROUP BY cell),
       |tot AS (
       |  SELECT SUM(n_old) AS tot_old, SUM(n_new) AS tot_new FROM counts)
       |SELECT cell, n_old, n_new,
       |  ${sqlPpm("n_old", "tot_old")} AS share_old_ppm,
       |  ${sqlPpm("n_new", "tot_new")} AS share_new_ppm,
       |  abs(${sqlPpm("n_new", "tot_new")} - ${sqlPpm("n_old", "tot_old")})
       |    AS drift_ppm
       |FROM counts, tot
       |ORDER BY drift_ppm DESC, cell ASC
       |LIMIT $DriftTop""".stripMargin
  }

  // ------------------------------------------- dimension curve
  /** Embedding-truncation recall curve (the Matryoshka question): how
    * much exact-search quality survives keeping only the first
    * d ∈ {8, 16, 32, 64} dimensions? Each point is a full brute-force
    * search in the truncated space — cosine over the PREFIX of the
    * quantized vector — measured as recall@[[TopK]] against the
    * full-dimension exact answer. The d = 64 point is the search
    * itself, recall 10⁶ by construction, which doubles as the
    * curve's self-check. This is the table a storage owner reads
    * before cutting the vector bill 8× — the dimension twin of the
    * quantization family's bits-per-dim tradeoffs.
    *
    * Scale shape: one broadcast-query corpus scan per point with
    * dot cost ∝ d (Σd ≈ 2·64, about twice one full search); ranking
    * windows run per query over scored rows exactly as brute force.
    * Determinism: prefix dots and prefix norms are exact int64 sums;
    * recall is an integer ppm.
    */
  val DimCurve = Seq(8, 16, 32, 64)

  def knnDimCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id").asc)
    def topAt(d: Int): DataFrame = {
      val (qd, cd) = (slice(col("qq"), 1, d), slice(col("q"), 1, d))
      val qs = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qq"))
      broadcast(qs).join(e, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"),
          scorePpm(dot(qd, cd), dot(qd, qd), dot(cd, cd)).as("score_ppm"))
        .withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= TopK)
        .select(col("query_id"), col("vec_id"))
    }
    // the full-dimension baseline IS the published ground truth
    // (topAt(64) ≡ knn_brute_force: same scores, same tie order) — and
    // the d = 64 point still computes topAt(64) LIVE and joins it
    // against the published table, so the by-construction recall-10⁶
    // self-check now also proves the artifact equals the live search
    val exact = bruteTopk(spark, dir)
      .select(col("query_id"), col("vec_id"))
    DimCurve.map { d =>
      topAt(d).join(broadcast(exact), Seq("query_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d.toLong).as("dims"),
          ppm(col("n_hits"), lit(10L * TopK)).as("recall_ppm"))
    }.reduce(_ unionByName _)
  }

  val knnDimCurveSql: String = {
    def pdot(d: Int) =
      s"list_sum(list_transform(generate_series(1, $d), i -> a.qv[i] * b.qv[i]))"
    def pnorm(side: String, d: Int) =
      s"list_sum(list_transform(generate_series(1, $d), i -> $side.qv[i] * $side.qv[i]))"
    def topCte(name: String, d: Int) =
      s"""$name AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${sqlScorePpm(pdot(d), pnorm("a", d),
                  pnorm("b", d))} DESC, b.vec_id ASC) AS rnk
         |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
         |  WHERE rnk <= $TopK)""".stripMargin
    val points = DimCurve.map { d =>
      val hits = s"(SELECT COUNT(*) FROM top$d t JOIN top64 e " +
        "ON t.query_id = e.query_id AND t.vec_id = e.vec_id)"
      s"""SELECT CAST($d AS BIGINT) AS dims,
         |  ${sqlPpm(hits, s"10 * $TopK")} AS recall_ppm""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $sqlQuantized,
       |${DimCurve.map(d => topCte(s"top$d", d)).mkString(",\n")}
       |$points""".stripMargin
  }

  // ------------------------------------------- MMR diversified kNN
  /** Maximal-marginal-relevance top-k (Carbonell & Goldstein 1998) —
    * DIVERSIFIED retrieval: greedily pick the candidate maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` so the result set trades
    * raw relevance for coverage. This is the retrieval shape RAG
    * context assembly actually wants (10 near-identical passages
    * waste 9 context slots); none of the plain top-k families can
    * express it because the objective depends on what was already
    * selected. λ = ½, so the integer objective is
    * `mmr_ppm = rel_ppm − max_sim_ppm` (both sides scaled by 2; the
    * empty-set max is 0 by convention, making step 1 the plain
    * relevance argmax).
    *
    * Scale shape: the distributed work is the candidate generation —
    * the same broadcast-query corpus scan as brute force, keeping the
    * top-[[MmrPool]] per query. The greedy loop then runs on a
    * localCheckpointed ≤|queries|·[[MmrPool]]-row frame (pool
    * pairwise sims: ≤|queries|·[[MmrPool]]² rows) — corpus-size-
    * independent, exactly like the trained-quantizer mirrors
    * elsewhere in this file. [[MmrK]] unrolled argmax steps, each a
    * broadcast join on the tiny frames. The oracle twin is a
    * GENERATED unrolled-CTE program sharing the step count.
    */
  val MmrK = 5
  val MmrPool = 20

  def knnMmr(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache() // queries + scan + pool vectors
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("qnorm2"))
    val scored = broadcast(qs).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
          .as("rel_ppm"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel_ppm").desc, col("vec_id").asc)
    val candKeys = scored.withColumn("crnk", row_number().over(wRel))
      .where(col("crnk") <= MmrPool)
      .select(col("query_id"), col("vec_id"), col("rel_ppm"))
    // vectors re-attach via a BROADCAST of the ≤|queries|·MmrPool key
    // frame — the corpus side streams, it is never shuffled on vec_id
    val cands = e.select(col("vec_id"), col("q"), col("norm2"))
      .join(broadcast(candKeys), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("rel_ppm"), col("q"),
        col("norm2"))
      .localCheckpoint(false) // ≤ 10·MmrPool rows; ends the corpus's
      // lineage. LAZY, like every checkpoint in this derivation: the
      // caller's one action materializes the whole greedy walk (each
      // step persists, so nothing is recomputed across steps) instead
      // of one eager job per checkpoint — and the corpus cache has no
      // unpersist here, so deferral is safe
    val sims = cands
      .select(col("query_id"), col("vec_id").as("a_id"), col("q").as("aq"),
        col("norm2").as("an"))
      .join(cands.select(col("query_id"), col("vec_id").as("b_id"),
        col("q").as("bq"), col("norm2").as("bn")), Seq("query_id"))
      .where(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        scorePpm(dot(col("aq"), col("bq")), col("an"), col("bn"))
          .as("sim_ppm"))
      .localCheckpoint(false) // ≤ 10·MmrPool² rows
    val slim = cands.select(col("query_id"), col("vec_id"), col("rel_ppm"))
    var selected = slim.withColumn("r", row_number().over(wRel))
      .where(col("r") === 1)
      .select(col("query_id"), col("vec_id"), lit(1L).as("rnk"),
        col("rel_ppm"), col("rel_ppm").as("mmr_ppm"))
    for (t <- 2 to MmrK) {
      val selKeys = selected.select(col("query_id"), col("vec_id"))
      val maxSim = sims
        .join(selKeys.withColumnRenamed("vec_id", "b_id"),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id"))
        .agg(max(col("sim_ppm")).as("max_sim"))
        .withColumnRenamed("a_id", "vec_id")
      val wMmr = Window.partitionBy(col("query_id"))
        .orderBy(col("mmr").desc, col("vec_id").asc)
      val step = slim.join(selKeys, Seq("query_id", "vec_id"), "left_anti")
        .join(maxSim, Seq("query_id", "vec_id"))
        .withColumn("mmr", col("rel_ppm") - col("max_sim"))
        .withColumn("r", row_number().over(wMmr)).where(col("r") === 1)
        .select(col("query_id"), col("vec_id"), lit(t.toLong).as("rnk"),
          col("rel_ppm"), col("mmr").as("mmr_ppm"))
      // EAGER per step: each step's selKeys feed two lazy-broadcast
      // builds; leaving the chain lazy made those broadcast threads
      // re-materialize overlapping prefixes (measured: tasks 2x). The
      // first eager step also materializes the lazy cands/sims above.
      selected = selected.unionByName(step).localCheckpoint()
    }
    selected
  }

  val knnMmrSql: String = {
    def selUnion(t: Int): String =
      (1 until t).map(i => s"SELECT query_id, vec_id FROM s$i")
        .mkString(" UNION ALL ")
    val steps = (2 to MmrK).map { t =>
      s"""s$t AS (
         |  SELECT query_id, vec_id, CAST($t AS BIGINT) AS rnk, rel_ppm,
         |    mmr AS mmr_ppm
         |  FROM (
         |    SELECT c.query_id, c.vec_id, c.rel_ppm,
         |      c.rel_ppm - ms.max_sim AS mmr,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY c.rel_ppm - ms.max_sim DESC, c.vec_id ASC) AS r
         |    FROM cands c
         |    JOIN (SELECT s.query_id, s.a_id, MAX(s.sim_ppm) AS max_sim
         |          FROM sims s JOIN (${selUnion(t)}) sel
         |            ON s.query_id = sel.query_id AND s.b_id = sel.vec_id
         |          GROUP BY s.query_id, s.a_id) ms
         |      ON ms.query_id = c.query_id AND ms.a_id = c.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM (${selUnion(t)}) sel2
         |      WHERE sel2.query_id = c.query_id
         |        AND sel2.vec_id = c.vec_id)
         |  ) WHERE r = 1)""".stripMargin
    }.mkString(",\n")
    val simDot =
      "list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i]))"
    s"""WITH $sqlQuantized,
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id,
       |    ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS rel_ppm
       |  FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, rel_ppm, row_number() OVER (
       |    PARTITION BY query_id
       |    ORDER BY rel_ppm DESC, vec_id ASC) AS crnk
       |  FROM scored),
       |cands AS (
       |  SELECT query_id, vec_id, rel_ppm FROM ranked WHERE crnk <= $MmrPool),
       |cv AS (
       |  SELECT c.query_id, c.vec_id, n.qv, n.norm2
       |  FROM cands c JOIN n ON c.vec_id = n.vec_id),
       |sims AS (
       |  SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${sqlScorePpm(simDot, "a.norm2", "b.norm2")} AS sim_ppm
       |  FROM cv a JOIN cv b
       |    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT query_id, vec_id, CAST(1 AS BIGINT) AS rnk, rel_ppm,
       |    rel_ppm AS mmr_ppm
       |  FROM ranked WHERE crnk = 1),
       |$steps
       |${(1 to MmrK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")}
       |""".stripMargin
  }

  // ------------------------------------- persisted IVF index search
  /** [[knnIvf]] through a PERSISTED index: the inverted file is
    * materialized to parquet `partitionBy(cell)` — the on-disk layout
    * a production vector index actually has (one directory per
    * coarse cell) — and the search reads it back touching ONLY the
    * probed cells via partition pruning (`cell IN (...)` lands in the
    * scan's PartitionFilters; unprobed directories are never opened,
    * spec-pinned). Build once, search many: at 10^9 vectors the
    * search I/O is nprobe/nlist of the index regardless of corpus
    * size, and the build cost amortizes across every later query —
    * the separation [[knnIvf]] (recompute per run) cannot offer.
    *
    * The probe list is collected to the driver — bounded by
    * |queries|·nprobe, never corpus-sized — because a search service
    * KNOWS its probe cells; making them literals is what turns them
    * into static partition pruning instead of a join.
    *
    * Same cells, same probes, same re-rank ⇒ results are identical to
    * [[knnIvf]] by construction, so it shares [[knnIvfSql]] — the
    * oracle re-proves the parquet round-trip is exact every run.
    */
  def knnIvfPersisted(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir).cache()
    try {
      val (cells, qprobe) = ivfCoarse(e)
      val outPath = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"graft_ivf_index_${java.util.UUID.randomUUID().toString.take(8)}")
      val fs = outPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      try {
        cells.write.partitionBy("cell").mode("overwrite")
          .parquet(outPath.toString)
        val probes = qprobe.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted
        val idx = spark.read.parquet(outPath.toString)
          .where(col("cell").isin(probes: _*))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_ppm").desc, col("vec_id").asc)
        broadcast(qprobe).join(idx, Seq("cell"))
          .where(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id"),
            scorePpm(dot(col("qq"), col("q")), col("qnorm2"), col("norm2"))
              .as("score_ppm"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .where(col("rnk") <= TopK)
          .localCheckpoint(true) // eager: the finally deletes the index
      } finally fs.delete(outPath, true)
    } finally e.unpersist()
  }

  // ---------------------------------------- hybrid retrieval (RRF)
  /** Hybrid retrieval: an Okapi BM25 sparse ranking and a dense
    * cosine ranking, fused per query by Reciprocal Rank Fusion
    * (Cormack et al. 2009) — `Σ 1/(60 + rank)` over the rankers that
    * returned the document, the standard zero-tuning fusion behind
    * production hybrid search. Queries are every 50th vector id (the
    * eval set grows with the corpus); each query's sparse side scores
    * its own document's distinct tokens against the corpus with the
    * [[TextQueries.textBm25]] linear-idf arithmetic (exact integers +
    * one IEEE divide — no libm), and its dense side is the
    * brute-force quantized cosine. Each ranker contributes its
    * TRUNCATED top-50 (the production form: rankers return bounded
    * lists; absent docs contribute nothing), fused ranks keep the
    * top-10. The RRF terms are `floor(1e9/(60+r))` — integer-exact in
    * both engines, and order-independent to sum.
    *
    * Scale shape: the sparse probe is an inverted-index join on the
    * query-term key (only matching postings shuffle); this variant
    * scores ALL postings of every query term — the exact baseline.
    * The top-k-bounded scale path is [[knnHybridWand]]: the same
    * fusion over an impact-ordered truncated index, with the
    * full-vs-scanned posting volume reported in-band so the bound's
    * cost and effect are both pinned. The dense side broadcasts the
    * query block and
    * would ride the IVF searches above ~10^7 vectors (this is the
    * eval harness, so it rides the exact baseline); per-ranker
    * truncation means the fusion join moves ≤ 2·50 rows per query.
    * No df broadcast hint: the term-frequency table is
    * vocabulary-sized (unbounded on a real corpus) — Catalyst/AQE
    * picks the strategy.
    */
  def knnHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val R = 50L // per-ranker truncation depth
    val KOut = 10L // fused results kept per query
    val docs = table(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val e = quantized(spark, dir)
    // ----- dense ranking: quantized cosine, queries broadcast
    val qv = e.where(col("vec_id") % 50 === 7)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("norm2").as("qn"))
    val wd = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ppm").desc, col("vec_id").asc)
    val denseTop = broadcast(qv).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qn"), col("norm2"))
          .as("cos_ppm"))
      .withColumn("r_d", row_number().over(wd).cast("long"))
      .where(col("r_d") <= R)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("r_d"))
    // ----- sparse ranking: BM25, query terms = the query doc's tokens
    val stats = docs.agg(count(lit(1)).as("nd"),
      sum(size(toks).cast("long")).as("st"))
    val tf = docs.select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = docs
      .join(broadcast(qv.select(col("q_id"))),
        col("doc_id") === col("q_id"))
      .select(col("q_id"), explode(array_distinct(toks)).as("term"))
    val dd = (c: Column) => c.cast("double")
    val idf = dd(lit(2) * col("nd") - lit(2) * col("df") + lit(1)) /
      dd(lit(2) * col("df") + lit(1))
    val tfc = dd(col("tf")) * lit(2.2) /
      (dd(col("tf")) + lit(0.3) +
        lit(0.9) * dd(col("dl")) * dd(col("nd")) / dd(col("st")))
    val ws = Window.partitionBy(col("q_id"))
      .orderBy(col("s_ppm").desc, col("doc_id").asc)
    val sparseTop = qterms.join(tf, "term")
      .where(col("doc_id") =!= col("q_id"))
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"),
        floor(lit(1e6) * idf * tfc).cast("long").as("score_ppm"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("score_ppm")).as("s_ppm"))
      .withColumn("r_s", row_number().over(ws).cast("long"))
      .where(col("r_s") <= R)
      .select(col("q_id"), col("doc_id"), col("r_s"))
    // ----- fuse: RRF over the union of both truncated lists
    val rrf = (r: Column) => when(r.isNotNull,
      floor(lit(1e9) / (lit(60) + r)).cast("long")).otherwise(0L)
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_e9").desc, col("doc_id").asc)
    sparseTop.join(denseTop, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("r_s"), lit(0L)).as("r_sparse"),
        coalesce(col("r_d"), lit(0L)).as("r_dense"),
        (rrf(col("r_s")) + rrf(col("r_d"))).as("rrf_e9"))
      .withColumn("fused_rank", row_number().over(wf).cast("long"))
      .where(col("fused_rank") <= KOut)
      .select(col("q_id"), col("fused_rank"), col("doc_id"),
        col("rrf_e9"), col("r_sparse"), col("r_dense"))
  }

  val knnHybridRrfSql: String =
    s"""WITH $sqlQuantized,
       |qs AS (SELECT vec_id AS q_id, qv, norm2 FROM n WHERE vec_id % 50 = 7),
       |dsc AS (
       |  SELECT a.q_id, b.vec_id AS doc_id,
       |    ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS cos_ppm
       |  FROM qs a JOIN n b ON a.q_id <> b.vec_id),
       |dtop AS (
       |  SELECT q_id, doc_id, r_d FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_ppm DESC, doc_id ASC) AS r_d FROM dsc)
       |  WHERE r_d <= 50),
       |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |             CAST(SUM(len(toks)) AS BIGINT) AS st FROM t),
       |e AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, u.term
       |  FROM t, LATERAL (SELECT unnest(toks) AS term) u),
       |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM e GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |qt AS (
       |  SELECT q.q_id, u.term
       |  FROM (SELECT q_id FROM qs) q JOIN t ON t.doc_id = q.q_id,
       |    LATERAL (SELECT unnest(list_distinct(t.toks)) AS term) u),
       |sp AS (
       |  SELECT qt.q_id, f.doc_id,
       |    SUM(CAST(FLOOR(1000000.0
       |      * (CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE)
       |         / CAST(2 * d.df + 1 AS DOUBLE))
       |      * (CAST(f.tf AS DOUBLE) * 2.2
       |         / (CAST(f.tf AS DOUBLE) + 0.3
       |            + 0.9 * CAST(f.dl AS DOUBLE) * CAST(s.nd AS DOUBLE)
       |              / CAST(s.st AS DOUBLE)))) AS BIGINT)) AS s_ppm
       |  FROM qt JOIN tf f USING (term) JOIN dfq d USING (term), s
       |  WHERE f.doc_id <> qt.q_id
       |  GROUP BY 1, 2),
       |stp AS (
       |  SELECT q_id, doc_id, r_s FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY s_ppm DESC, doc_id ASC) AS r_s FROM sp)
       |  WHERE r_s <= 50),
       |fused AS (
       |  SELECT q_id, doc_id,
       |    CAST(COALESCE(r_s, 0) AS BIGINT) AS r_sparse,
       |    CAST(COALESCE(r_d, 0) AS BIGINT) AS r_dense,
       |    CAST(CASE WHEN r_s IS NULL THEN 0
       |      ELSE FLOOR(1000000000.0 / (60 + r_s)) END
       |    + CASE WHEN r_d IS NULL THEN 0
       |      ELSE FLOOR(1000000000.0 / (60 + r_d)) END AS BIGINT) AS rrf_e9
       |  FROM stp FULL JOIN dtop USING (q_id, doc_id))
       |SELECT q_id, CAST(fused_rank AS BIGINT) AS fused_rank, doc_id,
       |  rrf_e9, r_sparse, r_dense
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf_e9 DESC, doc_id ASC) AS fused_rank
       |  FROM fused)
       |WHERE fused_rank <= 10""".stripMargin

  // ------------------------- hybrid retrieval with bounded postings
  /** [[knnHybridRrf]] with the sparse half TOP-K-BOUNDED — the scale
    * path its scaladoc names: per-term IMPACT-ORDERED posting
    * truncation (Anh & Moffat's impact-ordered indexes; the static
    * form of the WAND/max-score family). The BM25 contribution of a
    * posting is query-INDEPENDENT (tf, dl, df, corpus stats), so each
    * term's posting list is pre-sorted by that impact and cut to its
    * top [[WandP]] entries at INDEX BUILD time — per-query sparse work
    * becomes Σ min(df, P) over query terms instead of Σ df, bounded no
    * matter how stoppy a term gets at web scale. The price is
    * approximation (a doc outside every surviving posting cannot be
    * scored); both sides of that trade are IN-BAND: every output row
    * carries `n_post_full` (what an unbounded scorer would scan) vs
    * `n_post_scanned` (what this one did), and the oracle mirrors the
    * identical truncation, so the approximation is pinned exactly, not
    * hand-waved.
    *
    * Scale shape: the truncated index is |vocab|·P rows (df-independent);
    * impact ranking is one vocabulary-keyed window at build time; the
    * query join shuffles only surviving postings. Dense half and RRF
    * fusion are identical to [[knnHybridRrf]].
    */
  val WandP = 16

  def knnHybridWand(spark: SparkSession, dir: String): DataFrame = {
    val R = 50L // per-ranker truncation depth
    val KOut = 10L // fused results kept per query
    val docs = table(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val e = quantized(spark, dir)
    // ----- dense ranking: identical to knnHybridRrf
    val qv = e.where(col("vec_id") % 50 === 7)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("norm2").as("qn"))
    val wd = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ppm").desc, col("vec_id").asc)
    val denseTop = broadcast(qv).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        scorePpm(dot(col("qq"), col("q")), col("qn"), col("norm2"))
          .as("cos_ppm"))
      .withColumn("r_d", row_number().over(wd).cast("long"))
      .where(col("r_d") <= R)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("r_d"))
    // ----- impact-ordered truncated posting index (query-independent)
    val stats = docs.agg(count(lit(1)).as("nd"),
      sum(size(toks).cast("long")).as("st"))
    val tf = docs.select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dd = (c: Column) => c.cast("double")
    val idf = dd(lit(2) * col("nd") - lit(2) * col("df") + lit(1)) /
      dd(lit(2) * col("df") + lit(1))
    val tfc = dd(col("tf")) * lit(2.2) /
      (dd(col("tf")) + lit(0.3) +
        lit(0.9) * dd(col("dl")) * dd(col("nd")) / dd(col("st")))
    val wp = Window.partitionBy(col("term"))
      .orderBy(col("impact_ppm").desc, col("doc_id").asc)
    val posting = tf.join(dfreq, "term").crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        floor(lit(1e6) * idf * tfc).cast("long").as("impact_ppm"))
      .withColumn("pr", row_number().over(wp))
      .where(col("pr") <= WandP)
      .select(col("term"), col("doc_id"), col("impact_ppm"))
    // ----- per-query bound effect: full vs scanned posting volume
    val qterms = docs
      .join(broadcast(qv.select(col("q_id"))),
        col("doc_id") === col("q_id"))
      .select(col("q_id"), explode(array_distinct(toks)).as("term"))
    val scanned = posting.groupBy(col("term"))
      .agg(count(lit(1)).as("kept"))
    val bound = qterms.join(dfreq, "term").join(scanned, "term")
      .groupBy(col("q_id"))
      .agg(sum(col("df")).as("n_post_full"),
        sum(col("kept")).as("n_post_scanned"))
    // ----- sparse ranking over surviving postings only
    val ws = Window.partitionBy(col("q_id"))
      .orderBy(col("s_ppm").desc, col("doc_id").asc)
    val sparseTop = qterms.join(posting, "term")
      .where(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("impact_ppm")).as("s_ppm"))
      .withColumn("r_s", row_number().over(ws).cast("long"))
      .where(col("r_s") <= R)
      .select(col("q_id"), col("doc_id"), col("r_s"))
    // ----- fuse: identical RRF, bound columns riding along
    val rrf = (r: Column) => when(r.isNotNull,
      floor(lit(1e9) / (lit(60) + r)).cast("long")).otherwise(0L)
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_e9").desc, col("doc_id").asc)
    sparseTop.join(denseTop, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("r_s"), lit(0L)).as("r_sparse"),
        coalesce(col("r_d"), lit(0L)).as("r_dense"),
        (rrf(col("r_s")) + rrf(col("r_d"))).as("rrf_e9"))
      .withColumn("fused_rank", row_number().over(wf).cast("long"))
      .where(col("fused_rank") <= KOut)
      .join(broadcast(bound), "q_id")
      .select(col("q_id"), col("fused_rank"), col("doc_id"),
        col("rrf_e9"), col("r_sparse"), col("r_dense"),
        col("n_post_full"), col("n_post_scanned"))
  }

  val knnHybridWandSql: String =
    s"""WITH $sqlQuantized,
       |qs AS (SELECT vec_id AS q_id, qv, norm2 FROM n WHERE vec_id % 50 = 7),
       |dsc AS (
       |  SELECT a.q_id, b.vec_id AS doc_id,
       |    ${sqlScorePpm(sqlDot, "a.norm2", "b.norm2")} AS cos_ppm
       |  FROM qs a JOIN n b ON a.q_id <> b.vec_id),
       |dtop AS (
       |  SELECT q_id, doc_id, r_d FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_ppm DESC, doc_id ASC) AS r_d FROM dsc)
       |  WHERE r_d <= 50),
       |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |             CAST(SUM(len(toks)) AS BIGINT) AS st FROM t),
       |e AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, u.term
       |  FROM t, LATERAL (SELECT unnest(toks) AS term) u),
       |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM e GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |post AS (
       |  SELECT term, doc_id, impact_ppm FROM (
       |    SELECT f.term, f.doc_id,
       |      CAST(FLOOR(1000000.0
       |        * (CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE)
       |           / CAST(2 * d.df + 1 AS DOUBLE))
       |        * (CAST(f.tf AS DOUBLE) * 2.2
       |           / (CAST(f.tf AS DOUBLE) + 0.3
       |              + 0.9 * CAST(f.dl AS DOUBLE) * CAST(s.nd AS DOUBLE)
       |                / CAST(s.st AS DOUBLE)))) AS BIGINT) AS impact_ppm,
       |      row_number() OVER (PARTITION BY f.term
       |        ORDER BY CAST(FLOOR(1000000.0
       |        * (CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE)
       |           / CAST(2 * d.df + 1 AS DOUBLE))
       |        * (CAST(f.tf AS DOUBLE) * 2.2
       |           / (CAST(f.tf AS DOUBLE) + 0.3
       |              + 0.9 * CAST(f.dl AS DOUBLE) * CAST(s.nd AS DOUBLE)
       |                / CAST(s.st AS DOUBLE)))) AS BIGINT) DESC,
       |          f.doc_id ASC) AS pr
       |    FROM tf f JOIN dfq d USING (term), s)
       |  WHERE pr <= $WandP),
       |qt AS (
       |  SELECT q.q_id, u.term
       |  FROM (SELECT q_id FROM qs) q JOIN t ON t.doc_id = q.q_id,
       |    LATERAL (SELECT unnest(list_distinct(t.toks)) AS term) u),
       |kept AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS kept
       |  FROM post GROUP BY term),
       |bound AS (
       |  SELECT qt.q_id, CAST(SUM(d.df) AS BIGINT) AS n_post_full,
       |    CAST(SUM(k.kept) AS BIGINT) AS n_post_scanned
       |  FROM qt JOIN dfq d USING (term) JOIN kept k USING (term)
       |  GROUP BY qt.q_id),
       |sp AS (
       |  SELECT qt.q_id, p.doc_id,
       |    CAST(SUM(p.impact_ppm) AS BIGINT) AS s_ppm
       |  FROM qt JOIN post p USING (term)
       |  WHERE p.doc_id <> qt.q_id
       |  GROUP BY 1, 2),
       |stp AS (
       |  SELECT q_id, doc_id, r_s FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY s_ppm DESC, doc_id ASC) AS r_s FROM sp)
       |  WHERE r_s <= 50),
       |fused AS (
       |  SELECT q_id, doc_id,
       |    CAST(COALESCE(r_s, 0) AS BIGINT) AS r_sparse,
       |    CAST(COALESCE(r_d, 0) AS BIGINT) AS r_dense,
       |    CAST(CASE WHEN r_s IS NULL THEN 0
       |      ELSE FLOOR(1000000000.0 / (60 + r_s)) END
       |    + CASE WHEN r_d IS NULL THEN 0
       |      ELSE FLOOR(1000000000.0 / (60 + r_d)) END AS BIGINT) AS rrf_e9
       |  FROM stp FULL JOIN dtop USING (q_id, doc_id))
       |SELECT f.q_id, CAST(f.fused_rank AS BIGINT) AS fused_rank, f.doc_id,
       |  f.rrf_e9, f.r_sparse, f.r_dense, b.n_post_full, b.n_post_scanned
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf_e9 DESC, doc_id ASC) AS fused_rank
       |  FROM fused) f
       |JOIN bound b ON f.q_id = b.q_id
       |WHERE f.fused_rank <= 10""".stripMargin

  // ------------------------------------------ graph ANN: NN-Descent
  /** K-NN GRAPH construction by NN-Descent (Dong, Moses & Li, WWW'11)
    * — the graph-based ANN family (the algorithm under HNSW-class
    * indexes), completing the quantization families (IVF/PQ/SQ/LSH/
    * binary) with the index shape that wins on high-recall regimes.
    * The local-join iteration is inherently relational:
    *
    *  - init: a DETERMINISTIC ring in id space (`u = (v+i) mod n`,
    *    i = 1..K — the reproducible "random" start) UNIONED with an
    *    LSH WARM START: each vertex is seeded with its hyperplane
    *    bucket's ≤[[NndRepC]] representatives (the same
    *    [[bucketCol]]/[[sqlBucketed]] planes as `knn_lsh_bucketed`;
    *    reps chosen per bucket by the shared md5 hash order).
    *    Bucket-mates are likelier-than-random neighbors, so descent
    *    starts rounds ahead of a blind init (Dong et al. §5's
    *    "better-than-random init converges faster"), at the cost of
    *    one broadcast of a ≤2^Planes·RepC rep list;
    *  - round: B(v) = N(v) ∪ R_ρ(v) — the out-neighborhood plus the
    *    SAMPLED reverse edges (Dong et al.'s ρ parameter: only the
    *    [[NndRevK]] = ρ·K lowest-(d, v) in-edges per target join the
    *    candidate pool, bounding |B| at K+ρK instead of K+indegree);
    *    candidates = two-hop pairs {(v, u) : m ∈ B(v), u ∈ B(m)}
    *    where AT LEAST ONE hop edge is NEW — Dong's incremental
    *    new/old flags (Alg. 2): an old×old pair through an old path
    *    was a candidate in the round that created the path, and the
    *    per-vertex top-K only tightens, so a rejected candidate can
    *    never win later — rescoring it is pure waste. The changed-
    *    edge set typically decays geometrically, so late rounds cost
    *    a fraction of round 1 (the single biggest build-cost lever
    *    at 100×). Scored with the EXACT integer squared L2 over
    *    quantized vectors (norm²ₐ + norm²ᵦ − 2·dot, all int64), then
    *    per-vertex top-K by (distance, id) — engine-identical total
    *    order;
    *  - [[NndRounds]] fixed rounds, but a CONVERGED round is free by
    *    construction: no changed edges → empty two-hop frame → the
    *    round degenerates to topK(g) = g. The new/old flags thus
    *    subsume an explicit fixed-point exit (and the ε>0 new-edge-
    *    rate cutoffs of production NN-Descent would diverge from a
    *    fixed-round oracle anyway).
    *
    * Scale shape: every round is two vertex-keyed shuffles (the
    * reverse-edge sampling and the two-hop join) over K- and
    * ((1+ρ)K)²-bounded per-vertex rows — never all-pairs; distances
    * ride the codegen'd [[graft.functions.DotLong]]; each round is
    * `localCheckpoint`ed so the plan stays flat. Versus the unsampled
    * B(v), ρ=1/2 cuts the per-round scored-candidate bound from
    * n·(2K)² to n·(1.5K)² (≈1.8×), and the warm start converts that
    * into fewer *effective* rounds — measured at the 100× smoke in
    * SWEEP_r12.md. The reported query evaluates graph recall@K against
    * the exact neighbors of a 1-in-[[NndEvalStride]] vertex sample, so
    * the eval side is |sample|·n, not n² (stride = max(50, n/40),
    * fixed-size at scale — see [[nndEvalStride]]).
    */
  val NndK = 8
  /** 4 rounds, not the classical ~5: the LSH warm start stands in for
    * the first descent round (measured at sf0.001/0.01: recall within
    * 4% of warm+5 and far above ring+5's init, search-recall floors
    * unchanged) — and the dominant two-hop cost scales linearly with
    * rounds, so the warm start converts into a flat 20% build cut.
    */
  val NndRounds = 4
  /** Warm-start representatives per LSH bucket (2K). */
  val NndRepC = 16
  /** Dong et al.'s sampled-reverse-edge cap ρ·K with ρ = 1/2. */
  val NndRevK = NndK / 2
  /** Eval-sample stride: FIXED-SIZE (~40 vertices), not corpus-
    * proportional — the same r11 lesson gsStride encodes. A pure
    * `% 50` makes the eval's exact ground truth an O(n²/50) corpus
    * scan: the 100× smoke measured the BUILD at ~130 s and the
    * stride-50 EVAL at ~450 s of the query's wall. `max(50, n/40)`
    * keeps the historical stride (and every oracle hash) at the test
    * SFs (n ≤ 2000) while capping the eval at sample·n at any scale.
    */
  private val NndEvalStride = 50
  private def nndEvalStride(n: Long): Long =
    math.max(NndEvalStride.toLong, n / 40)
  private val sqlNndEvalStride =
    s"GREATEST($NndEvalStride, (SELECT COUNT(*) FROM n) // 40)"

  private[analytics] def nndGraph(spark: SparkSession, dir: String,
      rounds: Int): DataFrame =
    nndGraphWithInit(spark, dir, rounds)._2

  /** (init graph, after-`rounds` graph) in one derivation — the init
    * graph (ring ∪ LSH warm start, top-K'd) is round 0 of the same
    * walk, so the report query gets both without rebuilding the
    * quantized corpus.
    */
  private[analytics] def nndGraphWithInit(spark: SparkSession, dir: String,
      rounds: Int): (DataFrame, DataFrame) = {
    val e = quantized(spark, dir)
      .withColumn("bucket", bucketCol)
      // int16-packed vectors (PackS16): the scoring joins attach a
      // vector to every candidate row past the broadcast threshold,
      // so its serialized width IS the build's shuffle volume — ~4.5×
      // narrower packed, same integers (DotPackedS16 ≡ DotLong,
      // property-pinned), so no oracle hash moves
      .select(col("vec_id"),
        graft.functions.PackS16(col("q")).as("qp"),
        col("norm2"), col("bucket")).cache()
    try {
      val n = e.count()
      // shuffle_hash on the corpus side: at 100× the corpus outgrows
      // the broadcast threshold and these joins fall back to sort-
      // merge, which SORTS the candidate frame WITH a ~0.5 KiB
      // quantized vector attached to every row (measured: the 100×
      // build's dominant cost, not the dot products). A shuffled hash
      // join builds its per-partition map from the corpus slice
      // (vectors/partitions-sized) and streams the candidates unsorted
      val scoredHint = "shuffle_hash"
      def scored(pairs: DataFrame): DataFrame =
        pairs
          .join(e.select(col("vec_id").as("v"), col("qp").as("qa"),
            col("norm2").as("na")).hint(scoredHint), "v")
          .join(e.select(col("vec_id").as("u"), col("qp").as("qb"),
            col("norm2").as("nb")).hint(scoredHint), "u")
          .select(col("v"), col("u"),
            (col("na") + col("nb") - lit(2L) *
              graft.functions.DotPackedS16(col("qa"), col("qb")))
              .as("d"))
      // per-vertex DISTINCT bottom-K of (d, u) as ONE bounded-buffer
      // aggregation (map-side partials, k tuples per partition across
      // the shuffle) instead of distinct + a window sort of the whole
      // candidate frame — bit-identical rows to the oracle's
      // `SELECT DISTINCT … row_number() ≤ K` spelling, which stays
      // the DuckDB twin. The TAGGED variant carries an old/new flag
      // per tuple (max over duplicates; never part of the ordering),
      // so the round's new-edge set falls out of the aggregation
      // itself instead of a per-round left-outer + left-anti join
      // pair (guide §2.4: remove shuffles outright).
      val bk = udaf(graft.functions.BottomKPairsTagAgg(NndK))
      def topK(cand: DataFrame): DataFrame =
        cand.groupBy(col("v"))
          .agg(bk(col("d"), col("u"), col("old")).as("tk"))
          .select(col("v"), explode(col("tk")).as("e"))
          .select(col("v"), col("e._2").as("u"), col("e._1").as("d"),
            (lit(1L) - col("e._3")).as("nf"))
      val ring = e
        .select(col("vec_id").as("v"),
          explode(sequence(lit(1), lit(NndK))).as("i"))
        .select(col("v"), ((col("v") + col("i")) % n).as("u"))
      // LSH warm start: ≤NndRepC representatives per hyperplane bucket
      // (shared md5 hash order — a uniform in-bucket sample), joined
      // back to every bucket member. The rep list is ≤2^Planes·RepC
      // rows — broadcast, so the warm seam adds no exchange.
      val wrep = Window.partitionBy(col("bucket")).orderBy(
        graft.functions.CrossHash.md5Long(col("vec_id").cast("string")).asc,
        col("vec_id").asc)
      val reps = e.select(col("bucket"), col("vec_id"))
        .withColumn("rnk", row_number().over(wrep))
        .where(col("rnk") <= NndRepC)
        .select(col("bucket"), col("vec_id").as("u"))
      val warm = e.select(col("vec_id").as("v"), col("bucket"))
        .join(broadcast(reps), "bucket")
        .where(col("v") =!= col("u"))
        .select(col("v"), col("u"))
      // data-sized per-round task count (the propagateLabels
      // discipline): the iterated graph is exactly n·K rows, so tiny
      // corpora stop scheduling 32 near-empty tasks per stage while
      // billion-vector graphs still get thousands of partitions
      val parts = (((n * NndK + 499999L) / 500000L).toInt.max(1))
        .min(e.rdd.getNumPartitions.max(1))
      val g0 = topK(scored(ring.unionByName(warm)).withColumn("old",
          lit(0L))).coalesce(parts)
        .localCheckpoint(true)
      var g = g0 // (v, u, d, nf): round 0 — every edge is new (nf=1)
      // Dong's NEW/OLD flags (Alg. 2): only pairs touching an edge
      // that CHANGED last round are scored — an old×old pair through
      // an old path was a candidate in the round that created it and
      // per-vertex top-K only tightens, so rescoring it can't change
      // anything. The flags also make a separate fixed-point early
      // exit redundant: a converged round has an EMPTY changed set,
      // so its two-hop frame is empty and the round degenerates to
      // topK(g) = g — a natural no-op, no extra convergence job.
      // The flag is computed INSIDE the top-K aggregation (candidates
      // tagged old=0 union'd with last round's edges tagged old=1; a
      // surviving tuple's max-tag says whether it existed last round),
      // which deletes the per-round flag-attach left-outer join and
      // the new-edge left-anti join the previous formulation paid.
      val revAgg = udaf(graft.functions.BottomKPairsTagAgg(NndRevK))
      for (_ <- 1 to rounds) {
        // B(v) = out-edges ∪ the NndRevK lowest-(d, v) in-edges per
        // target (Dong's sampled reverse edges); the flag rides along.
        // Bottom-K as a bounded-buffer aggregation, not a window sort:
        // same selected rows (tuple order (d, v) == the window's
        // ORDER BY d, v), but map-side partials ship ≤RevK tuples per
        // partition instead of sorting the whole frame (guide §2.3).
        val rev = g.groupBy(col("u"))
          .agg(revAgg(col("d"), col("v"), col("nf")).as("tk"))
          .select(col("u"), explode(col("tk")).as("e"))
          .select(col("u").as("v"), col("e._2").as("u"),
            col("e._3").as("nf"))
        val b = g.select(col("v"), col("u"), col("nf")).union(rev)
          .groupBy(col("v"), col("u")).agg(max(col("nf")).as("nf"))
        val bx = b.select(col("v").as("xv"), col("u").as("xu"),
          col("nf").as("xn"))
        val by = b.select(col("v").as("yv"), col("u").as("yu"),
          col("nf").as("yn"))
        val twoHop = bx.join(by, col("xu") === col("yv"))
          .where(col("xn") === 1 || col("yn") === 1)
          .select(col("xv").as("v"), col("yu").as("u"))
          .where(col("v") =!= col("u"))
          .distinct()
        val gNext = topK(scored(twoHop).withColumn("old", lit(0L))
            .unionByName(g.select(col("v"), col("u"), col("d"))
              .withColumn("old", lit(1L))))
          .coalesce(parts)
          .localCheckpoint(true)
        g = gNext
      }
      (g0.select(col("v"), col("u"), col("d")),
        g.select(col("v"), col("u"), col("d")))
    } finally e.unpersist()
  }

  /** Recall@K of the NN-Descent graph against exact neighbors, per
    * sampled vertex — alongside the RING-INIT recall, so the result
    * itself carries the convergence evidence (on this deliberately
    * unstructured corpus the local join lifts recall ~25× over init;
    * absolute recall stays modest because uniform high-dim data has
    * no neighborhood structure to exploit — the distance-concentration
    * regime where every ANN family here measures low, see
    * knn_recall_report).
    */
  def knnGraphNnd(spark: SparkSession, dir: String): DataFrame = {
    val (g0, gBuilt) = nndGraphWithInit(spark, dir, NndRounds)
    // this IS the nightly build job: publish the built graph through
    // the artifact seam (rebuild = recompute + republish, honest cost)
    // and evaluate the READ-BACK — so the eval also proves the sink
    // round-trip, and knn_graph_search rides the same publish
    val g = SessionArtifact.rebuild(spark, dir, "nnd_graph")(gBuilt)
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
    val samp = e.where(col("vec_id") % nndEvalStride(e.count()) === 0)
      .select(col("vec_id").as("v"), col("q").as("qa"),
        col("norm2").as("na"))
    val w = Window.partitionBy(col("v"))
      .orderBy(col("d").asc, col("u").asc)
    val exact = broadcast(samp)
      .join(e.select(col("vec_id").as("u"), col("q").as("qb"),
        col("norm2").as("nb")), col("v") =!= col("u"))
      .select(col("v"), col("u"),
        (col("na") + col("nb") - lit(2L) * dot(col("qa"), col("qb")))
          .as("d"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= NndK)
    exact.select(col("v"), col("u"))
      .join(g.select(col("v"), col("u")).withColumn("hit", lit(1L)),
        Seq("v", "u"), "left_outer")
      .join(g0.select(col("v"), col("u")).withColumn("hit0", lit(1L)),
        Seq("v", "u"), "left_outer")
      .groupBy(col("v"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_matched"),
        sum(coalesce(col("hit0"), lit(0L))).as("n_matched_init"))
      .select(col("v").as("vec_id"), col("n_matched"),
        col("n_matched_init"),
        ppm(col("n_matched"), lit(NndK)).as("recall_ppm"),
        ppm(col("n_matched_init"), lit(NndK)).as("recall_init_ppm"))
    } finally e.unpersist()
  }

  /** The NN-Descent construction as oracle CTEs (`sqlQuantized` … up
    * to the final graph `g$NndRounds`) — shared by [[knnGraphNndSql]]
    * and [[knnGraphSearchSql]], whose walks both start from the same
    * built graph.
    */
  private lazy val sqlNndChain: String = {
    val dotAB = sqlDot // the canonical a/b quantized-dot fragment
    def distCte(src: String, out: String) =
      s"""$out AS (
         |  SELECT t.v, t.u, a.norm2 + b.norm2 - 2 * $dotAB AS d
         |  FROM $src t JOIN n a ON t.v = a.vec_id JOIN n b ON t.u = b.vec_id)"""
        .stripMargin
    // MATERIALIZED: each g/b is referenced 2-3× by the next round —
    // DuckDB would otherwise inline the whole chain and re-evaluate it
    // exponentially (3^rounds); materialization makes the oracle walk
    // the same round-by-round dataflow Spark does
    def rankCte(src: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT v, u, d FROM (
         |    SELECT v, u, d, row_number() OVER (
         |      PARTITION BY v ORDER BY d, u) AS rnk
         |    FROM (SELECT DISTINCT v, u, d FROM $src))
         |  WHERE rnk <= $NndK)""".stripMargin
    val rounds = (1 to NndRounds).map { r =>
      // new/old-flagged local join (Dong Alg. 2): B = out-edges ∪ the
      // NndRevK lowest-(d, v) in-edges per target, each carrying
      // whether its forward edge changed last round; only pairs with
      // a new side are scored; nw tracks the changed set round-over-
      // round (identical total order to the Spark side)
      val nwNext =
        if (r == NndRounds) "" // last round's changed set has no reader
        else s""",
          |nw$r AS MATERIALIZED (SELECT v, u FROM g$r
          |  EXCEPT SELECT v, u FROM g${r - 1})""".stripMargin
      s"""gb$r AS (SELECT g.v, g.u, g.d,
         |  CASE WHEN n.u IS NULL THEN 0 ELSE 1 END AS nf
         |  FROM g${r - 1} g LEFT JOIN nw${r - 1} n
         |    ON g.v = n.v AND g.u = n.u),
         |rv$r AS (SELECT u AS v, v AS u, nf FROM (
         |  SELECT v, u, nf, row_number() OVER (
         |    PARTITION BY u ORDER BY d, v) AS rr FROM gb$r)
         |  WHERE rr <= $NndRevK),
         |b$r AS MATERIALIZED (SELECT v, u, MAX(nf) AS nf FROM (
         |  SELECT v, u, nf FROM gb$r
         |  UNION ALL SELECT v, u, nf FROM rv$r) GROUP BY v, u),
         |t$r AS (SELECT DISTINCT x.v, y.u FROM b$r x
         |  JOIN b$r y ON x.u = y.v
         |  WHERE (x.nf = 1 OR y.nf = 1) AND x.v <> y.u),
         |${distCte(s"t$r", s"c$r")},
         |a$r AS (SELECT v, u, d FROM c$r
         |  UNION ALL SELECT v, u, d FROM g${r - 1}),
         |${rankCte(s"a$r", s"g$r")}$nwNext""".stripMargin
    }.mkString(",\n")
    s"""$sqlBucketed,
       |nreps AS (SELECT bucket, vec_id AS u FROM (
       |  SELECT bucket, vec_id, row_number() OVER (PARTITION BY bucket
       |    ORDER BY ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(vec_id AS VARCHAR)")}, vec_id) AS rnk
       |  FROM bucketed) WHERE rnk <= $NndRepC),
       |p0 AS (
       |  SELECT a.vec_id AS v,
       |    (a.vec_id + s.i) % (SELECT COUNT(*) FROM n) AS u
       |  FROM n a, LATERAL (SELECT unnest(generate_series(1, $NndK))
       |    AS i) s
       |  UNION ALL
       |  SELECT b.vec_id AS v, r.u FROM bucketed b
       |  JOIN nreps r ON b.bucket = r.bucket AND b.vec_id <> r.u),
       |${distCte("p0", "d0")},
       |${rankCte("d0", "g0")},
       |nw0 AS MATERIALIZED (SELECT v, u FROM g0),
       |$rounds""".stripMargin
  }

  val knnGraphNndSql: String =
    s"""WITH $sqlNndChain,
       |samp AS (SELECT vec_id, qv, norm2 FROM n
       |  WHERE vec_id % $sqlNndEvalStride = 0),
       |ex AS (
       |  SELECT s.vec_id AS v, b.vec_id AS u, row_number() OVER (
       |    PARTITION BY s.vec_id
       |    ORDER BY s.norm2 + b.norm2 - 2 * list_sum(list_transform(
       |      generate_series(1, 64), i -> s.qv[i] * b.qv[i])), b.vec_id)
       |    AS rnk
       |  FROM samp s JOIN n b ON b.vec_id <> s.vec_id),
       |exk AS (SELECT v, u FROM ex WHERE rnk <= $NndK)
       |SELECT e.v AS vec_id,
       |  CAST(SUM(CASE WHEN g.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched,
       |  CAST(SUM(CASE WHEN g0.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched_init,
       |  ${sqlPpm(
             s"SUM(CASE WHEN g.u IS NOT NULL THEN 1 ELSE 0 END)",
             NndK.toString)} AS recall_ppm,
       |  ${sqlPpm(
             s"SUM(CASE WHEN g0.u IS NOT NULL THEN 1 ELSE 0 END)",
             NndK.toString)} AS recall_init_ppm
       |FROM exk e
       |LEFT JOIN g$NndRounds g ON e.v = g.v AND e.u = g.u
       |LEFT JOIN g0 ON e.v = g0.v AND e.u = g0.u
       |GROUP BY e.v""".stripMargin

  // --------------------------------- graph ANN: beam search over NND
  /** QUERY-TIME search over the NN-Descent graph — the missing half of
    * the graph family ([[knnGraphNnd]] builds the index; this walks
    * it, reading the graph from the session-persisted manifest table
    * below, so the benched cost is the search, not a rebuild):
    * HNSW's layer-0 search (Malkov & Yashunin, TPAMI'18)
    * re-expressed as SYNCHRONOUS BEAM SEARCH, the deterministic
    * relational form of greedy best-first — every query enters at the
    * same fixed seeds, each hop expands the whole beam through the
    * symmetrized adjacency, scores candidates with the exact integer
    * squared L2, and keeps the best [[GsBeam]] per query by (distance,
    * id); after [[GsHops]] fixed hops the beam's top-[[NndK]] are the
    * answer. Per query the walk touches O(hops · beam · degree)
    * vertices — independent of corpus size, the property that makes
    * graph ANN the high-recall index family — and the output carries
    * its own evaluation: hits against the brute-force top-K
    * (`n_matched`, `recall_ppm`) per query, the same in-band recall
    * discipline as [[knnGraphNnd]] and knn_recall_report.
    *
    * Determinism: seeds are id-space quartiles (`i·⌊n/4⌋`, i = 0..3 —
    * ids are uncorrelated with embedding space, so fixed ids are the
    * reproducible stand-in for HNSW's entry point); all scores are
    * int64; every per-query selection is totally ordered by (d, u).
    * The query's own vertex is excluded from scoring throughout (a
    * search never returns its probe).
    *
    * Scale shape: the beam frame is |queries|·beam rows — broadcast on
    * every hop join (plan-pinned: zero SortMergeJoin); the adjacency
    * is the K-bounded graph (n·2K rows) shuffled once at
    * symmetrization and reused checkpointed; scoring joins stream the
    * corpus past the broadcast candidate set. At 10^9 vectors the
    * graph lives partitioned by vertex and each hop is one
    * broadcast-semi-probe of it — no corpus scan after the build.
    */
  val GsBeam = 12
  val GsHops = 3
  private val GsQueryStride = 50

  /** COARSE ENTRY LAYER for the graph searches — the HNSW upper-layer
    * idea in miniature, replacing r12's four fixed id-quartile seeds
    * (a flat entry whose walks lengthen proportionally at 10⁹
    * vectors). A deterministic sample of vertices (`vec_id %
    * layerStride = 0`, stride sized so the layer holds ≤ ~[[GsLayerCap]]
    * members at ANY corpus size) forms the upper layer; each query
    * exact-scores the layer and enters the graph at its
    * [[GsEntrySeeds]] nearest members. Entry lands inside the
    * query's neighborhood, so the [[GsHops]] beam rounds CONVERGE —
    * hops revisit a tighter candidate set, and the per-query
    * scored-candidate count (`n_scanned`, in-band) drops ~8%% while
    * recall improves (grid-measured at sf0.001 + sf0.01, SWEEP_r13).
    * At 10⁹ vectors the layer is still ≤32 dots per query — a
    * bounded routing cost, where a flat entry pays ever-longer walks.
    */
  val GsLayerCap = 32L
  val GsEntrySeeds = 4
  private def gsLayerStride(n: Long): Long = math.max(7L, n / GsLayerCap)
  private val sqlGsLayerStride =
    s"GREATEST(7, (SELECT COUNT(*) FROM n) // $GsLayerCap)"

  /** Query-set stride for the graph-search eval: FIXED-SIZE (~40
    * queries), not corpus-proportional. A pure `% 50` stride makes
    * the query set grow with n, which silently turns the in-band
    * exact ground truth into an O(n²/50) scan and the beam broadcast
    * into an n-sized frame — the 100× scale smoke measured exactly
    * that (437 s at 100× sf0.1 vs 1.9 s at 1×). A benchmark query
    * set at 100 TB is a fixed eval sample; `max(50, n/40)` keeps the
    * historical stride (and every oracle hash) at the test SFs while
    * capping the query count — and with it the ground-truth scan and
    * the broadcast size — at any scale.
    */
  private def gsStride(n: Long): Long = math.max(GsQueryStride.toLong, n / 40)
  private val sqlGsStride =
    s"GREATEST($GsQueryStride, (SELECT COUNT(*) FROM n) // 40)"

  /** Insert-walk depth for [[knnGraphDelta]] — one hop shallower than
    * the query-time search: the insert's local-join REFINE stage
    * supplies the close-neighborhood tail a third hop would find, at
    * a fraction of the per-hop cost (each hop is a full
    * score+rank+checkpoint round over the whole delta wavefront).
    */
  val GdHops = 2

  /** Session-scoped PERSISTED NND graph — the build-once/search-many
    * separation for the graph family ([[knnIvfPersisted]]'s pattern;
    * near-dup twin: [[NearDupArtifact]]): the K-NN graph is an INDEX,
    * built and PUBLISHED by the nightly job ([[knnGraphNnd]] — its
    * rebuild republishes through the [[SessionArtifact]] seam, so its
    * benched cost is the honest build) and only READ at query time.
    * Content-addressed per (code, dataset): a restarted session on
    * unchanged data reuses the published graph. [[knnGraphSearch]]'s
    * oracle re-derives the full construction, so a wrong or stale
    * persisted graph diverges its hash.
    */
  private[analytics] def nndIndex(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "nnd_graph")(
      nndGraph(spark, dir, NndRounds))

  /** Exact L2 top-[[NndK]] for the stride-sampled graph-search query
    * set — the beam search's in-band recall baseline, published as a
    * session artifact so repeat searches grade against a table instead
    * of re-paying the |queries|×n exact scan (the oracle re-derives it
    * from the raw corpus every verify run).
    */
  private[analytics] def gsExactFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2"))
    val qs = e.where(col("vec_id") % gsStride(e.count()) === 13)
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("norm2").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("u").asc)
    broadcast(qs)
      .join(e.select(col("vec_id").as("u"), col("q").as("qb"),
        col("norm2").as("nb")), col("qid") =!= col("u"))
      .select(col("qid"), col("u"),
        (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
          .as("d"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= NndK)
      .select(col("qid"), col("u"))
  }

  def knnGraphSearch(spark: SparkSession, dir: String): DataFrame =
    searchOver(spark, dir, nndIndex(spark, dir))



  /** The beam-search eval over an arbitrary adjacency `g` (v, u, …) —
    * factored out so [[knnGraphPrune]]'s spec can grade search quality
    * on the PRUNED graph with the identical walk. Entry is
    * LAYER-ROUTED (see [[GsLayerCap]]): each query exact-scores the
    * bounded coarse layer and walks [[GsHops]] beam rounds from
    * its [[GsEntrySeeds]] nearest members; `quartileEntry = true`
    * keeps r12's four fixed id-quartile seeds at the historical
    * [[GsHops]] — the measured-comparison twin (SWEEP_r13), not a
    * query surface. `n_scanned` rides in-band: the per-query count of
    * DISTINCT candidates exact-scored anywhere (layer + every beam
    * round) — the walk's true cost, pinned by the oracle.
    */
  private[analytics] def searchOver(spark: SparkSession, dir: String,
      g: DataFrame, quartileEntry: Boolean = false): DataFrame = {
    val adj = g.select(col("v"), col("u"))
      .union(g.select(col("u").as("v"), col("v").as("u")))
      .distinct().localCheckpoint(false) // first hop materializes
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
      val n = e.count()
      val qs = e.where(col("vec_id") % gsStride(n) === 13)
        .select(col("vec_id").as("qid"), col("q").as("qq"),
          col("norm2").as("qn"))
      // score the candidate set exactly and keep the per-query top-k.
      // The per-query DISTINCT bottom-k of (d, u) runs as ONE bounded-
      // buffer aggregation (map-side partials, ≤k tuples per partition
      // across the one exchange) — the previous distinct + row_number
      // window spelling paid an extra exchange plus a full sort of the
      // scored frame per hop. Same rows: tuple order (d, u) == the
      // window's ORDER BY d, u, and the aggregate's dedup == DISTINCT
      // (the oracle keeps that literal spelling).
      def scoredTop(cand: DataFrame, k: Int): DataFrame =
        broadcast(cand)
          .join(e.select(col("vec_id").as("u"), col("q").as("qb"),
            col("norm2").as("nb")), "u")
          .join(broadcast(qs), "qid")
          .where(col("u") =!= col("qid"))
          .select(col("qid"), col("u"),
            (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
              .as("d"))
          .groupBy(col("qid"))
          .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(k))
            bk(col("d"), col("u")) }.as("tk"))
          .select(col("qid"), explode(col("tk")).as("bk"))
          .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
      // entry candidates: every (query, layer-member) pair — the
      // bounded routing scan — or the legacy four quartile ids
      val entryCands =
        if (quartileEntry)
          qs.select(col("qid"), explode(
            array((0 until 4).map(i => lit(i * (n / 4))): _*)).as("u"))
        else
          qs.select(col("qid")).crossJoin(broadcast(
            e.where(col("vec_id") % gsLayerStride(n) === 0)
              .select(col("vec_id").as("u"))))
      val seeds =
        if (quartileEntry) entryCands
        else scoredTop(entryCands, GsEntrySeeds).select(col("qid"), col("u"))
      // beam frames are |queries|·beam rows — size their task count
      // from the data (propagateLabels discipline) so each hop's
      // checkpoint doesn't schedule 32 near-empty tasks
      val bParts = (((n / gsStride(n) + 1) * GsBeam + 499999L) / 500000L)
        .toInt.max(1).min(32)
      // LAZY per-hop checkpoints: the next hop's frontier broadcast is
      // the action that materializes each beam — one job per hop
      var beam = scoredTop(seeds, GsBeam).coalesce(bParts)
        .localCheckpoint(false)
      // scanned = every candidate ever offered for exact scoring.
      // Accumulated LAZILY: each hop's candidate frame builds on the
      // checkpointed beam, so the deferred union stays shallow and the
      // one dedup folds into the final plan — zero extra jobs
      val candFrames = Seq.newBuilder[DataFrame]
      candFrames += entryCands
      for (h <- 1 to GsHops) {
        val frontier = beam.select(col("qid"), col("u").as("bu"))
        val expanded = broadcast(frontier)
          .join(adj, col("bu") === col("v"))
          .select(col("qid"), col("u"))
        val cand = expanded.unionByName(beam.select(col("qid"), col("u")))
        candFrames += cand
        // intermediate hops lazy (each materializes transitively with
        // the next); the LAST hop is eager so the whole walk runs NOW,
        // while the corpus cache is live — the finally-unpersist below
        // fires before the caller's action, so anything left lazy past
        // this point would re-derive the corpus uncached at scale
        beam = scoredTop(cand, GsBeam).coalesce(bParts)
          .localCheckpoint(h == GsHops)
      }
      val scanned = candFrames.result()
        .map(_.select(col("qid"), col("u")))
        .reduce(_ unionByName _)
        .where(col("u") =!= col("qid"))
      // the final top-K over the last beam: same bounded bottom-k
      // aggregation (beam rows are already distinct per (qid, u))
      val found = beam.groupBy(col("qid"))
        .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
          bk(col("d"), col("u")) }.as("tk"))
        .select(col("qid"), explode(col("tk")).as("bk"))
        .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
      // count-distinct aggregation instead of distinct + count: one
      // exchange, identical n_scanned (distinct (qid, u) pairs)
      val nScanned = scanned.groupBy(col("qid"))
        .agg(countDistinct(col("u")).as("n_scanned"))
      // ground truth from the PUBLISHED artifact (built lazily once
      // per (code, dataset); pre-warmed by the bench harness)
      val exact = SessionArtifact.table(spark, dir, "knn_gs_exact")(
        gsExactFrame(spark, dir))
      // exact side is |queries|·K rows — broadcast, so the final eval
      // join can never sort-merge (plan-pinned alongside the other
      // search families)
      found.select(col("qid"), col("u"), col("d"))
        .join(broadcast(exact.withColumn("hit", lit(1L))),
          Seq("qid", "u"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_found"),
          sum(coalesce(col("hit"), lit(0L))).as("n_matched"),
          min(col("d")).as("d_best"))
        .join(broadcast(nScanned), Seq("qid"), "left_outer")
        .select(col("qid").as("query_id"), col("n_found"),
          col("n_matched"),
          ppm(col("n_matched"), lit(NndK.toLong)).as("recall_ppm"),
          col("d_best"),
          coalesce(col("n_scanned"), lit(0L)).as("n_scanned"))
    } finally e.unpersist()
  }

  val knnGraphSearchSql: String = {
    val qeDot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * e.qv[i]))"
    // one hop = expand the beam through adj, re-score, keep top-GsBeam
    def beamCte(candSrc: String, out: String, k: Int = GsBeam) =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, u, d FROM (
         |    SELECT qid, u, d, row_number() OVER (
         |      PARTITION BY qid ORDER BY d, u) AS rnk
         |    FROM (SELECT DISTINCT t.qid, t.u,
         |            q.norm2 + e.norm2 - 2 * $qeDot AS d
         |          FROM $candSrc t
         |          JOIN gqs q ON t.qid = q.qid
         |          JOIN n e ON t.u = e.vec_id
         |          WHERE t.u <> t.qid))
         |  WHERE rnk <= $k)""".stripMargin
    val hops = (1 to GsHops).map { h =>
      s"""gc$h AS (SELECT b.qid, a.u FROM gw${h - 1} b
         |  JOIN gadj a ON b.u = a.v
         |  UNION SELECT qid, u FROM gw${h - 1}),
         |${beamCte(s"gc$h", s"gw$h")}""".stripMargin
    }.mkString(",\n")
    // every candidate ever offered for scoring: the entry-layer scan
    // plus each hop's candidate set — the oracle twin of `n_scanned`
    val scanCtes =
      s"""gscan AS (SELECT qid, u FROM gl0 WHERE u <> qid
         |  ${(1 to GsHops).map(h =>
             s"UNION SELECT qid, u FROM gc$h WHERE u <> qid")
             .mkString("\n  ")}),
         |gns AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scanned
         |  FROM gscan GROUP BY qid)""".stripMargin
    s"""WITH $sqlNndChain,
       |gadj AS MATERIALIZED (SELECT v, u FROM g$NndRounds
       |  UNION SELECT u AS v, v AS u FROM g$NndRounds),
       |gqs AS (SELECT vec_id AS qid, qv, norm2 FROM n
       |  WHERE vec_id % $sqlGsStride = 13),
       |glayer AS (SELECT vec_id AS u FROM n
       |  WHERE vec_id % $sqlGsLayerStride = 0),
       |gl0 AS (SELECT q.qid, l.u FROM gqs q, glayer l),
       |${beamCte("gl0", "gseed", GsEntrySeeds)},
       |${beamCte("gseed", "gw0")},
       |$scanCtes,
       |$hops,
       |gfk AS (
       |  SELECT qid, u, d FROM (
       |    SELECT qid, u, d, row_number() OVER (
       |      PARTITION BY qid ORDER BY d, u) AS rnk
       |    FROM gw$GsHops)
       |  WHERE rnk <= $NndK),
       |gex AS (
       |  SELECT q.qid, e.vec_id AS u, row_number() OVER (
       |    PARTITION BY q.qid
       |    ORDER BY q.norm2 + e.norm2 - 2 * $qeDot, e.vec_id) AS rnk
       |  FROM gqs q JOIN n e ON e.vec_id <> q.qid),
       |gexk AS (SELECT qid, u FROM gex WHERE rnk <= $NndK)
       |SELECT f.qid AS query_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched,
       |  ${sqlPpm("SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END)",
             NndK.toString)} AS recall_ppm,
       |  CAST(MIN(f.d) AS BIGINT) AS d_best,
       |  sc.n_scanned AS n_scanned
       |FROM gfk f LEFT JOIN gexk x ON f.qid = x.qid AND f.u = x.u
       |JOIN gns sc ON f.qid = sc.qid
       |GROUP BY f.qid, sc.n_scanned""".stripMargin
  }

  // --------------------------- graph ANN: incremental delta insert
  /** NIGHTLY MAINTENANCE for the graph-ANN family — the counterpart
    * of [[knnIvfDelta]]'s frozen-quantizer path: tonight's delta
    * vectors (the shared md5 [[DeltaMod]] split) are INSERTED into
    * "last night's" graph instead of triggering a full NN-Descent
    * rebuild. The HNSW insert shape (Malkov & Yashunin, TPAMI'18),
    * relationally:
    *
    *  1. last night's graph = the persisted NND graph restricted to
    *     base–base edges (what a build that never saw the delta would
    *     have published);
    *  2. each delta BEAM-SEARCHES that graph for its neighborhood —
    *     a fixed-seed, [[GdHops]]-hop, [[GsBeam]]-beam walk like
    *     [[knnGraphSearch]], scoring candidates with the exact int64
    *     squared L2;
    *  3. LOCAL-JOIN REFINE around the touched vertices only: two
    *     deltas that selected a common base neighbor are likely
    *     neighbors themselves (NN-Descent's "neighbor of my neighbor"
    *     step, restricted to the insert wavefront), so those
    *     delta–delta pairs are scored exactly and merged into each
    *     delta's top-[[NndK]].
    *
    * Per delta the work is O(hops · beam · degree) + O(refine pairs) —
    * independent of corpus size, while a full rebuild pays
    * [[NndRounds]] corpus-wide local joins. The report carries its own
    * evaluation per delta: `n_refine` (the refine-candidate count the
    * oracle twin must reproduce — the generated program shares hop,
    * beam and refine shapes), recall vs the FULL REBUILD on the
    * delta'd corpus (the persisted graph's own delta rows — how close
    * nightly maintenance gets to what a rebuild would publish), and
    * recall vs exact brute force (the absolute floor, spec-pinned).
    * The exact side is READ from the published `knn_gd_exact` ground
    * truth ([[gdExactFrame]], built once per (code, dataset)), so the
    * maintenance run itself never scans the corpus — neither for the
    * insert (graph-routed) nor for its own evaluation.
    */
  /** Exact L2 top-[[NndK]] over the FULL delta'd corpus for the delta
    * query set — [[knnGraphDelta]]'s absolute recall floor, published
    * once per (code, dataset) through the artifact seam like
    * [[gsExactFrame]]: repeat maintenance runs grade against a table
    * instead of re-paying the |delta|·n broadcast scan in-band.
    */
  private[analytics] def gdExactFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2"))
    val dq = e.where(isDelta)
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("norm2").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("u").asc)
    broadcast(dq)
      .join(e.select(col("vec_id").as("u"), col("q").as("qb"),
        col("norm2").as("nb")), col("qid") =!= col("u"))
      .select(col("qid"), col("u"),
        (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
          .as("d"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= NndK)
      .select(col("qid"), col("u"))
  }

  def knnGraphDelta(spark: SparkSession, dir: String): DataFrame = {
    val g = nndIndex(spark, dir) // persisted full graph (v, u, d)
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
      val base = e.where(!isDelta)
      val gb = g.where(!isDeltaId(col("v")) && !isDeltaId(col("u")))
        .select(col("v"), col("u")).localCheckpoint(true)
      val adjB = gb.union(gb.select(col("u").as("v"), col("v").as("u")))
        .distinct().localCheckpoint(true)
      val dq = e.where(isDelta)
        .select(col("vec_id").as("qid"), col("q").as("qq"),
          col("norm2").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("d").asc, col("u").asc)
      // exact-score a candidate set against the BASE corpus, keep the
      // per-delta top-k — the same broadcast-candidate shape as
      // knnGraphSearch (plan-pinned zero SMJ); dedup AFTER scoring,
      // the oracle's literal DISTINCT shape, so the candidate
      // broadcast build carries no shuffle
      def scoredTop(cand: DataFrame, k: Int): DataFrame =
        broadcast(cand)
          .join(base.select(col("vec_id").as("u"), col("q").as("qb"),
            col("norm2").as("nb")), "u")
          .join(broadcast(dq), "qid")
          .select(col("qid"), col("u"),
            (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
              .as("d"))
          .groupBy(col("qid"))
          .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(k))
            bk(col("d"), col("u")) }.as("tk"))
          .select(col("qid"), explode(col("tk")).as("bk"))
          .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
      // fixed entry points: the 4 smallest base ids (ids are
      // uncorrelated with embedding space — the reproducible stand-in
      // for HNSW's entry point, as in knnGraphSearch)
      val seeds = dq.select(col("qid")).crossJoin(
        broadcast(base.orderBy(col("vec_id").asc).limit(4)
          .select(col("vec_id").as("u"))))
      // data-sized hop checkpoints, as in knnGraphSearch: beam state
      // is |deltas|·beam rows
      val nDelta = dq.count()
      val bParts = ((nDelta * GsBeam + 499999L) / 500000L)
        .toInt.max(1).min(32)
      var beam = scoredTop(seeds, GsBeam).coalesce(bParts)
        .localCheckpoint(false) // next hop's broadcast materializes
      for (h <- 1 to GdHops) {
        val expanded = broadcast(beam.select(col("qid"), col("u").as("bu")))
          .join(adjB, col("bu") === col("v"))
          .select(col("qid"), col("u"))
        // last hop eager — the walk must materialize while the corpus
        // cache is live (finally-unpersist below)
        beam = scoredTop(expanded.unionByName(beam.select(col("qid"),
          col("u"))), GsBeam).coalesce(bParts)
          .localCheckpoint(h == GdHops)
      }
      // bounded bottom-k aggregation, as in scoredTop (beam rows are
      // already distinct per (qid, u))
      val inserted = beam.groupBy(col("qid"))
        .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
          bk(col("d"), col("u")) }.as("tk"))
        .select(col("qid"), explode(col("tk")).as("bk"))
        .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
        .localCheckpoint(true) // feeds refine pairs AND the final merge
      // refine wavefront: delta pairs sharing an inserted base
      // neighbor, scored exactly over the delta vectors (base u-keys
      // and delta u-keys are disjoint, so the merge has no dup keys)
      val pairsDD = inserted.select(col("qid").as("da"), col("u"))
        .join(inserted.select(col("qid").as("db"), col("u")), Seq("u"))
        .where(col("da") =!= col("db"))
        .select(col("da"), col("db")).distinct()
      val scoredDD = broadcast(pairsDD)
        .join(broadcast(dq.select(col("qid").as("da"), col("qq").as("qa"),
          col("qn").as("na"))), Seq("da"))
        .join(broadcast(dq.select(col("qid").as("db"), col("qq").as("qb2"),
          col("qn").as("nb2"))), Seq("db"))
        .select(col("da").as("qid"), col("db").as("u"),
          (col("na") + col("nb2") - lit(2L) * dot(col("qa"), col("qb2")))
            .as("d"))
        .localCheckpoint(true) // feeds the count AND the merge
      val refCnt = scoredDD.groupBy(col("qid"))
        .agg(count(lit(1)).as("n_refine"))
      val fin = inserted.unionByName(scoredDD)
        .groupBy(col("qid"))
        .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
          bk(col("d"), col("u")) }.as("tk"))
        .select(col("qid"), explode(col("tk")).as("bk"))
        .select(col("qid"), col("bk._2").as("u"))
      val rebuild = g.where(isDeltaId(col("v")))
        .select(col("v").as("qid"), col("u")).withColumn("hitr", lit(1L))
      // exact ground truth from the PUBLISHED artifact (the discipline
      // the rest of the eval family adopted in r10): the |delta|·n
      // scan is paid once per (code, dataset) by the artifact build,
      // not per maintenance run — the oracle still re-derives it from
      // the raw corpus every verify pass
      val exact = SessionArtifact.table(spark, dir, "knn_gd_exact")(
        gdExactFrame(spark, dir)).withColumn("hite", lit(1L))
      fin
        .join(broadcast(rebuild), Seq("qid", "u"), "left_outer")
        .join(broadcast(exact), Seq("qid", "u"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_final"),
          sum(coalesce(col("hitr"), lit(0L))).as("n_matched_rebuild"),
          sum(coalesce(col("hite"), lit(0L))).as("n_matched_exact"))
        .join(broadcast(refCnt), Seq("qid"), "left")
        .select(col("qid").as("vec_id"), col("n_final"),
          coalesce(col("n_refine"), lit(0L)).as("n_refine"),
          col("n_matched_rebuild"),
          ppm(col("n_matched_rebuild"), lit(NndK.toLong))
            .as("recall_rebuild_ppm"),
          col("n_matched_exact"),
          ppm(col("n_matched_exact"), lit(NndK.toLong))
            .as("recall_exact_ppm"))
    } finally e.unpersist()
  }

  val knnGraphDeltaSql: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("CAST(vec_id AS VARCHAR)")
    val qeDot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * e.qv[i]))"
    val xyDot =
      "list_sum(list_transform(generate_series(1, 64), i -> x.qv[i] * y.qv[i]))"
    def beamCte(candSrc: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, u, d FROM (
         |    SELECT qid, u, d, row_number() OVER (
         |      PARTITION BY qid ORDER BY d, u) AS rnk
         |    FROM (SELECT DISTINCT t.qid, t.u,
         |            q.norm2 + e.norm2 - 2 * $qeDot AS d
         |          FROM $candSrc t
         |          JOIN ddq q ON t.qid = q.qid
         |          JOIN dbse e ON t.u = e.vec_id))
         |  WHERE rnk <= $GsBeam)""".stripMargin
    val hops = (1 to GdHops).map { hh =>
      s"""dc$hh AS (SELECT b.qid, a.u FROM dw${hh - 1} b
         |  JOIN dgadjb a ON b.u = a.v
         |  UNION SELECT qid, u FROM dw${hh - 1}),
         |${beamCte(s"dc$hh", s"dw$hh")}""".stripMargin
    }.mkString(",\n")
    s"""WITH $sqlNndChain,
       |dgb AS (SELECT v, u FROM g$NndRounds
       |  WHERE NOT EXISTS (SELECT 1 FROM n WHERE vec_id = v
       |          AND $h % $DeltaMod = 3)
       |    AND NOT EXISTS (SELECT 1 FROM n WHERE vec_id = u
       |          AND $h % $DeltaMod = 3)),
       |dgadjb AS MATERIALIZED (SELECT v, u FROM dgb
       |  UNION SELECT u AS v, v AS u FROM dgb),
       |ddq AS (SELECT vec_id AS qid, qv, norm2 FROM n
       |  WHERE $h % $DeltaMod = 3),
       |dbse AS (SELECT vec_id, qv, norm2 FROM n
       |  WHERE $h % $DeltaMod <> 3),
       |dseeds AS (
       |  SELECT q.qid, s.u FROM ddq q,
       |    (SELECT vec_id AS u FROM dbse ORDER BY vec_id LIMIT 4) s),
       |${beamCte("dseeds", "dw0")},
       |$hops,
       |dins AS MATERIALIZED (
       |  SELECT qid, u, d FROM (
       |    SELECT qid, u, d, row_number() OVER (
       |      PARTITION BY qid ORDER BY d, u) AS rnk
       |    FROM dw$GdHops)
       |  WHERE rnk <= $NndK),
       |ddp AS (
       |  SELECT DISTINCT a.qid AS da, b.qid AS db
       |  FROM dins a JOIN dins b ON a.u = b.u AND a.qid <> b.qid),
       |dds AS MATERIALIZED (
       |  SELECT p.da AS qid, p.db AS u,
       |    x.norm2 + y.norm2 - 2 * $xyDot AS d
       |  FROM ddp p JOIN n x ON p.da = x.vec_id
       |  JOIN n y ON p.db = y.vec_id),
       |drefc AS (
       |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_refine
       |  FROM dds GROUP BY qid),
       |dfin AS (
       |  SELECT qid, u FROM (
       |    SELECT qid, u, row_number() OVER (
       |      PARTITION BY qid ORDER BY d, u) AS rnk
       |    FROM (SELECT qid, u, d FROM dins
       |          UNION ALL SELECT qid, u, d FROM dds))
       |  WHERE rnk <= $NndK),
       |drebuild AS (
       |  SELECT g.v AS qid, g.u FROM g$NndRounds g
       |  WHERE EXISTS (SELECT 1 FROM n WHERE vec_id = g.v
       |    AND $h % $DeltaMod = 3)),
       |dexact AS (
       |  SELECT qid, u FROM (
       |    SELECT q.qid, e.vec_id AS u, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY q.norm2 + e.norm2 - 2 * $qeDot, e.vec_id) AS rnk
       |    FROM ddq q JOIN n e ON e.vec_id <> q.qid)
       |  WHERE rnk <= $NndK)
       |SELECT f.qid AS vec_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_final,
       |  CAST(COALESCE(MIN(c.n_refine), 0) AS BIGINT) AS n_refine,
       |  CAST(SUM(CASE WHEN r.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched_rebuild,
       |  ${sqlPpm("SUM(CASE WHEN r.u IS NOT NULL THEN 1 ELSE 0 END)",
           NndK.toString)} AS recall_rebuild_ppm,
       |  CAST(SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched_exact,
       |  ${sqlPpm("SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END)",
           NndK.toString)} AS recall_exact_ppm
       |FROM dfin f
       |LEFT JOIN drebuild r ON f.qid = r.qid AND f.u = r.u
       |LEFT JOIN dexact x ON f.qid = x.qid AND f.u = x.u
       |LEFT JOIN drefc c ON f.qid = c.qid
       |GROUP BY f.qid""".stripMargin
  }

  // --------------------------------- k-center (farthest-point) init
  /** Farthest-point traversal (Gonzalez' 2-approximate k-CENTER) as a
    * quantizer INITIALIZATION, with the coverage radius after every
    * pick — the quality curve that tells a training loop whether its
    * k-means seeds actually spread (the hash-sample init used by
    * [[knnIvfTrained]] is uniform; k-center guarantees every point is
    * within 2× the optimal radius of some seed). Start = bottom-1 by
    * the shared deterministic [[hashOrder]]; each round picks the
    * point FARTHEST from its nearest chosen center (exact int64
    * squared L2, ties by vec_id) and reports the new max-min radius.
    *
    * Scale shape: the candidate argmax is a TakeOrderedAndProject
    * (O(1) state per partition); the running min-distance column is
    * one narrow map per round against a broadcast single centroid
    * (the chosen vector rides as a LITERAL — 64 longs); rounds are
    * checkpointed so the plan stays flat. Driver traffic is one row +
    * one scalar per round — K-bounded, corpus-independent.
    */
  val KcenterK = 8

  private def distToLit(cq: Seq[Long], cn: Long): Column =
    col("norm2") + lit(cn) - lit(2L) * dot(col("q"), typedlit(cq))

  /** The farthest-point walk over a cached `(vec_id, q, norm2)` frame:
    * per-round (pick, radius-after) plus the FINAL min-distance frame
    * (the k-center assignment cost surface [[embInitQuality]] folds).
    */
  private def kcenterWalk(e: DataFrame, withRadii: Boolean = true)
      : (Seq[(Long, Long, Long)], DataFrame) = {
    def centroidOf(r: org.apache.spark.sql.Row): (Long, Seq[Long], Long) =
      (r.getLong(0), r.getSeq[Long](1), r.getLong(2))
    val (cid, cq, cn) = centroidOf(hashBottomK(e, 1)
      .select(col("vec_id"), col("q"), col("norm2")).head)
    var dm = e.withColumn("dmin", distToLit(cq, cn)).localCheckpoint(true)
    // the per-round radius costs one corpus max-aggregation — skipped
    // when the caller only folds the final dm (embInitQuality)
    def radius(): Long =
      if (withRadii) dm.agg(max(col("dmin"))).head.getLong(0) else 0L
    val out = collection.mutable.ArrayBuffer((1L, cid, radius()))
    for (r <- 2 to KcenterK) {
      val nxt = dm.orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("q"), col("norm2")).head
      val (nid, nq, nn) = centroidOf(nxt)
      dm = dm.withColumn("dmin",
        least(col("dmin"), distToLit(nq, nn))).localCheckpoint(true)
      out += ((r.toLong, nid, radius()))
    }
    (out.toSeq, dm)
  }

  def embKcenterInit(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
      import spark.implicits._
      kcenterWalk(e)._1.toDF("rnd", "centroid_id", "radius_d2")
    } finally e.unpersist()
  }

  /** INITIALIZATION QUALITY, hash-sample vs k-center, K=[[KcenterK]]
    * seeds each: the one-assignment-pass inertia (Σ min squared
    * distance — the k-means objective the first Lloyd round starts
    * from) and the coverage radius (max min distance — the k-center
    * objective). The uniform hash sample is what [[knnIvfTrained]]
    * seeds with; the farthest-point walk buys its 2-approximate
    * radius guarantee at K extra passes — this report prices that
    * trade with both objectives exact-integer and hash-gated.
    * On this corpus k-center wins radius decisively (its guarantee)
    * and edges inertia too (~1% at sf0.1) — on clustered real-world
    * embeddings the uniform sample usually claws inertia back
    * (outlier seeds pull k-center means), which is exactly what this
    * report exists to measure per corpus.
    */
  def embInitQuality(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
      val dmK = kcenterWalk(e, withRadii = false)._2
      val hashSeeds = hashBottomK(e, KcenterK)
        .select(col("vec_id"), col("q"), col("norm2")).collect()
        .map(r => (r.getSeq[Long](1), r.getLong(2)))
      val dmH = e.withColumn("dmin",
        hashSeeds.map { case (cq, cn) => distToLit(cq, cn) }
          .reduce(least(_, _)))
      def report(scheme: String, dm: DataFrame) = dm
        .agg(sum(col("dmin")).as("inertia"),
          max(col("dmin")).as("radius_d2"))
        .select(lit(scheme).as("init_scheme"),
          lit(KcenterK.toLong).as("k"), col("inertia"), col("radius_d2"))
      report("hash_sample", dmH).unionByName(report("kcenter", dmK))
        // 2 rows; materialize while the quantized corpus is cached
        .localCheckpoint(true)
    } finally e.unpersist()
  }

  val embInitQualitySql: String = {
    val dotAB = sqlDot // the canonical a/b quantized-dot fragment
    // the k-center CTE chain is shared with embKcenterInitSql's
    // construction (same rounds); here only dm8's fold is read
    val rounds = (2 to KcenterK).map { r =>
      s"""c$r AS MATERIALIZED (SELECT vec_id, qv, norm2 FROM dm${r - 1}
         |  ORDER BY dmin DESC, vec_id ASC LIMIT 1),
         |dm$r AS MATERIALIZED (
         |  SELECT a.vec_id, a.qv, a.norm2,
         |    LEAST(a.dmin, a.norm2 + b.norm2 - 2 * $dotAB) AS dmin
         |  FROM dm${r - 1} a, c$r b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |c1 AS MATERIALIZED (SELECT vec_id, qv, norm2 FROM cranked
       |  WHERE hrnk = 1),
       |dm1 AS MATERIALIZED (
       |  SELECT a.vec_id, a.qv, a.norm2,
       |    a.norm2 + b.norm2 - 2 * $dotAB AS dmin
       |  FROM n a, c1 b),
       |$rounds,
       |hs AS (SELECT vec_id, qv, norm2 FROM cranked
       |  WHERE hrnk <= $KcenterK),
       |dmh AS (
       |  SELECT a.vec_id,
       |    MIN(a.norm2 + b.norm2 - 2 * $dotAB) AS dmin
       |  FROM n a CROSS JOIN hs b GROUP BY a.vec_id)
       |SELECT 'hash_sample' AS init_scheme, CAST($KcenterK AS BIGINT) AS k,
       |  CAST(SUM(dmin) AS BIGINT) AS inertia,
       |  CAST(MAX(dmin) AS BIGINT) AS radius_d2 FROM dmh
       |UNION ALL
       |SELECT 'kcenter', $KcenterK, CAST(SUM(dmin) AS BIGINT),
       |  CAST(MAX(dmin) AS BIGINT) FROM dm$KcenterK""".stripMargin
  }

  val embKcenterInitSql: String = {
    val dotAB = sqlDot // the canonical a/b quantized-dot fragment
    val rounds = (2 to KcenterK).map { r =>
      s"""c$r AS MATERIALIZED (SELECT vec_id, qv, norm2 FROM dm${r - 1}
         |  ORDER BY dmin DESC, vec_id ASC LIMIT 1),
         |dm$r AS MATERIALIZED (
         |  SELECT a.vec_id, a.qv, a.norm2,
         |    LEAST(a.dmin, a.norm2 + b.norm2 - 2 * $dotAB) AS dmin
         |  FROM dm${r - 1} a, c$r b),
         |r$r AS (SELECT $r AS rnd, (SELECT vec_id FROM c$r) AS centroid_id,
         |  MAX(dmin) AS radius_d2 FROM dm$r)""".stripMargin
    }.mkString(",\n")
    val unions = (2 to KcenterK).map(r => s"SELECT * FROM r$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $sqlQuantized,
       |$sqlCranked,
       |c1 AS MATERIALIZED (SELECT vec_id, qv, norm2 FROM cranked
       |  WHERE hrnk = 1),
       |dm1 AS MATERIALIZED (
       |  SELECT a.vec_id, a.qv, a.norm2,
       |    a.norm2 + b.norm2 - 2 * $dotAB AS dmin
       |  FROM n a, c1 b),
       |r1 AS (SELECT 1 AS rnd, (SELECT vec_id FROM c1) AS centroid_id,
       |  MAX(dmin) AS radius_d2 FROM dm1),
       |$rounds
       |SELECT CAST(rnd AS BIGINT) AS rnd, centroid_id,
       |  CAST(radius_d2 AS BIGINT) AS radius_d2
       |FROM (SELECT * FROM r1
       |UNION ALL
       |$unions)""".stripMargin
  }

  // ------------------------------ graph ANN: Vamana occlusion pruning
  /** DiskANN/Vamana ROBUST-PRUNE over the persisted K-NN graph
    * (Subramanya et al., "DiskANN", NeurIPS 2019; α=1 degenerates to
    * Toussaint's relative-neighborhood rule): per vertex, walk the
    * neighbor list in (distance, id) order and KEEP a candidate only
    * if no already-kept neighbor occludes it — kept w occludes u when
    * `α·d(w,u) ≤ d(v,u)`. Pruning trades raw adjacency recall for
    * DIVERSE edges (each kept edge opens a direction no earlier edge
    * covers), which is what keeps beam search's hop count low on a
    * disk-resident graph; the serving index ships the pruned graph.
    * α is the rational [[PruneAlphaNum]]/[[PruneAlphaDen]] so the
    * occlusion test stays exact-integer (`1·dab ≤ 1·dvu`); α=1 is the
    * right setting for THIS corpus — uniform-random embeddings are
    * distance-concentrated, so the paper's α=1.2 would occlude almost
    * nothing (pairwise distances rarely drop 20% below the
    * vertex-candidate distance) and the query would be vacuous.
    * Round11OpsSpec pins non-vacuity (edges actually removed, rank-1
    * always kept) and that beam search over the pruned graph retains
    * most of the unpruned search's recall.
    *
    * Scale shape: the candidate pair frame is degree²-bounded per
    * vertex (n·K(K−1)/2 rows, NEVER corpus×corpus), shuffled on the
    * vertex key once; the greedy fold is K−1 rank rounds, each one
    * v-keyed join over n-row frames with the kept set checkpointed —
    * the relational form of DiskANN's in-memory per-vertex loop. At
    * 10⁹ vertices every frame partitions by v; nothing is collected.
    */
  val PruneAlphaNum = 1L
  val PruneAlphaDen = 1L

  /** The pruned adjacency itself — (v, u, d, rnk) rows that survive
    * robust-prune; shared by the gated report query and the spec's
    * search-quality pin.
    */
  private[analytics] def prunedGraph(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.bridge.checkpointKeyedEager
    val g = nndIndex(spark, dir)
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("norm2")).cache()
    try {
      // every frame the K−1 greedy rounds touch is keyed by the vertex.
      // DATA-ADAPTIVE materialization (guide §2 — scale-adaptive, not
      // tuned to one mode): when the per-round frames fit one ~500k-row
      // partition, AQE broadcasts them and plain eager checkpoints are
      // exchange-free and cheapest; past that, checkpointKeyed pins the
      // vertex partitioning so the occlusion joins, the distinct and
      // the anti-join plan ZERO exchanges per round instead of
      // re-shuffling n-row frames ×(K−1) rounds. Eager either way: the
      // frames feed concurrent broadcast builds (see checkpointKeyedEager).
      // The rank itself comes from the bounded bottom-K aggregation
      // (buffer position == row_number over (d, u) — the graph is
      // unique per (v, u)), not a window sort.
      val parts = {
        val n = g.count()
        (((n + 499999L) / 500000L).toInt.max(1)).min(32)
      }
      def pin(df: DataFrame): DataFrame =
        if (parts == 1) df.localCheckpoint(true)
        else checkpointKeyedEager(df, parts, eager = true, "v")
      val cand = pin(
        g.groupBy(col("v"))
          .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
            bk(col("d"), col("u")) }.as("tk"))
          .select(col("v"), posexplode(col("tk")).as(Seq("p", "bk")))
          .select(col("v"), col("bk._2").as("u"), col("bk._1").as("d"),
            (col("p") + 1).cast("long").as("rnk")))
      val pw = pin(
        cand.select(col("v"), col("u").as("ua"), col("rnk").as("ra"))
          .join(cand.select(col("v"), col("u").as("ub"),
            col("rnk").as("rb")), Seq("v"))
          .where(col("ra") < col("rb"))
          .join(e.select(col("vec_id").as("ua"), col("q").as("qa"),
            col("norm2").as("na")), "ua")
          .join(e.select(col("vec_id").as("ub"), col("q").as("qb"),
            col("norm2").as("nb")), "ub")
          .select(col("v"), col("ra"), col("rb"),
            (col("na") + col("nb") - lit(2L) * dot(col("qa"), col("qb")))
              .as("dab")))
      var kept = cand.where(col("rnk") === 1).select(col("v"), col("rnk"))
      for (r <- 2 to NndK) {
        val candR = cand.where(col("rnk") === r).select(col("v"), col("d"))
        val occluded = pw.where(col("rb") === r)
          .join(kept.withColumnRenamed("rnk", "ra"), Seq("v", "ra"))
          .join(candR, "v")
          .where(col("dab") * lit(PruneAlphaNum) <=
            col("d") * lit(PruneAlphaDen))
          .select(col("v")).distinct()
        kept = pin(
          kept.unionByName(
            candR.join(occluded, Seq("v"), "left_anti")
              .select(col("v"), lit(r.toLong).as("rnk"))))
      }
      kept.join(cand, Seq("v", "rnk"))
        .select(col("v"), col("u"), col("d"), col("rnk"))
        .localCheckpoint(true)
    } finally e.unpersist()
  }

  /** The pruned graph is itself an INDEX, published through the
    * artifact seam ("vamana_graph") by [[knnGraphPrune]] — the build
    * job — and only READ by [[knnGraphSearchPruned]], mirroring the
    * nnd_graph build/search split.
    */
  private def vamanaIndex(spark: SparkSession, dir: String): DataFrame =
    SessionArtifact.table(spark, dir, "vamana_graph")(
      prunedGraph(spark, dir))

  def knnGraphPrune(spark: SparkSession, dir: String): DataFrame = {
    val g = nndIndex(spark, dir)
    // this IS the nightly build: republish the pruned index and
    // report off the READ-BACK, so the hash gate re-proves the sink
    // round-trip every run (the knnGraphNnd pattern)
    val keptD = SessionArtifact.rebuild(spark, dir, "vamana_graph")(
      prunedGraph(spark, dir)).select(col("v"), col("d"))
    val totals = keptD.agg(count(lit(1)).as("edges_after"))
      .crossJoin(broadcast(g.agg(count(lit(1)).as("edges_before"))))
    keptD.groupBy(col("v"))
      .agg(count(lit(1)).as("degree"), sum(col("d")).as("sumd"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_vertices"), sum(col("sumd")).as("sum_d_kept"))
      .crossJoin(broadcast(totals))
      .select(col("degree"), col("n_vertices"), col("sum_d_kept"),
        col("edges_before"), col("edges_after"))
  }

  /** The robust-prune CTE chain (cand → pairwise → greedy kept set
    * ka[[NndK]]) over the [[sqlNndChain]] graph — shared by the prune
    * report oracle and the pruned-search oracle.
    */
  private lazy val sqlPruneChain: String = {
    val dotAB = sqlDot // the canonical a/b quantized-dot fragment
    val keptChain = (2 to NndK).map { r =>
      s"""k$r AS (
         |  SELECT c.v, c.rnk FROM cand c WHERE c.rnk = $r AND NOT EXISTS (
         |    SELECT 1 FROM ka${r - 1} k JOIN pw p
         |      ON p.v = k.v AND p.ra = k.rnk AND p.rb = $r
         |    WHERE p.v = c.v
         |      AND $PruneAlphaNum * p.dab <= $PruneAlphaDen * c.d)),
         |ka$r AS MATERIALIZED (SELECT v, rnk FROM ka${r - 1}
         |  UNION ALL SELECT v, rnk FROM k$r)""".stripMargin
    }.mkString(",\n")
    s"""cand AS MATERIALIZED (
       |  SELECT v, u, d, CAST(row_number() OVER (
       |    PARTITION BY v ORDER BY d, u) AS BIGINT) AS rnk
       |  FROM g$NndRounds),
       |pw AS MATERIALIZED (
       |  SELECT t.v, t.ra, t.rb, a.norm2 + b.norm2 - 2 * $dotAB AS dab
       |  FROM (SELECT x.v, x.u AS ua, x.rnk AS ra, y.u AS ub, y.rnk AS rb
       |        FROM cand x JOIN cand y ON x.v = y.v AND x.rnk < y.rnk) t
       |  JOIN n a ON t.ua = a.vec_id JOIN n b ON t.ub = b.vec_id),
       |ka1 AS (SELECT v, rnk FROM cand WHERE rnk = 1),
       |$keptChain""".stripMargin
  }

  val knnGraphPruneSql: String =
    s"""WITH $sqlNndChain,
       |$sqlPruneChain,
       |kd AS (SELECT k.v, c.d FROM ka$NndK k
       |  JOIN cand c ON k.v = c.v AND k.rnk = c.rnk),
       |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS degree,
       |  SUM(d) AS sumd FROM kd GROUP BY v)
       |SELECT degree, COUNT(*) AS n_vertices,
       |  CAST(SUM(sumd) AS BIGINT) AS sum_d_kept,
       |  (SELECT COUNT(*) FROM cand) AS edges_before,
       |  (SELECT COUNT(*) FROM kd) AS edges_after
       |FROM deg GROUP BY degree""".stripMargin

  /** QUERY-TIME SEARCH OVER THE PRUNED INDEX — the serving half of
    * the Vamana story: the identical beam walk as [[knnGraphSearch]]
    * ([[searchOver]] is shared code) but through the PUBLISHED pruned
    * adjacency, so the oracle gate — which re-derives NND
    * construction, robust-prune, and the unrolled beam — proves that
    * what the DISK-SHAPED index (fewer, diverse edges) returns is
    * exactly what the algorithm specifies, per query, with recall vs
    * the exact top-K in-band. Together with knn_graph_search this
    * pair quantifies the prune's cost/recall trade under the hash
    * gate rather than only in a spec.
    */
  def knnGraphSearchPruned(spark: SparkSession, dir: String): DataFrame =
    searchOver(spark, dir, vamanaIndex(spark, dir))

  val knnGraphSearchPrunedSql: String = {
    val qeDot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * e.qv[i]))"
    def beamCte(candSrc: String, out: String, k: Int = GsBeam) =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, u, d FROM (
         |    SELECT qid, u, d, row_number() OVER (
         |      PARTITION BY qid ORDER BY d, u) AS rnk
         |    FROM (SELECT DISTINCT t.qid, t.u,
         |            q.norm2 + e.norm2 - 2 * $qeDot AS d
         |          FROM $candSrc t
         |          JOIN gqs q ON t.qid = q.qid
         |          JOIN n e ON t.u = e.vec_id
         |          WHERE t.u <> t.qid))
         |  WHERE rnk <= $k)""".stripMargin
    val hops = (1 to GsHops).map { h =>
      s"""gc$h AS (SELECT b.qid, a.u FROM gw${h - 1} b
         |  JOIN gadj a ON b.u = a.v
         |  UNION SELECT qid, u FROM gw${h - 1}),
         |${beamCte(s"gc$h", s"gw$h")}""".stripMargin
    }.mkString(",\n")
    // every candidate ever offered for scoring: the entry-layer scan
    // plus each hop's candidate set — the oracle twin of `n_scanned`
    val scanCtes =
      s"""gscan AS (SELECT qid, u FROM gl0 WHERE u <> qid
         |  ${(1 to GsHops).map(h =>
             s"UNION SELECT qid, u FROM gc$h WHERE u <> qid")
             .mkString("\n  ")}),
         |gns AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scanned
         |  FROM gscan GROUP BY qid)""".stripMargin
    s"""WITH $sqlNndChain,
       |$sqlPruneChain,
       |kd2 AS (SELECT k.v, c.u FROM ka$NndK k
       |  JOIN cand c ON k.v = c.v AND k.rnk = c.rnk),
       |gadj AS MATERIALIZED (SELECT v, u FROM kd2
       |  UNION SELECT u AS v, v AS u FROM kd2),
       |gqs AS (SELECT vec_id AS qid, qv, norm2 FROM n
       |  WHERE vec_id % $sqlGsStride = 13),
       |glayer AS (SELECT vec_id AS u FROM n
       |  WHERE vec_id % $sqlGsLayerStride = 0),
       |gl0 AS (SELECT q.qid, l.u FROM gqs q, glayer l),
       |${beamCte("gl0", "gseed", GsEntrySeeds)},
       |${beamCte("gseed", "gw0")},
       |$scanCtes,
       |$hops,
       |gfk AS (
       |  SELECT qid, u, d FROM (
       |    SELECT qid, u, d, row_number() OVER (
       |      PARTITION BY qid ORDER BY d, u) AS rnk
       |    FROM gw$GsHops)
       |  WHERE rnk <= $NndK),
       |gex AS (
       |  SELECT q.qid, e.vec_id AS u, row_number() OVER (
       |    PARTITION BY q.qid
       |    ORDER BY q.norm2 + e.norm2 - 2 * $qeDot, e.vec_id) AS rnk
       |  FROM gqs q JOIN n e ON e.vec_id <> q.qid),
       |gexk AS (SELECT qid, u FROM gex WHERE rnk <= $NndK)
       |SELECT f.qid AS query_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched,
       |  ${sqlPpm("SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END)",
             NndK.toString)} AS recall_ppm,
       |  CAST(MIN(f.d) AS BIGINT) AS d_best,
       |  sc.n_scanned AS n_scanned
       |FROM gfk f LEFT JOIN gexk x ON f.qid = x.qid AND f.u = x.u
       |JOIN gns sc ON f.qid = sc.qid
       |GROUP BY f.qid, sc.n_scanned""".stripMargin
  }

  // ------------------------------- graph ANN: FILTERED beam search
  /** FILTERED ANN over the pruned Vamana index — "nearest neighbors
    * WHERE label = ℓ", the retrieval shape production almost always
    * needs (metadata predicate riding the vector search). The index
    * here is filter-OBLIVIOUS (one graph for all labels), so the
    * right recipe is the ACORN one (Patel et al., SIGMOD'24; also
    * how filter-oblivious HNSW deployments behave): NAVIGATE the
    * graph unfiltered — pruning navigation to matching vertices would
    * fragment the walk, since pruned-graph edges cross labels — with
    * the beam WIDENED by [[FsBeamMult]] to compensate for predicate
    * selectivity (~10% per label ⇒ 2× beam keeps the expected number
    * of matching visited vertices at the unfiltered search's level),
    * then POST-FILTER the visited pool and return the matching
    * top-[[NndK]]. Naive post-filtering of an UNWIDENED top-K is the
    * high-selectivity failure mode the widening exists to fix.
    * (Filtered-DiskANN's per-label entry points need a filter-AWARE
    * build — StitchedVamana — which is an index-time choice, not a
    * query-time one; over a shared index the widened walk is the
    * standard recipe.)
    *
    * Per query: n_found (matching candidates the walk surfaced, ≤ K),
    * recall vs the EXACT filtered brute floor (read from the published
    * `knn_fs_exact` artifact), best distance. Queries whose visited
    * pool has no matching vertex produce no row — the oracle twin
    * group-by drops them identically. Scale shape: identical to
    * [[searchOver]] (broadcast beam probes, no corpus scan at query
    * time); the widened beam only scales the |queries|·beam frame.
    */
  val FsBeamMult = 2

  /** Exact label-filtered L2 top-[[NndK]] for the search query set —
    * the filtered walk's recall floor, published once per
    * (code, dataset) like [[gsExactFrame]].
    */
  private[analytics] def fsExactFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("label"), col("q"), col("norm2"))
    val qs = e.where(col("vec_id") % gsStride(e.count()) === 13)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("q").as("qq"), col("norm2").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("u").asc)
    broadcast(qs)
      .join(e.select(col("vec_id").as("u"), col("label"),
        col("q").as("qb"), col("norm2").as("nb")),
        col("qid") =!= col("u") && col("label") === col("qlabel"))
      .select(col("qid"), col("u"),
        (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
          .as("d"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= NndK)
      .select(col("qid"), col("u"))
  }

  def knnFilteredSearch(spark: SparkSession, dir: String): DataFrame =
    filteredSearchFrame(spark, dir, FsBeamMult)

  /** The filtered walk at an explicit beam multiplier — `FsBeamMult`
    * for the gated query; the spec runs mult=1 alongside to pin that
    * the widening (not the post-filter alone) carries the recall.
    */
  private[analytics] def filteredSearchFrame(spark: SparkSession,
      dir: String, beamMult: Int): DataFrame = {
    val fsBeam = GsBeam * beamMult
    val g = vamanaIndex(spark, dir)
    val adj = g.select(col("v"), col("u"))
      .union(g.select(col("u").as("v"), col("v").as("u")))
      .distinct().localCheckpoint(false) // first hop materializes
    val e = quantized(spark, dir)
      .select(col("vec_id"), col("label"), col("q"), col("norm2")).cache()
    try {
      val n = e.count()
      val qs = e.where(col("vec_id") % gsStride(n) === 13)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("q").as("qq"), col("norm2").as("qn"))
      // bounded bottom-k aggregation instead of distinct + window —
      // see searchOver: same rows, one exchange, no sort
      def scoredTop(cand: DataFrame, k: Int): DataFrame =
        broadcast(cand)
          .join(e.select(col("vec_id").as("u"), col("q").as("qb"),
            col("norm2").as("nb")), "u")
          .join(broadcast(qs), "qid")
          .where(col("u") =!= col("qid"))
          .select(col("qid"), col("u"),
            (col("qn") + col("nb") - lit(2L) * dot(col("qq"), col("qb")))
              .as("d"))
          .groupBy(col("qid"))
          .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(k))
            bk(col("d"), col("u")) }.as("tk"))
          .select(col("qid"), explode(col("tk")).as("bk"))
          .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
      // LAYER-ROUTED entry (see GsLayerCap): the filter-oblivious walk
      // starts at the query's nearest coarse-layer members, same as
      // the unfiltered searches — bounded routing at any corpus size
      val entryCands = qs.select(col("qid")).crossJoin(broadcast(
        e.where(col("vec_id") % gsLayerStride(n) === 0)
          .select(col("vec_id").as("u"))))
      val seeds = scoredTop(entryCands, GsEntrySeeds)
        .select(col("qid"), col("u"))
      val bParts = (((n / gsStride(n) + 1) * fsBeam + 499999L) / 500000L)
        .toInt.max(1).min(32)
      var beam = scoredTop(seeds, fsBeam).coalesce(bParts)
        .localCheckpoint(false) // next hop's broadcast materializes
      var visited = beam
      // lazy scanned accumulation — see searchOver
      val candFrames = Seq.newBuilder[DataFrame]
      candFrames += entryCands
      for (h <- 1 to GsHops) {
        val frontier = beam.select(col("qid"), col("u").as("bu"))
        val expanded = broadcast(frontier)
          .join(adj, col("bu") === col("v"))
          .select(col("qid"), col("u"))
        val cand = expanded.unionByName(beam.select(col("qid"), col("u")))
        candFrames += cand
        // last hop eager — see searchOver: the walk must materialize
        // while the corpus cache is live (finally-unpersist below)
        beam = scoredTop(cand, fsBeam).coalesce(bParts)
          .localCheckpoint(h == GsHops)
        visited = visited.unionByName(beam)
      }
      val scanned = candFrames.result()
        .map(_.select(col("qid"), col("u")))
        .reduce(_ unionByName _)
        .where(col("u") =!= col("qid"))
      // post-filter the visited pool to the query's label, top-K —
      // the bounded bottom-k aggregation dedups the visited pool as
      // it selects, so the separate distinct exchange is gone too
      val filt = visited
        .join(e.select(col("vec_id").as("u"), col("label")), "u")
        .join(broadcast(qs.select(col("qid"), col("qlabel"))), "qid")
        .where(col("label") === col("qlabel"))
        .groupBy(col("qid"))
        .agg({ val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
          bk(col("d"), col("u")) }.as("tk"))
        .select(col("qid"), explode(col("tk")).as("bk"))
        .select(col("qid"), col("bk._2").as("u"), col("bk._1").as("d"))
      val exact = SessionArtifact.table(spark, dir, "knn_fs_exact")(
        fsExactFrame(spark, dir))
      val nScanned = scanned.groupBy(col("qid"))
        .agg(countDistinct(col("u")).as("n_scanned"))
      filt.select(col("qid"), col("u"), col("d"))
        .join(broadcast(exact.withColumn("hit", lit(1L))),
          Seq("qid", "u"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_found"),
          sum(coalesce(col("hit"), lit(0L))).as("n_matched"),
          min(col("d")).as("d_best"))
        .join(broadcast(nScanned), Seq("qid"), "left_outer")
        .select(col("qid").as("query_id"), col("n_found"),
          col("n_matched"),
          ppm(col("n_matched"), lit(NndK.toLong)).as("recall_ppm"),
          col("d_best"),
          coalesce(col("n_scanned"), lit(0L)).as("n_scanned"))
    } finally e.unpersist()
  }

  val knnFilteredSearchSql: String = {
    val fsBeam = GsBeam * FsBeamMult
    val qeDot =
      "list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * e.qv[i]))"
    def beamCte(candSrc: String, out: String, k: Int = fsBeam) =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, u, d FROM (
         |    SELECT qid, u, d, row_number() OVER (
         |      PARTITION BY qid ORDER BY d, u) AS rnk
         |    FROM (SELECT DISTINCT t.qid, t.u,
         |            q.norm2 + e.norm2 - 2 * $qeDot AS d
         |          FROM $candSrc t
         |          JOIN gqs q ON t.qid = q.qid
         |          JOIN n e ON t.u = e.vec_id
         |          WHERE t.u <> t.qid))
         |  WHERE rnk <= $k)""".stripMargin
    val hops = (1 to GsHops).map { h =>
      s"""gc$h AS (SELECT b.qid, a.u FROM gw${h - 1} b
         |  JOIN gadj a ON b.u = a.v
         |  UNION SELECT qid, u FROM gw${h - 1}),
         |${beamCte(s"gc$h", s"gw$h")}""".stripMargin
    }.mkString(",\n")
    // every candidate ever offered for scoring: the entry-layer scan
    // plus each hop's candidate set — the oracle twin of `n_scanned`
    val scanCtes =
      s"""gscan AS (SELECT qid, u FROM gl0 WHERE u <> qid
         |  ${(1 to GsHops).map(h =>
             s"UNION SELECT qid, u FROM gc$h WHERE u <> qid")
             .mkString("\n  ")}),
         |gns AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scanned
         |  FROM gscan GROUP BY qid)""".stripMargin
    val visUnion = (0 to GsHops)
      .map(h => s"SELECT qid, u, d FROM gw$h").mkString(" UNION ALL ")
    s"""WITH $sqlNndChain,
       |$sqlPruneChain,
       |kd2 AS (SELECT k.v, c.u FROM ka$NndK k
       |  JOIN cand c ON k.v = c.v AND k.rnk = c.rnk),
       |gadj AS MATERIALIZED (SELECT v, u FROM kd2
       |  UNION SELECT u AS v, v AS u FROM kd2),
       |gqs AS (SELECT vec_id AS qid, label AS qlabel, qv, norm2 FROM n
       |  WHERE vec_id % $sqlGsStride = 13),
       |glayer AS (SELECT vec_id AS u FROM n
       |  WHERE vec_id % $sqlGsLayerStride = 0),
       |gl0 AS (SELECT q.qid, l.u FROM gqs q, glayer l),
       |${beamCte("gl0", "gseed", GsEntrySeeds)},
       |${beamCte("gseed", "gw0")},
       |$scanCtes,
       |$hops,
       |vis AS (SELECT DISTINCT qid, u, d FROM ($visUnion)),
       |gfk AS (
       |  SELECT qid, u, d FROM (
       |    SELECT v.qid, v.u, v.d, row_number() OVER (
       |      PARTITION BY v.qid ORDER BY v.d, v.u) AS rnk
       |    FROM vis v
       |    JOIN n e ON v.u = e.vec_id
       |    JOIN gqs q ON v.qid = q.qid AND e.label = q.qlabel)
       |  WHERE rnk <= $NndK),
       |gex AS (
       |  SELECT q.qid, e.vec_id AS u, row_number() OVER (
       |    PARTITION BY q.qid
       |    ORDER BY q.norm2 + e.norm2 - 2 * $qeDot, e.vec_id) AS rnk
       |  FROM gqs q JOIN n e
       |    ON e.vec_id <> q.qid AND e.label = q.qlabel),
       |gexk AS (SELECT qid, u FROM gex WHERE rnk <= $NndK)
       |SELECT f.qid AS query_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_matched,
       |  ${sqlPpm("SUM(CASE WHEN x.u IS NOT NULL THEN 1 ELSE 0 END)",
             NndK.toString)} AS recall_ppm,
       |  CAST(MIN(f.d) AS BIGINT) AS d_best,
       |  sc.n_scanned AS n_scanned
       |FROM gfk f LEFT JOIN gexk x ON f.qid = x.qid AND f.u = x.u
       |JOIN gns sc ON f.qid = sc.qid
       |GROUP BY f.qid, sc.n_scanned""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_kcenter_init" -> (embKcenterInit _),
    "emb_init_quality" -> (embInitQuality _),
    "knn_graph_nnd" -> (knnGraphNnd _),
    "knn_graph_search" -> (knnGraphSearch _),
    "knn_graph_delta" -> (knnGraphDelta _),
    "knn_graph_prune" -> (knnGraphPrune _),
    "knn_graph_search_pruned" -> (knnGraphSearchPruned _),
    "knn_filtered_search" -> (knnFilteredSearch _),
    "emb_contrastive_pairs" -> (embContrastivePairs _),
    "knn_hybrid_rrf" -> (knnHybridRrf _),
    "knn_hybrid_wand" -> (knnHybridWand _),
    "knn_ivf_persisted" -> (knnIvfPersisted _),
    "emb_covariance" -> (embCovariance _),
    "emb_kmeans_train" -> (embKmeansTrain _),
    "emb_pca_power" -> (embPcaPower _),
    "emb_doc_pool" -> (embDocPool _),
    "emb_outliers" -> (embOutliers _),
    "knn_brute_force" -> (knnBruteForce _),
    "knn_lsh_bucketed" -> (knnLshBucketed _),
    "knn_lsh_multiprobe" -> (knnLshMultiprobe _),
    "knn_ivf" -> (knnIvf _),
    "knn_ivf_trained" -> (knnIvfTrained _),
    "knn_pq_adc" -> (knnPqAdc _),
    "knn_ivfpq" -> (knnIvfPq _),
    "knn_ivf_residual" -> (knnIvfResidual _),
    "knn_pq_distortion" -> (knnPqDistortion _),
    "knn_pq_balanced" -> (knnPqBalanced _),
    "knn_rerank_curve" -> (knnRerankCurve _),
    "knn_sq8" -> (knnSq8 _),
    "knn_brute_heldout" -> (knnBruteHeldout _),
    "knn_ivf_trained_heldout" -> (knnIvfTrainedHeldout _),
    "knn_sq8_heldout" -> (knnSq8Heldout _),
    "knn_recall_report" -> (knnRecallReport _),
    "knn_ivf_stats" -> (knnIvfStats _),
    "knn_ivf_delta" -> (knnIvfDelta _),
    "sql_native_funcs" -> (sqlNativeFuncs _),
    "emb_neardup_pairs" -> (embNeardupPairs _),
    "emb_semantic_dedup" -> (embSemanticDedup _),
    "knn_binary" -> (knnBinary _),
    "knn_mmr" -> (knnMmr _),
    "knn_nprobe_curve" -> (knnNprobeCurve _),
    "knn_mrr_report" -> (knnMrrReport _),
    "knn_dim_curve" -> (knnDimCurve _),
    "emb_drift" -> (embDrift _),
    "knn_filtered_eval" -> (knnFilteredEval _))

  val oracles: Map[String, String] = Map(
    "knn_graph_nnd" -> knnGraphNndSql,
    "knn_graph_search" -> knnGraphSearchSql,
    "knn_graph_delta" -> knnGraphDeltaSql,
    "knn_graph_prune" -> knnGraphPruneSql,
    "knn_graph_search_pruned" -> knnGraphSearchPrunedSql,
    "knn_filtered_search" -> knnFilteredSearchSql,
    "emb_kcenter_init" -> embKcenterInitSql,
    "emb_init_quality" -> embInitQualitySql,
    "emb_contrastive_pairs" -> embContrastivePairsSql,
    "knn_hybrid_rrf" -> knnHybridRrfSql,
    "knn_hybrid_wand" -> knnHybridWandSql,
    // the persisted index is knn_ivf through a parquet round-trip:
    // identical cells/probes/re-rank, so it shares the oracle — the
    // hash gate re-proves the storage layer is exact every run
    "knn_ivf_persisted" -> knnIvfSql,
    "emb_covariance" -> embCovarianceSql,
    "emb_kmeans_train" -> embKmeansTrainSql,
    "emb_pca_power" -> embPcaPowerSql,
    "emb_doc_pool" -> embDocPoolSql,
    "emb_outliers" -> embOutliersSql,
    "knn_brute_force" -> knnBruteForceSql,
    "knn_lsh_bucketed" -> knnLshBucketedSql,
    "knn_lsh_multiprobe" -> knnLshMultiprobeSql,
    "knn_ivf" -> knnIvfSql,
    "knn_ivf_trained" -> knnIvfTrainedSql,
    "knn_pq_adc" -> knnPqAdcSql,
    "knn_ivfpq" -> knnIvfPqSql,
    "knn_ivf_residual" -> knnIvfResidualSql,
    "knn_pq_distortion" -> knnPqDistortionSql,
    "knn_pq_balanced" -> knnPqBalancedSql,
    "knn_rerank_curve" -> knnRerankCurveSql,
    "knn_sq8" -> knnSq8Sql,
    "knn_brute_heldout" -> knnBruteHeldoutSql,
    "knn_ivf_trained_heldout" -> knnIvfTrainedHeldoutSql,
    "knn_sq8_heldout" -> knnSq8HeldoutSql,
    "knn_recall_report" -> knnRecallReportSql,
    "knn_ivf_stats" -> knnIvfStatsSql,
    "knn_ivf_delta" -> knnIvfDeltaSql,
    "sql_native_funcs" -> sqlNativeFuncsSql,
    "emb_neardup_pairs" -> embNeardupPairsSql,
    "emb_semantic_dedup" -> embSemanticDedupSql,
    "knn_binary" -> knnBinarySql,
    "knn_mmr" -> knnMmrSql,
    "knn_nprobe_curve" -> knnNprobeCurveSql,
    "knn_mrr_report" -> knnMrrReportSql,
    "knn_dim_curve" -> knnDimCurveSql,
    "emb_drift" -> embDriftSql,
    "knn_filtered_eval" -> knnFilteredEvalSql)
}
