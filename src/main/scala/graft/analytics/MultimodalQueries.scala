package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Oracle-checked surface of the multimodal plumbing: the query runs
  * the REAL pipeline (binary synthesis → partition-batched
  * [[MultimodalOps.extractFeatures]]) and exposes the SQL-expressible
  * projection of the stub decode — content hash, byte length, and the
  * md5-derived fake dimensions — so DuckDB independently re-derives
  * what the executors computed. The float feature vector itself is
  * covered by MultimodalSpec (arrays don't hash-compare stably).
  */
object MultimodalQueries {

  /** Shared DuckDB twin of the decode-stub contract — media type and
    * md5-derived dims per document. ONE copy so the three consuming
    * oracles (features, filter, tokens) cannot drift from the stub.
    */
  private val sqlMediaCte: String =
    """m AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]
      |      AS media_type,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    md5(text) AS content_hash,
      |    1 + (CAST('0x' || substr(md5(text), 1, 4) AS INT) % 640) AS width,
      |    1 + (CAST('0x' || substr(md5(text), 5, 4) AS INT) % 480) AS height
      |  FROM documents)""".stripMargin

  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(spark, dir))
      .select(
        col("mediaId").as("media_id"),
        col("mediaType").as("media_type"),
        col("nBytes").as("n_bytes"),
        col("contentHash").as("content_hash"),
        col("width"),
        col("height"))

  val multimodalFeaturesSql: String =
    s"""WITH $sqlMediaCte
       |SELECT media_id, media_type, n_bytes, content_hash, width, height
       |FROM m""".stripMargin

  /** Frame sampling over synthetic "video" rows — plumbing shape:
    * explode to one row per sampled frame, hash each frame.
    */
  /** The engine slices BYTES (correct for opaque media) while DuckDB
    * can only slice characters (no blob substring/md5 in 1.0), so the
    * oracle-checked surface is restricted to byte==char documents on
    * BOTH sides; the byte semantics themselves are covered for
    * arbitrary content by MultimodalSpec.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.sampleFrames(
      MultimodalOps.mediaFromDocuments(spark, dir)
        .filter(col("mediaType") === "video")
        .filter(length(decode(col("content"), "utf-8")) ===
          octet_length(col("content"))))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_bytes")).as("sampled_bytes"),
        countDistinct(col("frame_hash")).as("n_distinct_frames"))

  val multimodalFramesSql: String =
    """WITH v AS (
      |  SELECT doc_id AS media_id, text FROM documents
      |  WHERE CAST(doc_id % 3 AS INT) = 2
      |    AND strlen(text) = length(text)),
      |frames AS (
      |  SELECT media_id, g.i - 1 AS frame_index,
      |    substr(text, (g.i - 1) * 16 + 1, 16) AS frame
      |  FROM v, LATERAL (SELECT unnest(generate_series(
      |    1, CAST(ceil(strlen(text) / 16.0) AS BIGINT))) AS i) g
      |  WHERE (g.i - 1) % 2 = 0)
      |SELECT media_id, COUNT(*) AS n_frames,
      |  CAST(SUM(strlen(frame)) AS BIGINT) AS sampled_bytes,
      |  COUNT(DISTINCT md5(frame)) AS n_distinct_frames
      |FROM frames GROUP BY media_id""".stripMargin

  /** Stub resize through the real partition-batched plumbing: keep
    * every 2nd content byte. DuckDB re-derives the downsampled bytes
    * with character slicing (valid for the all-ASCII corpus — byte
    * semantics for arbitrary content are covered by MultimodalSpec)
    * and must reproduce the md5 of the resized blob exactly.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.resize(MultimodalOps.mediaFromDocuments(spark, dir))
      .select(col("mediaId").as("media_id"),
        col("origBytes").as("orig_bytes"),
        col("resizedBytes").as("resized_bytes"),
        col("resizedHash").as("resized_hash"))

  val multimodalResizeSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(strlen(text) AS BIGINT) AS orig_bytes,
      |  CAST((strlen(text) + 1) // 2 AS BIGINT) AS resized_bytes,
      |  md5(array_to_string(list_transform(
      |    generate_series(1, strlen(text), 2),
      |    i -> substr(text, CAST(i AS INT), 1)), '')) AS resized_hash
      |FROM documents""".stripMargin

  /** Exact dedup of opaque media: canonical = min media_id among
    * byte-identical content within a (media_type, n_bytes) block.
    * Only the md5 content hash ever crosses the shuffle — at 100 TB
    * of images/video the bytes stay where they were scanned, which is
    * the entire point of hash-first media dedup; the byte-length
    * block key means even hash computation could be skipped for
    * unique lengths in a real pipeline.
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_type"), col("n_bytes"),
      col("content_hash"))
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(spark, dir))
      .select(col("mediaId").as("media_id"),
        col("mediaType").as("media_type"),
        col("nBytes").as("n_bytes"),
        col("contentHash").as("content_hash"))
      .withColumn("canonical_id", min(col("media_id")).over(w))
      .withColumn("is_duplicate", col("media_id") =!= col("canonical_id"))
  }

  val multimodalDedupSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    md5(text) AS content_hash
      |  FROM documents)
      |SELECT media_id, media_type, n_bytes, content_hash,
      |  MIN(media_id) OVER (PARTITION BY media_type, n_bytes, content_hash)
      |    AS canonical_id,
      |  media_id <> MIN(media_id) OVER (PARTITION BY media_type, n_bytes,
      |    content_hash) AS is_duplicate
      |FROM m""".stripMargin

  /** Perceptual near-dup clustering: the 16-bit byte-histogram
    * fingerprint ([[MultimodalOps.perceptualHash]]) grouped into
    * perceptual buckets — media whose byte distributions match land
    * in one bucket even when exact hashes differ (the complement to
    * multimodal_dedup's exact md5 grouping). Bytes never shuffle —
    * only the 2-byte fingerprint; the report is fingerprint-space
    * bounded (≤ 2^16 rows) at any corpus size. Oracle restricted to
    * byte==char documents (the multimodal_frames precedent: DuckDB
    * 1.0 cannot histogram blob bytes, so the checked surface is the
    * ASCII slice where char counts ARE byte counts; the byte
    * semantics for arbitrary content are covered by MultimodalSpec).
    */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.perceptualHash(
      MultimodalOps.mediaFromDocuments(spark, dir)
        .filter(length(decode(col("content"), "utf-8")) ===
          octet_length(col("content"))))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_media"),
        min(col("media_id")).as("representative"))
      .orderBy(col("phash"))

  /** Oracle CTE chain ending in `ph(doc_id, phash)` — the DuckDB twin
    * of [[MultimodalOps.perceptualHash]] over byte==char documents.
    * Shared by the cluster report and the near-dup pair query.
    */
  private val phashCtes: String =
    """t AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text)),
      |ch AS (
      |  SELECT doc_id, ascii(substring(text, i, 1)) % 16 AS b
      |  FROM t, LATERAL (SELECT unnest(generate_series(1,
      |    strlen(text))) AS i) u),
      |hist AS (SELECT doc_id, b, COUNT(*) AS n FROM ch GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS total FROM t),
      |ph AS (
      |  SELECT tot.doc_id,
      |    CAST(COALESCE(SUM(CASE WHEN n * 16 > total THEN 1 << b
      |      ELSE 0 END), 0) AS BIGINT) AS phash
      |  FROM tot LEFT JOIN hist ON tot.doc_id = hist.doc_id
      |  GROUP BY tot.doc_id)""".stripMargin

  val multimodalPhashSql: String =
    s"""WITH $phashCtes
      |SELECT phash, COUNT(*) AS n_media, MIN(doc_id) AS representative
      |FROM ph GROUP BY phash ORDER BY phash""".stripMargin

  /** Hamming-near perceptual-hash pairs — the near-dup complement to
    * [[multimodalPhash]]'s exact-fingerprint clustering: media whose
    * byte distributions differ in ≤2 of the 16 fingerprint bits.
    *
    * Pairing happens in FINGERPRINT space, not media space: the corpus
    * first collapses to its ≤2^16 distinct phash values (the same
    * aggregate the cluster report runs), and only those are paired —
    * each 16-bit value has C(16,1)+C(16,2)=136 neighbors within
    * distance 2, so the pair relation is ≤2^16·136/2 rows at ANY
    * corpus size, and per-media near-dups are a join away through the
    * cluster table. The candidate join uses bit-sampling LSH exactly
    * like [[DedupQueries.simhashBanded]]: 3 bands of 6/5/5 bits — by
    * pigeonhole a pair differing in ≤2 bits agrees on ≥1 intact band —
    * then exact `bit_count(xor)` verifies. The DuckDB twin is the
    * brute-force pairwise compare, so a banding gap (a distance-≤2
    * pair the bands missed) would fail the oracle, not just a spec.
    */
  def multimodalPhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val clusters = MultimodalOps.perceptualHash(
      MultimodalOps.mediaFromDocuments(spark, dir)
        .filter(length(decode(col("content"), "utf-8")) ===
          octet_length(col("content"))))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_media"), min(col("media_id")).as("rep"))
      // one histogram pass feeds both join sides; ≤2^16 rows, so an
      // eager localCheckpoint beats cache(): same reuse, but the
      // blocks are ContextCleaner-reclaimed instead of pinned until
      // an unpersist that a long-lived session would never issue
      .localCheckpoint(true)
    val banded = clusters.select(col("phash"), col("n_media"), col("rep"),
      posexplode(array(
        col("phash") % 64,
        shiftright(col("phash"), 6) % 32,
        shiftright(col("phash"), 11)))
        .as(Seq("band", "key")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.phash") < col("b.phash"))
      .select(col("a.phash").as("phash_a"), col("b.phash").as("phash_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long")
          .as("hamming"),
        col("a.n_media").as("n_media_a"), col("b.n_media").as("n_media_b"),
        col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
      .distinct()
      .where(col("hamming") <= 2)
  }

  val multimodalPhashPairsSql: String =
    s"""WITH $phashCtes,
      |g AS (
      |  SELECT phash, COUNT(*) AS n_media, MIN(doc_id) AS rep
      |  FROM ph GROUP BY phash)
      |SELECT a.phash AS phash_a, b.phash AS phash_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
      |  a.n_media AS n_media_a, b.n_media AS n_media_b,
      |  a.rep AS rep_a, b.rep AS rep_b
      |FROM g a JOIN g b ON a.phash < b.phash
      |WHERE bit_count(xor(a.phash, b.phash)) <= 2""".stripMargin

  // ------------------------------------------- media dedup APPLIED
  /** Media dedup applied: keep each perceptual-hash cluster's
    * representative (the minimum media id) and report, per media
    * type, what survives — the media twin of the text side's
    * `dedup_apply`, closing the report→apply gap for the multimodal
    * path too. Runs the REAL pipeline (binary synthesis → the typed
    * [[MultimodalOps.perceptualHash]] map), not a SQL re-derivation.
    *
    * Scale shape: one groupBy and one self-join, both on the ≤2¹⁶-key
    * phash (bounded key domain — the join back is against a
    * cluster-count frame that can never exceed 65 536 rows), then a
    * media-type rollup over three keys. Content bytes never enter an
    * exchange; only (id, phash) pairs move.
    */
  def multimodalDedupApply(spark: SparkSession, dir: String): DataFrame = {
    val media = MultimodalOps.mediaFromDocuments(spark, dir)
      .filter(length(decode(col("content"), "utf-8")) ===
        octet_length(col("content")))
    val ph = MultimodalOps.perceptualHash(media)
    val rep = ph.groupBy(col("phash")).agg(min(col("media_id")).as("rep"))
    ph.join(rep, "phash")
      .select(element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("media_id") % 3 + 1).cast("int")).as("media_type"),
        (col("media_id") === col("rep")).as("keep"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("removed_ppm",
        QueryUtil.ppm(col("n_media") - col("n_kept"), col("n_media")))
  }

  val multimodalDedupApplySql: String =
    s"""WITH $phashCtes,
      |rep AS (SELECT phash, MIN(doc_id) AS rep FROM ph GROUP BY 1),
      |j AS (
      |  SELECT ['image','audio','video'][CAST(p.doc_id % 3 AS INT) + 1]
      |      AS media_type,
      |    p.doc_id = r.rep AS keep
      |  FROM ph p JOIN rep r ON p.phash = r.phash)
      |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_media,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  ${QueryUtil.sqlPpm(
           "COUNT(*) - SUM(CASE WHEN keep THEN 1 ELSE 0 END)",
           "COUNT(*)")} AS removed_ppm
      |FROM j GROUP BY 1""".stripMargin

  /** Resolution/aspect QUALITY GATE over decoded media — the LAION-
    * style screening step between decode and training: drop frames
    * under a minimum resolution or outside a 1:3 aspect band (banner
    * ads, scanlines, corrupt headers all land there). Runs the REAL
    * partition-batched decode ([[MultimodalOps.extractFeatures]]);
    * the keep predicate is pure integer arithmetic on the decoded
    * dims, so DuckDB re-derives the verdict from the md5-derived stub
    * dims independently. Per media type: total, kept, and bytes
    * surviving — the mixture owner's before/after line.
    *
    * Scale shape: decode is narrow (zero shuffle — content never
    * leaves its partition); only the per-type rollup aggregates, on a
    * 3-value key.
    */
  def multimodalFilter(spark: SparkSession, dir: String): DataFrame = {
    val keep = col("width") >= 64 && col("height") >= 64 &&
      col("width") * 3 >= col("height") && col("height") * 3 >= col("width")
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(spark, dir))
      .select(col("mediaType").as("media_type"),
        col("nBytes").as("n_bytes"), col("width"), col("height"))
      .withColumn("keep", keep)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(when(col("keep"), col("n_bytes")).otherwise(0L))
          .as("n_bytes_kept"))
  }

  val multimodalFilterSql: String =
    s"""WITH $sqlMediaCte,
       |k AS (SELECT media_type, n_bytes,
       |  width >= 64 AND height >= 64 AND width * 3 >= height
       |    AND height * 3 >= width AS keep FROM m)
       |SELECT media_type, COUNT(*) AS n_media,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
       |  CAST(SUM(CASE WHEN keep THEN n_bytes ELSE 0 END) AS BIGINT)
       |    AS n_bytes_kept
       |FROM k GROUP BY media_type""".stripMargin

  /** Media-to-TOKEN accounting — the context-window budget of a
    * multimodal training mix: images cost ViT-style patch tokens
    * (⌈w/14⌉·⌈h/14⌉ at patch 14), audio costs one token per 320
    * content bytes (the 25-token/sec shape at 8 kHz), video costs its
    * sampled frames × the per-frame patch grid of its decoded dims.
    * All exact integer arithmetic over the decoded stub dims, so the
    * oracle re-derives every cost from the md5 dims independently.
    * Per media type: items, total tokens, mean (floor) and max per
    * item — the numbers a batch packer budgets against.
    */
  def multimodalTokens(spark: SparkSession, dir: String): DataFrame = {
    val patches = (ceil(col("width").cast("double") / 14) *
      ceil(col("height").cast("double") / 14)).cast("long")
    val tokens = when(col("media_type") === "image", patches)
      .when(col("media_type") === "audio",
        greatest(lit(1L), expr("n_bytes div 320")))
      // sampled frames (every 2nd of 16-byte frames) × patch grid
      .otherwise(patches *
        greatest(lit(1L), expr("(n_bytes + 31) div 32")))
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(spark, dir))
      .select(col("mediaType").as("media_type"),
        col("nBytes").as("n_bytes"), col("width"), col("height"))
      .withColumn("toks", tokens)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"), sum(col("toks")).as("n_tokens"),
        expr("sum(toks) div count(1)").as("mean_tokens"),
        max(col("toks")).as("max_tokens"))
  }

  val multimodalTokensSql: String =
    s"""WITH $sqlMediaCte,
       |t AS (SELECT media_type,
       |  CASE media_type
       |    WHEN 'image' THEN CAST(ceil(CAST(width AS DOUBLE) / 14)
       |      * ceil(CAST(height AS DOUBLE) / 14) AS BIGINT)
       |    WHEN 'audio' THEN GREATEST(1, n_bytes // 320)
       |    ELSE CAST(ceil(CAST(width AS DOUBLE) / 14)
       |      * ceil(CAST(height AS DOUBLE) / 14) AS BIGINT)
       |      * GREATEST(1, (n_bytes + 31) // 32) END AS toks
       |  FROM m)
       |SELECT media_type, COUNT(*) AS n_media,
       |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(toks) // COUNT(*) AS BIGINT) AS mean_tokens,
       |  CAST(MAX(toks) AS BIGINT) AS max_tokens
       |FROM t GROUP BY media_type""".stripMargin

  /** REAL-BYTES decode through the P6 codec: deterministic PPM images
    * are encoded on the executors ([[MultimodalOps.ppmFromDocuments]]),
    * parsed BACK by [[MultimodalOps.PpmCodec]] (header, comments,
    * strict raster length), and the decoded raster is walked for
    * per-channel sums. The oracle recomputes every statistic from the
    * fixture's closed-form pixel rule — it never sees a byte — so any
    * drift in header writing, parsing, channel interleave, or pixel
    * order fails the hash. This is the decode boundary exercised with
    * actual image bytes end-to-end; formats the container cannot
    * decode still cross the same seam via the stub.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeStats(MultimodalOps.ppmFromDocuments(spark, dir))
      .select(col("media_id"), col("width"), col("height"), col("n_pix"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        QueryUtil.ppm(col("sum_r") + col("sum_g") + col("sum_b"),
          lit(765L) * col("n_pix")).as("brightness_ppm"))

  val multimodalDecodeSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, u.i, (7 * u.i + 13 * doc_id) % 256 AS v
       |  FROM dims, LATERAL (SELECT unnest(generate_series(0,
       |    CAST(w * h * 3 - 1 AS BIGINT))) AS i) u),
       |a AS (
       |  SELECT doc_id, w, h,
       |    SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS sum_r,
       |    SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS sum_g,
       |    SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS sum_b
       |  FROM px GROUP BY 1, 2, 3)
       |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width,
       |  CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_pix,
       |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |  CAST(sum_b AS BIGINT) AS sum_b,
       |  ${QueryUtil.sqlPpm("sum_r + sum_g + sum_b", "765 * w * h")}
       |    AS brightness_ppm
       |FROM a""".stripMargin

  /** REAL-BYTES decode through the WAV codec — the [[multimodalDecode]]
    * proof ported to audio: deterministic PCM16 WAVs are encoded on
    * the executors ([[MultimodalOps.wavFromDocuments]]), parsed BACK by
    * [[MultimodalOps.WavCodec]] (RIFF chunk walk, strict PCM16
    * checks, little-endian samples), and the decoded stream is walked
    * for per-channel sums, peak and total amplitude. The oracle
    * recomputes everything from the closed-form sample rule — any
    * drift in header layout, endianness, chunk walking, or channel
    * interleave fails the hash. With PPM (images) and WAV (audio)
    * both real, the stub now covers only formats whose decoding
    * genuinely requires codec libraries this container lacks.
    */
  def multimodalDecodeWav(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeWavStats(MultimodalOps.wavFromDocuments(spark, dir))
      .select(col("media_id"), col("n_channels"), col("sample_rate"),
        col("n_frames"), col("sum_ch0"), col("sum_ch1"), col("peak_abs"),
        col("sum_abs"),
        QueryUtil.ppm(col("sum_abs"),
          lit(32768L) * col("n_frames") * col("n_channels"))
          .as("loudness_ppm"))

  val multimodalDecodeWavSql: String =
    s"""WITH p AS (
       |  SELECT doc_id, 1 + doc_id % 2 AS nch,
       |    8000 + (doc_id % 3) * 4000 AS sr, 20 + doc_id % 13 AS nfr
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, nch, sr, nfr, u.i,
       |    ((31 * u.i + 7 * doc_id) % 65536) - 32768 AS v
       |  FROM p, LATERAL (SELECT unnest(generate_series(0,
       |    CAST(nfr * nch - 1 AS BIGINT))) AS i) u),
       |a AS (
       |  SELECT doc_id, nch, sr, nfr,
       |    SUM(CASE WHEN i % nch = 0 THEN v ELSE 0 END) AS sum_ch0,
       |    SUM(CASE WHEN i % nch = 1 THEN v ELSE 0 END) AS sum_ch1,
       |    MAX(abs(v)) AS peak_abs, SUM(abs(v)) AS sum_abs
       |  FROM s GROUP BY 1, 2, 3, 4)
       |SELECT doc_id AS media_id, CAST(nch AS BIGINT) AS n_channels,
       |  CAST(sr AS BIGINT) AS sample_rate, CAST(nfr AS BIGINT) AS n_frames,
       |  CAST(sum_ch0 AS BIGINT) AS sum_ch0,
       |  CAST(sum_ch1 AS BIGINT) AS sum_ch1,
       |  CAST(peak_abs AS BIGINT) AS peak_abs,
       |  CAST(sum_abs AS BIGINT) AS sum_abs,
       |  ${QueryUtil.sqlPpm("sum_abs", "32768 * nfr * nch")} AS loudness_ppm
       |FROM a""".stripMargin

  /** REAL-BYTES decode through the PNG codec — the [[multimodalDecode]]
    * proof pushed through a COMPRESSED container: deterministic
    * greyscale/RGB images are encoded on the executors
    * ([[MultimodalOps.pngFromDocuments]]: deflate, CRC32 chunks, a
    * different scanline filter per id mod 5), parsed BACK by
    * [[MultimodalOps.PngCodec]] (signature, per-chunk CRC, strict
    * inflated length, all five unfilter paths), and the unfiltered
    * raster is walked for per-channel sums. The oracle recomputes
    * everything from the closed-form pixel rule — any drift in
    * deflate round-trip, chunk layout, CRC, filter math, or channel
    * interleave fails the hash. With PPM, WAV, and PNG real, the stub
    * now covers only formats that genuinely need external codec
    * libraries (JPEG/video).
    */
  def multimodalDecodePng(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodePngStats(MultimodalOps.pngFromDocuments(spark, dir))
      .select(col("media_id"), col("width"), col("height"),
        col("n_channels"), col("n_pix"),
        col("sum_ch0"), col("sum_ch1"), col("sum_ch2"),
        QueryUtil.ppm(col("sum_ch0") + col("sum_ch1") + col("sum_ch2"),
          lit(255L) * col("n_pix") * col("n_channels"))
          .as("brightness_ppm"))

  val multimodalDecodePngSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
       |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS nch
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, nch, u.i,
       |    (11 * u.i + 5 * doc_id) % 256 AS v
       |  FROM dims, LATERAL (SELECT unnest(generate_series(0,
       |    CAST(w * h * nch - 1 AS BIGINT))) AS i) u),
       |a AS (
       |  SELECT doc_id, w, h, nch,
       |    SUM(CASE WHEN i % nch = 0 THEN v ELSE 0 END) AS sum_ch0,
       |    SUM(CASE WHEN i % nch = 1 THEN v ELSE 0 END) AS sum_ch1,
       |    SUM(CASE WHEN i % nch = 2 THEN v ELSE 0 END) AS sum_ch2
       |  FROM px GROUP BY 1, 2, 3, 4)
       |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width,
       |  CAST(h AS BIGINT) AS height, CAST(nch AS BIGINT) AS n_channels,
       |  CAST(w * h AS BIGINT) AS n_pix,
       |  CAST(sum_ch0 AS BIGINT) AS sum_ch0,
       |  CAST(sum_ch1 AS BIGINT) AS sum_ch1,
       |  CAST(sum_ch2 AS BIGINT) AS sum_ch2,
       |  ${QueryUtil.sqlPpm("sum_ch0 + sum_ch1 + sum_ch2",
            "255 * w * h * nch")} AS brightness_ppm
       |FROM a""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_decode_wav" -> (multimodalDecodeWav _),
    "multimodal_decode_png" -> (multimodalDecodePng _),
    "multimodal_tokens" -> (multimodalTokens _),
    "multimodal_filter" -> (multimodalFilter _),
    "multimodal_dedup_apply" -> (multimodalDedupApply _),
    "multimodal_phash" -> (multimodalPhash _),
    "multimodal_phash_pairs" -> (multimodalPhashPairs _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_dedup" -> (multimodalDedup _))

  val oracles: Map[String, String] = Map(
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_decode_wav" -> multimodalDecodeWavSql,
    "multimodal_decode_png" -> multimodalDecodePngSql,
    "multimodal_tokens" -> multimodalTokensSql,
    "multimodal_filter" -> multimodalFilterSql,
    "multimodal_dedup_apply" -> multimodalDedupApplySql,
    "multimodal_phash" -> multimodalPhashSql,
    "multimodal_phash_pairs" -> multimodalPhashPairsSql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_resize" -> multimodalResizeSql,
    "multimodal_dedup" -> multimodalDedupSql)
}
