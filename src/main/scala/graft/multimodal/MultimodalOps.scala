package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-batched executors.
  *
  * The decode step is a STUB: the container has no image/audio codecs,
  * so [[StubDecoder]] is a deterministic fake clearly marked as the
  * swap-in point. Everything around it — the schema contract, the
  * binary column handling, the `mapPartitions` batch shape (the Scala
  * analog of `mapInPandas`: one iterator per partition, vectorizable
  * batches, no per-row task overhead), the partitioning — is the real
  * production plumbing and is tested.
  *
  * Scale notes: media bytes dwarf metadata, so every transform keeps
  * binary opaque until the per-partition decode, projects metadata
  * early, and never shuffles content (feature extraction is
  * narrow — zero shuffle; only the small feature vectors move
  * afterwards).
  */
object MultimodalOps {

  /** One media record: content is opaque bytes; metadata is typed. */
  final case class MediaRecord(
      mediaId: Long,
      mediaType: String, // image | audio | video
      content: Array[Byte],
      sourceUri: String)

  /** Extracted features: fixed-width vector + decode metadata. */
  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      nBytes: Long,
      contentHash: String,
      width: Int,
      height: Int,
      features: Array[Float])

  /** ======= STUB BOUNDARY =======
    * A real deployment replaces this object with actual codecs
    * (JPEG/PNG decode, audio PCM, video frame extraction). The fake is
    * deterministic in the content bytes so tests and oracles are
    * stable. Signature is the contract: bytes in, dims + features out.
    */
  object StubDecoder {
    def decode(content: Array[Byte]): (Int, Int, Array[Float]) = {
      val d = MessageDigest.getInstance("MD5").digest(content)
      def u(i: Int): Int = d(i) & 0xff
      val width = 1 + (((u(0) << 8) | u(1)) % 640)
      val height = 1 + (((u(2) << 8) | u(3)) % 480)
      val features = Array.tabulate(8)(i => u(i * 2) / 255.0f)
      (width, height, features)
    }
  }

  /** Hex md5 (matches Spark's `md5` function and DuckDB's). */
  def md5Hex(content: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(content)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Partition-batched feature extraction — the mapInPandas shape:
    * the executor walks one iterator per partition and can amortize
    * any per-batch setup (codec init, model load) across the whole
    * partition instead of paying it per row.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/model init — once)
      it.map { m =>
        val (w, h, feats) = StubDecoder.decode(m.content)
        MediaFeatures(m.mediaId, m.mediaType, m.content.length.toLong,
          md5Hex(m.content), w, h, feats)
      }
    }
  }

  /** Deterministic frame sampling for "video" content: every
    * `frameBytes`-sized slice stands in for a decoded frame; `step`
    * picks every step-th frame. Explodes to one row per sampled frame
    * — the real pipeline shape for frame-level dedup/embedding.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 16,
      step: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % step == 0)
        .map { case (frame, idx) =>
          (m.mediaId, idx, frame.length, md5Hex(frame))
        }
    }.toDF("media_id", "frame_index", "frame_bytes", "frame_hash")
  }

  /** Resized media: original dims from decode, downsampled content. */
  final case class MediaResized(
      mediaId: Long,
      mediaType: String,
      origBytes: Long,
      resizedBytes: Long,
      width: Int,
      height: Int,
      resizedHash: String)

  /** Deterministic stub resize: keep every `factor`-th content byte
    * (a real deployment decodes, scales, re-encodes at the
    * [[StubDecoder]] boundary — the contract is the same: binary in,
    * smaller binary + scaled dims out). Same partition-batched narrow
    * shape as [[extractFeatures]]: content never shuffles, per-batch
    * codec setup amortizes across the partition.
    */
  def resize(media: Dataset[MediaRecord],
      factor: Int = 2): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val resized = Array.range(0, m.content.length, factor)
          .map(m.content)
        val (w, h, _) = StubDecoder.decode(m.content)
        MediaResized(m.mediaId, m.mediaType, m.content.length.toLong,
          resized.length.toLong, math.max(w / factor, 1),
          math.max(h / factor, 1), md5Hex(resized))
      }
    }
  }

  /** Synthesize a media table from `documents` (the container has no
    * real media; utf-8 text bytes play the opaque blob — which is
    * exactly how the plumbing should treat real media anyway).
    */
  /** 16-bit perceptual fingerprint from the byte-value histogram:
    * bit b is set iff low-nibble bucket b holds more than a uniform
    * share of the content's bytes. Similar content ⇒ similar byte
    * distribution ⇒ small Hamming distance — the pHash shape over the
    * stub decode (a real deployment fingerprints decoded pixels/PCM
    * the same way: histogram → above-mean bits). Computed where the
    * bytes live; only the 2-byte fingerprint ever shuffles.
    */
  def perceptualHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val counts = new Array[Long](16)
      var i = 0
      while (i < m.content.length) {
        counts((m.content(i) & 0xff) % 16) += 1
        i += 1
      }
      val total = m.content.length.toLong
      var ph = 0L
      var b = 0
      while (b < 16) {
        if (counts(b) * 16L > total) ph |= (1L << b)
        b += 1
      }
      (m.mediaId, ph)
    }.toDF("media_id", "phash")
  }

  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "utf-8").as("content"),
        concat(lit("synthetic://"), col("source"), lit("/"), col("doc_id"))
          .as("sourceUri"))
      .as[MediaRecord]
  }
}
