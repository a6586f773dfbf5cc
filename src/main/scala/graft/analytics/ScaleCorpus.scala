package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic documents/embeddings corpus generator for the scale
  * smoke + the isolated 100× harness (`graft.ScaleBench`).
  *
  * `/root/testdata` caps at sf0.1 (read-only), so scale runs
  * synthesize a corpus with the same statistical shape as the
  * driver's tables — same 31-word vocabulary, 10–100 words/doc,
  * ~10% near-dup pairs (copy of the previous doc with exactly one
  * token substituted, so LSH bucket density stays realistic instead
  * of exploding), 64-dim embeddings drawn as centroid+noise around
  * 10 label centroids inside the real data's ±0.4 envelope.
  * Generation is pure Column expressions over `spark.range`
  * (distributed, codegen'd, no driver loop). The generator contract
  * (schema parity, vocabulary closure, one-token near-dup invariant,
  * embedding envelope) is pinned at 1× in ScaleSmokeSpec on every
  * `sbt test`.
  */
object ScaleCorpus {

  /** The exact 31-word vocabulary of the driver's documents table. */
  val vocabWords: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  private def vocab: Column = array(vocabWords.map(lit): _*)

  /** documents at `n` rows, sf0.1-shaped. Near-dup structure: ids with
    * id % 10 == 1 re-draw the PREVIOUS id's word sequence with exactly
    * one position substituted — so near-dup clusters have size 2 and
    * LSH bucket load scales linearly with the corpus, as it does in a
    * real crawl (a naive "explode sf0.1 100×" would instead put 100
    * copies in every bucket and square the candidate pair count).
    */
  def genDocuments(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val isDup = pmod(col("id"), lit(10)) === 1
    spark.range(0, n, 1, parts)
      .select(
        col("id").as("doc_id"),
        when(isDup, col("id") - 1).otherwise(col("id")).as("seed"),
        isDup.as("is_dup"))
      .withColumn("len",
        (pmod(xxhash64(col("seed"), lit(11)), lit(91)) + 10).cast("int"))
      .withColumn("perturb",
        when(col("is_dup"),
          pmod(xxhash64(col("doc_id"), lit(13)), col("len")))
          .otherwise(lit(-1L)))
      .withColumn("text", array_join(
        transform(sequence(lit(0L), col("len") - 1), i => {
          // base word index, plus — at the one perturbed position — a
          // nonzero offset mod 31, so the substitute NEVER collides
          // with the original word (the one-token contract is exact)
          val baseIdx = pmod(xxhash64(col("seed"), i), lit(31))
          val off = when(i === col("perturb"),
            pmod(xxhash64(col("doc_id"), lit(13)), lit(30)) + 1)
            .otherwise(lit(0L))
          element_at(vocab,
            (pmod(baseIdx + off, lit(31)) + 1).cast("int"))
        }), " "))
      .withColumn("lang", element_at(
        array(Seq("en", "en", "en", "en", "de", "es", "es", "fr", "fr",
          "zh").map(lit): _*),
        (pmod(xxhash64(col("doc_id"), lit(17)), lit(10)) + 1).cast("int")))
      .withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** embeddings at `n` rows: 64-dim float vectors, 10 label centroids
    * (component ±0.25) plus per-vector noise (±0.125) — inside the
    * driver table's observed ±0.4 component envelope.
    */
  def genEmbeddings(spark: SparkSession, n: Long, parts: Int): DataFrame =
    spark.range(0, n, 1, parts)
      .select(col("id").as("vec_id"))
      .withColumn("label",
        pmod(xxhash64(col("vec_id"), lit(5)), lit(10)).cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0L), lit(63L)), d =>
          ((pmod(xxhash64(col("label"), d, lit(101)), lit(2001)) - 1000)
            .cast("double") / 4000.0 +
           (pmod(xxhash64(col("vec_id"), d, lit(103)), lit(2001)) - 1000)
            .cast("double") / 8000.0).cast("float")))
      .select("vec_id", "embedding", "label")

  /** Write a `mult`×-sf0.1 corpus under `dir` (documents at 5000·mult
    * rows, embeddings at 2000·mult — the sf0.1 table sizes).
    */
  def writeCorpus(spark: SparkSession, mult: Int, dir: String): Unit = {
    val parts = spark.sparkContext.defaultParallelism
    genDocuments(spark, 5000L * mult, parts)
      .write.parquet(s"$dir/documents.parquet")
    genEmbeddings(spark, 2000L * mult, parts)
      .write.parquet(s"$dir/embeddings.parquet")
  }
}
