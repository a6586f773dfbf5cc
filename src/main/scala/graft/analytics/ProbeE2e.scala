package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level profiler for the `pipeline_e2e` funnel at smoke scale —
  * the [[graft.Probe]] playbook (attribute before optimizing) applied
  * to r12's heaviest unprofiled family: replicates
  * `PipelineQueries.e2eStages` with per-stage walls and row counts on
  * a `GRAFT_PROBE_MULT`×-sf0.1-shaped synthetic documents corpus
  * (ScaleSmokeSpec's generator shape, vocabulary and near-dup
  * structure included), so the 100× cost splits into scan+filters /
  * exact-dedup shuffle / simhash pair generation / star-contraction
  * fixpoint / final join instead of one opaque number. Dev tool, like
  * [[graft.TimeOne]] — never on the query path.
  */
object ProbeE2e {

  private val vocabWords = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("GRAFT_PROBE_MULT", "100").toInt
    val spark = graft.core.GraftSession.local(32, "graft-probe-e2e")
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE_E2E $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // sf0.1-shaped documents (ScaleSmokeSpec.genDocuments)
    val n0 = 5000L * mult
    val vocab = array(vocabWords.map(lit): _*)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-probe-e2e-$mult").toString
    t("gen") {
      val isDup = pmod(col("id"), lit(10)) === 1
      spark.range(0, n0, 1, 64)
        .select(col("id").as("doc_id"),
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
            val baseIdx = pmod(xxhash64(col("seed"), i), lit(31))
            val off = when(i === col("perturb"),
              pmod(xxhash64(col("doc_id"), lit(13)), lit(30)) + 1)
              .otherwise(lit(0L))
            element_at(vocab,
              (pmod(baseIdx + off, lit(31)) + 1).cast("int"))
          }), " "))
        .withColumn("lang", element_at(
          array(Seq("en", "en", "en", "en", "de", "es", "es", "fr",
            "fr", "zh").map(lit): _*),
          (pmod(xxhash64(col("doc_id"), lit(17)), lit(10)) + 1)
            .cast("int")))
        .withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }

    // ---- mirror of PipelineQueries.e2eStages, stage-timed
    val nToks = size(split(col("text"), " ")).cast("long")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), nToks.as("n_toks"))
      .cache()
    t("raw: cache+count")(docs.count())
    val s1 = TextQueries.langScored(docs)
      .where(TextQueries.langPred === "en")
      .select(col("doc_id"), col("text"), col("n_toks"))
    t("s1 lang filter")(println(s"  rows=${s1.count()}"))
    val nStop = size(filter(split(col("text"), " "),
      x => x === "the" || x === "a")).cast("long")
    val s2 = s1.where(QueryUtil.ppm(nStop, col("n_toks")) <= 120000)
    t("s2 quality filter")(println(s"  rows=${s2.count()}"))
    val wN = Window.partitionBy(col("norm_hash"))
    val s3 = s2
      .withColumn("norm_hash", md5(DedupQueries.normText.cast("binary")))
      .withColumn("canon", min(col("doc_id")).over(wN))
      .where(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("text"), col("n_toks"))
      .cache()
    t("s3 exact dedup")(println(s"  rows=${s3.count()}"))
    // candidate cut: min_by aggregation instead of the window (no
    // per-partition sort; one partial-aggregable exchange)
    val s3b = s2
      .withColumn("norm_hash", md5(DedupQueries.normText.cast("binary")))
      .groupBy(col("norm_hash"))
      .agg(min_by(struct(col("doc_id"), col("text"), col("n_toks")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id"), col("r.text"), col("r.n_toks"))
      .cache()
    t("s3 exact dedup (min_by)")(println(s"  rows=${s3b.count()}"))
    val pairs = t("s4a simhash pairs") {
      val p = DedupQueries.simhashPairsFrame(s3)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      println(s"  pairs=${p.count()}")
      p
    }
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint(true)
    val labels = t("s4b star contraction") {
      val l = DedupQueries.starContractLabels(edges)
        .withColumnRenamed("v", "doc_id").localCheckpoint(true)
      println(s"  labeled=${l.count()}")
      l
    }
    t("s4c survivor join + agg") {
      val s4 = s3.join(labels, Seq("doc_id"), "left_outer")
        .where(col("doc_id") === coalesce(col("label"), col("doc_id")))
      println(s"  rows=${s4.count()}")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
