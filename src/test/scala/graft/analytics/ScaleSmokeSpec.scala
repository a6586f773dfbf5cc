package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Scale smoke (VERDICT r10 item 5): convert the "plans survive 100×"
  * claim from argument to artifact by actually EXECUTING the heaviest
  * query families on a corpus ~100× sf0.1.
  *
  * `/root/testdata` caps at sf0.1 (read-only, do-not-regenerate), so
  * the corpus is synthesized here with the same statistical shape as
  * the driver's documents/embeddings tables — same 31-word vocabulary,
  * 10–100 words/doc, ~10% near-dup pairs (copy of the previous doc
  * with exactly one token substituted, so LSH bucket density stays
  * realistic instead of exploding), 64-dim embeddings drawn as
  * centroid+noise around 10 label centroids inside the real data's
  * ±0.4 envelope. Generation is pure Column expressions over
  * `spark.range` (distributed, codegen'd, no driver loop) — the same
  * approach SyntheticV2Source takes for the TPC-H-ish fact tables,
  * specialized to the text/vector schemas the heavy families read.
  *
  * Two tests:
  *  - an always-on generator contract (runs at 1× in every `sbt test`,
  *    seconds): schema parity with the driver tables, vocabulary
  *    closure, the near-dup invariant (same length, exactly one token
  *    differs), embedding envelope;
  *  - the opt-in smoke itself, gated on `GRAFT_SCALE_MULT` (e.g. 100):
  *    generates `mult`× sf0.1 documents+embeddings and runs the five
  *    heaviest families (dedup_clusters_persisted, knn_graph_nnd,
  *    knn_graph_search, text_bpe_train + emb_kmeans_train,
  *    pipeline_e2e) end-to-end, asserting completion (rows > 0) and
  *    the scale-critical plan pins (no CartesianProduct anywhere; the
  *    ANN/k-means corpus joins stay broadcast — no SortMergeJoin —
  *    exactly the PlanAuditSpec pins, now witnessed at 100× instead
  *    of sf0.001). Wall-clock per family is printed for SWEEP_r{N}.md.
  */
class ScaleSmokeSpec extends SparkSuite {

  // generators live in ScaleCorpus (shared with graft.ScaleBench,
  // the isolated min-of-N 100× harness); this spec pins the contract.
  private def vocabWords = ScaleCorpus.vocabWords

  private def genDir(mult: Int): String = {
    val dir = Files.createTempDirectory(s"graft-scale-${mult}x").toString
    ScaleCorpus.writeCorpus(spark, mult, dir)
    dir
  }

  test("scale generator matches the driver tables' shape at 1x") {
    val dir = genDir(1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(docs.count() == 5000 && embs.count() == 2000)
    // schema parity with /root/testdata/sf0.1 (names, types, order)
    val refDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val refEmbs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    assert(docs.schema == refDocs.schema, docs.schema.treeString)
    assert(embs.schema == refEmbs.schema, embs.schema.treeString)
    // vocabulary closure + word-count envelope
    val wordRange = docs.select(split(col("text"), " ").as("w"))
      .agg(min(size(col("w"))), max(size(col("w")))).head
    assert(wordRange.getInt(0) >= 10 && wordRange.getInt(1) <= 100)
    val novel = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(!col("w").isin(vocabWords: _*)).count()
    assert(novel == 0, s"$novel tokens outside the driver vocabulary")
    // near-dup invariant: every id%10==1 doc has the same word count
    // as its base and differs in EXACTLY one position
    val pairs = docs.where(pmod(col("doc_id"), lit(10)) === 1)
      .select((col("doc_id") - 1).as("base_id"),
        split(col("text"), " ").as("dup_w"))
      .join(docs.select(col("doc_id").as("base_id"),
        split(col("text"), " ").as("base_w")), "base_id")
    val bad = pairs.where(
      size(col("dup_w")) =!= size(col("base_w")) ||
      size(filter(zip_with(col("dup_w"), col("base_w"), (x, y) => x =!= y),
        (b: Column) => b)) =!= 1).count()
    assert(bad == 0, s"$bad near-dup pairs break the one-token contract")
    // embedding envelope: every component within ±0.4, like the table
    val outside = embs.select(explode(col("embedding")).as("x"))
      .where(abs(col("x")) > lit(0.4f)).count()
    assert(outside == 0)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("heavy families complete at GRAFT_SCALE_MULT x sf0.1 " +
    "with their plan pins intact") {
    val mult = sys.env.get("GRAFT_SCALE_MULT").map(_.toInt).getOrElse(0)
    assume(mult > 0,
      "opt-in: set GRAFT_SCALE_MULT=100 — results recorded in SWEEP_r*.md")
    val dir = genDir(mult)
    // build jobs first: the graph/label artifacts the riders read
    // (GRAFT_SCALE_ONLY=a,b re-runs a subset after a targeted fix)
    val only = sys.env.get("GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val targets = Seq(
      "dedup_clusters_persisted", // LSH pairs + star contraction + sink
      "emb_kmeans_train",         // Lloyd rounds, broadcast centroids
      "text_bpe_train",           // multi-round pair-count merges
      "knn_graph_nnd",            // NN-Descent graph build
      "knn_graph_search",         // beam search over the built graph
      "pipeline_e2e")             // funnel: score→filter→dedup→pack
      .filter(q => only.forall(_.contains(q)))
    val noSmj = Set("emb_kmeans_train", "knn_graph_search")
    val times = targets.map { q =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      val p = df.queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
      if (noSmj(q))
        assert(!p.contains("SortMergeJoin"), s"$q shuffles its corpus")
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(n > 0, s"$q returned no rows at ${mult}x")
      println(f"SCALE_SMOKE mult=$mult $q%-28s rows=$n%-10d ${sec}%8.1f s")
      q -> sec
    }
    println(f"SCALE_SMOKE mult=$mult TOTAL ${times.map(_._2).sum}%8.1f s")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
