package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.sources.ManifestV2Sink

/** The live corpus-admission pipeline END TO END: documents arrive as
  * a stream and pass three gates — minimum quality (token floor),
  * benchmark contamination ([[StreamContamGate]]), near-duplication
  * against the frozen corpus index ([[StreamNearDupGate]]) — and the
  * survivors land in the transactional manifest table, one upsert
  * commit per micro-batch. This composes the pieces the way a
  * production ingestion loop does, and pins that the SAME gate code
  * runs identically on batch and stream frames: the expected state is
  * an independent plain-Scala refold of all three criteria.
  */
class StreamingAdmissionE2ESpec extends SparkSuite {

  private def md5l(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  private def grams(text: String): Set[Long] = {
    val t = text.split(" ", -1)
    if (t.length < 4) Set.empty
    else t.sliding(4).map(w => md5l(w.mkString(" "))).toSet
  }

  test("quality + contamination + near-dup gates admit exactly the clean docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 17 =!= 0)
    val delta = docs.where(col("doc_id") % 17 === 0)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    // frozen nightly artifacts: the corpus LSH index and the eval
    // benchmark grams (doc 17's text plays the leaked benchmark)
    val (b0, s0) = StreamNearDupGate.corpusIndex(corpus)
    val buckets = b0.localCheckpoint(true)
    val shingles = s0.localCheckpoint(true)
    val evalGrams = grams(delta.find(_._1 == 17L).get._2).toSeq.sorted

    val dir = Files.createTempDirectory("graft-admission").toString
    Seq.empty[(Long, Long)].toDF("doc_id", "n_toks")
      .write.format("graft-manifest").mode("append").save(dir) // seed
    val v0 = ManifestV2Sink.versions(dir).size

    val ms = MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val contamOk = StreamContamGate(b, evalGrams)
          .where(col("keep")).select(col("doc_id"))
        val dupBad = StreamNearDupGate(b, buckets, shingles)
          .where(!col("keep"))
          .select(col("doc_new").as("doc_id")).distinct()
        val survivors = b
          .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
          .where(col("n_toks") >= 20)
          .join(contamOk, Seq("doc_id"), "left_semi")
          .join(dupBad, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("n_toks"))
        if (!survivors.isEmpty)
          ManifestV2Sink.upsert(spark, dir, survivors, "doc_id")
        ()
      }
      .start()
    try {
      val (b1, b2) = delta.splitAt(delta.size / 2)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // independent refold of all three gates in plain Scala
    val corpusSh = corpus.as[(Long, String)].collect()
      .map { case (id, t) => id -> shingleSet(t) }
    val evalSet = evalGrams.toSet
    def quality(t: String) = t.split(" ", -1).length >= 20
    def contaminated(t: String) = grams(t).exists(evalSet)
    def nearDup(t: String) = {
      val sh = shingleSet(t)
      corpusSh.exists { case (_, c) =>
        val inter = sh.intersect(c).size
        val union = sh.union(c).size
        // same integer-ppm floor and ≥600000 rule as the gate
        math.floor(1e6 * inter.toDouble / union.toDouble).toLong >= 600000L
      }
    }
    // refold dup via exact Jaccard OVER ALL corpus docs — a superset
    // of the gate's LSH candidates, so assert on the gate's own
    // banded candidate semantics instead: recompute candidates there
    val gateDup = StreamNearDupGate(
      docs.where(col("doc_id") % 17 === 0), buckets, shingles)
      .where(!col("keep")).select(col("doc_new")).distinct()
      .as[Long].collect().toSet

    val expected = delta.filter { case (id, t) =>
      quality(t) && !contaminated(t) && !gateDup(id)
    }.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap

    val got = ManifestV2Sink.readCommitted(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)

    // every gate must have actually fired on this fixture
    assert(delta.exists(d => !quality(d._2)), "quality gate vacuous")
    assert(delta.exists(d => contaminated(d._2)), "contam gate vacuous")
    assert(gateDup.nonEmpty, "near-dup gate vacuous")
    assert(expected.nonEmpty, "no survivors — fixture degenerate")
    // LSH candidates that verified as dups must be true near-dups
    gateDup.foreach { id =>
      assert(nearDup(delta.find(_._1 == id).get._2),
        s"doc $id flagged but not a true near-dup")
    }
    // one commit per non-empty micro-batch
    assert(ManifestV2Sink.versions(dir).size == v0 + 2)
    spark.catalog.clearCache()
  }

  /** Plain-Scala twin of DedupQueries' 3-token shingle hashing. */
  private def shingleSet(text: String): Set[Long] = {
    val t = text.split(" ", -1)
    val sh = if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(text)
    sh.map(s => md5l(s) % graft.functions.CrossHash.P).toSet
  }
}
