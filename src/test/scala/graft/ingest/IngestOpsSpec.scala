package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

class IngestOpsSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = GraftConfig.parity

  /** Minimal property runner (scalatestplus bridge isn't in the offline
    * cache): deterministic seeds, n samples.
    */
  private def forAll[A](gen: Gen[A], n: Int = 40)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed at seed $i")))
    }

  // --- W1 chunking: exactness from test/test_api.js:68-82 ------------
  test("chunk splits [1..7] into [1,2,3],[4,5,6],[7] in order") {
    val got = Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)).toDF("ids")
      .select(IngestOps.chunk($"ids", 3).as("chunks"))
      .as[Seq[Seq[Long]]].head()
    assert(got === Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
  }

  test("chunk of empty ids is an empty chunk list (zero batches)") {
    val got = Seq(Seq.empty[Long]).toDF("ids")
      .select(IngestOps.chunk($"ids", 3).as("chunks"))
      .as[Seq[Seq[Long]]].head()
    assert(got.isEmpty)
  }

  test("chunk expression agrees with chunkSeq on arbitrary inputs") {
    val caseGen = for {
      len <- Gen.chooseNum(0, 20)
      ids <- Gen.listOfN(len, Gen.chooseNum(1L, 1000000007L))
      n <- Gen.chooseNum(1, 5)
    } yield (ids, n)
    forAll(caseGen) { case (ids, n) =>
      val expr = Seq(ids).toDF("ids")
        .select(IngestOps.chunk($"ids", n).as("chunks"))
        .as[Seq[Seq[Long]]].head()
      assert(expr === IngestOps.chunkSeq(ids, n))
      // invariants: concat == input, all ≤ n, only last may be short
      assert(expr.flatten === ids)
      assert(expr.forall(_.size <= n))
      assert(expr.dropRight(1).forall(_.size == n))
    }
  }

  // --- F1 validation --------------------------------------------------
  test("validation accepts empty ids, rejects out-of-range and bad enum") {
    val rows = Seq(
      (Seq.empty[Long], "LOW", true), // test_api.js:47-57
      (Seq(1L, 2L, 3L), "HIGH", true),
      (Seq(0L), "LOW", false), // test_api.js:39-45
      (Seq(1000000008L), "HIGH", false),
      (Seq(1L, 1000000007L), "MEDIUM", true),
      (Seq(1L, 2L, 3L), "VERY_HIGH", false)) // test_api.js:31-37
    val got = rows.map(_._1).zip(rows.map(_._2)).toDF("ids", "priority")
      .select(IngestOps.validRequest($"ids", $"priority", cfg).as("v"))
      .as[Boolean].collect().toSeq
    assert(got === rows.map(_._3))
  }

  // --- A1 status fold -------------------------------------------------
  /** Scala oracle mirroring src/app.js:168-173 exactly. */
  private def foldOracle(statuses: Seq[String]): String =
    if (statuses.forall(_ == Status.Completed)) Status.Completed
    else if (statuses.exists(_ == Status.Triggered)) Status.Triggered
    else Status.YetToStart

  test("status fold matches the reference oracle on random multisets") {
    val statusGen = Gen.listOfN(8,
        Gen.oneOf(Status.YetToStart, Status.Triggered, Status.Completed))
      .flatMap(l => Gen.chooseNum(0, 8).map(l.take))
    forAll(statusGen) { statuses =>
      val ingestions = Seq("i1").toDF("ingestion_id")
      val batches = statuses.map(s => ("i1", s))
        .toDF("ingestion_id", "status")
      val got = IngestOps.statusOf(ingestions, batches)
        .select($"status").as[String].head()
      assert(got === foldOracle(statuses))
    }
  }

  test("zero-batch ingestion folds to completed (vacuous every)") {
    val got = IngestOps.statusOf(
      Seq("empty").toDF("ingestion_id"),
      Seq.empty[(String, String)].toDF("ingestion_id", "status"))
      .select($"status").as[String].head()
    assert(got === Status.Completed)
  }

  // --- P1 explode -----------------------------------------------------
  test("explodeBatches emits one ordered row per batch, none for empty") {
    val reqs = Seq(
      ("a", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L), "HIGH", 100L),
      ("b", Seq.empty[Long], "LOW", 200L))
      .toDF("ingestion_id", "ids", "priority", "created_at")
    val got = IngestOps.explodeBatches(reqs, cfg)
      .orderBy($"ingestion_id", $"ordinal")
      .select($"ingestion_id", $"ordinal", $"ids", $"status")
      .as[(String, Int, Seq[Long], String)].collect().toSeq
    assert(got === Seq(
      ("a", 0, Seq(1L, 2L, 3L), Status.YetToStart),
      ("a", 1, Seq(4L, 5L, 6L), Status.YetToStart),
      ("a", 2, Seq(7L), Status.YetToStart)))
  }

  // --- O1 ordering -----------------------------------------------------
  test("queue order: weight desc, createdAt asc, ordinal asc") {
    val entries = Seq(
      ("lo-old", "LOW", 1L, 0), ("hi-new", "HIGH", 9L, 0),
      ("med", "MEDIUM", 5L, 0), ("hi-new-2", "HIGH", 9L, 1),
      ("hi-old", "HIGH", 2L, 0))
      .toDF("batch_id", "priority", "created_at", "ordinal")
    val got = entries
      .orderBy(IngestOps.queueOrder($"priority", $"created_at", $"ordinal"): _*)
      .select($"batch_id").as[String].collect().toSeq
    assert(got === Seq("hi-old", "hi-new", "hi-new-2", "med", "lo-old"))
  }
}
