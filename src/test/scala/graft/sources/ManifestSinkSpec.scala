package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The transactional contract of the DSv2 manifest sink: committed
  * state is exactly the manifest, a failed job changes nothing
  * visible, retries can never double-commit a partition, and
  * append/overwrite modes do what they say.
  */
class ManifestSinkSpec extends SparkSuite {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-manifest").toString

  private def sample = {
    import spark.implicits._
    Seq(
      (1L, "plain", 1.5, true),
      (2L, "tab\tand\nnewline \"quoted\" back\\slash", -0.25, false),
      (3L, null.asInstanceOf[String], 0.0, true),
      (4L, "nonfinite", Double.NaN, false),
      (5L, "inf", Double.PositiveInfinity, true))
      .toDF("id", "s", "d", "b")
  }

  test("round-trips rows, special characters, and nulls exactly") {
    val dir = tmpTable()
    sample.coalesce(2).write.format("graft-manifest")
      .mode("append").save(dir)
    val back = ManifestV2Sink.readCommitted(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "d", "b"))
    assert(back.orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
    // nothing is left staged after a successful commit
    assert(!Files.exists(Paths.get(dir, "_staged")) ||
      Files.list(Paths.get(dir, "_staged")).count() == 0)
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
  }

  test("a failing job leaves the previous committed state untouched") {
    val dir = tmpTable()
    sample.write.format("graft-manifest").mode("append").save(dir)
    val before = ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq

    // second job fails mid-write on an executor (ANSI division by a
    // zero column after a few rows stream out)
    import spark.implicits._
    val bad = spark.range(100)
      .select(col("id"),
        (lit(1L) / when(col("id") < 50, lit(1L)).otherwise(lit(0L)))
          .cast("double").as("d"))
      .select(col("id"), lit("x").as("s"), col("d"), lit(true).as("b"))
    val err = intercept[Exception] {
      bad.coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    }
    assert(err != null)

    // committed view: bit-identical to before the failed job
    val after = ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq
    assert(after == before)
  }

  test("commit protocol: losing attempts never reach the manifest") {
    // drive the write protocol directly — deterministic stand-in for
    // a task retry, which local[32]'s maxTaskFailures=1 cannot replay
    val dir = tmpTable()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val factory = new ManifestWriterFactory(dir, schema, "q1")

    // attempt 1 of partition 0 writes rows, then fails → abort()
    val lose = factory.createWriter(0, taskId = 1L)
    lose.write(org.apache.spark.sql.catalyst.InternalRow(
      7L, org.apache.spark.unsafe.types.UTF8String.fromString("stale")))
    lose.abort()

    // attempt 2 of partition 0 succeeds; partition 1 succeeds
    val win0 = factory.createWriter(0, taskId = 2L)
    win0.write(org.apache.spark.sql.catalyst.InternalRow(
      1L, org.apache.spark.unsafe.types.UTF8String.fromString("a")))
    val m0 = win0.commit()
    val win1 = factory.createWriter(1, taskId = 3L)
    win1.write(org.apache.spark.sql.catalyst.InternalRow(
      2L, org.apache.spark.unsafe.types.UTF8String.fromString("b")))
    val m1 = win1.commit()

    new ManifestBatchWrite(dir, schema, "q1", replace = false)
      .commit(Array(m0, m1))

    val rows = ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq
    assert(rows == Seq(Row(1L, "a"), Row(2L, "b"))) // no 'stale' row
    // exactly the two committed files exist — the aborted attempt's
    // staged file is gone, nothing is unreferenced
    assert(Files.list(Paths.get(dir, "data")).count() == 2)
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
  }

  test("append merges the manifest; overwrite replaces it") {
    val dir = tmpTable()
    import spark.implicits._
    def one(id: Long) = Seq(id).toDF("id")
    one(1L).write.format("graft-manifest").mode("append").save(dir)
    one(2L).write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    one(3L).write.format("graft-manifest").mode("overwrite").save(dir)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .as[Long].collect().toSeq == Seq(3L))
    // overwrite drops the old files from the CURRENT view, but they
    // stay time-travel-reachable through the retained snapshots, so
    // vacuum must NOT list them yet...
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty,
      "snapshot-reachable files must survive vacuum")
    // ...until retention expires the old snapshots — then (and only
    // then) the orphaned files are released to the sweep
    ManifestV2Sink.versions(dir).dropRight(1).foreach { v =>
      Files.delete(Paths.get(dir, f"_MANIFEST.v$v%05d"))
    }
    assert(ManifestV2Sink.unreferencedFiles(dir).nonEmpty,
      "expired snapshots must release their files")
  }

  test("snapshot versions time-travel exactly; truncate keeps history") {
    val dir = tmpTable()
    import spark.implicits._
    def df(ids: Long*) = ids.toDF("id")
    df(1L, 2L).write.format("graft-manifest").mode("append").save(dir)
    df(3L).write.format("graft-manifest").mode("append").save(dir)
    df(9L).write.format("graft-manifest").mode("overwrite").save(dir)
    assert(ManifestV2Sink.versions(dir) == Seq(1, 2, 3))
    def at(v: Int): Seq[Long] = ManifestV2Sink.readVersion(spark, dir, v)
      .as[Long].collect().sorted.toSeq
    assert(at(1) == Seq(1L, 2L), "v1 must be the first append alone")
    assert(at(2) == Seq(1L, 2L, 3L), "v2 must merge both appends")
    assert(at(3) == Seq(9L), "v3 is the truncate")
    // current view ≡ the latest snapshot
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == at(3))
    // an expired / never-published version fails loudly, not empty
    intercept[IllegalArgumentException] {
      ManifestV2Sink.readVersion(spark, dir, 7)
    }
    ()
  }

  test("compaction rewrites files, keeps content and history, releases on expiry") {
    import spark.implicits._
    val dir = tmpTable()
    // four tiny single-file appends — the small-file pathology
    for (i <- 1 to 4)
      Seq((i.toLong, s"row-$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.committedFileCount(dir) == 4)
    ManifestV2Sink.compact(spark, dir, 1)
    // one commit: fewer files, identical content
    assert(ManifestV2Sink.committedFileCount(dir) == 1)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 4L))
    // history intact: the pre-compaction state is still time-travelable
    val vs = ManifestV2Sink.versions(dir)
    assert(vs.size == 5)
    assert(ManifestV2Sink.readVersion(spark, dir, 4)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 4L))
    // the small files release ONLY at snapshot expiry (OPTIMIZE→VACUUM)
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
    val expired = ManifestV2Sink.expireSnapshots(dir, keepLast = 1)
    assert(expired == (1 to 4), s"expired $expired")
    assert(ManifestV2Sink.versions(dir) == Seq(5))
    // expiry never touches the committed view…
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 4L))
    // …but the pre-compaction files are now vacuum bait
    assert(ManifestV2Sink.unreferencedFiles(dir).size == 4)
  }

  test("streaming micro-batches land exactly-once via ledger + manifest") {
    // the composition a production stream-to-lake path uses: the
    // batchId ledger (IdempotentSink) upgrades foreachBatch's
    // at-least-once to exactly-once, and each committed batch appends
    // through the transactional manifest — a replayed batch is skipped
    // BEFORE it can stage anything, a crashed batch publishes nothing
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = tmpTable()
    val ledgerDir = Files.createTempDirectory("graft-ledger").toString
    val ledger = new IdempotentSink("manifest_stream", ledgerDir)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val q = stream.toDS().toDF("id").writeStream
      .queryName("manifest-stream")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        ledger.commitOnce(id) {
          df.write.format("graft-manifest").mode("append").save(dir)
        }
        ()
      }
      .start()
    try {
      stream.addData(1L, 2L, 3L)
      q.processAllAvailable()
      stream.addData(4L, 5L)
      q.processAllAvailable()
      assert(ManifestV2Sink.readCommitted(spark, dir)
        .as[Long].collect().sorted.toSeq == (1L to 5L))

      // at-least-once redelivery: re-run the foreachBatch body with an
      // already-committed id and the SAME deterministic contents — the
      // ledger must skip it and the committed table must not change
      val replayed = ledger.commitOnce(0L) {
        Seq(1L, 2L, 3L).toDF("id")
          .write.format("graft-manifest").mode("append").save(dir)
      }
      assert(!replayed)
      assert(ManifestV2Sink.readCommitted(spark, dir)
        .as[Long].collect().sorted.toSeq == (1L to 5L))
      // a genuinely new batch still lands
      assert(ledger.commitOnce(2L) {
        Seq(6L).toDF("id")
          .write.format("graft-manifest").mode("append").save(dir)
      })
      assert(ManifestV2Sink.readCommitted(spark, dir)
        .as[Long].collect().sorted.toSeq == (1L to 6L))
    } finally q.stop()
  }

  test("write-time file stats skip disjoint files; statless files always read") {
    import spark.implicits._
    val dir = tmpTable()
    // three appends with disjoint id ranges → three data files whose
    // recorded [min,max] tile the space
    def slice(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    slice(0L, 10L); slice(100L, 110L); slice(200L, 210L)
    assert(ManifestV2Sink.committedFileCount(dir) == 3)
    // a window touching only the middle file reads exactly one file
    assert(ManifestV2Sink.prunedDataFiles(dir, "id", 100L, 150L).size == 1)
    assert(ManifestV2Sink.readPruned(spark, dir, "id", 100L, 150L)
      .select("id").as[Long].collect().sorted.toSeq == (100L until 110L))
    // boundary overlap: [9, 100] must keep BOTH touching files
    assert(ManifestV2Sink.prunedDataFiles(dir, "id", 9L, 100L).size == 2)
    // a column with no stats (string) can never prune
    assert(ManifestV2Sink.prunedDataFiles(dir, "s", 0L, 0L).size == 3)
    // a STATLESS entry (external append writes no stats) is always
    // read — legacy manifests keep full correctness, zero skipping
    ManifestV2Sink.appendExternal(dir,
      Seq("""{"id":9999,"s":"ext"}"""), "statless")
    assert(ManifestV2Sink.prunedDataFiles(dir, "id", 100L, 150L).size == 2)
    assert(ManifestV2Sink.readPruned(spark, dir, "id", 100L, 150L)
      .where(col("id").between(100L, 150L))
      .select("id").as[Long].collect().sorted.toSeq == (100L until 110L))
    // compaction rewrites carry fresh stats for the rewritten file
    ManifestV2Sink.compact(spark, dir, 1)
    assert(ManifestV2Sink.prunedDataFiles(dir, "id", 100L, 150L).size == 1)
  }

  test("merge-on-read delete: zero rewrites, exact reconcile, compact materializes") {
    import spark.implicits._
    val dir = tmpTable()
    (1L to 20L).map(i => (i, i * 100)).toDF("id", "v").coalesce(2)
      .write.format("graft-manifest").mode("append").save(dir)
    def dataFiles(): Set[String] =
      ManifestV2Sink.readManifest(dir).get._2
        .filterNot(ManifestV2Sink.isDeleteEntry)
        .map(ManifestV2Sink.entryFile).toSet
    val before = dataFiles()
    ManifestV2Sink.delete(spark, dir, "id", Seq(3L, 7L, 15L).toDF("id"))
    // tombstones committed, data files untouched (files-rewritten = 0)
    assert(dataFiles() == before, "MOR delete must not rewrite data files")
    assert(ManifestV2Sink.committedDeleteFileCount(dir) >= 1)
    val want = (1L to 20L).filterNot(Set(3L, 7L, 15L))
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == want)
    // COW equivalence: the reconciled view equals what a copy-on-write
    // rewrite of the same delete would have produced
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq ==
      (1L to 20L).filterNot(Set(3L, 7L, 15L)).map(i => Row(i, i * 100)))
    // pre-delete snapshot still shows every row (time travel)
    assert(ManifestV2Sink.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 20L))
    // pruned reads reconcile too
    assert(ManifestV2Sink.readPruned(spark, dir, "id", 1L, 10L)
      .where(col("id") <= 10L)
      .select("id").as[Long].collect().sorted.toSeq ==
      (1L to 10L).filterNot(Set(3L, 7L)))
    // deleting a missing key is a no-op on content
    ManifestV2Sink.delete(spark, dir, "id", Seq(999L).toDF("id"))
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == want)
    // OPTIMIZE materializes the reconcile: tombstones drop, content
    // holds, and the deleted keys become re-insertable
    ManifestV2Sink.compact(spark, dir, 1)
    assert(ManifestV2Sink.committedDeleteFileCount(dir) == 0)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == want)
    Seq((3L, 333L)).toDF("id", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .where(col("id") === 3L).select("v").as[Long].collect().toSeq ==
      Seq(333L))
  }

  test("cross-process concurrent appends: every writer's commit lands") {
    // three writers race one head: two FORKED JVMs committing through
    // appendExternal (the in-process stripe cannot see them) and the
    // parent committing through the Spark sink. Only the cross-process
    // head lock serializes their read→merge→publish sections; without
    // it the last pointer rename would silently drop the other
    // writers' files (the documented pre-round-11 limitation).
    import spark.implicits._
    val dir = tmpTable()
    Seq(0L).toDF("id").write.format("graft-manifest").mode("append").save(dir)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    def fork(writerId: Int): Process =
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.sources.ExternalCommitterMain",
        dir, writerId.toString, "12", "5")
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
    val children = Seq(fork(1), fork(2))
    // parent commits through the Spark sink CONCURRENTLY with the
    // children — cross-process interleaving is guaranteed by volume
    // (24 child commits race 8 parent commits on one head)
    val parentIds = (1L to 8L).map(_ + 3000000L)
    parentIds.foreach { i =>
      Seq(i).toDF("id").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    }
    children.foreach { p =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "external committer timed out")
      assert(p.exitValue() == 0, "external committer failed")
    }
    val got = ManifestV2Sink.readCommitted(spark, dir)
      .as[Long].collect().toSet
    val want = Set(0L) ++ parentIds ++
      (for (w <- 1 to 2; c <- 0 until 12; r <- 0 until 5)
        yield w * 1000000L + c.toLong * 5 + r)
    assert(got == want,
      s"committed view lost/invented rows: missing=${(want -- got).size} " +
        s"extra=${(got -- want).size}")
    // every commit minted its own snapshot: 1 seed + 8 parent + 24 ext
    assert(ManifestV2Sink.versions(dir).size == 33)
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
  }

  test("zorder rewrite is one atomic commit: content kept, boxes " +
    "prune to one file") {
    import spark.implicits._
    val dir = tmpTable()
    // 1024 rows covering every (x, y) in 32×32 — every 4-bit Morton
    // cell is populated; land as 4 hash-mixed files so every file's
    // x AND y stats span the full range (the unclustered baseline)
    val df = spark.range(1024).select(
      col("id"), (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    df.repartition(4).write.format("graft-manifest").mode("append").save(dir)
    val before = ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq
    val box = Seq(("x", 8L, 15L), ("y", 16L, 23L)) // quarter 1 × quarter 2
    assert(ManifestV2Sink.prunedDataFilesMulti(dir, box).size == 4,
      "unclustered baseline must fail to prune")
    val vsBefore = ManifestV2Sink.versions(dir).size

    val cells = ManifestV2Sink.compactZOrder(spark, dir, Seq("x", "y"), 2)

    assert(cells == 16)
    assert(ManifestV2Sink.committedFileCount(dir) == 16)
    // ONE commit: exactly one new snapshot, content bit-identical
    assert(ManifestV2Sink.versions(dir).size == vsBefore + 1)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq == before)
    // conjunctive box pruning now reads exactly the one cell file,
    // and the pruned read + residual equals the exact filter
    assert(ManifestV2Sink.prunedDataFilesMulti(dir, box).size == 1)
    assert(ManifestV2Sink.readPrunedMulti(spark, dir, box)
      .where(col("x").between(8, 15) && col("y").between(16, 23))
      .select("id").as[Long].collect().sorted.toSeq ==
      before.map(_.getLong(0)).filter { id =>
        val (x, y) = (id % 32, id / 32)
        x >= 8 && x <= 15 && y >= 16 && y <= 23
      })
    // pre-optimize files stay snapshot-reachable (no unreferenced
    // debris) until retention expires them — then vacuum sees them
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
    ManifestV2Sink.expireSnapshots(dir, keepLast = 1)
    assert(ManifestV2Sink.unreferencedFiles(dir).size == 4)
  }

  test("upsertNarrow rewrites only the stats-matching file and " +
    "matches full-COW semantics") {
    import spark.implicits._
    val dir = tmpTable()
    def slice(lo: Long): Unit =
      (lo until lo + 10).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    slice(0); slice(100); slice(200); slice(300)
    assert(ManifestV2Sink.committedFileCount(dir) == 4)
    // updates: two keys inside the 100-slice plus one INSERT key whose
    // envelope still only touches that slice
    val updates = Seq((105L, "UP105"), (107L, "UP107"), (150L, "NEW150"))
      .toDF("id", "s")
    val rewritten = ManifestV2Sink.upsertNarrow(spark, dir, updates, "id")
    assert(rewritten == 1, "only the 100-slice file may be rewritten")
    assert(ManifestV2Sink.committedFileCount(dir) == 4)
    val got = ManifestV2Sink.readCommitted(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 41)
    assert(got(105L) == "UP105" && got(107L) == "UP107" &&
      got(150L) == "NEW150")
    assert(got(106L) == "v106" && got(0L) == "v0" && got(305L) == "v305")
    // empty updates: no-op, no commit minted
    val vs = ManifestV2Sink.versions(dir).size
    assert(ManifestV2Sink.upsertNarrow(spark, dir,
      updates.where(col("id") < 0), "id") == 0)
    assert(ManifestV2Sink.versions(dir).size == vs)
    // tombstoned tables must compact first
    ManifestV2Sink.delete(spark, dir, "id", Seq(0L).toDF("id"))
    intercept[IllegalArgumentException] {
      ManifestV2Sink.upsertNarrow(spark, dir, updates, "id")
    }
    ()
  }

  test("per-file Bloom filters prune point lookups, never lose a key") {
    import spark.implicits._
    val dir = tmpTable()
    // EVEN ids 0..998, hash-distributed on the key: every file's
    // [min, max] spans the full range, so range stats cannot skip —
    // only the opt-in Bloom can
    spark.range(500).select((col("id") * 2).as("id"))
      .repartition(4, col("id"))
      .write.format("graft-manifest").option("bloomColumns", "id")
      .mode("append").save(dir)
    assert(ManifestV2Sink.committedFileCount(dir) == 4)
    assert(ManifestV2Sink.prunedDataFiles(dir, "id", 500L, 500L).size == 4,
      "min/max must be useless on the hash layout")
    // point lookup on a present key: fewer files read, row found
    val hit = ManifestV2Sink.prunedDataFilesEq(dir, "id", 500L)
    assert(hit.size < 4, s"bloom pruned nothing: $hit")
    assert(ManifestV2Sink.readPrunedEq(spark, dir, "id", 500L)
      .where(col("id") === 500L).count() == 1)
    // absent key INSIDE the range: blooms say no (≈0.2% FP per file),
    // and the reconciled result is exactly empty either way
    assert(ManifestV2Sink.prunedDataFilesEq(dir, "id", 501L).size < 4)
    assert(ManifestV2Sink.readPrunedEq(spark, dir, "id", 501L)
      .where(col("id") === 501L).count() == 0)
    // NO FALSE NEGATIVES: every file's actual keys pass its own bloom
    val (_, entries) = ManifestV2Sink.readManifest(dir).get
    entries.foreach { e =>
      val bloom = ManifestV2Sink.entryBloom(e, "id")
      assert(bloom.nonEmpty, s"no bloom recorded on $e")
      val ids = spark.read
        .schema(StructType(Seq(StructField("id", LongType))))
        .parquet(Paths.get(dir, ManifestV2Sink.entryFile(e)).toString)
        .as[Long].collect()
      ids.foreach { k =>
        assert(ManifestV2Sink.bloomMightContain(bloom.get, k),
          s"false negative for key $k")
      }
    }
    // a write WITHOUT the option carries no bloom → never skipped
    spark.range(1).select((col("id") + 2000L).as("id")).coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.prunedDataFilesEq(dir, "id", 2000L).nonEmpty)
    assert(ManifestV2Sink.readPrunedEq(spark, dir, "id", 2000L)
      .where(col("id") === 2000L).count() == 1)
  }

  test("zero-row partitions commit no data files") {
    import spark.implicits._
    val dir = tmpTable()
    spark.range(3).select(col("id")).repartition(8)
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.committedFileCount(dir) == 3)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty,
      "empty staged files must be swept, not stranded")
  }

  test("non-primitive schemas are rejected at plan time") {
    val dir = tmpTable()
    import spark.implicits._
    val arr = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[Exception] {
      arr.write.format("graft-manifest").mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("incremental read returns exactly what arrived after the base " +
    "snapshot, reconciled against later deletes") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir) // v1
    Seq((3L, "c")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir) // v2
    Seq((4L, "d")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir) // v3
    ManifestV2Sink.delete(spark, dir, "id", Seq(3L).toDF("id")) // v4
    assert(ManifestV2Sink.readAppendedSince(spark, dir, 1)
      .select("id").as[Long].collect().sorted.toSeq == Seq(4L),
      "since v1: arrivals are v2+v3 rows minus the later delete")
    assert(ManifestV2Sink.readAppendedSince(spark, dir, 2)
      .select("id").as[Long].collect().sorted.toSeq == Seq(4L))
    assert(ManifestV2Sink.readAppendedSince(spark, dir, 3)
      .select("id").as[Long].collect().isEmpty,
      "nothing but the delete arrived after v3")
    assert(ManifestV2Sink.appendedFileCount(dir, 1) == 2)
    assert(ManifestV2Sink.appendedFileCount(dir, 3) == 0)
  }

  test("metadata bounds fold exactly; a statless file makes them " +
    "unsound (None), never wrong") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((5L, 2.5), (1L, -3.5)).toDF("id", "d")
      .write.format("graft-manifest").mode("append").save(dir)
    Seq((9L, 0.5)).toDF("id", "d")
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.statsMinMax(dir, "id") ==
      Some((BigDecimal(1L), BigDecimal(9L))))
    assert(ManifestV2Sink.statsMinMax(dir, "d") ==
      Some((BigDecimal(-3.5), BigDecimal(2.5))))
    assert(ManifestV2Sink.statsMinMax(dir, "nope").isEmpty,
      "unknown column has no sound bounds")
    // a legacy statless entry poisons metadata soundness for ALL
    // columns — the fold must answer None, not a wrong bound
    ManifestV2Sink.appendExternal(dir,
      Seq("""{"id":100,"d":9.9}"""), "legacy")
    assert(ManifestV2Sink.statsMinMax(dir, "id").isEmpty)
    // ... while the data itself still reads fully
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 4)
  }

  test("schema evolution: add-column null-fills, omit keeps, " +
    "time travel reads each snapshot's own schema") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    // gen-2 ADDS v
    Seq((3L, "c", 30L)).toDF("id", "s", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    // gen-3 OMITS s (an older writer still running)
    Seq((4L, 40L)).toDF("id", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    val cur = ManifestV2Sink.readCommitted(spark, dir)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "s", "v"),
      "merged schema = prior columns first, additions appended")
    val rows = cur.orderBy("id")
      .select("id", "s", "v").collect().toSeq
    assert(rows == Seq(
      Row(1L, "a", null), Row(2L, "b", null),
      Row(3L, "c", 30L), Row(4L, null, 40L)))
    // time travel: v1 predates the evolution, so it reads 2 columns
    assert(ManifestV2Sink.readVersion(spark, dir, 1)
      .schema.fieldNames.toSeq == Seq("id", "s"))
    assert(ManifestV2Sink.readVersion(spark, dir, 2)
      .schema.fieldNames.toSeq == Seq("id", "s", "v"))
  }

  test("schema evolution: re-typing a column fails the commit and " +
    "leaves the table untouched") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, 10L)).toDF("id", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    val before = ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq
    val e = intercept[Exception] {
      Seq((2L, "oops")).toDF("id", "v")
        .write.format("graft-manifest").mode("append").save(dir)
    }
    assert(e.getMessage != null)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .orderBy("id").collect().toSeq == before,
      "a rejected evolution must not advance the table")
    assert(ManifestV2Sink.versions(dir).size == 1)
  }

  test("schema evolution merges across a branch: the branch's added " +
    "column fast-forwards onto main") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.createBranch(dir, "dev")
    Seq((2L, "b", 20L)).toDF("id", "s", "v")
      .write.format("graft-manifest").mode("append")
      .option("branch", "dev").save(dir)
    ManifestV2Sink.mergeBranch(dir, "dev")
    val merged = ManifestV2Sink.readCommitted(spark, dir)
    assert(merged.schema.fieldNames.toSeq == Seq("id", "s", "v"))
    assert(merged.orderBy("id").select("id", "s", "v").collect().toSeq ==
      Seq(Row(1L, "a", null), Row(2L, "b", 20L)))
  }
}
