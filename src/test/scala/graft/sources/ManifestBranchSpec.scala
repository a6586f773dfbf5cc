package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Branch protocol of the manifest sink: two-way isolation, pure
  * metadata merge, rewrite-conflict rejection, vacuum retention of
  * branch-only files, and the delete lifecycle.
  */
class ManifestBranchSpec extends SparkSuite {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-manifest-br").toString

  private def rows(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"row-$i")).toDF("id", "s")
  }

  private def idsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import spark.implicits._
    df.select(col("id")).as[Long].collect().sorted.toSeq
  }

  test("branch writes are isolated both ways and merge unions exactly once") {
    val dir = tmpTable()
    rows(1, 2).write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.createBranch(dir, "exp")
    // branch starts at the fork state
    assert(idsOf(ManifestV2Sink.readBranch(spark, dir, "exp")) == Seq(1L, 2L))
    rows(3).write.format("graft-manifest").option("branch", "exp")
      .mode("append").save(dir)
    // main does not see the branch commit…
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) == Seq(1L, 2L))
    // …and an independent main commit does not reach the branch
    rows(4).write.format("graft-manifest").mode("append").save(dir)
    assert(idsOf(ManifestV2Sink.readBranch(spark, dir, "exp")) ==
      Seq(1L, 2L, 3L))
    // branch-only files are NOT vacuum bait while the branch is live
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
    ManifestV2Sink.mergeBranch(dir, "exp")
    // merge = fork-shared once + both sides' additions
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) ==
      Seq(1L, 2L, 3L, 4L))
    assert(ManifestV2Sink.branches(dir).isEmpty)
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
  }

  test("fork points are per-branch file lists, immune to other heads' commits") {
    // regression: the fork base used to be the LATEST global snapshot
    // number — which can belong to ANOTHER branch's commit — so a
    // second branch created after a first branch's commit mis-merged
    val dir = tmpTable()
    rows(1).write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.createBranch(dir, "a")
    rows(2).write.format("graft-manifest").option("branch", "a")
      .mode("append").save(dir) // lands a global snapshot with a's files
    ManifestV2Sink.createBranch(dir, "b") // fork point must be MAIN's state
    rows(3).write.format("graft-manifest").option("branch", "b")
      .mode("append").save(dir)
    ManifestV2Sink.mergeBranch(dir, "b") // append-only vs ITS base: must pass
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) == Seq(1L, 3L))
    // branch a is untouched and still merges its own addition
    ManifestV2Sink.mergeBranch(dir, "a")
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) ==
      Seq(1L, 2L, 3L))
  }

  test("a rewrite branch refuses merge-by-union") {
    val dir = tmpTable()
    rows(1, 2).write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.createBranch(dir, "rw")
    rows(9).write.format("graft-manifest").option("branch", "rw")
      .mode("overwrite").save(dir) // drops the fork-point files
    intercept[IllegalStateException] {
      ManifestV2Sink.mergeBranch(dir, "rw")
    }
    // main is untouched by the failed merge
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) == Seq(1L, 2L))
  }

  test("an un-created branch starts empty at the current fork point") {
    val dir = tmpTable()
    rows(1).write.format("graft-manifest").mode("append").save(dir)
    rows(7).write.format("graft-manifest").option("branch", "fresh")
      .mode("append").save(dir)
    assert(idsOf(ManifestV2Sink.readBranch(spark, dir, "fresh")) == Seq(7L))
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) == Seq(1L))
    ManifestV2Sink.mergeBranch(dir, "fresh")
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) == Seq(1L, 7L))
  }

  test("concurrent publishes mint distinct snapshot versions (optimistic commit)") {
    // regression: version numbers used to be read-modify-write with a
    // REPLACE_EXISTING rename — two racing committers could mint the
    // same vNNNNN and silently overwrite one snapshot. The mint is now
    // an atomic create-if-absent (hard link); losers retry.
    val dir = tmpTable()
    rows(1).write.format("graft-manifest").mode("append").save(dir)
    val schema = ManifestV2Sink.readManifest(dir).get._1
    val n = 8
    val threads = (0 until n).map { i =>
      new Thread(() =>
        ManifestV2Sink.publish(dir, schema, Seq(s"data/fake-$i.jsonl"),
          s"race-$i"))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val vs = ManifestV2Sink.versions(dir)
    // 1 seed commit + n racers, no number reused, no snapshot lost
    assert(vs == (1 to n + 1), s"got versions $vs")
    val bodies = vs.map(v =>
      ManifestV2Sink.parseManifest(ManifestV2Sink.versionFile(dir, v)).get._2)
    assert(bodies.distinct.size == vs.size,
      s"a snapshot body was overwritten: $bodies")
  }

  test("concurrent appends to one head all land in the committed view") {
    // regression: commit was read-modify-write on the pointer — two
    // concurrent appends could each read `previous` before either
    // committed, and the last rename dropped the other's files (they
    // survived only as orphan snapshots). The per-path commit lock
    // serializes in-process read→merge→publish, so the final state
    // must UNION every append, not merely mint distinct snapshots.
    val dir = tmpTable()
    rows(0).write.format("graft-manifest").mode("append").save(dir)
    val n = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { i =>
      new Thread(() =>
        try rows(i.toLong).write.format("graft-manifest")
          .mode("append").save(dir)
        catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"a concurrent append failed: ${errs.peek()}")
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) ==
      (0L to n.toLong))
  }

  test("implicit branch write heals a stale sidecar from a crashed createBranch") {
    // regression: createBranch writes the .base sidecar BEFORE the
    // head rename; a crash in between leaves main's file list as the
    // sidecar. An implicit write used to keep that stale base (head
    // starts empty) and mergeBranch then rejected an append-only
    // branch with the rewrote-fork-point error.
    val dir = tmpTable()
    rows(1, 2).write.format("graft-manifest").mode("append").save(dir)
    // simulate the crash: sidecar holds main's current files, no head
    val mainFiles = ManifestV2Sink.readManifest(dir).get._2
    Files.write(ManifestV2Sink.branchBaseFile(dir, "crashed"),
      (mainFiles.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    rows(9).write.format("graft-manifest").option("branch", "crashed")
      .mode("append").save(dir)
    assert(idsOf(ManifestV2Sink.readBranch(spark, dir, "crashed")) == Seq(9L))
    ManifestV2Sink.mergeBranch(dir, "crashed") // must not throw
    assert(idsOf(ManifestV2Sink.readCommitted(spark, dir)) ==
      Seq(1L, 2L, 9L))
  }

  test("deleting a branch releases its files only after snapshots expire") {
    val dir = tmpTable()
    rows(1).write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.createBranch(dir, "dead")
    rows(2).write.format("graft-manifest").option("branch", "dead")
      .mode("append").save(dir)
    ManifestV2Sink.deleteBranch(dir, "dead")
    // the branch commit's snapshot still references its file
    assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
    // expire the branch commit's snapshot (the latest one — the main
    // pointer still holds the v1 state, which stays referenced)
    Files.delete(ManifestV2Sink.versionFile(dir,
      ManifestV2Sink.versions(dir).max))
    val orphans = ManifestV2Sink.unreferencedFiles(dir)
    assert(orphans.size == 1, s"expected the dead branch's file: $orphans")
  }
}
