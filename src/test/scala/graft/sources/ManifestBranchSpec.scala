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
