package graft.sources

/** Forked by ManifestSinkSpec's cross-process commit test: a SEPARATE
  * JVM appending to the same manifest head the parent's Spark sink
  * writes — the writer the in-process commit stripe cannot see, so
  * only the cross-process head lock (catalog CAS section) keeps the
  * read→merge→publish commits from dropping each other's files. No
  * SparkSession in this process, deliberately: the external-committer
  * path is plain metadata + file IO.
  *
  * args: tablePath writerId nCommits rowsPerCommit — writes ids
  * `writerId·1_000_000 + commit·rowsPerCommit + row`, one commit per
  * data file, exiting 0 iff every commit published.
  */
object ExternalCommitterMain {
  def main(args: Array[String]): Unit = {
    val Array(path, writerIdS, nCommitsS, rowsS) = args
    val writerId = writerIdS.toInt
    val nCommits = nCommitsS.toInt
    val rows = rowsS.toInt
    val base = writerId.toLong * 1000000L
    for (c <- 0 until nCommits) {
      val lines = (0 until rows)
        .map(r => s"""{"id":${base + c.toLong * rows + r}}""")
      ManifestV2Sink.appendExternal(path, lines, s"w$writerId-$c")
    }
  }
}
