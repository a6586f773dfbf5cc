package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for every query so
  * scan pushdown (PushedFilters / ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen spans
  * can be reviewed per change. Usage:
  *   runMain graft.Explain <sfDir> <outFile> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "target/plans.txt"
    val only = args.drop(2).toSet
    val spark = graft.core.GraftSession.builder("graft-explain")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        sb ++= s"\n${"=" * 72}\n== $name\n${"=" * 72}\n"
        try {
          val df = fn(spark, sfDir)
          sb ++= df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => sb ++= s"FAILED: ${e.getMessage}\n"
        } finally spark.catalog.clearCache() // per-query cache() scope
      }
    }
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), sb.result())
    println(s"wrote $out")
    spark.stop()
  }
}
