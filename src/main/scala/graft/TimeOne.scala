package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query (or several) without the full Bench
  * sweep. `runMain graft.TimeOne <sfDir> <name> [name...]` — each query
  * is warmed once at sf0.001 then timed twice at the target SF (the
  * second number is the steady-state one; the first includes plan and
  * codegen compilation for this exact data size).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.core.GraftSession.builder("graft-timeone")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      once(n, "/root/testdata/sf0.001")
      val a = once(n, sfDir)
      val b = once(n, sfDir)
      println(f"[timeone] $n%-28s first=$a%6.2fs steady=$b%6.2fs")
    }
    spark.stop()
  }
}
