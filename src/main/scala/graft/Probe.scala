package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level profiler for the NN-Descent build at smoke scale —
  * replicates nndGraphWithInit with per-stage walls and row counts so
  * 100× cost attribution is measured, not argued (dev tool, like
  * [[TimeOne]]/[[Explain]]; `GRAFT_PROBE_MULT` scales the synthetic
  * corpus). This is the tool that caught the r12 eval-stride defect:
  * the query's smoke wall said "the build is slow", the per-stage
  * walls said the build was ~130 s and the O(n²/50) recall EVAL was
  * the other ~450 s — mirror-the-query instrumentation beats
  * guessing at plan shapes when a wall number disagrees with a cost
  * model.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("GRAFT_PROBE_MULT", "100").toInt
    val spark = graft.core.GraftSession.local(32, "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.EmbeddingQueries.{NndK, NndRepC, NndRevK}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // smoke-shaped embeddings (ScaleSmokeSpec.genEmbeddings)
    val n0 = 2000L * mult
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-probe-$mult").toString
    t("gen") {
      spark.range(0, n0, 1, 64)
        .select(col("id").as("vec_id"))
        .withColumn("label",
          pmod(xxhash64(col("vec_id"), lit(5)), lit(10)).cast("int"))
        .withColumn("embedding",
          transform(sequence(lit(0L), lit(63L)), d =>
            ((pmod(xxhash64(col("label"), d, lit(101)), lit(2001)) - 1000)
              .cast("double") / 4000.0 +
             (pmod(xxhash64(col("vec_id"), d, lit(103)), lit(2001)) - 1000)
              .cast("double") / 8000.0).cast("float")))
        .select("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
    }

    val e = t("quantize+bucket+pack+cache") {
      val q = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 4096).cast("long")).as("q"))
        .withColumn("norm2", graft.functions.DotLong(col("q"), col("q")))
        .withColumn("bucket", graft.analytics.EmbeddingQueries.bucketColForProbe)
        .select(col("vec_id"),
          graft.functions.PackS16(col("q")).as("qp"),
          col("norm2"), col("bucket")).cache()
      q.count()
      q
    }
    val n = e.count()

    val scoredHint = "shuffle_hash"
    def scored(pairs: DataFrame): DataFrame =
      pairs
        .join(e.select(col("vec_id").as("v"), col("qp").as("qa"),
          col("norm2").as("na")).hint(scoredHint), "v")
        .join(e.select(col("vec_id").as("u"), col("qp").as("qb"),
          col("norm2").as("nb")).hint(scoredHint), "u")
        .select(col("v"), col("u"),
          (col("na") + col("nb") - lit(2L) *
            graft.functions.DotPackedS16(col("qa"), col("qb")))
            .as("d"))
    val bk = udaf(graft.functions.BottomKPairsAgg(NndK))
    def topK(cand: DataFrame): DataFrame =
      cand.groupBy(col("v"))
        .agg(bk(col("d"), col("u")).as("tk"))
        .select(col("v"), explode(col("tk")).as("x"))
        .select(col("v"), col("x._2").as("u"), col("x._1").as("d"))

    val ring = e
      .select(col("vec_id").as("v"),
        explode(sequence(lit(1), lit(NndK))).as("i"))
      .select(col("v"), ((col("v") + col("i")) % n).as("u"))
    val wrep = Window.partitionBy(col("bucket")).orderBy(
      graft.functions.CrossHash.md5Long(col("vec_id").cast("string")).asc,
      col("vec_id").asc)
    val reps = e.select(col("bucket"), col("vec_id"))
      .withColumn("rnk", row_number().over(wrep))
      .where(col("rnk") <= NndRepC)
      .select(col("bucket"), col("vec_id").as("u"))
    val warm = e.select(col("vec_id").as("v"), col("bucket"))
      .join(broadcast(reps), "bucket")
      .where(col("v") =!= col("u"))
      .select(col("v"), col("u"))
    val parts = (((n * NndK + 499999L) / 500000L).toInt.max(1))
      .min(e.rdd.getNumPartitions.max(1))
    var g = t("g0") {
      topK(scored(ring.unionByName(warm))).coalesce(parts)
        .localCheckpoint(true)
    }
    var nw = g.select(col("v"), col("u"))
    for (r <- 1 to 4) {
      val gN = g.join(nw.withColumn("nf", lit(1)), Seq("v", "u"),
          "left_outer")
        .select(col("v"), col("u"), col("d"),
          coalesce(col("nf"), lit(0)).as("nf"))
      val wr = Window.partitionBy(col("u"))
        .orderBy(col("d").asc, col("v").asc)
      val rev = gN.withColumn("rr", row_number().over(wr))
        .where(col("rr") <= NndRevK)
        .select(col("u").as("v"), col("v").as("u"), col("nf"))
      val b = t(s"r$r b") {
        gN.select(col("v"), col("u"), col("nf")).union(rev)
          .groupBy(col("v"), col("u")).agg(max(col("nf")).as("nf"))
          .coalesce(parts).localCheckpoint(true)
      }
      val bx = b.select(col("v").as("xv"), col("u").as("xu"),
        col("nf").as("xn"))
      val by = b.select(col("v").as("yv"), col("u").as("yu"),
        col("nf").as("yn"))
      val twoHop = t(s"r$r twoHop") {
        val th = bx.join(by, col("xu") === col("yv"))
          .where(col("xn") === 1 || col("yn") === 1)
          .select(col("xv").as("v"), col("yu").as("u"))
          .where(col("v") =!= col("u"))
          .distinct()
          .localCheckpoint(true)
        println(f"PROBE r$r twoHop rows ${th.count()}%,d")
        th
      }
      val gNext = t(s"r$r score+topK") {
        topK(scored(twoHop).union(g)).coalesce(parts)
          .localCheckpoint(true)
      }
      nw = t(s"r$r nw") {
        val x = gNext.join(g, Seq("v", "u"), "left_anti")
          .select(col("v"), col("u")).coalesce(parts).localCheckpoint(true)
        println(f"PROBE r$r nw rows ${x.count()}%,d")
        x
      }
      g = gNext
    }
    println(s"PROBE done n=$n")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
